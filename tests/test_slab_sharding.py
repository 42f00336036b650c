"""Slab-sharded structured solver == single-device (8 virtual CPU devices).

The round-3 sharded path: cube-major x-plane slabs, halo ppermute of edge
planes, structured slice-add combine per shard, no flat slot tables, no
gather tables, no resident boundary masks (structured constraint). These
tests are the correctness gate for BASELINE config 5's design (1e9 DOFs on
8 chips): shard-vs-single equivalence at 1e-9 in f64, all smoothers, all
coarse modes, at sizes where face orbits span shard boundaries at depth
(n=8, levels=3-4 — deeper than the round-2 toy tests flagged in the
round-2 verdict).
"""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke lane (pytest -m "not slow")

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from homogenization_jl_tpu.fem.local_operators import load_vector
from homogenization_jl_tpu.mesh.grid import affine_maps, hypercube
from homogenization_jl_tpu.models.checkerboard import (
    conductivity_per_element,
    generate_conductivity,
)
from homogenization_jl_tpu.ops.plan import build_grid_plan
from homogenization_jl_tpu.parallel.slab import SlabShardedMultigridSolver
from homogenization_jl_tpu.solver.multigrid import MultigridSolver


def _setup(dim, n, levels, seed=0):
    base = hypercube(dim, n)  # cube-major (slab requirement)
    rng = np.random.default_rng(seed)
    field = generate_conductivity(dim, n, rng)
    sigma = conductivity_per_element(base, field, np.zeros(dim))
    # no slot tables: the slab path must build without them (round-3 gate)
    plan = build_grid_plan(base, levels, slot_tables=False)
    b_ref = load_vector(plan.reference.levels[levels - 1])
    _, _, detJ, _ = affine_maps(base)
    b = detJ[:, None] * b_ref[None, :]
    return plan, sigma, b


def _mesh(n_dev):
    return Mesh(np.array(jax.devices()[:n_dev]), ("e",))


def test_slab_combine_matches_single_device():
    """The halo-extended slab combine == the single-device structured
    combine, bitwise-level (identical orbit summation order)."""
    plan, _, _ = _setup(3, 8, 3)
    ref = MultigridSolver(plan, dtype=jnp.float64, coarse="cg")
    sh = SlabShardedMultigridSolver(plan, _mesh(8), dtype=jnp.float64, coarse="cg")
    rng = np.random.default_rng(3)
    for k in range(plan.nlevels):
        x = rng.standard_normal((plan.base.nelements, plan.n_local(k)))
        a = np.asarray(ref.combine(jnp.asarray(x), k))
        b = np.asarray(sh.combine(sh.put(x), k))
        err = np.abs(a - b).max()
        assert err < 1e-12 * max(np.abs(a).max(), 1.0), (k, err)


def test_slab_constraint_matches_mask():
    """Slab structured constraint (static shells + dynamic axis-0 mask) ==
    the plan's boundary-mask multiply, every level."""
    plan, _, _ = _setup(3, 8, 3)
    sh = SlabShardedMultigridSolver(plan, _mesh(8), dtype=jnp.float64, coarse="cg")
    rng = np.random.default_rng(4)
    for k in range(plan.nlevels):
        x = rng.standard_normal((plan.base.nelements, plan.n_local(k)))
        want = x * plan.levels[k].boundary_mask
        got = np.asarray(sh.constrain(sh.put(x), k))
        assert np.abs(got - want).max() == 0.0, k


@pytest.mark.parametrize(
    "dim,n,levels,coarse,smoother,ndev",
    [
        (3, 8, 3, "chol", "cg", 8),
        (3, 8, 3, "chol", "cg_exact", 8),
        (2, 8, 4, "chol", "cg_exact", 4),
        (3, 8, 3, "cg", "cg", 8),
        (3, 8, 2, "mg", "cg_exact", 8),
        # 3D shard width > 1 (W=2): intra-shard planes along the sharded
        # axis coexist with the ppermute halo — the regime the width-1
        # (n=8, ndev=8) cases never enter, and the one run_slab_big.py
        # executes at n=32 (W=4)
        (3, 8, 3, "chol", "cg_exact", 4),
        (3, 8, 3, "chol", "cg", 4),
        # d=2 through the slab lattice-stencil coarse path
        (2, 8, 3, "cg", "cg_exact", 4),
    ],
)
def test_slab_vcycle_matches_single_device(dim, n, levels, coarse, smoother, ndev):
    plan, sigma, b_np = _setup(dim, n, levels)
    lam = 0.3
    kw = dict(dtype=jnp.float64, coarse=coarse, smoother=smoother,
              coarse_mg_dense_limit=4, coarse_mg_tol=1e-12)

    ref = MultigridSolver(plan, **kw)
    coeff = ref.coefficients(sigma, lam)
    setup = ref.coarse_setup(sigma, lam)
    x, _ = ref.zero_states()
    b = jnp.asarray(b_np)
    for _ in range(3):
        x, r = ref.vcycle(x, b, coeff, setup)

    sh = SlabShardedMultigridSolver(plan, _mesh(ndev), **kw)
    coeff_s = sh.coefficients(sigma, lam)
    setup_s = sh.coarse_setup(sigma, lam)
    x_s, _ = sh.zero_states()
    b_s = sh.put(b_np)
    for _ in range(3):
        x_s, r_s = sh.vcycle(x_s, b_s, coeff_s, setup_s)

    scale = max(float(jnp.abs(x).max()), 1e-300)
    err = float(jnp.abs(x_s - x).max()) / scale
    assert err < 1e-9, err
    err_r = float(jnp.abs(r_s - r).max()) / max(float(jnp.abs(r).max()), 1e-300)
    assert err_r < 1e-9, err_r
    # residual norms agree too (first-copy weighted)
    assert abs(float(sh.residual_norm(r_s)) - float(ref.residual_norm(r))) < 1e-9


def test_slab_chebyshev_matches_single_device():
    plan, sigma, b_np = _setup(3, 8, 3)
    lam = 0.2
    kw = dict(dtype=jnp.float64, coarse="chol", smoother="chebyshev")

    ref = MultigridSolver(plan, **kw)
    coeff = ref.coefficients(sigma, lam)
    chol = ref.coarse_cholesky(sigma, lam)
    lam_max = ref.estimate_lambda_max(coeff)
    x, _ = ref.zero_states()
    b = jnp.asarray(b_np)
    for _ in range(4):
        x, r = ref.vcycle(x, b, coeff, chol, lam_max=lam_max)

    sh = SlabShardedMultigridSolver(plan, _mesh(8), **kw)
    coeff_s = sh.coefficients(sigma, lam)
    chol_s = sh.coarse_setup(sigma, lam)
    lam_max_s = sh.estimate_lambda_max(coeff_s)
    assert abs(lam_max_s - lam_max) < 1e-9 * abs(lam_max)
    x_s, _ = sh.zero_states()
    b_s = sh.put(b_np)
    for _ in range(4):
        x_s, r_s = sh.vcycle(x_s, b_s, coeff_s, chol_s, lam_max=lam_max_s)

    err = float(jnp.abs(x_s - x).max()) / max(float(jnp.abs(x).max()), 1e-300)
    assert err < 1e-9, err


def test_slab_contracts_to_solution():
    """Slab-sharded V-cycles drive the residual down like the single-device
    solver (contraction, not just one-step equivalence)."""
    plan, sigma, b_np = _setup(3, 8, 3)
    sh = SlabShardedMultigridSolver(
        plan, _mesh(8), dtype=jnp.float64, coarse="chol",
        smoother="cg_exact",
    )
    coeff = sh.coefficients(sigma, 0.0)
    setup = sh.coarse_setup(sigma, 0.0)
    x, _ = sh.zero_states()
    b = sh.put(b_np)
    hist = []
    for _ in range(10):
        x, r = sh.vcycle(x, b, coeff, setup)
        hist.append(float(sh.residual_norm(r)))
    # ~0.35x per cycle (same rate as single-device; 0.35^10 ~ 2.8e-5)
    assert hist[-1] < 1e-4 * hist[0], hist


def test_slab_pcg_matches_single_device():
    """V-cycle-preconditioned CG, slab-sharded == single-device: the same
    iteration count, matching residual history, matching solution."""
    plan, sigma, b_np = _setup(3, 8, 3)
    kw = dict(dtype=jnp.float64, coarse="chol", smoother="chebyshev")

    ref = MultigridSolver(plan, **kw)
    coeff = ref.coefficients(sigma, 0.0)
    chol = ref.coarse_cholesky(sigma, 0.0)
    lam_max = ref.estimate_lambda_max(coeff)
    x, hist = ref.pcg(jnp.asarray(b_np), coeff, chol, lam_max=lam_max, iters=8)

    sh = SlabShardedMultigridSolver(plan, _mesh(8), **kw)
    coeff_s = sh.coefficients(sigma, 0.0)
    chol_s = sh.coarse_setup(sigma, 0.0)
    lam_max_s = sh.estimate_lambda_max(coeff_s)
    x_s, hist_s = sh.pcg(sh.put(b_np), coeff_s, chol_s, lam_max=lam_max_s, iters=8)

    assert len(hist) == len(hist_s)
    for a, b in zip(hist, hist_s):
        assert abs(a - b) < 1e-9 * max(abs(a), 1e-300), (a, b)
    err = float(jnp.abs(x_s - x).max()) / max(float(jnp.abs(x).max()), 1e-300)
    assert err < 1e-9, err
    assert hist[-1] < 1e-5 * hist[0]


def test_slab_fmg_matches_single_device():
    """FMG sweep, slab-sharded == single-device at 1e-9."""
    plan, sigma, b_np = _setup(3, 8, 3)
    kw = dict(dtype=jnp.float64, coarse="chol", smoother="cg_exact")

    ref = MultigridSolver(plan, **kw)
    coeff = ref.coefficients(sigma, 0.0)
    chol = ref.coarse_cholesky(sigma, 0.0)
    x, r = ref.fmg(jnp.asarray(b_np), coeff, chol)

    sh = SlabShardedMultigridSolver(plan, _mesh(8), **kw)
    coeff_s = sh.coefficients(sigma, 0.0)
    chol_s = sh.coarse_setup(sigma, 0.0)
    x_s, r_s = sh.fmg(sh.put(b_np), coeff_s, chol_s)

    err = float(jnp.abs(x_s - x).max()) / max(float(jnp.abs(x).max()), 1e-300)
    assert err < 1e-9, err
    a, b = float(ref.residual_norm(r)), float(sh.residual_norm(r_s))
    assert abs(a - b) < 1e-9 * max(a, 1e-300)
    # fmg actually helps: below one plain V-cycle from zero
    xz, _ = ref.zero_states()
    _, r1 = ref.vcycle(xz, jnp.asarray(b_np), coeff, chol)
    assert a < float(ref.residual_norm(r1))


def test_slab_solve_matches_single_device():
    """Inherited one-call solve() on the slab solver (needs the shard_map-
    wrapped initial_residual_norm override): same history and solution as
    the single-device solve()."""
    plan, sigma, b_np = _setup(3, 4, 3)
    kw = dict(dtype=jnp.float64, coarse="chol", smoother="chebyshev")

    ref = MultigridSolver(plan, **kw)
    x1, h1 = ref.solve(
        jnp.asarray(b_np), sigma, 0.0, tol=1e-8, max_cycles=20, method="auto"
    )

    slab = SlabShardedMultigridSolver(plan, _mesh(4), **kw)
    x_s, h_s = slab.solve(
        slab.put(b_np), sigma, 0.0, tol=1e-8, max_cycles=20, method="auto"
    )

    assert h_s[-1] <= 1e-8
    assert len(h1) == len(h_s)
    # 1e-7 relative: the two solvers compute their own lam_max, whose
    # Lanczos dots reduce in different orders (psum vs single-device), so
    # the Chebyshev polynomials differ at f64-rounding level and the
    # per-iteration histories drift ~1e-8 relative by the last iterate
    for a, b in zip(h1, h_s):
        assert abs(a - b) < 1e-7 * max(abs(a), 1e-300), (a, b)
    err = np.abs(np.asarray(x_s) - np.asarray(x1)).max()
    assert err < 1e-7 * max(np.abs(np.asarray(x1)).max(), 1e-300), err
