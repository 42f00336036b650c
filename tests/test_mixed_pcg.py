"""Mixed-precision PCG (solver.multigrid.mixed_precision_pcg): an f64 Krylov
loop around an f32 V-cycle preconditioner must converge BELOW the f32 floor —
the capability the f32-only V-cycle cannot provide (its measured floor is
~9.4e-4 relative at 190M DOFs, PERFORMANCE.md; ~1e-6 at test scale). The
reference gets deep tolerances for free from CPU float64
(src/multigrid.jl:46-71); on TPU the f64 path is emulated and this is the
cheap arrangement: one f64 apply + BLAS-1 per iteration, everything else f32.
"""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke lane (pytest -m "not slow")

import numpy as np
import jax.numpy as jnp

from homogenization_jl_tpu.fem.local_operators import load_vector
from homogenization_jl_tpu.mesh.grid import affine_maps, hypercube
from homogenization_jl_tpu.ops.plan import build_grid_plan
from homogenization_jl_tpu.solver.multigrid import (
    MultigridSolver,
    mixed_precision_pcg,
)


def _problem(dim, n, levels, lam=0.0, seed=3):
    base = hypercube(dim, n)
    plan = build_grid_plan(base, levels, slot_tables=False)
    rng = np.random.default_rng(seed)
    sigma = rng.choice([1.0, 9.0], size=(base.nelements, base.dim))
    b_ref = load_vector(plan.reference.levels[levels - 1])
    _, _, detJ, _ = affine_maps(base)
    b64 = jnp.asarray(detJ[:, None] * b_ref[None, :], dtype=jnp.float64)
    return plan, sigma, b64


@pytest.mark.parametrize("dim,n,levels", [(2, 4, 3), (3, 2, 3)])
def test_mixed_pcg_reaches_f64_depth(dim, n, levels):
    plan, sigma, b64 = _problem(dim, n, levels)
    outer = MultigridSolver(plan, dtype=jnp.float64, smoother="chebyshev")
    inner = MultigridSolver(plan, dtype=jnp.float32, smoother="chebyshev")

    x, hist = mixed_precision_pcg(
        outer, inner, b64, sigma, iters=60, tol=1e-12
    )
    assert hist[-1] <= 1e-12 * hist[0], hist

    # the f64 residual of the returned iterate really is that small
    # (history is not lying: recompute from scratch)
    coeff64 = outer.coefficients(sigma, 0.0)
    r = outer._local_residual(x, b64, coeff64, outer.nlevels - 1, None)
    assert float(outer.residual_norm(outer.combine(r))) <= 1.1e-12 * hist[0]

    # and it matches a pure-f64 V-cycle solve of the same system
    chol64 = outer.coarse_setup(sigma, 0.0)
    lam_max = outer.estimate_lambda_max(coeff64)
    x_ref, _ = outer.zero_states()
    for _ in range(80):
        x_ref, rr = outer.vcycle(x_ref, b64, coeff64, chol64, lam_max=lam_max)
    assert float(outer.residual_norm(rr)) < 1e-12 * hist[0]
    scale = float(jnp.max(jnp.abs(x_ref)))
    assert float(jnp.max(jnp.abs(x - x_ref))) < 1e-10 * scale


def test_f32_alone_floors_above_mixed():
    """The same V-cycle iterated purely in f32 stalls orders above where the
    mixed loop lands — the floor the mixed arrangement exists to break."""
    plan, sigma, b64 = _problem(2, 4, 3)
    inner = MultigridSolver(plan, dtype=jnp.float32, smoother="chebyshev")
    coeff32 = inner.coefficients(sigma, 0.0)
    chol32 = inner.coarse_setup(sigma, 0.0)
    lam_max = inner.estimate_lambda_max(coeff32)
    b32 = b64.astype(jnp.float32)
    x, _ = inner.zero_states()
    r0 = None
    rn = None
    for i in range(80):
        x, r = inner.vcycle(x, b32, coeff32, chol32, lam_max=lam_max)
        rn = float(inner.residual_norm(r))
        if r0 is None:
            r0 = rn
    f32_floor_rel = rn / r0
    assert f32_floor_rel > 1e-9  # f32 cannot get anywhere near 1e-12

    outer = MultigridSolver(plan, dtype=jnp.float64, smoother="chebyshev")
    _, hist = mixed_precision_pcg(outer, inner, b64, sigma, iters=60, tol=1e-12)
    assert hist[-1] / hist[0] < 1e-3 * f32_floor_rel


def test_mixed_pcg_slab_matches_single_device():
    """Sharded mixed-precision PCG (round-4: the below-f32-floor story for
    the 1e9-DOF regime): two slab solvers on an 8-device mesh run the
    identical iteration — converges to the same 1e-12 depth, tracking the
    single-device history at f32 resolution. Exact (1e-12) per-iteration
    identity is NOT achievable here by construction: the preconditioner is
    an f32 V-cycle whose rounding differs across layouts (psum reduction
    order, per-shard matmul tiling), so histories drift apart at f32
    epsilon from iteration 1 (measured: initial residual agrees to 1e-13,
    iteration 1 to ~1e-6 relative); the flexible-CG beta absorbs it."""
    import jax
    from jax.sharding import Mesh

    from homogenization_jl_tpu.parallel.slab import SlabShardedMultigridSolver

    base = hypercube(3, 8)  # cube-major (slab requirement)
    plan = build_grid_plan(base, 3, slot_tables=False)
    rng = np.random.default_rng(3)
    sigma = rng.choice([1.0, 9.0], size=(base.nelements, base.dim))
    b_ref = load_vector(plan.reference.levels[2])
    _, _, detJ, _ = affine_maps(base)
    b64 = jnp.asarray(detJ[:, None] * b_ref[None, :], dtype=jnp.float64)

    outer1 = MultigridSolver(plan, dtype=jnp.float64, smoother="chebyshev")
    inner1 = MultigridSolver(plan, dtype=jnp.float32, smoother="chebyshev")
    x1, h1 = mixed_precision_pcg(outer1, inner1, b64, sigma, iters=40, tol=1e-12)

    mesh = Mesh(np.array(jax.devices()[:8]), ("e",))
    outer8 = SlabShardedMultigridSolver(
        plan, mesh, dtype=jnp.float64, smoother="chebyshev"
    )
    inner8 = SlabShardedMultigridSolver(
        plan, mesh, dtype=jnp.float32, smoother="chebyshev"
    )
    x8, h8 = mixed_precision_pcg(
        outer8, inner8, outer8.put(b64), sigma, iters=40, tol=1e-12
    )

    assert h8[-1] <= 1e-12 * h8[0], h8
    assert abs(len(h1) - len(h8)) <= 2, (len(h1), len(h8))
    # early iterations (before f32 preconditioner noise compounds) track
    # the single-device history well inside f32 resolution
    for a, c in zip(h1[:6], h8[:6]):
        assert abs(a - c) <= 1e-4 * max(a, c), (h1, h8)
    # both solutions solved the same f64 system to 1e-12 relative residual
    scale = float(jnp.max(jnp.abs(x1)))
    assert float(jnp.max(jnp.abs(np.asarray(x8) - np.asarray(x1)))) < 1e-8 * scale

    # mismatched pairs rejected
    with pytest.raises(AssertionError, match="same solver kind"):
        mixed_precision_pcg(outer8, inner1, b64, sigma, iters=1)


def test_mixed_pcg_guards():
    plan, sigma, b64 = _problem(2, 2, 2)
    f64cg = MultigridSolver(plan, dtype=jnp.float64, smoother="cg_exact")
    f32 = MultigridSolver(plan, dtype=jnp.float32, smoother="chebyshev")
    f64 = MultigridSolver(plan, dtype=jnp.float64, smoother="chebyshev")
    with pytest.raises(AssertionError, match="chebyshev"):
        mixed_precision_pcg(f64, MultigridSolver(plan, dtype=jnp.float32, smoother="cg_exact"), b64, sigma, iters=1)
    with pytest.raises(AssertionError, match="higher precision"):
        mixed_precision_pcg(f32, f32, b64.astype(jnp.float32), sigma, iters=1)
    # distinct plans rejected
    other = build_grid_plan(hypercube(2, 2), 2, slot_tables=False)
    with pytest.raises(AssertionError, match="share"):
        mixed_precision_pcg(
            f64, MultigridSolver(other, dtype=jnp.float32, smoother="chebyshev"),
            b64, sigma, iters=1,
        )
    del f64cg


def test_mixed_pcg_keep_best_guard_stops_at_floor():
    """Past its attainable floor the flexible recurrence is unstable, not
    stagnant (measured on TPU: rel 7.4e-10 at iteration 17, then geometric
    ~4.2x/iteration divergence once beta ratios are rounding noise). With
    tol below the floor, keep_best (default) must stop within
    divergence_stop non-improving iterations and return the BEST iterate,
    whose recomputed residual matches the best history entry."""
    plan, sigma, b64 = _problem(2, 4, 3)
    outer = MultigridSolver(plan, dtype=jnp.float64, smoother="chebyshev")
    inner = MultigridSolver(plan, dtype=jnp.float32, smoother="chebyshev")

    # tol=0 can never trigger the tolerance stop: only the guard can end
    # the loop before the 80-iteration budget
    x, hist = mixed_precision_pcg(
        outer, inner, b64, sigma, iters=80, tol=0.0
    )
    assert len(hist) < 81, "guard did not stop the post-floor iteration"
    best = min(hist)
    assert best <= 1e-13 * hist[0], hist  # still reached f64 depth first

    coeff64 = outer.coefficients(sigma, 0.0)
    r = outer._local_residual(x, b64, coeff64, outer.nlevels - 1, None)
    rn = float(outer.residual_norm(outer.combine(r)))
    # The returned iterate solves to f64 depth. (The RECURRENCE residual
    # the history records reads ~1e-16 at the floor while the TRUE
    # recomputed residual floors ~100x higher — the classic CG drift at
    # machine depth — so the contract is the relative-depth bound, not
    # equality with min(history).)
    assert rn <= 1e-12 * hist[0], (rn, best, hist[-3:])
