"""Multigrid convergence + solution correctness (reference:
docs/src/index.md:282-304 residual-contraction demo and
test/local_operators.jl's test_multigrid)."""

import numpy as np
import jax.numpy as jnp
import pytest

from homogenization_jl_tpu.fem.assembly import assemble_operator
from homogenization_jl_tpu.fem.local_operators import load_vector
from homogenization_jl_tpu.mesh.grid import affine_maps, hypercube, interior_nodes
from homogenization_jl_tpu.mesh.refine import refine_uniformly
from homogenization_jl_tpu.models.poisson import checkerboard_hypercube_multigrid
from homogenization_jl_tpu.ops.plan import build_grid_plan
from homogenization_jl_tpu.solver.multigrid import MultigridSolver


@pytest.mark.parametrize("dim,n,levels,coarse", [(2, 4, 3, "chol"), (3, 2, 3, "chol"), (2, 4, 3, "cg")])
def test_vcycle_contracts_and_matches_direct(dim, n, levels, coarse):
    import scipy.sparse.linalg as spl

    history, x, solver = checkerboard_hypercube_multigrid(
        n, dim=dim, refinements=levels - 1, max_cycles=12, coarse=coarse
    )
    # monotone-ish contraction, large total reduction
    assert history[-1] < 1e-4 * history[0]

    # compare against direct solve on the explicit fine mesh
    plan = solver.plan
    base = plan.base
    fine = refine_uniformly(base, times=levels - 1)
    rng = np.random.default_rng(1)
    from homogenization_jl_tpu.models.checkerboard import (
        conductivity_per_element,
        generate_conductivity,
    )

    field = generate_conductivity(dim, n, rng)
    sigma_fine = conductivity_per_element(fine, field, np.zeros(dim))
    A = assemble_operator(fine, sigma_fine, 0.0)
    b = load_vector(fine)
    ii = interior_nodes(fine)
    u = np.zeros(fine.nnodes)
    u[ii] = spl.spsolve(A[np.ix_(ii, ii)].tocsc(), b[ii])

    # map duplicated solution onto fine nodes by exact coordinates
    J, shift, _, _ = affine_maps(base)
    refn = plan.reference.levels[levels - 1].nodes
    allx = (np.einsum("eij,nj->eni", J, refn) + shift[:, None, :]).reshape(-1, dim)

    def key(a):
        return (
            np.ascontiguousarray(np.round(a * 2**20).astype(np.int64))
            .view([("", np.int64)] * dim)
            .ravel()
        )

    fk = key(fine.nodes)
    order = np.argsort(fk)
    mapping = order[np.searchsorted(fk[order], key(allx))]
    err = np.abs(u[mapping] - np.asarray(x).reshape(-1)).max()
    assert err < 50 * history[-1] + 1e-10, f"solution error {err} vs residual {history[-1]}"


def test_vcycle_idempotent_on_solution():
    """Once converged, extra V-cycles keep the residual at the floor."""
    history, _, _ = checkerboard_hypercube_multigrid(2, dim=2, refinements=2, max_cycles=40)
    assert history[-1] < 1e-11


def test_baseline_config1_2d_poisson_to_1e8():
    """BASELINE.json config 1: 2D Poisson, unit-square Tri base, 2 implicit
    refinements, GMG V-cycles to |r| <= 1e-8."""
    import jax.numpy as jnp
    from homogenization_jl_tpu.models.poisson import local_unit_rhs
    from homogenization_jl_tpu.ops.interfaces import apply_mask

    base = hypercube(2, 8, scale=1.0 / 8.0)  # unit square
    sigma = np.ones((base.nelements, 2))
    plan = build_grid_plan(base, 3)
    solver = MultigridSolver(plan)
    coeff = solver.coefficients(sigma, 0.0)
    chol = solver.coarse_cholesky(sigma, 0.0)
    x, _ = solver.zero_states()
    b = local_unit_rhs(solver)
    history = []
    for _ in range(40):
        x, r = solver.vcycle(x, b, coeff, chol)
        history.append(float(solver.residual_norm(r)))
        if history[-1] <= 1e-8:
            break
    assert history[-1] <= 1e-8, history[-5:]
    assert len(history) <= 30, f"too many cycles: {len(history)}"


def test_cg_exact_smoother_matches_parity_cg():
    """smoother='cg_exact' (exact dots, one combine per step, restriction
    from the maintained local residual) solves the same system to the same
    floor as the reference-parity CG smoother."""
    import jax.numpy as jnp
    from homogenization_jl_tpu.models.poisson import local_unit_rhs

    base = hypercube(2, 6)
    rng = np.random.default_rng(5)
    sigma = rng.choice([1.0, 9.0], size=(base.nelements, 2))
    plan = build_grid_plan(base, 3)

    sols = {}
    for smoother in ("cg", "cg_exact"):
        solver = MultigridSolver(plan, smoother=smoother)
        coeff = solver.coefficients(sigma, 0.0)
        chol = solver.coarse_cholesky(sigma, 0.0)
        x, _ = solver.zero_states()
        b = local_unit_rhs(solver)
        hist = []
        for _ in range(18):
            x, r = solver.vcycle(x, b, coeff, chol)
            hist.append(float(solver.residual_norm(r)))
        assert hist[-1] < 1e-8 * hist[0], (smoother, hist)
        sols[smoother] = np.asarray(x)

    err = np.abs(sols["cg"] - sols["cg_exact"]).max()
    assert err < 1e-9, f"solutions diverge: {err}"


def test_bf16_direction_storage_convergence():
    """direction_dtype='bfloat16' (smoother direction vectors stored
    half-width) must not materially change the V-cycle contraction: the
    cg_exact smoother recomputes its entry residual at full precision each
    smooth, so direction rounding perturbs rather than accumulates."""
    from homogenization_jl_tpu.fem.local_operators import load_vector
    from homogenization_jl_tpu.mesh.grid import affine_maps

    base = hypercube(2, 8)
    plan = build_grid_plan(base, 4, slot_tables=False)
    rng = np.random.default_rng(2)
    sigma = rng.choice([1.0, 9.0], size=(base.nelements, 2))
    b_ref = load_vector(plan.reference.levels[3])
    _, _, detJ, _ = affine_maps(base)
    b = jnp.asarray(detJ[:, None] * b_ref[None, :], dtype=jnp.float32)

    finals = {}
    for dd in (None, "bfloat16"):
        for smoother in ("cg_exact", "chebyshev"):
            s = MultigridSolver(
                plan, dtype=jnp.float32, smoother=smoother, direction_dtype=dd
            )
            coeff = s.coefficients(sigma, 0.0)
            chol = s.coarse_cholesky(sigma, 0.0)
            lam_max = (
                s.estimate_lambda_max(coeff) if smoother == "chebyshev" else None
            )
            x, _ = s.zero_states()
            for _ in range(10):
                x, r = s.vcycle(x, b, coeff, chol, lam_max=lam_max)
            finals[(dd, smoother)] = float(s.residual_norm(r))
    for smoother in ("cg_exact", "chebyshev"):
        a, c = finals[(None, smoother)], finals[("bfloat16", smoother)]
        assert c < 5 * max(a, 1e-7), (smoother, a, c)
