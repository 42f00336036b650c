""""st1" spectral-field elliptic solve (reference: tools/generate_st1_field.jl
st1_example, :122-136): generate a log-normal-ish conductivity field with
power-law spectral decay, assemble lam*M + scalar-sigma stiffness, solve with
zero Dirichlet b.c.

The field generation runs on device (utils/fft_field.py, jnp.fft); the solve
uses either the implicit-grid multigrid (scalable path) or a host direct
solve (small demos), exercising the scalar-conductivity code path
(assemble_st1, tools/generate_st1_field.jl:156-201, takes one sigma per
element rather than per-axis)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.assembly import assemble_operator
from ..fem.local_operators import load_vector
from ..mesh.grid import affine_maps, hypercube, interior_nodes
from ..ops.plan import build_grid_plan
from ..solver.multigrid import CHEBYSHEV_SMOOTHERS, MultigridSolver
from ..utils.fft_field import st1_conductivity


def conductivity_per_cell(mesh, field: np.ndarray) -> np.ndarray:
    """sigma_el[e] = field[floor(center_e)] — scalar per element (reference:
    conductivity_per_cell, tools/generate_st1_field.jl:206-214)."""
    centers = mesh.nodes[mesh.elements].mean(axis=1)
    idx = np.clip(np.floor(centers).astype(np.int64), 0, field.shape[0] - 1)
    return np.asarray(field)[tuple(idx[:, k] for k in range(mesh.dim))]


def st1_example(
    n: int = 32,
    dim: int = 2,
    lam: float = 1.0,
    p: float = 1.5,
    alpha: float = 3.0,
    seed: int = 0,
    save: str | None = None,
):
    """Direct solve of (lam - div sigma grad) u = 1 with an st1 field.

    Returns (mesh, u, sigma_el). ``alpha`` defaults lower than the
    reference's 100 — exp(100 |f|) overflows float unless the field is tiny;
    pass alpha explicitly to reproduce extreme contrasts.
    """
    import scipy.sparse.linalg as spl

    mesh = hypercube(dim, n)
    field = st1_conductivity(jax.random.PRNGKey(seed), n, dim, p=p, alpha=alpha)
    sigma_el = conductivity_per_cell(mesh, field)

    A = assemble_operator(mesh, sigma_el, lam)
    b = load_vector(mesh)
    ii = interior_nodes(mesh)
    u = np.zeros(mesh.nnodes)
    u[ii] = spl.spsolve(A[np.ix_(ii, ii)].tocsc(), b[ii])

    if save:
        from ..utils.vtk import write_vtu

        write_vtu(save, mesh, point_data={"x": u}, cell_data={"sigma": sigma_el})
    return mesh, u, sigma_el


def st1_multigrid(
    n: int = 32,
    dim: int = 2,
    refinements: int = 2,
    lam: float = 1.0,
    p: float = 1.5,
    alpha: float = 3.0,
    seed: int = 0,
    max_cycles: int = 20,
    smoothing_steps: int = 3,
    coarse: str = "chol",
    coarse_dense_limit: int = 8_000,
    dtype=jnp.float64,
    save: str | None = None,
    solver_opts: dict | None = None,
    method: str = "vcycle",
    tol: float = 0.0,
):
    """st1 field solve on the *implicit fine grid* — the scalable path.

    The st1 field lives on unit cells, so the base mesh is taken at the
    field's resolution (one scalar sigma per base element, like the
    checkerboard driver); refinement resolves the solution, not the
    coefficient. Exercises the whole scalar-sigma implicit pipeline that the
    reference tool (tools/generate_st1_field.jl:156-201) only ever ran
    through an explicit global assembly.

    Returns (residual_history, x_finest, solver, sigma_el).
    """
    base = hypercube(dim, n)
    field = st1_conductivity(jax.random.PRNGKey(seed), n, dim, p=p, alpha=alpha)
    sigma_el = conductivity_per_cell(base, field)

    plan = build_grid_plan(base, refinements + 1, slot_tables=False)
    if coarse == "chol" and len(plan.interior_base_nodes) > coarse_dense_limit:
        coarse = "mg"
    solver_opts = dict(solver_opts or {})
    if method == "pcg":
        # pcg requires a linear SPD V-cycle (chebyshev smoothing)
        solver_opts.setdefault("smoother", "chebyshev")
    solver = MultigridSolver(
        plan, dtype=dtype, smoothing_steps=smoothing_steps, coarse=coarse,
        **solver_opts,
    )
    coeff = solver.coefficients(sigma_el, lam)
    setup = solver.coarse_setup(sigma_el, lam)

    x, _ = solver.zero_states()
    b_ref = load_vector(plan.reference.levels[refinements])
    _, _, detJ, _ = affine_maps(base)
    b = jnp.asarray(detJ[:, None] * b_ref[None, :], dtype=dtype)

    lam_max = (
        solver.estimate_lambda_max(coeff)
        if solver.smoother in CHEBYSHEV_SMOOTHERS
        else None
    )
    if method == "pcg":
        # V-cycle-preconditioned CG: contrast-robust where the standalone
        # V-cycle stalls (alpha=100 fields contract at ~0.99/cycle)
        x, history = solver.pcg(
            b, coeff, setup, lam_max=lam_max, iters=max_cycles, tol=tol
        )
    else:
        # history[0] = the initial residual norm, exactly like pcg's, so a
        # given ``tol`` means the same stopping point for both methods
        history = [float(solver.initial_residual_norm(b, coeff))]
        for _ in range(max_cycles):
            x, r = solver.vcycle(x, b, coeff, setup, lam_max=lam_max)
            history.append(float(solver.residual_norm(r)))
            if tol and history[-1] <= tol * history[0]:
                break

    if save:
        from ..utils.vtk import export_solution

        export_solution(save, plan, refinements, np.asarray(x))
    return history, x, solver, sigma_el
