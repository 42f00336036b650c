"""Shifted-family solves on the implicit fine grid (multishift CG).

TPU-native counterpart of tools/multishift_cg.jl (an out-of-tree experiment
in the reference, not wired into the package — SURVEY.md §2 L6): the
homogenization recurrence halves lambda each outer step, so the systems
(A + lambda_i I) x_i = b for lambda_i = lambda, lambda/2, lambda/4, ... share
the Krylov space of A and b. One mat-vec per iteration serves every shift
(solver/cg.py); here it is wired to the matrix-free implicit-grid operator.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.plan import build_grid_plan
from ..solver.cg import cg, multishift_cg
from ..solver.multigrid import MultigridSolver


def shifted_family_solve(
    solver: MultigridSolver,
    coeff_diffusion,
    b,
    shifts,
    iters: int = 200,
    level: int | None = None,
):
    """Solve (A + shift_i I) x_i = b for all shifts on the duplicated layout.

    ``coeff_diffusion`` must be built with lam=0 (pure -div a grad part); the
    shifts act as an identity (lumped L2) term. Dots count each physical DOF
    once (first-copy weighted), so the Lanczos recurrence sees the true
    operator on the unduplicated space.

    Returns (xs [n_shifts, E, n_local], resnorms [n_shifts]).
    """
    k = solver.nlevels - 1 if level is None else level
    w = solver.levels[k].first_copy_mask

    def matvec(v):
        return solver._combine(
            solver._constrain(solver._apply_op(v, coeff_diffusion, k), k), k
        )

    def dot(a, b2):
        return jnp.vdot(a * w, b2)

    b = solver._constrain(solver._combine(b, k), k)
    return multishift_cg(matvec, b, shifts, iters=iters, dot=dot)


def multishift_demo(dim=2, n=4, levels=3, n_shifts=3, iters=150, seed=0):
    """Demo mirroring tools/multishift_cg.jl:87 (shifts 1, 1/2, 1/4): one
    Krylov pass vs per-shift CG; returns max relative solution difference."""
    from ..mesh.grid import hypercube
    from .checkerboard import conductivity_per_element, generate_conductivity

    base = hypercube(dim, n)
    rng = np.random.default_rng(seed)
    sigma = conductivity_per_element(base, generate_conductivity(dim, n, rng), np.zeros(dim))
    plan = build_grid_plan(base, levels)
    solver = MultigridSolver(plan, coarse="cg")
    coeff = solver.coefficients(sigma, 0.0)
    k = levels - 1
    b = jnp.asarray(rng.standard_normal((base.nelements, plan.n_local(k))))
    shifts = [1.0 / 2**i for i in range(n_shifts)]
    xs, res = shifted_family_solve(solver, coeff, b, shifts, iters=iters)

    w = solver.levels[k].first_copy_mask

    def matvec(v, s):
        return (
            solver._combine(solver._constrain(solver._apply_op(v, coeff, k), k), k)
            + s * v
        )

    bc = solver._constrain(solver._combine(b, k), k)
    worst = 0.0
    for i, s in enumerate(shifts):
        x_cg, _, _ = cg(
            lambda v: matvec(v, s), bc, tol=1e-12, maxiter=iters * 2,
            dot=lambda a, b2: jnp.vdot(a * w, b2),
        )
        num = float(jnp.abs((xs[i] - x_cg) * w).max())
        den = float(jnp.abs(x_cg * w).max())
        worst = max(worst, num / max(den, 1e-300))
    return worst, np.asarray(res)
