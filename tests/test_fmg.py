"""Full-multigrid (F-cycle) initializer (MultigridSolver.fmg): one sweep —
costing ~1.14 fine V-cycles — must land the iterate well below what several
plain V-cycles from x=0 reach, and continuing with V-cycles must converge
to the same solution. The reference only iterates vcycle! from zero
(src/multigrid.jl:73-119) — this is capability beyond it."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke lane (pytest -m "not slow")

import numpy as np
import jax.numpy as jnp

from homogenization_jl_tpu.fem.local_operators import load_vector
from homogenization_jl_tpu.mesh.grid import affine_maps, hypercube
from homogenization_jl_tpu.ops.plan import build_grid_plan
from homogenization_jl_tpu.solver.multigrid import MultigridSolver


def _setup(dim, n, levels, lam=0.0, **solver_opts):
    base = hypercube(dim, n)
    plan = build_grid_plan(base, levels, slot_tables=False)
    rng = np.random.default_rng(5)
    sigma = rng.choice([1.0, 9.0], size=(base.nelements, dim))
    solver = MultigridSolver(plan, **solver_opts)
    coeff = solver.coefficients(sigma, lam)
    setup = solver.coarse_setup(sigma, lam)
    b_ref = load_vector(plan.reference.levels[levels - 1])
    _, _, detJ, _ = affine_maps(base)
    b = jnp.asarray(detJ[:, None] * b_ref[None, :])
    return solver, coeff, setup, b


@pytest.mark.parametrize(
    "dim,n,levels,smoother,coarse,beats",
    [
        # beats = how many plain V-cycles from x=0 one FMG sweep (~1.14
        # V-cycle cost) must outdo. FMG's payoff grows with the per-cycle
        # contraction factor: at the 190M bench config (contraction ~0.7)
        # it replaces several cycles; on these tiny fast-contracting test
        # problems (0.19-0.45/cycle) it must at least beat 1-2.
        (2, 8, 4, "cg_exact", "chol", 2),
        (2, 8, 4, "chebyshev", "chol", 1),
        (3, 4, 3, "cg_exact", "cg", 1),
    ],
)
def test_fmg_beats_vcycles_from_zero(dim, n, levels, smoother, coarse, beats):
    solver, coeff, setup, b = _setup(
        dim, n, levels, smoother=smoother, coarse=coarse
    )
    lam_max = (
        solver.estimate_lambda_max(coeff) if smoother == "chebyshev" else None
    )

    x_f, r_f = solver.fmg(b, coeff, setup, lam_max=lam_max)
    rn_f = float(solver.residual_norm(r_f))

    x, _ = solver.zero_states()
    rns = []
    for _ in range(3):
        x, r = solver.vcycle(x, b, coeff, setup, lam_max=lam_max)
        rns.append(float(solver.residual_norm(r)))
    assert rn_f < rns[beats - 1], (rn_f, rns)

    # continuing with V-cycles converges to the same solution
    x_ref = x
    for _ in range(57):
        x_ref, r = solver.vcycle(x_ref, b, coeff, setup, lam_max=lam_max)
    for _ in range(40):
        x_f, r_f = solver.vcycle(x_f, b, coeff, setup, lam_max=lam_max)
    scale = float(jnp.max(jnp.abs(x_ref)))
    assert float(jnp.max(jnp.abs(x_f - x_ref))) < 1e-9 * scale


def test_fmg_nu2_at_least_as_good():
    solver, coeff, setup, b = _setup(2, 8, 4, smoother="cg_exact")
    _, r1 = solver.fmg(b, coeff, setup, nu=1)
    _, r2 = solver.fmg(b, coeff, setup, nu=2)
    assert float(solver.residual_norm(r2)) <= float(solver.residual_norm(r1))


@pytest.mark.parametrize("method", ["vcycle", "fmg", "pcg", "fmg+pcg", "auto"])
def test_solve_api(method):
    """MultigridSolver.solve: one-call driver for every iteration flavor,
    to tolerance (the reference hand-rolls the vcycle! loop)."""
    smoother = "chebyshev" if method in ("pcg", "fmg+pcg", "auto") else "cg_exact"
    base = hypercube(2, 8)
    plan = build_grid_plan(base, 4, slot_tables=False)
    rng = np.random.default_rng(5)
    sigma = rng.choice([1.0, 9.0], size=(base.nelements, 2))
    solver = MultigridSolver(plan, smoother=smoother)
    b_ref = load_vector(plan.reference.levels[3])
    _, _, detJ, _ = affine_maps(base)
    b = jnp.asarray(detJ[:, None] * b_ref[None, :])

    x, hist = solver.solve(b, sigma, 0.0, tol=1e-9, max_cycles=60, method=method)
    assert hist[-1] <= 1e-9, hist[-3:]
    # the residual of the returned x really is what history claims
    coeff = solver.coefficients(sigma, 0.0)
    r = solver._combine_constrained(
        b - solver._apply_op(x, coeff, plan.nlevels - 1), plan.nlevels - 1
    )
    bb = b * solver.levels[-1].first_copy_mask
    rel = float(solver.residual_norm(r)) / float(jnp.sqrt(jnp.vdot(bb, bb)))
    assert rel <= 2e-9, rel


@pytest.mark.parametrize("method", ["auto", "fmg", "vcycle", "fmg+pcg"])
def test_solve_zero_rhs_and_preconverged(method):
    """solve() edge cases: b = 0 must return (zeros, [0.0]) rather than a
    0/0-nan history, and an already-converged start must return a real
    iterate (never None) for every method — including the fmg-family
    methods that only bind x inside their branch."""
    smoother = "chebyshev" if method in ("fmg+pcg", "auto") else "cg_exact"
    base = hypercube(2, 4)
    plan = build_grid_plan(base, 3, slot_tables=False)
    rng = np.random.default_rng(3)
    sigma = rng.choice([1.0, 9.0], size=(base.nelements, 2))
    solver = MultigridSolver(plan, smoother=smoother)

    b0 = jnp.zeros((base.nelements, plan.n_local(2)))
    x, hist = solver.solve(b0, sigma, 0.0, tol=1e-8, method=method)
    assert x is not None and hist == [0.0]
    assert float(jnp.max(jnp.abs(x))) == 0.0

    # converged at entry: solve to tol, then re-enter with the solution
    b_ref = load_vector(plan.reference.levels[2])
    _, _, detJ, _ = affine_maps(base)
    b = jnp.asarray(detJ[:, None] * b_ref[None, :])
    x1, h1 = solver.solve(b, sigma, 0.0, tol=1e-10, max_cycles=60,
                          method=method)
    assert h1[-1] <= 1e-10, h1[-3:]
    x2, h2 = solver.solve(b, sigma, 0.0, tol=1e-6, method=method, x=x1)
    assert x2 is not None and len(h2) == 1 and h2[0] <= 1e-6
    assert float(jnp.max(jnp.abs(x2 - x1))) == 0.0
