"""CG / multishift-CG tests (reference: tools/multishift_cg.jl — shifted
systems share one Krylov subspace; here additionally batched over shifts)."""

import numpy as np
import jax.numpy as jnp
import pytest

from homogenization_jl_tpu.solver.cg import cg, multishift_cg


def _laplacian_1d(n, dtype=jnp.float64):
    main = 2.0 * jnp.ones(n, dtype)
    off = -jnp.ones(n - 1, dtype)
    A = jnp.diag(main) + jnp.diag(off, 1) + jnp.diag(off, -1)
    return A


def test_cg_solves_spd_system():
    n = 80
    A = _laplacian_1d(n)
    rng = np.random.default_rng(0)
    x_true = jnp.asarray(rng.standard_normal(n))
    b = A @ x_true
    x, iters, rs = cg(lambda v: A @ v, b, tol=1e-12, maxiter=500)
    assert np.abs(np.asarray(x - x_true)).max() < 1e-8
    assert int(iters) <= n + 1


def test_multishift_matches_separate_solves():
    """x_i from the shared Krylov recurrence == direct solve of (A + s_i I)."""
    n = 60
    A = _laplacian_1d(n)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(n))
    shifts = [1.0, 0.5, 0.25]  # the lambda-halving schedule
    xs, res = multishift_cg(lambda v: A @ v, b, shifts, iters=n)
    for i, s in enumerate(shifts):
        direct = np.linalg.solve(np.asarray(A) + s * np.eye(n), np.asarray(b))
        err = np.abs(np.asarray(xs[i]) - direct).max()
        assert err < 1e-8, f"shift {s}: {err}"
    assert np.all(np.asarray(res) < 1e-8)


def test_multishift_residual_estimate_tracks_true_residual():
    n = 50
    A = _laplacian_1d(n)
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal(n))
    shifts = [1.0, 0.25]
    xs, res = multishift_cg(lambda v: A @ v, b, shifts, iters=20)
    for i, s in enumerate(shifts):
        true_res = np.linalg.norm(
            np.asarray(b) - (np.asarray(A) + s * np.eye(n)) @ np.asarray(xs[i])
        )
        assert abs(true_res - float(res[i])) < 1e-6 * (1 + true_res)


def test_multishift_matrix_free_on_duplicated_layout():
    """Multishift CG over the implicit-grid matvec (matrix-free, [E, n])."""
    from homogenization_jl_tpu.mesh.grid import hypercube
    from homogenization_jl_tpu.models.checkerboard import (
        conductivity_per_element,
        generate_conductivity,
    )
    from homogenization_jl_tpu.ops.plan import build_grid_plan
    from homogenization_jl_tpu.solver.multigrid import MultigridSolver

    dim, n, levels = 2, 3, 3
    base = hypercube(dim, n)
    rng = np.random.default_rng(3)
    sigma = conductivity_per_element(base, generate_conductivity(dim, n, rng), np.zeros(dim))
    plan = build_grid_plan(base, levels)
    s = MultigridSolver(plan, coarse="cg")
    k = levels - 1
    coeff0 = s.coefficients(sigma, 0.0)  # pure -div a grad part
    w = s.levels[k].first_copy_mask

    def matvec(v):
        return s._combine(s._constrain(s._apply_op(v, coeff0, k), k), k)

    def dot(a, b):
        return jnp.vdot(a * w, b)

    b = s._constrain(s._combine(jnp.asarray(rng.standard_normal(w.shape)), k), k)
    shifts = [1.0, 0.5]
    xs, res = multishift_cg(matvec, b, shifts, iters=150, dot=dot)
    for i, sh in enumerate(shifts):
        # residual of the shifted system, checked matrix-free
        r = b - (matvec(xs[i]) + sh * xs[i])
        # note: shift acts on constrained/combined space; compare consistently
        rn = float(jnp.sqrt(jnp.vdot(r * w, r * w)))
        bn = float(jnp.sqrt(jnp.vdot(b * w, b * w)))
        assert rn < 1e-6 * bn, f"shift {sh}: rel res {rn / bn}"


def test_preconditioned_cg_matches_and_converges_faster():
    """Jacobi-preconditioned CG (cg(..., precond=)) solves the same system
    to the same true-residual stopping contract, in no more iterations than
    plain CG on an ill-scaled SPD matrix (the multishift inner mass solve
    uses this with the assembled mass diagonal, models/multishift.py)."""
    n = 120
    rng = np.random.default_rng(5)
    # ill-diagonal-scaled SPD: D^(1/2) (L + I) D^(1/2), D log-uniform 1e-3..1e3
    L = _laplacian_1d(n) + jnp.eye(n)
    d = jnp.asarray(10.0 ** rng.uniform(-3, 3, n))
    A = jnp.sqrt(d)[:, None] * L * jnp.sqrt(d)[None, :]
    x_true = jnp.asarray(rng.standard_normal(n))
    b = A @ x_true

    x0, it0, rs0 = cg(lambda v: A @ v, b, tol=1e-10, maxiter=5000)
    inv_diag = 1.0 / jnp.diag(A)
    x1, it1, rs1 = cg(
        lambda v: A @ v, b, tol=1e-10, maxiter=5000,
        precond=lambda r: inv_diag * r,
    )
    bn = float(jnp.linalg.norm(b))
    assert float(jnp.linalg.norm(A @ x1 - b)) / bn < 1e-9
    assert int(it1) < int(it0)
    # the stopping contract is the same ||r|| reduction in both forms
    assert float(rs1) <= 1e-20 * float(jnp.vdot(b, b)) * 1e6  # rs = ||r||^2


def test_preconditioned_cg_identity_precond_matches_plain():
    """precond=identity reproduces plain CG's iterates (same alphas/betas):
    final x and iteration count agree to rounding."""
    n = 60
    A = _laplacian_1d(n) + jnp.eye(n)
    rng = np.random.default_rng(6)
    b = jnp.asarray(rng.standard_normal(n))
    x0, it0, _ = cg(lambda v: A @ v, b, tol=1e-12, maxiter=500)
    x1, it1, _ = cg(
        lambda v: A @ v, b, tol=1e-12, maxiter=500, precond=lambda r: r
    )
    assert int(it0) == int(it1)
    assert np.abs(np.asarray(x0 - x1)).max() < 1e-12
