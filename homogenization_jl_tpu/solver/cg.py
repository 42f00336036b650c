"""Conjugate gradients and multishift CG (device, JAX).

Rebuild of tools/multishift_cg.jl: a Lanczos-basis CG that solves
(A + shift_i I) x_i = b for several shifts simultaneously with ONE mat-vec
per iteration — the intended fast path for the homogenization recurrence
where lambda halves every outer step (shifts lambda, lambda/2, lambda/4, ...).

TPU-native differences: the per-shift scalar recurrences (root-free Cholesky
of the shifted tridiagonal Lanczos matrix, tools/multishift_cg.jl:89-148) are
*batched over the shift axis* as [n_shifts]-vectors, and the iteration is a
``lax.fori_loop`` with static iteration count so the whole solve jits into a
single program. The mat-vec is any pure function (e.g. the implicit
element-apply + interface combine), so this runs matrix-free on the
duplicated [E, n_local] layout as well as on plain vectors.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def cg(matvec, b, x0=None, tol=1e-10, maxiter=200, dot=None, precond=None):
    """Plain CG (reference: CGIterable, tools/multishift_cg.jl:12-49).

    Returns (x, iterations, final_rs). ``dot`` may be overridden (e.g. a
    first-copy-weighted dot on the duplicated layout, or a psum-reduced dot
    under shard_map). ``precond`` (optional) applies an SPD preconditioner
    z = P^{-1} r per iteration — e.g. the Jacobi/assembled-diagonal inverse
    for well-conditioned operators like the P1 mass matrix, where it cuts
    the iteration count several-fold at one elementwise multiply per step.
    The stopping criterion stays on the TRUE residual ||r||^2 < tol^2
    ||r_0||^2 in both forms, so callers see the same convergence contract.
    """
    if dot is None:
        dot = jnp.vdot
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    rs = dot(r, r)
    eps2 = jnp.asarray(tol, b.dtype) ** 2 * rs

    def safe(num, den):
        return jnp.where(den == 0, jnp.zeros_like(num), num / jnp.where(den == 0, 1, den))

    if precond is None:
        p = r

        def body(state):
            x, r, p, rs, i = state
            Ap = matvec(p)
            alpha = safe(rs, dot(p, Ap))
            x = x + alpha * p
            r = r - alpha * Ap
            rs_new = dot(r, r)
            p = r + safe(rs_new, rs) * p
            return x, r, p, rs_new, i + 1

        def cond(state):
            _, _, _, rs_c, i = state
            return jnp.logical_and(rs_c > eps2, i < maxiter)

        x, _, _, rs, i = jax.lax.while_loop(cond, body, (x, r, p, rs, 0))
        return x, i, rs

    z = precond(r)
    p = z
    rz = dot(r, z)

    def body_p(state):
        x, r, p, rz, _, i = state
        Ap = matvec(p)
        alpha = safe(rz, dot(p, Ap))
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = dot(r, z)
        p = z + safe(rz_new, rz) * p
        return x, r, p, rz_new, dot(r, r), i + 1

    def cond_p(state):
        _, _, _, _, rs_c, i = state
        return jnp.logical_and(rs_c > eps2, i < maxiter)

    x, _, _, _, rs, i = jax.lax.while_loop(cond_p, body_p, (x, r, p, rz, rs, 0))
    return x, i, rs


def multishift_cg(matvec, b, shifts, iters: int, dot=None):
    """Solve (A + shifts[i] I) x_i = b for all i with one mat-vec/iteration.

    Lanczos three-term recurrence builds an orthonormal basis of K_m(A, b);
    each shifted system is solved through a root-free LDL' factorization of
    the shifted tridiagonal matrix, carried as per-shift two-term scalar
    recurrences (batched: every Greek scalar of the reference becomes an
    [n_shifts] vector). Returns (xs [n_shifts, ...b.shape], resnorms
    [n_shifts]).
    """
    if dot is None:
        dot = jnp.vdot
    shifts = jnp.asarray(shifts, dtype=b.dtype)
    ns = shifts.shape[0]

    beta0 = jnp.sqrt(dot(b, b))
    v_curr = b / beta0

    # per-shift state: W = A-conjugated basis [ns, ...], y = last entry of the
    # projected solution, D = LDL' diagonal recurrence
    W = jnp.broadcast_to(v_curr, (ns,) + b.shape).astype(b.dtype)
    xs = jnp.zeros((ns,) + b.shape, b.dtype)
    y = jnp.full((ns,), beta0, b.dtype)
    D_prev = jnp.zeros((ns,), b.dtype)

    def shift_dims(a):
        return a.reshape((ns,) + (1,) * b.ndim)

    def body(k, state):
        xs, W, y, D_prev, v_prev, v_curr, t_prev = state
        w = matvec(v_curr)
        t_curr = dot(v_curr, w)
        w = w - t_curr * v_curr - t_prev * v_prev
        t_next = jnp.sqrt(dot(w, w))
        v_next = w / jnp.where(t_next == 0, 1, t_next)

        first = k == 0
        D_curr = jnp.where(
            first,
            t_curr + shifts,
            t_curr + shifts - t_prev**2 / jnp.where(D_prev == 0, 1, D_prev),
        )
        y = jnp.where(first, y / D_curr, y * (-t_prev / D_curr))
        W = jnp.where(
            first, W, v_curr[None] - W * shift_dims(t_prev / jnp.where(D_prev == 0, 1, D_prev))
        )
        xs = xs + W * shift_dims(y)
        return xs, W, y, D_curr, v_curr, v_next, t_next

    init = (xs, W, y, D_prev, jnp.zeros_like(b), v_curr, jnp.zeros((), b.dtype))
    xs, W, y, D_prev, v_prev, v_curr, t_next = jax.lax.fori_loop(
        0, iters, body, init
    )
    resnorms = jnp.abs(t_next * y)
    return xs, resnorms
