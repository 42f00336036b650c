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


def homogenization_multishift(
    n: int = 2,
    dim: int = 2,
    refinements: int = 1,
    lanczos_iters: int = 120,
    xi=None,
    cond_field=None,
    seed=None,
    dtype=None,
    mass_tol: float = 1e-12,
    return_stats: bool = False,
    two_pass: bool = False,
):
    """Fixed-domain homogenization recurrence via ONE Lanczos pass.

    The recurrence v_{k+1} = (lam_{k+1} M + A)^{-1} lam_{k+1} M v_k with
    lam halving (homogenized_coefficients.jl:254-342) applies a chain of
    resolvents of the SAME pencil (A, M) to one starting functional b0 —
    exactly the structure the reference's multishift-CG tool exploits
    (tools/multishift_cg.jl:67-166: one Krylov space serves every shift).
    Here the generalized Lanczos process in the M-inner product builds an
    M-orthonormal basis V with V' A V = T tridiagonal; every step then
    reduces to an m x m shifted tridiagonal solve on host:

        y_0 = (T + lam_0)^{-1} beta_0 e_1,   y_k = lam_k (T + lam_k)^{-1} y_{k-1},
        v_k = V y_k,

    so ONE device mat-vec stream (one A-apply + one M-solve per Lanczos
    iteration) serves the whole recurrence, instead of a V-cycle loop per
    outer step. The domain is fixed at the k=0 radius (the driver's
    ``shrink=False`` variant — shrinking is a work optimization, not part
    of the estimator); sigma increments use the same box masks, integrals
    and 2^k scaling as the driver.

    Memory: by default keeps the m Lanczos vectors ([m, E, n_local]) to
    reconstruct the v_k — fine for moderate fixed domains. ``two_pass=True``
    stores NO basis: pass 1 runs the recurrence collecting only the scalar
    tridiagonal (alphas, betas); the per-step coefficient vectors y_k are
    then solved on host, and pass 2 re-runs the identical recurrence,
    accumulating v_k = sum_j y_k[j] V_j into K+1 running state arrays.
    Storage drops from m (~120) state arrays to K+2 (~5), at 2x the
    mat-vec count — the variant that scales BASELINE config 4 beyond toy
    domains (round-2 verdict item 10). Both modes are bit-identical in
    exact arithmetic and agree to ~1e-12 in f64 (tested).
    """
    import jax

    from .checkerboard import (
        _integrals_fns,
        compute_boundary_layer,
        compute_box_radius,
        conductivity_per_element,
        generate_conductivity,
        initial_rhs,
        ordered_hypercube,
        prefix_in_radius,
    )
    from ..mesh.grid import affine_maps

    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    lam = 1.0
    box_radius = compute_box_radius(0, n)
    R0 = box_radius + compute_boundary_layer(lam, n)
    if xi is None:
        xi = np.ones(dim) / np.sqrt(dim)
    rng = np.random.default_rng(seed)
    if cond_field is None:
        cond_field = generate_conductivity(dim, 2 * R0, rng)

    base, node_norms, center_norms = ordered_hypercube(dim, R0)
    sigma_el = conductivity_per_element(base, cond_field, np.full(dim, float(R0)))
    nlevels = refinements + 1
    plan = build_grid_plan(base, nlevels)
    solver = MultigridSolver(plan, dtype=dtype, coarse="cg")
    kf = nlevels - 1
    w = solver.levels[kf].first_copy_mask

    coeff_A = solver.coefficients(sigma_el, 0.0)  # pure -div a grad part
    mass = solver.levels[kf].stack[-1]
    _, _, detJ_np, _ = affine_maps(base)
    detJ = jnp.asarray(detJ_np, dtype=dtype)
    area_fn, first_fn, terms_fn, _ = _integrals_fns(mass, detJ)

    stats = {"A_applies": 0, "M_applies": 0}

    def Aop(v):
        stats["A_applies"] += 1
        return solver._combine(solver._constrain(solver._apply_op(v, coeff_A, kf), kf), kf)

    def M_local(v):
        return detJ[:, None] * jnp.einsum(
            "mn,en->em", mass, v, precision=jax.lax.Precision.HIGHEST
        )

    def Mop(v):
        return solver._combine(solver._constrain(M_local(v), kf), kf)

    def dot_M(u, v):
        # exact global M-inner product: sum_e u_e' (detJ_e Mhat) v_e
        # (element integrals partition the domain; u, v consistent)
        return float(jnp.vdot(u, M_local(v)))

    def wdot(a, b):
        return jnp.vdot(a * w, b)

    b0 = jnp.asarray(initial_rhs(plan, sigma_el, xi), dtype=dtype)
    b0c = solver._constrain(solver._combine(b0, kf), kf)

    # Jacobi preconditioner for the inner mass solves: the assembled mass
    # diagonal per duplicated slot is combine(detJ_e * diag(Mhat)). On a
    # uniform hypercube it measured ITERATION-NEUTRAL (the P1 mass matrix's
    # ~25-iteration count at tol 1e-12 is its intrinsic sqrt(cond)~3, not
    # diagonal scaling) — kept because it is one elementwise multiply and
    # pays off exactly when detJ varies across elements. The structural cost
    # of this path stays ~(1 + mass_iters) applies per Lanczos iteration.
    diag_M = solver._combine(detJ[:, None] * jnp.diag(mass)[None, :], kf)
    inv_diag_M = 1.0 / diag_M

    def Msolve(b):
        x, it, _ = cg(
            Mop, b, tol=mass_tol, maxiter=400, dot=wdot,
            precond=lambda r: inv_diag_M * r,
        )
        stats["M_applies"] += int(it) + 1
        return x

    # ---- generalized Lanczos in the M-inner product -----------------------
    def run_lanczos(consume, max_iters):
        """One sweep of the M-inner-product Lanczos recurrence; calls
        ``consume(j, v_j)`` as each basis vector appears. Returns
        (beta0, alphas, betas). Re-running with the same inputs reproduces
        the identical sequence (pure jitted device math + deterministic
        host scalars), which is what licenses the two-pass mode."""
        alphas, betas = [], []
        q0 = Msolve(b0c)
        beta0_ = np.sqrt(dot_M(q0, q0))
        v = q0 / beta0_
        v_prev = jnp.zeros_like(v)
        consume(0, v)
        beta_j = 0.0
        for j in range(max_iters):
            u = Msolve(Aop(v))  # M^{-1} A v
            alpha = dot_M(u, v)  # = v' A v
            u = u - alpha * v - beta_j * v_prev
            beta_next = np.sqrt(max(dot_M(u, u), 0.0))
            alphas.append(alpha)
            if beta_next <= 1e-300:
                break
            betas.append(beta_next)
            v_prev, v = v, u / beta_next
            consume(j + 1, v)
            beta_j = beta_next
        return beta0_, alphas, betas

    def tridiag(alphas, betas, m):
        T = np.diag(np.array(alphas[:m]))
        if m > 1:
            off = np.array(betas[: m - 1])
            T += np.diag(off, 1) + np.diag(off, -1)
        return T

    def coefficient_vectors(T, beta0_, m):
        """Host-side reduced recurrence: y_0 = (T + lam_0)^{-1} beta0 e1,
        y_k = lam_k (T + lam_k)^{-1} y_{k-1}, one per executed step."""
        ys = []
        lam_r = 1.0
        box_r = compute_box_radius(0, n)
        e1 = np.zeros(m)
        e1[0] = beta0_
        y = np.linalg.solve(T + lam_r * np.eye(m), e1)
        ys.append(y)
        for k in range(n + 1):
            lam_r /= 2.0
            box_r = compute_box_radius(k + 1, n)
            if box_r + compute_boundary_layer(lam_r, n) > R0:
                break
            y = lam_r * np.linalg.solve(T + lam_r * np.eye(m), y)
            ys.append(y)
        return ys

    if not two_pass:
        V = []
        beta0, alphas, betas = run_lanczos(
            lambda j, v: V.append(v), lanczos_iters
        )
        m = len(alphas)
        V = jnp.stack(V[:m])  # [m, E, n_local]
        T = tridiag(alphas, betas, m)
        ys = coefficient_vectors(T, beta0, m)
        vks = [
            jnp.einsum("i,ien->en", jnp.asarray(y, dtype=dtype), V) for y in ys
        ]
    else:
        # pass 1: scalars only — no basis storage
        beta0, alphas, betas = run_lanczos(lambda j, v: None, lanczos_iters)
        m = len(alphas)
        T = tridiag(alphas, betas, m)
        ys = coefficient_vectors(T, beta0, m)
        Y = np.stack([y for y in ys])  # [K+1, m]
        # pass 2: regenerate the identical basis, accumulate K+1 sums
        sums = [None] * len(ys)

        def accumulate(j, v):
            for k2 in range(len(sums)):
                c = jnp.asarray(Y[k2, j], dtype=dtype)
                sums[k2] = c * v if sums[k2] is None else sums[k2] + c * v

        # m - 1 iterations regenerate exactly v_0 .. v_{m-1}
        beta0_2, _, _ = run_lanczos(accumulate, m - 1)
        assert abs(beta0_2 - beta0) < 1e-12 * max(abs(beta0), 1e-300), (
            "two-pass Lanczos did not reproduce pass 1"
        )
        vks = sums
    stats["lanczos_iters"] = m

    # ---- sigma integrals over the reduced-space recurrence -----------------
    sigma = 0.0
    sigma_steps = []
    v_km1 = None
    for k, v_k in enumerate(vks):
        n_box = prefix_in_radius(center_norms, box_radius)
        mask = jnp.asarray(
            (np.arange(base.nelements) < n_box).astype(np.float64), dtype=dtype
        )
        area = float(area_fn(mask))
        if k == 0:
            integral = float(first_fn(v_k, b0, mask))
        else:
            integral = float(terms_fn(v_k, v_km1, mask))
        sigma += 2.0**k * integral / area
        sigma_steps.append(sigma)
        lam /= 2.0
        box_radius = compute_box_radius(k + 1, n)
        v_km1 = v_k

    if return_stats:
        stats["sigma_steps"] = sigma_steps
        return sigma, stats
    return sigma


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
