"""Matrix-free geometric multigrid on the implicit fine grid (device, JAX).

Rebuild of src/multigrid.jl: V-cycles with a CG smoother and a directly
factorized coarse (= base mesh) level. The whole V-cycle is a pure function
over static shapes and is jitted end to end; the CG smoother runs a fixed
number of steps (unrolled at trace time, like the reference's fixed `steps`).

Semantics intentionally mirrored from the reference (for iteration-count
parity):
  * the smoother's dot products run over the duplicated-interface layout and
    therefore double-count shared DOFs — the documented "approximate CG"
    (src/examples/homogenized_coefficients.jl:136-139);
  * restriction acts on the *local* (non-combined) residual
    (src/multigrid.jl:102-105); linearity makes the combined coarse rhs right;
  * recursive levels smooth with 2 CG steps regardless of the finest level's
    step count (the reference recursion drops the `steps` argument,
    src/multigrid.jl:109).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.assembly import assemble_operator
from ..fem.local_operators import build_level_operators, element_coefficients
from ..ops.apply import element_apply
from ..ops.interfaces import (
    apply_mask,
    combine_gather_rows,
    combine_interfaces,
    copy_to_base,
    distribute,
)
from ..ops.plan import GridPlan
from ..ops.transfer import prolong_add, restrict
from ..mesh.reference import prolongation_dense


# the polynomial (dot-free, linear) smoother family: both are valid SPD
# V-cycle preconditioners for pcg and share the lam_max plumbing
CHEBYSHEV_SMOOTHERS = ("chebyshev", "chebyshev4")


class LevelDevice(NamedTuple):
    """Per-level device arrays. Passed to the jitted V-cycle as *arguments*
    (a NamedTuple pytree), not closure constants: baking [E, n_local] masks
    and index tables into the HLO as literals bloats the serialized program
    past what remote-compile transports accept, and bloats executables."""

    stack: jnp.ndarray  # [P, n, n]
    slot_flat: jnp.ndarray  # [S] flattened slot indices (elem * n_local + node)
    slot_group: jnp.ndarray  # [S]
    boundary_mask: jnp.ndarray  # [E, n]
    first_copy_mask: jnp.ndarray  # [E, n]
    P_up: jnp.ndarray | None  # prolongation to this level from below [n_k, n_{k-1}]
    row: dict  # {"gather": GatherCombineTables on device} (ops/plan.py)


class MultigridSolver:
    """Owns device constants and jitted kernels for one (base mesh, nlevels).

    Coefficients (sigma, lambda) are *arguments* of the jitted functions so the
    homogenization driver can halve lambda without recompiling.
    """

    def __init__(
        self,
        plan: GridPlan,
        dtype=jnp.float64,
        smoothing_steps: int = 3,
        coarse_smoothing_steps: int = 2,
        coarse: str = "chol",
        coarse_cg_tol: float = 1e-12,
        coarse_cg_maxiter: int = 500,
        combine: str = "auto",
        apply_precision=None,
        smoother: str = "cg",
        cheb_ratio: float = 30.0,
        coarse_mg_tol: float = 1e-8,
        coarse_mg_maxiter: int = 40,
        coarse_prec_cycles: int = 1,
        coarse_prec_smooth: int = 2,
        coarse_mg_dense_limit: int = 4000,
        constraint: str = "auto",
        smooth_precision=None,
        direction_dtype=None,
        cycle: str = "V",
        restrict_precision=None,
        krylov_precision=None,
    ):
        self.plan = plan
        self.dtype = dtype
        self.nlevels = plan.nlevels
        self.smoothing_steps = smoothing_steps
        self.coarse_smoothing_steps = coarse_smoothing_steps
        self.coarse_kind = coarse
        self.coarse_cg_tol = coarse_cg_tol
        self.coarse_cg_maxiter = coarse_cg_maxiter
        self.coarse_mg_tol = coarse_mg_tol
        self.coarse_mg_maxiter = coarse_mg_maxiter
        self.coarse_prec_cycles = coarse_prec_cycles
        self.coarse_prec_smooth = coarse_prec_smooth
        self.smoother = smoother
        self.cheb_ratio = cheb_ratio
        self.apply_precision = (
            apply_precision
            if apply_precision is not None
            else jax.lax.Precision.HIGHEST
        )
        # Mixed-precision smoothing (f32 state): direction/inner applies run
        # at `smooth_precision` (e.g. "high" = bf16x3, ~2x the MXU rate of
        # HIGHEST = 6-pass f32 emulation) while the residuals that feed
        # restriction stay at `apply_precision`. cg_exact recomputes its
        # entry residual at full precision each smooth, so the bf16x3
        # direction error (~1e-5 relative) perturbs the V-cycle instead of
        # accumulating — the classic mixed-precision MG arrangement (the
        # remaining 2x identified in round 2, PERFORMANCE.md).
        self.smooth_precision = (
            smooth_precision if smooth_precision is not None else self.apply_precision
        )
        # Storage dtype for the smoothers' DIRECTION vectors between steps
        # (e.g. "bfloat16": halves their HBM traffic). The conversions fuse
        # into the consuming kernels; numerical guard: cg_exact recomputes
        # its entry residual at full precision each smooth, so direction
        # rounding perturbs (doesn't accumulate into) the V-cycle, same
        # argument as smooth_precision. None = store at the state dtype.
        self.direction_dtype = (
            jnp.dtype(direction_dtype) if direction_dtype is not None else None
        )
        # Precision of the smoothers' fresh ENTRY residual — the apply whose
        # incrementally-maintained result feeds restriction (chebyshev and
        # cg_exact), or the separate restriction apply (plain cg). Two of
        # these per level per V-cycle run at apply_precision (HIGHEST) by
        # default. Inside a PCG preconditioner the V-cycle only needs to stay
        # a fixed (approximately) linear SPD operator, so "high" (bf16x3)
        # here trades a ~eps_bf16x3*||A||*||x|| once-per-smooth error for the
        # HIGHEST-vs-HIGH apply cost difference — convergence neutrality is a
        # TPU-measured property, not assumed (the bf16x3 PER-STEP residual
        # recomputation stalled bare cycles at 190M; once-per-smooth under a
        # PCG outer is the measured A/B, PERFORMANCE.md round 4). None =
        # apply_precision.
        self.restrict_precision = (
            restrict_precision if restrict_precision is not None
            else self.apply_precision
        )
        # Precision of the outer PCG iteration's fine-level matvec A p
        # (the residual-recurrence operator). Reduced precision perturbs the
        # Krylov recurrence itself (not just the preconditioner) — riskier
        # than restrict_precision; the exact first-copy residual norm in the
        # pcg history is computed from the recurrence residual, so drift is
        # observable. None = apply_precision.
        self.krylov_precision = (
            krylov_precision if krylov_precision is not None
            else self.apply_precision
        )
        # cycle="W": recurse twice per level (gamma=2) — stronger coarse
        # correction per cycle at ~2x sub-top cost (the reference has
        # V-cycles only, src/multigrid.jl:73-119)
        assert cycle in ("V", "W")
        self.cycle = cycle

        ref_ops = build_level_operators(plan.reference, dtype=np.float64)
        np_dtype = np.dtype(jnp.dtype(dtype).name)

        # combine="auto": on a lexicographic full-box hypercube base, the
        # structured fast path (ops/structured.py) replaces every gather
        # with shifted slice-adds — descriptor-free, ~20x faster at a 196k-
        # element base, and needs NO device index tables at all. Other
        # meshes (e.g. the driver's shrunken prefix domains) fall back to
        # the gather form.
        self.structured = None
        if combine in ("auto", "structured"):
            from ..ops.structured import (
                build_structured_combine_auto,
                detect_structured,
            )

            det = detect_structured(plan.base)  # one O(E) pass, all levels
            sc0 = (
                build_structured_combine_auto(plan, 0, det=det)
                if det is not None and plan.reference.layout is not None
                else None
            )
            if sc0 is not None:
                self.structured = [sc0] + [
                    build_structured_combine_auto(plan, k, det=det)
                    for k in range(1, self.nlevels)
                ]
                combine = "structured"
            else:
                assert combine != "structured", (
                    "combine='structured' requires a lexicographic full-box "
                    "hypercube base mesh; use combine='gather'"
                )
                combine = "gather"
        self.combine_kind = combine
        # constraint="mask": force the resident [E, n_local] boundary-mask
        # constraint even with the structured combine. The lattice-mode
        # homogenization driver uses this to impose the *shrunken* sub-box
        # Dirichlet condition per outer step: masks live in LevelDevice,
        # which is a jit ARGUMENT, so swapping them per step needs no
        # recompile (see models/checkerboard.py lattice mode).
        assert constraint in ("auto", "mask")
        self.constraint_kind = (
            "mask" if (constraint == "mask" or combine != "structured") else "structured"
        )

        # Only the selected combine form's tables go to HBM. At 190M DOFs the
        # finest-level flat slot tables alone are ~0.8 GB — shipping every
        # form (as round 1 did) costs more memory than the smoother's live
        # temporaries. combine="flat" is kept as the counting oracle
        # (round-3 verdict item 6: rowwise/gather_legacy deleted).
        has_layout = plan.reference.layout is not None
        use_gather = combine == "gather" and has_layout
        use_flat = not (use_gather or combine == "structured")

        self.levels: list[LevelDevice] = []
        self.n_groups: list[int] = []
        self.row_layout: list[dict] = []
        for k in range(self.nlevels):
            lp = plan.levels[k]
            n_local = plan.n_local(k)
            P_up = (
                jnp.asarray(prolongation_dense(plan.reference, k - 1), dtype=dtype)
                if k > 0
                else None
            )
            self.n_groups.append(lp.combine.n_groups)

            def dev_gt(t):
                if t is None:
                    return None
                oe, ol, om, gmap = t
                return (
                    jnp.asarray(oe),
                    jnp.asarray(ol),
                    jnp.asarray(om, dtype=dtype),
                    jnp.asarray(gmap),
                )

            row = dict(
                gather=dict(
                    face=dev_gt(lp.gather.face) if use_gather else None,
                    edge=dev_gt(lp.gather.edge) if use_gather else None,
                    corner=dev_gt(lp.gather.corner) if use_gather else None,
                ),
            )
            if plan.reference.layout is not None:
                lay = plan.reference.layout[k]
                # combine_gather_rows reshapes each class span to [E*L, W]:
                # blocks must sit at consecutive width-multiples
                for offs, wdt in (
                    (lay.face_offsets, lay.npf),
                    (lay.edge_offsets, lay.npe),
                    (lay.corner_cols, 1),
                ):
                    if len(offs) and wdt > 0:
                        assert all(
                            offs[l] == offs[0] + l * wdt for l in range(len(offs))
                        ), "interface layout not contiguous per class"
                candidates = (
                    list(lay.face_offsets) + list(lay.edge_offsets) + list(lay.corner_cols)
                )
                self.row_layout.append(
                    dict(
                        face_off=tuple(int(v) for v in lay.face_offsets),
                        npf=int(lay.npf),
                        edge_off=tuple(int(v) for v in lay.edge_offsets),
                        npe=int(lay.npe),
                        corner_cols=tuple(int(v) for v in lay.corner_cols),
                        iface_start=int(min(candidates)),
                    )
                )
            self.levels.append(
                LevelDevice(
                    stack=jnp.asarray(ref_ops[k].stack, dtype=dtype),
                    slot_flat=jnp.asarray(lp.combine.flat(n_local))
                    if use_flat
                    else jnp.zeros((0,), dtype=jnp.int32),
                    slot_group=jnp.asarray(lp.combine.slot_group)
                    if use_flat
                    else jnp.zeros((0,), dtype=jnp.int32),
                    # masks stored as bool (4-8x less HBM than the compute
                    # dtype); the mask multiply casts on the fly and XLA
                    # fuses the convert. The structured path needs no
                    # boundary mask at all — the constraint is static shell
                    # zeroing (ops/structured.py::constrain_structured);
                    # the finest-level bool mask alone is ~0.5 GB at 500M
                    # DOFs.
                    boundary_mask=jnp.zeros((0, 0), dtype=bool)
                    if self.constraint_kind == "structured"
                    else jnp.asarray(lp.boundary_mask != 0),
                    first_copy_mask=jnp.asarray(lp.first_copy_mask != 0),
                    P_up=P_up,
                    row=row,
                )
            )

        self.base_elements = jnp.asarray(plan.base.elements.astype(np.int32))
        self.n_base_nodes = plan.base.nnodes
        self.interior_idx = jnp.asarray(plan.interior_base_nodes.astype(np.int32))
        self._np_dtype = np_dtype

        # Global-assembly tables for the level-0 solve: the iterative coarse
        # solves run on the [n_base_nodes] vector (144 KB at a 36k-node base)
        # instead of the duplicated [E, d+1] layout (3 MB + a ~10 ms combine
        # per operator application). Summing local contributions to global
        # nodes is a gather + SORTED segment_sum — no scatters.
        flat_nodes = plan.base.elements.reshape(-1)
        perm = np.argsort(flat_nodes, kind="stable")
        self._asm_perm = jnp.asarray(perm.astype(np.int32))
        self._asm_node = jnp.asarray(flat_nodes[perm].astype(np.int32))
        im = np.zeros(plan.base.nnodes, dtype=bool)
        im[plan.interior_base_nodes] = True
        self._interior_mask_N = jnp.asarray(im)

        # On box bases the level-0 operator is a lattice stencil: the coarse
        # CG/PCG applies become <= 3^d shifted elementwise multiply-adds on
        # the (n+1)^d node lattice instead of gather + tiny-matmul +
        # segment_sum (~20x cheaper per application — ops/stencil.py).
        # Sharded subclasses disable this (their coarse vectors are
        # shard-local blocks inside shard_map).
        from ..ops.stencil import build_lattice_stencil

        self.lattice_stencil = build_lattice_stencil(plan.base)

        self._power_jit = {}

        # base-mesh coarsening below level 0 (coarse="mg"): an auxiliary
        # implicit hierarchy on the geometrically coarsened box, used as a
        # Chebyshev-smoothed V-cycle preconditioner for CG on the exact
        # level-0 operator (solver/coarse.py)
        self.coarse_geom = None
        self.aux_solver = None
        if coarse == "mg":
            from .coarse import build_coarse_geometry

            self.coarse_geom = build_coarse_geometry(
                plan, dense_limit=coarse_mg_dense_limit
            )
            assert self.coarse_geom is not None, (
                "coarse='mg' requires a full-box hypercube base mesh with an "
                "even cell count; use coarse='chol' or 'cg' otherwise"
            )
            self.aux_solver = MultigridSolver(
                self.coarse_geom.plan,
                dtype=dtype,
                smoother="chebyshev",
                coarse="inv",  # inverse-matmul: cho_solve's triangular
                # solves are sequential and dominate on TPU
                apply_precision=self.apply_precision,
            )
            g = self.coarse_geom

            def idx(a):
                a = np.asarray(a)
                return jnp.asarray(
                    a.astype(np.int32) if a.size == 0 or a.max() < 2**31 else a
                )

            self._aux_maps = dict(
                node_map=idx(g.node_map),
                aux_first_flat=idx(g.aux_first_flat),
                # bool on device (the multiply casts; ~8x less HBM at the
                # 1M-base-element scale where the aux hierarchy matters)
                aux_first_mask=jnp.asarray(g.aux_first_mask != 0),
            )

        # donate the finest-level x: at 500M+ DOFs the state is ~2 GB and
        # aliasing it into the output removes one full copy from peak HBM
        # (CPU ignores donation — skip it there to avoid warning spam)
        donate = () if jax.default_backend() == "cpu" else (0,)
        self._vcycle = jax.jit(self._vcycle_impl, donate_argnums=donate)

    # ------------------------------------------------------------------ #
    # coefficient / coarse-operator setup (host precompute per outer step)
    # ------------------------------------------------------------------ #
    def coefficients(self, sigma_el, lam: float):
        """[E, P] apply coefficients per level (same for all levels — the
        reference likewise shares sigma/lambda across levels)."""
        c = element_coefficients(self.plan.base, sigma_el, lam, dtype=self._np_dtype)
        return jnp.asarray(c)

    def coarse_cholesky(self, sigma_el, lam: float):
        """Dense Cholesky factor of the interior coarse operator
        (reference: cholesky(assemble_checkerboard(...)[int,int]),
        src/examples/homogenized_coefficients.jl:259-261)."""
        A = assemble_operator(self.plan.base, sigma_el, lam, dtype=np.float64)
        ii = self.plan.interior_base_nodes
        A_int = A[np.ix_(ii, ii)].toarray()
        L = np.linalg.cholesky(A_int)
        return jnp.asarray(L.astype(self._np_dtype))

    def coarse_inverse(self, sigma_el, lam: float):
        """Dense inverse of the interior coarse operator. Unlike the
        triangular solves of the Cholesky factor (inherently sequential —
        slow on the MXU), applying the inverse is one matmul. Computed in
        f64 on host, stored in the solver dtype; used where the coarse solve
        is a preconditioner component ("mg" aux hierarchy) or where dtype
        roundoff is acceptable ("inv")."""
        A = assemble_operator(self.plan.base, sigma_el, lam, dtype=np.float64)
        ii = self.plan.interior_base_nodes
        A_int = A[np.ix_(ii, ii)].toarray()
        return jnp.asarray(np.linalg.inv(A_int).astype(self._np_dtype))

    def coarse_setup(self, sigma_el, lam: float):
        """Per-(sigma, lam) coarse-solve payload, passed to ``vcycle``:
        the Cholesky factor ("chol"), the dense interior inverse ("inv"),
        an empty array ("cg"), or the aux hierarchy's coefficients + factor
        + Chebyshev bound ("mg")."""
        if self.coarse_kind == "chol":
            return self.coarse_cholesky(sigma_el, lam)
        if self.coarse_kind == "inv":
            return self.coarse_inverse(sigma_el, lam)
        if self.coarse_kind == "cg":
            return jnp.zeros((0, 0), dtype=self.dtype)
        g = self.coarse_geom
        sigma_aux = g.average_sigma(sigma_el)
        coeff_a = self.aux_solver.coefficients(sigma_aux, lam)
        chol_a = self.aux_solver.coarse_setup(sigma_aux, lam)
        lam_max = self.aux_solver.estimate_lambda_max(coeff_a)
        # Chebyshev bound for the junction-level smoothing on the EXACT
        # level-0 operator (the aux operator is sigma-averaged; smoothing on
        # the exact operator around the aux correction is what makes the
        # preconditioner strong under coefficient contrast)
        coeff0 = self.coefficients(sigma_el, lam)
        lam_max0 = self.estimate_lambda_max(coeff0, k=0)
        # inverse global diagonal for the junction Chebyshev (constant per
        # (sigma, lam) — computing it inside the smoother costs an einsum +
        # combine per call)
        diag_g = self._diag_global(coeff0)
        dinv_g = jnp.where(diag_g > 0, 1.0 / jnp.where(diag_g > 0, diag_g, 1.0), 0.0)
        return dict(
            coeff=coeff_a,
            chol=chol_a,
            lam_max=jnp.asarray(lam_max, self.dtype),
            lam_max0=jnp.asarray(lam_max0, self.dtype),
            dinv_g=dinv_g,
            Ls=tuple(self.aux_solver.levels),
            base_elements=self.aux_solver.base_elements,
            interior_idx=self.aux_solver.interior_idx,
            **self._aux_maps,
        )

    def _diag_global(self, coeff0):
        """Assembled global diagonal of the level-0 operator, [N]. A setup-
        time helper (outside the jitted V-cycle); sharded subclasses override
        with a psum-reduced version."""
        d = jnp.einsum(
            "ep,pn->en",
            coeff0,
            jnp.diagonal(self.levels[0].stack, axis1=1, axis2=2),
        )
        return self._to_global(d, self.base_elements)

    # ------------------------------------------------------------------ #
    # device building blocks (traced)
    # ------------------------------------------------------------------ #
    def _combine(self, x, k, Ls=None):
        L = (Ls or self.levels)[k]
        if self.combine_kind == "structured":
            from ..ops.structured import combine_structured

            return combine_structured(x, self.structured[k], self.row_layout[k])
        if self.combine_kind == "gather" and self.row_layout:
            return combine_gather_rows(x, L.row["gather"], self.row_layout[k])
        return combine_interfaces(x, L.slot_flat, L.slot_group, self.n_groups[k])

    def _constrain(self, x, k, Ls=None):
        """Zero-Dirichlet constraint. The form is chosen PER CALL from the
        level arrays: an empty boundary_mask means the structured shell
        zeroing (no resident mask); a real mask means the multiply. The
        lattice-mode driver exploits this: it passes per-outer-step Ls whose
        masks encode the SHRUNKEN sub-box Dirichlet condition — the shape
        change retraces the jit, no solver rebuild."""
        bm = (Ls or self.levels)[k].boundary_mask
        if bm.size == 0:
            from ..ops.structured import constrain_structured

            return constrain_structured(x, self.structured[k], self.row_layout[k])
        return apply_mask(x, bm)

    def _combine_constrained(self, x, k, Ls=None):
        """combine(constrain(x)) in one pass where the structured form
        exists: the fold zeroes boundary GROUPS of the orbit sums, which
        equals constraining first (every copy of a boundary DOF is zeroed)
        — one full-state pass fewer than the two-op form. The cg_exact /
        chebyshev smoothers skip their separate constrain entirely under a
        structured constraint: boundary rows of the local residual become
        dead values that (a) this fold zeroes wherever dots/updates read
        them, and (b) restriction provably sends only to coarse-boundary
        rows (a fine boundary DOF's P stencil lies on the same boundary
        face), which the next level's constraint kills — the x-trajectory
        is bitwise unchanged (tested against the parity smoother)."""
        bm = (Ls or self.levels)[k].boundary_mask
        if bm.size == 0:
            from ..ops.structured import combine_structured

            return combine_structured(
                x, self.structured[k], self.row_layout[k], constrain=True
            )
        return apply_mask(self._combine(x, k, Ls), bm)

    def _vdot(self, a, b):
        """Dot product over the duplicated layout. The sharded subclasses
        override this with a psum-reduced version — every smoother and
        coarse solve below is then reusable inside shard_map unchanged."""
        return jnp.vdot(a, b)

    def _assemble_base(self, b0, base_elements):
        """Accumulate duplicated-layout local contributions onto global base
        nodes; [E, d+1] -> [N]. Sharded subclasses psum the result."""
        return copy_to_base(b0, base_elements, self.n_base_nodes)

    def _apply_op(self, x, coeff, k, Ls=None, precision=None):
        return element_apply(
            x, coeff, (Ls or self.levels)[k].stack,
            precision=precision if precision is not None else self.apply_precision,
        )

    def _local_residual(self, x, b, coeff, k, Ls=None, precision=None):
        """r = constrain(b - A x) (reference: local_residual!,
        src/apply_local_operators.jl:7-27)."""
        return self._constrain(
            b - self._apply_op(x, coeff, k, Ls, precision=precision), k, Ls
        )

    @staticmethod
    def _safe_div(num, den):
        """num / den, but 0 when den == 0: once the smoother has converged
        exactly, further CG updates degenerate to 0/0 — make them no-ops
        (the reference would NaN here too, it just never converges exactly)."""
        return jnp.where(den == 0, jnp.zeros_like(num), num / jnp.where(den == 0, 1, den))

    def diagonal(self, coeff, k, Ls=None):
        """Assembled diagonal of the implicit operator on the duplicated
        layout: diag[e, i] = sum_p coeff[e, p] stack[p][i, i], interface-
        combined (each copy gets the full assembled diagonal entry)."""
        L = (Ls or self.levels)[k]
        d_ref = jnp.diagonal(L.stack, axis1=1, axis2=2)  # [P, n]
        d = jnp.einsum("ep,pn->en", coeff, d_ref)
        return self._combine(d, k, Ls)

    # safety margins on the lambda_max estimate: UNDERestimating lets the
    # Chebyshev polynomial amplify the top modes — measured as a hard
    # V-cycle stall at 190M DOFs, where 30 power iterations land far enough
    # below lambda_true that even x1.15 did not cover it (round 4,
    # PERFORMANCE.md). Lanczos Ritz values converge much faster on the
    # clustered top spectrum, so a smaller margin suffices.
    _LAM_SAFETY = {"power": 1.15, "lanczos": 1.1}

    def _lam_body(self, k, iters, method):
        """Shared estimator body for lambda_max(D^{-1}A) at level k, written
        through the overridable primitives (_apply_op/_combine/_constrain/
        _vdot) so the slab solver can wrap it in shard_map unchanged.
        Returns est(coeff, v, Ls) -> lam (raw, no safety margin).

        method="lanczos" (default): D-inner-product Lanczos — D^{-1}A is
        self-adjoint in <u,v>_D = u'Dv, so the recurrence is the plain
        symmetric one with D-weighted dots, and lambda_max is the top
        eigenvalue of the [m, m] tridiagonal (eigvalsh inside the program;
        loss of orthogonality without reorthogonalization only duplicates
        converged Ritz values, which is harmless for the extremal estimate).
        method="power": the round-1..3 power iteration (kept for A/Bs).
        """

        def est(coeff, v, Ls):
            d = self.diagonal(coeff, k, Ls)
            dinv = jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0), 0.0)
            w = Ls[k].first_copy_mask
            v = self._constrain(self._combine(v, k, Ls), k, Ls)

            def matvec(u):
                return dinv * self._combine(
                    self._constrain(self._apply_op(u, coeff, k, Ls), k, Ls),
                    k, Ls,
                )

            if method == "power":

                def body(_, state):
                    v, _ = state
                    y = matvec(v)
                    lam = self._vdot(v * w, y) / self._vdot(v * w, v)
                    nrm = jnp.sqrt(self._vdot(y * w, y))
                    return y / jnp.where(nrm == 0, 1.0, nrm), lam

                _, lam = jax.lax.fori_loop(
                    0, iters, body, (v, jnp.zeros((), v.dtype))
                )
                return lam

            # Lanczos: dots in the D inner product on the first-copy subspace
            def ddot(a, b_):
                return self._vdot(a * w, d * b_)

            nrm0 = jnp.sqrt(ddot(v, v))
            v = v / jnp.where(nrm0 == 0, 1.0, nrm0)

            def body(carry, _):
                v_j, v_prev, beta_prev = carry
                u = matvec(v_j)
                alpha = ddot(u, v_j)
                u = u - alpha * v_j - beta_prev * v_prev
                beta = jnp.sqrt(jnp.maximum(ddot(u, u), 0.0))
                v_next = u / jnp.where(beta == 0, 1.0, beta)
                return (v_next, v_j, beta), (alpha, beta)

            _, (alphas, betas) = jax.lax.scan(
                body, (v, jnp.zeros_like(v), jnp.zeros((), v.dtype)),
                None, length=iters,
            )
            # the [m] tridiagonal coefficients leave the program; the tiny
            # eigensolve runs on host (the estimator returns a float anyway)
            return alphas, betas

        return est

    @staticmethod
    def _lanczos_top(alphas, betas):
        """Top eigenvalue of the Lanczos tridiagonal (host, numpy). A zero
        beta (breakdown) just decouples the trailing block — harmless."""
        a = np.asarray(alphas, np.float64)
        b_ = np.asarray(betas, np.float64)[:-1]
        T = np.diag(a) + np.diag(b_, 1) + np.diag(b_, -1)
        return float(np.linalg.eigvalsh(T)[-1])

    def estimate_lambda_max(
        self, coeff, k=None, iters: int = 30, seed: int = 0,
        method: str = "lanczos",
    ):
        """Estimate the largest eigenvalue of D^{-1} A on the constrained,
        interface-consistent subspace (host helper, one call per coefficient
        update — like coarse_cholesky). Runs as ONE jitted loop: per-step
        dispatch costs ~0.5s over the axon tunnel. See _lam_body for the
        two methods; the returned value includes the method's safety
        margin."""
        k = self.nlevels - 1 if k is None else k
        rng = np.random.default_rng(seed)
        v0 = jnp.asarray(
            rng.standard_normal((self.plan.base.nelements, self.plan.n_local(k))),
            dtype=self.dtype,
        )
        key = (k, iters, method)
        if key not in self._power_jit:
            self._power_jit[key] = jax.jit(self._lam_body(k, iters, method))
        out = self._power_jit[key](coeff, v0, tuple(self.levels))
        lam = float(out) if method == "power" else self._lanczos_top(*out)
        return lam * self._LAM_SAFETY[method]

    def estimate_lambda_max_levels(self, coeff, iters: int = 30, seed: int = 0):
        """Per-level lam_max array: anywhere a scalar ``lam_max`` is
        accepted (vcycle/fmg/pcg/solve), an [nlevels] array makes each
        level's Chebyshev smoother target its own D^{-1}A spectrum instead
        of reusing the finest level's — a free contraction improvement when
        the spectra differ (e.g. strong coefficient contrast)."""
        return jnp.asarray(
            [
                self.estimate_lambda_max(coeff, k, iters=iters, seed=seed)
                for k in range(self.nlevels)
            ],
            dtype=self.dtype,
        )

    def _smooth_chebyshev(self, x, b, coeff, lam_max, *, k, steps, Ls=None):
        """Jacobi-preconditioned Chebyshev smoother: no dot products at all
        (no cross-chip reductions, and none of the CG smoother's
        duplicated-DOF dot inexactness). Returns (x, r_loc) with the
        residual in LOCAL (duplicated-contribution) form, maintained
        incrementally — the V-cycle restricts it directly.

        smoother="chebyshev": classic first-kind three-term recurrence on
        D^{-1}A over [lam_max/cheb_ratio, lam_max].
        smoother="chebyshev4": fourth-kind Chebyshev recurrence (Lottes,
        "Optimal polynomial smoothers for multigrid V-cycles", 2022) —
        targets the FULL [0, lam_max] interval with the sqrt-weighted
        minimax polynomial MG smoothing wants, so it needs no lam_min /
        cheb_ratio hyperparameter and damps the upper half-spectrum ~2.5x
        harder per sweep at identical cost (same applies, same axpys;
        measured scalar bound at 3 steps: max|E| on [lam/4, lam] = 0.233
        vs 0.596 for first-kind at ratio 30)."""
        L = (Ls or self.levels)[k]
        d = self.diagonal(coeff, k, Ls)
        dinv = jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0), 0.0)
        fourth = self.smoother == "chebyshev4"
        lam_min = lam_max / self.cheb_ratio
        theta = 0.5 * (lam_max + lam_min)
        delta = 0.5 * (lam_max - lam_min)

        structured = L.boundary_mask.size == 0

        # Entry residual at full apply precision; inner updates are
        # INCREMENTAL on the direction applies (r_loc -= A p), exactly like
        # _smooth_cg_exact. Under mixed precision this is load-bearing, not
        # stylistic: recomputing r = b - A x at bf16x3 each step injects an
        # error ~eps_bf16x3 * ||A|| * ||x|| — proportional to the ACCUMULATED
        # iterate, which measured as a hard stall at 1.06x the initial
        # residual at 190M DOFs on TPU (full-precision smoothing converged;
        # PERFORMANCE.md round 4). The incremental form's error scales with
        # ||p|| (the shrinking update), and the fresh full-precision entry
        # residual re-bounds any drift once per smooth. It also hands the
        # V-cycle a maintained LOCAL residual, eliminating the separate
        # restriction apply (one HIGHEST apply per pre-smooth).
        if structured:
            r_loc = b - self._apply_op(
                x, coeff, k, Ls, precision=self.restrict_precision
            )
        else:
            r_loc = self._local_residual(
                x, b, coeff, k, Ls, precision=self.restrict_precision
            )
        sp = self.smooth_precision
        dd = self.direction_dtype
        store = (lambda v: v.astype(dd)) if dd is not None else (lambda v: v)
        load = (lambda v: v.astype(x.dtype)) if dd is not None else (lambda v: v)

        def Ap_local(pf):
            Ap = self._apply_op(pf, coeff, k, Ls, precision=sp)
            return Ap if structured else self._constrain(Ap, k, Ls)

        z = dinv * self._combine_constrained(r_loc, k, Ls)
        p = store(((4.0 / 3.0) / lam_max if fourth else 1.0 / theta) * z)
        x = x + load(p)
        sigma = theta / delta
        rho = 1.0 / sigma
        for j in range(2, steps + 1):
            r_loc = r_loc - Ap_local(load(p))
            z = dinv * self._combine_constrained(r_loc, k, Ls)
            if fourth:
                # p_j = (2j-3)/(2j+1) p_{j-1} + (8j-4)/((2j+1) lam) z
                p = store(
                    ((2.0 * j - 3.0) / (2.0 * j + 1.0)) * load(p)
                    + ((8.0 * j - 4.0) / (2.0 * j + 1.0) / lam_max) * z
                )
            else:
                rho_new = 1.0 / (2.0 * sigma - rho)
                p = store(
                    rho_new * rho * load(p) + (2.0 * rho_new / delta) * z
                )
                rho = rho_new
            x = x + load(p)
        # bring r_loc up to date with the final direction; dead code (DCE)
        # for callers that ignore the returned residual (pcg preconditioner)
        r_loc = r_loc - Ap_local(load(p))
        return x, r_loc

    def _smooth(self, x, b, coeff, *, k, steps, Ls=None, lam_max=None):
        if self.smoother in CHEBYSHEV_SMOOTHERS:
            # scalar = finest-level estimate reused everywhere; an
            # [nlevels] array (estimate_lambda_max_levels) is indexed per
            # level — k is static, so this is free under jit
            if lam_max is not None and jnp.ndim(lam_max) == 1:
                lam_max = lam_max[k]
            return self._smooth_chebyshev(
                x, b, coeff, lam_max, k=k, steps=steps, Ls=Ls
            )
        return self._smooth_cg(x, b, coeff, k=k, steps=steps, Ls=Ls)

    def _smooth_cg(self, x, b, coeff, *, k, steps, Ls=None):
        """`steps` CG iterations (reference: smoothing_steps!,
        src/multigrid.jl:46-71). Returns (x, r)."""
        r = self._combine(self._local_residual(x, b, coeff, k, Ls), k, Ls)
        p = r
        rs = self._vdot(r, r)
        for _ in range(steps):
            Ap = self._combine(
                self._constrain(
                    self._apply_op(p, coeff, k, Ls, precision=self.smooth_precision),
                    k, Ls,
                ),
                k, Ls,
            )
            alpha = self._safe_div(rs, self._vdot(p, Ap))
            x = x + alpha * p
            r = r - alpha * Ap
            rs_new = self._vdot(r, r)
            p = r + self._safe_div(rs_new, rs) * p
            rs = rs_new
        return x, r

    def _smooth_cg_exact(self, x, b, coeff, *, k, steps, Ls=None):
        """CG smoothing with exact dots and ONE combine per step.

        Two identities make this cheaper than the parity smoother
        (_smooth_cg) without changing the math being approximated:
          * for an interface-consistent direction p, the energy splits per
            element: p'Ap = sum over ALL slots of p * (A_local p) — so Ap
            never needs combining;
          * the local residual updates incrementally (r_loc -= alpha *
            A_local p), so the combined residual is ONE combine per step and
            the final r_loc is exactly what the V-cycle restricts —
            eliminating the separate local_residual apply.
        Dots are first-copy weighted (exact), unlike the reference's
        duplicated-DOF dots (homogenized_coefficients.jl:136-139).
        Returns (x, r_loc).
        """
        Ls_ = Ls or self.levels
        w = Ls_[k].first_copy_mask
        structured = Ls_[k].boundary_mask.size == 0
        # entry residual at restrict_precision (default: full apply
        # precision): recomputed fresh each smooth, it bounds the drift the
        # HIGH-precision direction applies can feed into the restricted
        # residual. Under the structured constraint the separate constrain
        # passes are skipped — see _combine_constrained for why that is
        # exact.
        if structured:
            r_loc = b - self._apply_op(
                x, coeff, k, Ls, precision=self.restrict_precision
            )
        else:
            r_loc = self._local_residual(
                x, b, coeff, k, Ls, precision=self.restrict_precision
            )
        rc = self._combine_constrained(r_loc, k, Ls)
        rs = self._vdot(rc * w, rc)
        dd = self.direction_dtype
        store = (lambda v: v.astype(dd)) if dd is not None else (lambda v: v)
        load = (lambda v: v.astype(x.dtype)) if dd is not None else (lambda v: v)
        p = store(rc)
        for i in range(steps):
            pf = load(p)
            Ap_loc = self._apply_op(
                pf, coeff, k, Ls, precision=self.smooth_precision
            )
            if not structured:
                Ap_loc = self._constrain(Ap_loc, k, Ls)
            alpha = self._safe_div(rs, self._vdot(pf, Ap_loc))
            x = x + alpha * pf
            r_loc = r_loc - alpha * Ap_loc
            if i + 1 < steps:
                rc = self._combine_constrained(r_loc, k, Ls)
                rs_new = self._vdot(rc * w, rc)
                p = store(rc + self._safe_div(rs_new, rs) * pf)
                rs = rs_new
        return x, r_loc

    def _coarse_solve_chol(self, b0, chol, base_elements, interior_idx):
        """Direct coarse solve (reference: vcycle! k==1 branch,
        src/multigrid.jl:74-93)."""
        u = self._assemble_base(b0, base_elements)
        b_int = u[interior_idx]
        sol_int = jax.scipy.linalg.cho_solve((chol, True), b_int)
        sol = jnp.zeros((self.n_base_nodes,), dtype=b0.dtype)
        sol = sol.at[interior_idx].set(sol_int)
        return distribute(sol, base_elements)

    def _coarse_solve_inv(self, b0, Ainv, base_elements, interior_idx):
        """Direct coarse solve by dense-inverse matmul (MXU-friendly)."""
        u = self._assemble_base(b0, base_elements)
        sol_int = jnp.matmul(Ainv, u[interior_idx], precision=self.apply_precision)
        sol = jnp.zeros((self.n_base_nodes,), dtype=b0.dtype)
        sol = sol.at[interior_idx].set(sol_int)
        return distribute(sol, base_elements)

    def _to_global(self, y, base_elements):
        """Sum duplicated-layout local contributions onto global base nodes:
        [E, d+1] -> [N]. Gather by the presorted permutation + one sorted
        segment_sum — scatter-free (TPU row scatters cost ~17x a gather).
        The sharded subclasses override with a per-shard scatter-add + psum
        (``base_elements`` is their local block; ignored here)."""
        vals = y.reshape(-1)[self._asm_perm]
        return jax.ops.segment_sum(
            vals, self._asm_node, num_segments=self.n_base_nodes
        )

    def _global_apply(self, u, coeff, Ls, base_elements, m):
        """Assembled level-0 operator on the global node vector: distribute
        (one gather), element apply (tiny MXU matmuls), re-assemble
        (_to_global), constrain by the interior-node mask ``m``. Same
        operator the duplicated-layout path applies, without its interface
        combine."""
        yd = element_apply(
            u[base_elements], coeff, Ls[0].stack,
            precision=self.apply_precision,
        )
        return self._to_global(yd, base_elements) * m

    def _coarse_solve_cg(self, b0, coeff, Ls, base_elements, m):
        """Matrix-free coarse solve: CG on the GLOBAL base-node vector.

        Mathematically identical to CG on the duplicated layout with
        first-copy dots (those dots are exactly global-vector dots and the
        operator is the same); state is n_base_nodes floats instead of
        [E, d+1], and each iteration is one gather + segment_sum instead of
        an interface combine. Scales to base meshes too large to factor.
        ``m``: [N] interior-node mask (an argument so the lattice-mode
        driver can shrink the Dirichlet box per outer step, no recompile)."""
        Aop, to_g, dist = self._level0_ops(coeff, Ls, base_elements, m)
        b = to_g(b0) * m
        x = jnp.zeros_like(b)
        r = b
        p = r
        rs = jnp.vdot(r, r)
        eps2 = jnp.asarray(self.coarse_cg_tol, b.dtype) ** 2 * (rs + 1e-300)

        def body(state):
            x, r, p, rs, i = state
            Ap = Aop(p)
            alpha = self._safe_div(rs, jnp.vdot(p, Ap))
            x = x + alpha * p
            r = r - alpha * Ap
            rs_new = jnp.vdot(r, r)
            p = r + self._safe_div(rs_new, rs) * p
            return x, r, p, rs_new, i + 1

        def cond(state):
            _, _, _, rs_c, i = state
            return jnp.logical_and(rs_c > eps2, i < self.coarse_cg_maxiter)

        x, _, _, _, _ = jax.lax.while_loop(cond, body, (x, r, p, rs, 0))
        return dist(x)

    def _level0_ops(self, coeff, Ls, base_elements, m):
        """(apply, to_global, distribute) for the global-space level-0
        solves. On box bases: the lattice-stencil forms (ops/stencil.py) —
        weights built once here and hoisted out of the CG while_loop by XLA;
        otherwise the gather/segment_sum forms."""
        st = self.lattice_stencil
        if st is not None:
            from ..ops.stencil import (
                lattice_apply,
                lattice_assemble,
                lattice_distribute,
                lattice_weights,
            )

            W = lattice_weights(coeff, Ls[0].stack, st)
            return (
                lambda u: lattice_apply(u, W, st) * m,
                lambda y0: lattice_assemble(y0, st),
                lambda u: lattice_distribute(u, st),
            )
        return (
            lambda u: self._global_apply(u, coeff, Ls, base_elements, m),
            lambda y0: self._to_global(y0, base_elements),
            lambda u: distribute(u, base_elements),
        )

    def _coarse_solve_mg(self, b0, coeff, aux, Ls, base_elements, m):
        """Coarse solve via PCG on the exact level-0 operator in the GLOBAL
        base-node space, preconditioned by Chebyshev junction smoothing on
        the exact operator around an aux-hierarchy V-cycle correction
        (sigma-averaged operator on the coarsened box, solver/coarse.py).

        Replaces the reference's direct BaseLevel solve
        (src/multigrid.jl:74-93) when the base mesh is too large to factor.
        Running on [n_base_nodes] (vs the duplicated [E, d+1] layout) makes
        every PCG vector op ~20x smaller and removes the interface combine
        from each operator application (~10 ms each at a 196k-element base —
        this was most of the coarse-solve cost).
        """
        dinv = aux["dinv_g"] * m
        lam_max0 = aux["lam_max0"]

        Aop, to_g, dist = self._level0_ops(coeff, Ls, base_elements, m)

        def aux_correct(r):
            # global residual -> aux finest layout in local-contribution
            # form (whole nodal value on the first aux copy) -> aux V-cycle
            b_aux = r[aux["node_map"]] * aux["aux_first_mask"]
            x_a = jnp.zeros_like(b_aux)
            for _ in range(self.coarse_prec_cycles):
                x_a, _ = self.aux_solver._vcycle_impl(
                    x_a,
                    b_aux,
                    aux["coeff"],
                    aux["chol"],
                    aux["Ls"],
                    aux["base_elements"],
                    aux["interior_idx"],
                    aux["lam_max"],
                )
            # aux copies are interface-consistent: read any (the first)
            return x_a.reshape(-1)[aux["aux_first_flat"]] * m

        lam_min = lam_max0 / self.cheb_ratio
        theta = 0.5 * (lam_max0 + lam_min)
        delta = 0.5 * (lam_max0 - lam_min)

        def cheb(x, b, steps):
            # Jacobi-preconditioned Chebyshev on the global vector (same
            # recurrence as _smooth_chebyshev; dinv precomputed per setup)
            r = b - Aop(x)
            p = (1.0 / theta) * (dinv * r)
            x = x + p
            sig = theta / delta
            rho = 1.0 / sig
            for _ in range(steps - 1):
                r = b - Aop(x)
                rho_new = 1.0 / (2.0 * sig - rho)
                p = rho_new * rho * p + (2.0 * rho_new / delta) * (dinv * r)
                x = x + p
                rho = rho_new
            return x

        nu = self.coarse_prec_smooth

        def prec(r):
            # one MG cycle at level 0: Chebyshev smoothing on the EXACT
            # operator around the sigma-averaged aux correction (symmetric,
            # linear -> an SPD preconditioner)
            x1 = jnp.zeros_like(r)
            if nu > 0:
                x1 = cheb(x1, r, nu)
            x1 = x1 + aux_correct(r - Aop(x1))
            if nu > 0:
                x1 = cheb(x1, r, nu)
            return x1

        b = to_g(b0) * m
        x = jnp.zeros_like(b)
        r = b
        z = prec(r)
        p = z
        rz = jnp.vdot(r, z)
        rs = jnp.vdot(r, r)
        eps2 = jnp.asarray(self.coarse_mg_tol, b.dtype) ** 2 * (rs + 1e-300)

        def body(state):
            x, r, p, rz, rs, i = state
            Ap = Aop(p)
            alpha = self._safe_div(rz, jnp.vdot(p, Ap))
            x = x + alpha * p
            r = r - alpha * Ap
            z = prec(r)
            rz_new = jnp.vdot(r, z)
            p = z + self._safe_div(rz_new, rz) * p
            return x, r, p, rz_new, jnp.vdot(r, r), i + 1

        def cond(state):
            *_, rs_c, i = state
            return jnp.logical_and(rs_c > eps2, i < self.coarse_mg_maxiter)

        x, *_ = jax.lax.while_loop(cond, body, (x, r, p, rz, rs, 0))
        return dist(x)

    def _vcycle_impl(
        self, x_top, b_top, coeff, chol, Ls, base_elements, interior,
        lam_max=None, top=None,
    ):
        """One V-cycle; returns (x_top, r_finest).

        ``top`` (static) starts the cycle at a sub-finest level — the FMG
        initializer runs ascending-level V-cycles through this.

        Only the FINEST level's state crosses the jit interface: sub-top
        xs/bs are pure scratch (zeroed or overwritten every cycle), so they
        are allocated inside the trace — XLA reuses their buffers freely and
        they stop counting against peak HBM as persistent I/O (~0.6 GB at
        the 566M-DOF config that round 2 missed by ~0.5 GB).

        `coeff` is a single [E, P] array shared by all levels: the apply
        coefficients depend only on base-element geometry, sigma and lambda
        (the per-level reference stacks differ, the coefficients do not).
        `Ls` is the tuple of LevelDevice pytrees (arguments, not constants).
        `interior` is the coarse-solve interior payload: node-index array for
        coarse chol/inv, [N] bool interior-node mask for coarse cg/mg.
        """
        top = self.nlevels - 1 if top is None else top
        exact = self.smoother == "cg_exact"
        cheb = self.smoother in CHEBYSHEV_SMOOTHERS
        E_loc = x_top.shape[0]
        xs = [None] * self.nlevels
        bs = [None] * self.nlevels
        xs[top], bs[top] = x_top, b_top

        def descend(k):
            if k == 0:
                if self.coarse_kind == "chol":
                    xs[0] = self._coarse_solve_chol(bs[0], chol, base_elements, interior)
                elif self.coarse_kind == "inv":
                    xs[0] = self._coarse_solve_inv(bs[0], chol, base_elements, interior)
                elif self.coarse_kind == "mg":
                    xs[0] = self._coarse_solve_mg(bs[0], coeff, chol, Ls, base_elements, interior)
                else:
                    xs[0] = self._coarse_solve_cg(bs[0], coeff, Ls, base_elements, interior)
                return None
            steps = self.smoothing_steps if k == top else self.coarse_smoothing_steps
            if exact:
                # cg_exact maintains the local residual itself: restriction
                # reads it directly, skipping the extra local_residual apply
                # the reference structure pays (src/multigrid.jl:97-102)
                x, r_local = self._smooth_cg_exact(xs[k], bs[k], coeff, k=k, steps=steps, Ls=Ls)
            elif cheb:
                # the chebyshev smoothers maintain the local residual too
                x, r_local = self._smooth(xs[k], bs[k], coeff, k=k, steps=steps, Ls=Ls, lam_max=lam_max)
            else:
                x, _ = self._smooth(xs[k], bs[k], coeff, k=k, steps=steps, Ls=Ls, lam_max=lam_max)
                r_local = self._local_residual(
                    x, bs[k], coeff, k, Ls, precision=self.restrict_precision
                )
            bs[k - 1] = restrict(r_local, Ls[k].P_up)
            if k - 1 > 0:
                xs[k - 1] = jnp.zeros((E_loc, Ls[k - 1].stack.shape[1]), x.dtype)
            descend(k - 1)
            if self.cycle == "W" and k - 1 > 0:
                # second sub-cycle from the first's iterate (gamma = 2);
                # trace size grows 2^depth — fine at practical level counts
                descend(k - 1)
            x = prolong_add(x, xs[k - 1], Ls[k].P_up)
            if exact or cheb:
                smooth = (
                    (lambda *a, **kw: self._smooth_cg_exact(*a, **kw))
                    if exact
                    else (lambda *a, **kw: self._smooth(*a, **kw, lam_max=lam_max))
                )
                x, r_local = smooth(x, bs[k], coeff, k=k, steps=steps, Ls=Ls)
                xs[k] = x
                # only the finest residual is consumed (combined with the
                # constraint folded in, for reporting); lower post-smooth
                # residuals are dead values
                return self._combine_constrained(r_local, k, Ls) if k == top else None
            x, r = self._smooth(x, bs[k], coeff, k=k, steps=steps, Ls=Ls, lam_max=lam_max)
            xs[k] = x
            return r

        r_fine = descend(top)
        return xs[top], r_fine

    # ------------------------------------------------------------------ #
    # public API
    # ------------------------------------------------------------------ #
    def zero_states(self):
        """(x, b) zeros at the finest level — the only level whose state
        crosses the V-cycle interface (sub-top states are in-trace scratch)."""
        E = self.plan.base.nelements
        z = jnp.zeros((E, self.plan.n_local(self.nlevels - 1)), dtype=self.dtype)
        return z, z

    def _interior_payload(self):
        return (
            self.interior_idx
            if self.coarse_kind in ("chol", "inv")
            else self._interior_mask_N
        )

    def vcycle(self, x, b, coeff, chol=None, lam_max=None, Ls=None, interior=None):
        """One V-cycle: (x, b) -> (x, r_finest), both [E, n_local(finest)].

        ``x`` is donated on accelerator backends — rebind it to the returned
        value (callers iterating cycles already do).
        ``Ls`` / ``interior`` override the level arrays / coarse interior
        payload (the lattice-mode driver swaps per-step Dirichlet masks this
        way without recompiling)."""
        if chol is None:
            assert self.coarse_kind not in ("chol", "inv", "mg"), (
                "pass coarse_setup(sigma, lam) as chol"
            )
            chol = jnp.zeros((0, 0), dtype=self.dtype)
        if self.smoother in CHEBYSHEV_SMOOTHERS:
            assert lam_max is not None, "pass lam_max=estimate_lambda_max(coeff)"
        # 0.0 placeholder keeps the program signature uniform (only the
        # chebyshev smoothers read it; fmg does the same) — and lets the
        # slab solver, whose shard_map in_specs need a concrete array,
        # inherit this method verbatim
        lam_max = jnp.asarray(0.0 if lam_max is None else lam_max, self.dtype)
        return self._vcycle(
            x,
            b,
            coeff,
            chol,
            tuple(self.levels) if Ls is None else tuple(Ls),
            self.base_elements,
            self._interior_payload() if interior is None else interior,
            lam_max,
        )

    # ------------------------------------------------------------------ #
    # V-cycle-preconditioned (flexible) CG — the contrast-robust outer solve
    # ------------------------------------------------------------------ #
    def _pcg_rnorm(self, r, Ls):
        """Exact first-copy residual norm from a local-form residual —
        computed through Ls and self._vdot so it is valid inside the slab
        solver's shard_map (self.levels there is global, Ls shard-local)."""
        top = self.nlevels - 1
        rr = apply_mask(self._combine(r, top, Ls), Ls[top].first_copy_mask)
        return jnp.sqrt(self._vdot(rr, rr))

    def _pcg_init_impl(self, x, b, coeff, chol, Ls, base_elements, interior, lam_max):
        top = self.nlevels - 1
        r = self._local_residual(x, b, coeff, top, Ls)
        z, _ = self._vcycle_impl(
            jnp.zeros_like(x), r, coeff, chol, Ls, base_elements, interior, lam_max
        )
        rz = self._vdot(z, r)
        return x, r, z, rz, self._pcg_rnorm(r, Ls)

    def _pcg_step_impl(
        self, x, r, p, rz, coeff, chol, Ls, base_elements, interior, lam_max,
        flexible,
    ):
        # Exact global dots WITHOUT combines: for a consistent vector v
        # (same value on every interface copy) and a local-contribution
        # vector w, sum over all duplicated entries of v*w equals the true
        # global <v, assembled w> — each copy's partial contribution is
        # weighted by the same consistent value. p and z are consistent
        # (V-cycle output / combined updates); Ap and r stay in local form.
        top = self.nlevels - 1
        Ap = self._constrain(
            self._apply_op(p, coeff, top, Ls, precision=self.krylov_precision),
            top, Ls,
        )
        alpha = self._safe_div(rz, self._vdot(p, Ap))
        x = x + alpha * p
        r_new = r - alpha * Ap
        z, _ = self._vcycle_impl(
            jnp.zeros_like(x), r_new, coeff, chol, Ls, base_elements, interior,
            lam_max,
        )
        rz_new = self._vdot(z, r_new)
        # Flexible (Polak-Ribiere) beta tolerates a nonlinear/slightly
        # nonsymmetric preconditioner (cg/cg_exact smoothers, tolerance-
        # stopped coarse PCG); the classic beta assumes a fixed SPD V-cycle
        # (chebyshev smoothing + direct coarse solve).
        num = rz_new - self._vdot(z, r) if flexible else rz_new
        p = z + self._safe_div(num, rz) * p
        return x, r_new, p, rz_new, self._pcg_rnorm(r_new, Ls)

    def pcg(
        self, b, coeff, chol=None, lam_max=None, x=None, *, iters: int = 50,
        tol: float = 0.0, Ls=None, interior=None, flexible: bool | None = None,
    ):
        """Solve A u = b by V-cycle-preconditioned (flexible) CG.

        Krylov acceleration around the V-cycle: where the standalone V-cycle
        stalls under strong coefficient contrast (st1 fields at alpha=100
        contract at ~0.99/cycle), CG over the same preconditioner converges
        at ~sqrt(kappa(M^-1 A)) — the standard contrast-robust arrangement.
        One V-cycle plus one fine-level apply per iteration. Capability
        beyond the reference, which only ever iterates vcycle!
        (src/multigrid.jl:73-119) directly.

        ``b`` is the local (duplicated-contribution) rhs, like ``vcycle``'s.
        Requires the chebyshev smoother: polynomial smoothing keeps the
        V-cycle a fixed SPD operator. The cg/cg_exact-smoothed V-cycle is
        nonlinear and measured DIVERGENT as a CG preconditioner under
        contrast (tests/test_pcg.py) — construct a chebyshev solver for the
        outer solve instead. ``flexible`` (Polak-Ribiere beta) defaults to
        True when the coarse solve is tolerance-stopped PCG ("cg"/"mg" —
        mildly nonlinear) and False for direct coarse solves.
        Returns (x, history) with history = exact first-copy residual norms
        per iteration (index 0 = initial residual).
        """
        if chol is None:
            assert self.coarse_kind not in ("chol", "inv", "mg"), (
                "pass coarse_setup(sigma, lam) as chol"
            )
            chol = jnp.zeros((0, 0), dtype=self.dtype)
        assert self.smoother in CHEBYSHEV_SMOOTHERS, (
            "pcg needs a linear SPD preconditioner: construct the solver "
            "with smoother='chebyshev'/'chebyshev4' (cg smoothers make the "
            "V-cycle nonlinear — measured divergent as a CG preconditioner)"
        )
        assert lam_max is not None, "pass lam_max=estimate_lambda_max(coeff)"
        if flexible is None:
            flexible = self.coarse_kind not in ("chol", "inv")
        if not hasattr(self, "_pcg_cache"):
            self._pcg_cache = self._pcg_programs()
        init_jit, step_jits = self._pcg_cache
        step_jit = step_jits[bool(flexible)]
        Ls_t = tuple(self.levels) if Ls is None else tuple(Ls)
        inter = self._interior_payload() if interior is None else interior
        lam_max = jnp.asarray(lam_max, self.dtype)
        if x is None:
            x, _ = self.zero_states()
        x, r, p, rz, rn = init_jit(
            x, b, coeff, chol, Ls_t, self.base_elements, inter, lam_max
        )
        history = [float(rn)]
        for _ in range(iters):
            x, r, p, rz, rn = step_jit(
                x, r, p, rz, coeff, chol, Ls_t, self.base_elements, inter,
                lam_max,
            )
            history.append(float(rn))
            if tol and history[-1] <= tol * history[0]:
                break
        return x, history

    def pcg_stepper(
        self, coeff, chol=None, lam_max=None, *, flexible=None, Ls=None,
        interior=None,
    ):
        """Stepwise access to the pcg iteration: returns ``(init, step)``
        closures with ``init(b, x=None) -> state`` and
        ``step(state) -> state``; ``state = (x, r, p, rz, rn)`` where
        state[0] is the current iterate and state[4] the exact first-copy
        residual norm. The packaged :meth:`pcg` loop doesn't expose the
        iterates — the homogenization driver's ``inner="pcg"`` mode needs
        them to evaluate the sigma-increment integral between iterations
        (reference stopping rule, homogenized_coefficients.jl:269-290).
        Also works on the slab-sharded solver (it overrides
        ``_pcg_programs`` with shard_map forms of the same signatures)."""
        if chol is None:
            assert self.coarse_kind not in ("chol", "inv", "mg")
            chol = jnp.zeros((0, 0), dtype=self.dtype)
        assert self.smoother in CHEBYSHEV_SMOOTHERS, (
            "pcg needs a linear SPD preconditioner "
            "(smoother='chebyshev'/'chebyshev4')"
        )
        assert lam_max is not None, "pass lam_max=estimate_lambda_max(coeff)"
        if flexible is None:
            flexible = self.coarse_kind not in ("chol", "inv")
        if not hasattr(self, "_pcg_cache"):
            self._pcg_cache = self._pcg_programs()
        init_jit, step_jits = self._pcg_cache
        step_jit = step_jits[bool(flexible)]
        Ls_t = tuple(self.levels) if Ls is None else tuple(Ls)
        inter = self._interior_payload() if interior is None else interior
        lam_max = jnp.asarray(lam_max, self.dtype)

        def init(b, x=None):
            if x is None:
                x, _ = self.zero_states()
            return init_jit(
                x, b, coeff, chol, Ls_t, self.base_elements, inter, lam_max
            )

        def step(state):
            x, r, p, rz, _ = state
            return step_jit(
                x, r, p, rz, coeff, chol, Ls_t, self.base_elements, inter,
                lam_max,
            )

        return init, step

    def solve(
        self, b, sigma_el, lam: float = 0.0, *, tol: float = 1e-8,
        max_cycles: int = 100, method: str = "auto", x=None, verbose: bool = False,
    ):
        """One-call solve of (lam - div sigma grad) u = b to a relative
        residual tolerance: builds the coefficients and coarse setup,
        picks the iteration, runs it, returns (x, history).

        ``method``: "vcycle" (plain V-cycle iteration from x or zero),
        "fmg" (full-multigrid start, then V-cycles), "pcg" (V-cycle-
        preconditioned CG; requires the chebyshev smoother), "fmg+pcg",
        or "auto" = "fmg+pcg" for chebyshev solvers and "fmg" otherwise.
        The reference exposes no solve driver — its examples hand-roll the
        vcycle! loop (src/examples/homogenized_coefficients.jl:269).

        The body is the shared ``solve_driver`` — the sharded solvers run
        the identical driver over their own primitives.
        """
        return solve_driver(
            self, b, sigma_el, lam, tol=tol, max_cycles=max_cycles,
            method=method, x=x, verbose=verbose,
        )

    def initial_residual_norm(self, b, coeff, x=None, Ls=None):
        """Exact first-copy norm of the constrained combined residual
        b - A x (x=None means zero): the common normalization anchor for
        solve()'s history and st1_multigrid's tolerance."""
        top = self.nlevels - 1
        r = b if x is None else b - self._apply_op(x, coeff, top, Ls)
        return self.residual_norm(self._combine_constrained(r, top, Ls))

    # ------------------------------------------------------------------ #
    # full multigrid (F-cycle) initializer
    # ------------------------------------------------------------------ #
    def _fmg_impl(
        self, b_top, coeff, chol, Ls, base_elements, interior, lam_max, nu,
    ):
        top = self.nlevels - 1
        bs = [None] * self.nlevels
        bs[top] = b_top
        for k in range(top, 0, -1):
            bs[k - 1] = restrict(self._constrain(bs[k], k, Ls), Ls[k].P_up)
        if self.coarse_kind == "chol":
            x = self._coarse_solve_chol(bs[0], chol, base_elements, interior)
        elif self.coarse_kind == "inv":
            x = self._coarse_solve_inv(bs[0], chol, base_elements, interior)
        elif self.coarse_kind == "mg":
            x = self._coarse_solve_mg(bs[0], coeff, chol, Ls, base_elements, interior)
        else:
            x = self._coarse_solve_cg(bs[0], coeff, Ls, base_elements, interior)
        r = None
        for k in range(1, top + 1):
            x = prolong_add(
                jnp.zeros((b_top.shape[0], Ls[k].stack.shape[1]), b_top.dtype),
                x, Ls[k].P_up,
            )
            for _ in range(nu):
                x, r = self._vcycle_impl(
                    x, bs[k], coeff, chol, Ls, base_elements, interior,
                    lam_max, top=k,
                )
        return x, r

    def fmg(
        self, b, coeff, chol=None, lam_max=None, nu: int = 1, Ls=None,
        interior=None,
    ):
        """Full-multigrid (F-cycle) initializer: restrict the rhs down the
        hierarchy, solve at the base, then ascend — prolong and run ``nu``
        V-cycles per level. Returns (x, r_finest) like ``vcycle``.

        The ascent's sub-top V-cycles cost a geometric tail (~1/8 per level
        down in 3D), so one fmg sweep costs ~1.14 fine V-cycles at nu=1 and
        lands x at ~discretization-level algebraic error — replacing several
        fine V-cycle iterations from a zero start. The reference only ever
        iterates vcycle! from x=0 (src/multigrid.jl:73-119;
        src/examples/homogenized_coefficients.jl:269) — capability beyond.
        """
        if chol is None:
            assert self.coarse_kind not in ("chol", "inv", "mg"), (
                "pass coarse_setup(sigma, lam) as chol"
            )
            chol = jnp.zeros((0, 0), dtype=self.dtype)
        assert nu >= 1, "fmg needs at least one V-cycle per ascent level"
        assert self.nlevels >= 2, "fmg needs a hierarchy"
        if self.smoother in CHEBYSHEV_SMOOTHERS:
            assert lam_max is not None, "pass lam_max=estimate_lambda_max(coeff)"
        # 0.0 placeholder keeps the (sharded) program signature uniform;
        # only the chebyshev smoother reads it, and it asserts above
        lam_max = jnp.asarray(0.0 if lam_max is None else lam_max, self.dtype)
        if not hasattr(self, "_fmg_jits"):
            self._fmg_jits = {}
        nu = int(nu)
        if nu not in self._fmg_jits:
            self._fmg_jits[nu] = self._fmg_program(nu)
        return self._fmg_jits[nu](
            b,
            coeff,
            chol,
            tuple(self.levels) if Ls is None else tuple(Ls),
            self.base_elements,
            self._interior_payload() if interior is None else interior,
            lam_max,
        )

    def _fmg_program(self, nu: int):
        """One jitted FMG sweep for a fixed nu — overridden by the slab
        solver with a shard_map-wrapped version of the same impl."""

        def body(b, coeff, chol, Ls, elements, interior, lam_max):
            return self._fmg_impl(
                b, coeff, chol, Ls, elements, interior, lam_max, nu
            )

        return jax.jit(body)

    def _pcg_programs(self):
        """(init_jit, {flexible: step_jit}) — overridden by the slab solver
        with shard_map-wrapped versions of the same impls."""
        donate = () if jax.default_backend() == "cpu" else (0, 1, 2)

        def mk(fl):
            def body(x, r, p, rz, coeff, chol, Ls, elements, interior, lam_max):
                return self._pcg_step_impl(
                    x, r, p, rz, coeff, chol, Ls, elements, interior, lam_max, fl
                )

            return jax.jit(body, donate_argnums=donate)

        return jax.jit(self._pcg_init_impl), {fl: mk(fl) for fl in (False, True)}

    def _mixed_pcg_programs(self, inner):
        """(init_jit, step_jit) for ``mixed_precision_pcg`` — overridden by
        the slab solver with shard_map-wrapped versions of the same impls.
        Donation rationale: three loop-carried [E, n_local] f64 vectors
        double-buffered would cost ~4.5 GB extra peak at 190M DOFs."""
        init_impl, step_impl = _mixed_pcg_impls(self, inner)
        donate = () if jax.default_backend() == "cpu" else (0, 1, 2)
        return (
            jax.jit(init_impl, donate_argnums=donate[:1]),
            jax.jit(step_impl, donate_argnums=donate),
        )

    def combine(self, x, k=None):
        """Interface combine with the solver's configured form (public:
        callers must not reach for level slot tables — only the selected
        combine form's tables are resident on device)."""
        k = self.nlevels - 1 if k is None else k
        return self._combine(x, k)

    def residual_norm(self, r, k=None):
        """Norm with each fine DOF counted once (reference:
        zero_out_all_but_one! + norm, src/implicit_fine_grid.jl:334-386)."""
        k = self.nlevels - 1 if k is None else k
        rr = apply_mask(r, self.levels[k].first_copy_mask)
        return jnp.sqrt(jnp.vdot(rr, rr))


def solve_driver(
    solver, b, sigma_el, lam: float = 0.0, *, tol: float = 1e-8,
    max_cycles: int = 100, method: str = "auto", x=None, verbose: bool = False,
):
    """The one-call tolerance-driven solve, written against the common
    solver surface (coefficients / coarse_setup / estimate_lambda_max /
    residual_norm / initial_residual_norm / zero_states / fmg / pcg /
    vcycle) so MultigridSolver, ShardedMultigridSolver, and the slab
    solver all run the SAME driver — one place for the stopping logic and
    its normalization."""
    if method == "auto":
        if x is not None:
            # fmg is a from-scratch initializer — a warm start skips it
            method = "pcg" if solver.smoother in CHEBYSHEV_SMOOTHERS else "vcycle"
        else:
            method = "fmg+pcg" if solver.smoother in CHEBYSHEV_SMOOTHERS else "fmg"
    coeff = solver.coefficients(sigma_el, lam)
    setup = solver.coarse_setup(sigma_el, lam)
    lam_max = (
        solver.estimate_lambda_max(coeff)
        if solver.smoother in CHEBYSHEV_SMOOTHERS
        else None
    )
    b_norm = float(solver.residual_norm(b))
    if b_norm == 0.0:
        # zero rhs: the solution is zero (or the caller's x is already
        # exact in the constrained subspace); avoid the 0/0 history
        return (solver.zero_states()[0] if x is None else x), [0.0]
    if x is None and method in ("vcycle", "pcg"):
        x, _ = solver.zero_states()
    # history[0] = the TRUE initial relative residual — every stopping
    # test below is history[-1] <= tol against this same normalization
    # (||first-copy of constrain(combine(b - A x0))|| / ||first-copy b||)
    history = [float(solver.initial_residual_norm(b, coeff, x=x)) / b_norm]
    if verbose:
        print(f"initial: rel residual {history[0]:.3e}", flush=True)
    if history[0] <= tol:
        # already converged: never fall through with x=None
        return (solver.zero_states()[0] if x is None else x), history
    if method in ("fmg", "fmg+pcg"):
        # fmg rebuilds x from the restricted rhs alone — it would silently
        # discard a caller's warm start (method="auto" routes x= to
        # pcg/vcycle above; an explicit fmg request with x= is a mistake)
        assert x is None, (
            "method includes 'fmg', which starts from scratch and would "
            "ignore x=; drop x= or use method='pcg'/'vcycle'"
        )
        x, r = solver.fmg(b, coeff, setup, lam_max=lam_max)
        history.append(float(solver.residual_norm(r)) / b_norm)
        if verbose:
            print(f"fmg: rel residual {history[-1]:.3e}", flush=True)
    if method in ("pcg", "fmg+pcg"):
        if history[-1] > tol:
            # pcg stops relative to ITS OWN start residual, which in
            # this normalization is history[-1]
            x, hist_p = solver.pcg(
                b, coeff, setup, lam_max=lam_max, x=x,
                iters=max_cycles, tol=tol / history[-1],
            )
            history.extend(h / b_norm for h in hist_p[1:])
            if verbose:
                print(f"pcg: rel residual {history[-1]:.3e} "
                      f"after {len(hist_p) - 1} iters", flush=True)
    else:
        while len(history) - 1 < max_cycles and history[-1] > tol:
            x, r = solver.vcycle(x, b, coeff, setup, lam_max=lam_max)
            history.append(float(solver.residual_norm(r)) / b_norm)
            if verbose:
                print(
                    f"cycle {len(history) - 1}: rel residual "
                    f"{history[-1]:.3e}",
                    flush=True,
                )
    return x, history


def mixed_precision_setup(
    outer: MultigridSolver, inner: MultigridSolver, sigma_el, lam: float = 0.0
):
    """Precompute mixed_precision_pcg's per-coefficient state (both
    solvers' coefficients, the inner coarse setup, the 30-iteration
    lam_max power iteration, the combine multiplicities) once, so repeated
    calls — a warm-up followed by a timed run, or several rhs with one
    conductivity field — don't redo it. Pass the result as ``setup=``.

    Works for any matched solver pair: two single-device solvers, or two
    slab-sharded solvers on one device mesh (everything here goes through
    the solvers' public, sharding-aware entry points)."""
    assert type(outer) is type(inner), (
        "outer and inner must be the same solver kind (both single-device "
        "or both slab-sharded)"
    )
    coeff_o = outer.coefficients(sigma_el, lam)
    coeff_i = inner.coefficients(sigma_el, lam)
    chol_i = inner.coarse_setup(sigma_el, lam)
    lam_max_i = jnp.asarray(inner.estimate_lambda_max(coeff_i), inner.dtype)
    Ls_o = tuple(outer.levels)
    # 1/multiplicity per slot: combine(ones) counts the duplicates.
    # zero_states()[0] + 1 (not jnp.ones) keeps the slab sharding; .combine
    # is the public form (eager single-device, jitted shard_map on the slab).
    # Stored at INNER precision: it scales the already-combined (assembled-
    # scale) residual right at the downcast boundary, so f32 rounding here
    # only perturbs the preconditioner input (flexible PCG absorbs it) —
    # and the [E, n_local] f64 table was 1.5 GB of the 190M-DOF HBM budget.
    inv_mult = (1.0 / outer.combine(outer.zero_states()[0] + 1.0)).astype(
        inner.dtype
    )
    return (
        inv_mult, coeff_o, Ls_o, coeff_i, chol_i, tuple(inner.levels),
        inner.base_elements, inner._interior_payload(), lam_max_i,
    )


def _mixed_pcg_impls(outer: MultigridSolver, inner: MultigridSolver):
    """The (init, step) bodies of mixed_precision_pcg, written against the
    solvers' overridable primitives so they are valid both under plain jit
    (single-device) and inside shard_map (slab solver — every dot/norm goes
    through ``_vdot``/psum, the combine through the slab's halo form)."""
    top = outer.nlevels - 1

    def precond(r, im, co_i, ch_i, ls_i, els, it_i, lm_i, ls_o):
        # re-express at the assembled scale BEFORE the downcast
        # (mixed_precision_pcg docstring): the combine(r) entries are
        # assembled-scale sums, so casting right after it is safe, and the
        # 1/multiplicity rescale then runs at inner precision (im is stored
        # at inner dtype — see mixed_precision_setup)
        rs = outer._combine(r, top, ls_o).astype(inner.dtype) * im
        z, _ = inner._vcycle_impl(
            jnp.zeros(r.shape, inner.dtype), rs,
            co_i, ch_i, ls_i, els, it_i, lm_i,
        )
        return z.astype(outer.dtype)

    def init(x, b, im, co_o, ls_o, co_i, ch_i, ls_i, els, it_i, lm_i):
        r = outer._local_residual(x, b, co_o, top, ls_o)
        z = precond(r, im, co_i, ch_i, ls_i, els, it_i, lm_i, ls_o)
        rz = outer._vdot(z, r)
        return x, r, z, rz, outer._pcg_rnorm(r, ls_o)

    def step(x, r, p, rz, im, co_o, ls_o, co_i, ch_i, ls_i, els, it_i, lm_i):
        # exact dots without combines: p/z consistent, Ap/r local
        # (see _pcg_step_impl for the identity)
        Ap = outer._constrain(outer._apply_op(p, co_o, top, ls_o), top, ls_o)
        alpha = outer._safe_div(rz, outer._vdot(p, Ap))
        x = x + alpha * p
        r_new = r - alpha * Ap
        z = precond(r_new, im, co_i, ch_i, ls_i, els, it_i, lm_i, ls_o)
        rz_new = outer._vdot(z, r_new)
        num = rz_new - outer._vdot(z, r)  # flexible beta
        p = z + outer._safe_div(num, rz) * p
        return x, r_new, p, rz_new, outer._pcg_rnorm(r_new, ls_o)

    return init, step


def mixed_precision_pcg(
    outer: MultigridSolver,
    inner: MultigridSolver,
    b,
    sigma_el=None,
    lam: float = 0.0,
    *,
    x=None,
    iters: int = 200,
    tol: float = 1e-12,
    setup=None,
    keep_best: bool = True,
    divergence_stop: int = 3,
):
    """Iterative-refinement PCG: a high-precision Krylov loop around a
    low-precision V-cycle preconditioner.

    ``outer`` holds the Krylov state (x, r, p) and computes the fine-level
    operator apply and all dot products at its dtype (float64); ``inner`` is
    a chebyshev-smoothed solver on the SAME plan whose V-cycle runs at its
    own dtype (float32) — each iteration casts the f64 residual down, runs
    one f32 V-cycle, and casts the correction back up. Because the f32
    cycle only has to *reduce* the error (not represent the solution), the
    iteration converges to the f64 floor at mostly-f32 cost: one emulated-
    f64 apply + BLAS-1 per iteration vs the cycle's ~8 f32 applies. This
    breaks the measured f32 V-cycle floor (~9.4e-4 relative at 190M DOFs,
    PERFORMANCE.md) without paying full-f64 V-cycles, a capability the
    reference gets for free from CPU float64 (src/multigrid.jl:46-71) but a
    TPU framework has to engineer.

    The downcast must NOT be applied to the raw local-form residual. Local
    (duplicated-contribution) entries stay O(|b|) even at convergence —
    only their duplicate-sums vanish — so ``r.astype(f32)`` corrupts the
    assembled content at O(eps32 * local-entry scale), flooring the whole
    iteration at ~1e-7 relative (measured; the dominant error is created at
    the cast, before the f32 cycle runs). Instead the residual handed to
    the preconditioner is re-expressed at the assembled scale: combine the
    duplicates in f64 and split the sum equally back across them
    (``combine(r) / combine(ones)``) — exactly the same assembled vector,
    but with entries O(assembled residual), so the cast loses only relative
    precision and the loop reaches ~5e-15 relative (tests/test_mixed_pcg.py).
    In assembled coordinates the preconditioner is unchanged, so it stays
    SPD and plain (non-flexible) beta semantics would still hold; flexible
    beta is kept for the casting noise.

    The beta is flexible (Polak-Ribiere): casting + the tolerance-stopped
    coarse solve make the preconditioner slightly nonlinear.

    ``b`` is the f64 local (duplicated-contribution) rhs. Returns
    ``(x, history)`` with history = exact first-copy residual norms, entry
    0 = initial. Stops when ``history[-1] <= tol * history[0]``.

    Past its attainable floor the flexible recurrence is UNSTABLE, not
    stagnant: measured on TPU (emulated-f64 apply, 23.8M DOFs) the
    iteration reached rel 7.4e-10 at iteration 17 and then diverged
    geometrically (~4.2x/iteration) once beta ratios became rounding
    noise — a ``tol`` below the floor would return garbage. The guard
    (``keep_best``, default on): the best iterate is snapshotted on each
    new minimum (one device copy of x, only while still improving), and
    after ``divergence_stop`` consecutive non-improving iterations the
    loop stops and returns the best iterate. The initial transient
    (residual rises ~5x at iteration 1 before contracting) survives the
    default of 3. ``keep_best=False`` skips the snapshot for callers at
    the single-chip HBM edge (one extra outer-dtype state array).

    The jitted init/step programs are cached on ``outer`` per inner solver,
    and ``setup=mixed_precision_setup(...)`` lets repeated calls (warm-up
    then timed, or several rhs on one field) skip the coefficient/coarse/
    lam_max precompute; with ``setup`` given, ``sigma_el`` is unused.

    Sharded: pass two ``SlabShardedMultigridSolver`` on the same device
    mesh — the programs come from the slab's ``_mixed_pcg_programs``
    override (shard_map-wrapped same impls: the multiplicity-rescaled
    downcast runs shard-locally on the halo-extended combine, every dot is
    a psum) and the f64 Krylov state stays slab-sharded end to end.
    """
    assert outer.plan is inner.plan, "solvers must share one GridPlan"
    assert type(outer) is type(inner), (
        "outer and inner must be the same solver kind (both single-device "
        "or both slab-sharded)"
    )
    assert getattr(outer, "mesh", None) is getattr(inner, "mesh", None), (
        "slab solvers must share one jax.sharding.Mesh"
    )
    assert inner.smoother in CHEBYSHEV_SMOOTHERS, (
        "the inner V-cycle must be a linear SPD preconditioner "
        "(smoother='chebyshev'); cg smoothers are nonlinear — measured "
        "divergent under outer CG (tests/test_pcg.py)"
    )
    assert jnp.dtype(outer.dtype).itemsize > jnp.dtype(inner.dtype).itemsize, (
        "outer must run at higher precision than inner"
    )
    if setup is None:
        assert sigma_el is not None, "pass sigma_el or setup="
        setup = mixed_precision_setup(outer, inner, sigma_el, lam)

    cache = outer.__dict__.setdefault("_mixed_pcg_cache", {})
    key = id(inner)
    if key not in cache:
        # hold a strong ref to inner so the id() key cannot be recycled
        cache[key] = (*outer._mixed_pcg_programs(inner), inner)
    init, step, _ = cache[key]

    if x is None:
        x, _ = outer.zero_states()
    (inv_mult, coeff_o, Ls_o, coeff_i, chol_i, Ls_i, els_i, inter_i,
     lam_max_i) = setup
    args = (inv_mult, coeff_o, Ls_o, coeff_i, chol_i, Ls_i,
            els_i, inter_i, lam_max_i)
    x, r, p, rz, rn = init(x, b, *args)
    history = [float(rn)]
    best_rn, x_best, worse = history[0], None, 0
    for _ in range(iters):
        x, r, p, rz, rn = step(x, r, p, rz, *args)
        history.append(float(rn))
        if tol and history[-1] <= tol * history[0]:
            break
        if keep_best:
            if history[-1] < best_rn:
                # snapshot BEFORE the next step donates this buffer away
                best_rn, x_best, worse = history[-1], jnp.copy(x), 0
            else:
                worse += 1
                if worse >= divergence_stop:
                    break
    if keep_best and x_best is not None and best_rn < history[-1]:
        x = x_best
    return x, history
