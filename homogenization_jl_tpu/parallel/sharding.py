"""Element-axis sharding of the implicit fine grid (device mesh, shard_map).

The reference's only parallel axis is base elements (round-robin threads,
src/apply_local_operators.jl:40-46); here the same axis becomes the sharded
leading dimension of every [E, n_local] state array over a 1D
``jax.sharding.Mesh``. Everything except the interface combine is
embarrassingly parallel:

  * element apply / transfer / masks: local dense math per shard;
  * CG dot products: local vdot + psum over ICI;
  * interface combine: split per level into
      - *intra-shard* groups (all copies of a fine DOF live on one shard):
        local gather -> segment_sum -> scatter, zero communication;
      - *cross-shard* groups (the shard-boundary "halo", O(surface)):
        each shard computes partial sums into a replicated [G_cross] vector,
        one psum over the mesh, then scatters back. This is the TPU-native
        equivalent of the reference's broadcast_interfaces!
        (src/implicit_fine_grid.jl:209-328) across address spaces — which the
        reference does not have at all (threads share memory).
  * coarse solve: the base-mesh rhs is psum-reduced to a replicated vector,
    solved identically on every shard (tiny), and redistributed locally.

Padding: E is padded to a multiple of the shard count with inert elements
(zero coefficients, zero masks, out-of-range scatter slots that XLA drops).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.plan import GridPlan
from ..solver.multigrid import CHEBYSHEV_SMOOTHERS, MultigridSolver

AXIS = "e"


# ---------------------------------------------------------------------------
# host: split combine tables into intra-shard / cross-shard parts
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class ShardedLevelTables:
    """Per-level cross-shard tables; leading-axis-[n_shards] arrays.

    Only the CROSS part of the interface topology needs per-DOF flat
    indices (O(surface)); the intra-shard combine runs on the cell-granular
    gather tables (build_sharded_gather_tables), so no O(volume) slot
    expansion exists anywhere on this path."""

    cross_gather: np.ndarray  # [S, C] local flat idx for gather (pad -> 0)
    cross_scatter: np.ndarray  # [S, C] local flat idx (pad -> OOR, dropped)
    cross_group: np.ndarray  # [S, C] global cross-group id (pad -> trash)
    n_cross_groups: int  # static (+1 trash)


def _pad_rows(rows: list, pad_val: int, width: int | None = None) -> np.ndarray:
    width = max((len(r) for r in rows), default=0) if width is None else width
    out = np.full((len(rows), max(width, 1)), pad_val, dtype=np.int64)
    for s, r in enumerate(rows):
        out[s, : len(r)] = r
    return out


def build_sharded_tables(
    plan: GridPlan, level: int, n_shards: int, E_pad: int
) -> ShardedLevelTables:
    """Cross-shard interface tables derived from the gather (owner) tables.

    A group is cross-shard iff its valid owners' elements span more than
    one block of the element partition. For each such group, every valid
    owner cell (element e, local cell l) expands to its ``width``
    consecutive flat columns in the owning shard's local block — these are
    both the gather sources (partial-sum inputs) and scatter targets
    (every copy receives the psum-med total). O(surface) work and storage;
    the plan's per-DOF slot tables (``slot_tables=True``) are NOT needed —
    the round-2 verdict's flat-slot requirement is gone from this path too
    (the slab solver never had it)."""
    lp = plan.levels[level]
    lay = plan.reference.layout[level]
    assert lay is not None, "sharded combine needs the contiguous layout"
    n_local = plan.n_local(level)
    B = E_pad // n_shards
    size_local = B * n_local  # flat size of one shard's block

    specs = []
    if lp.gather.face is not None:
        specs.append((lp.gather.face, lay.face_offsets, lay.npf))
    if lp.gather.edge is not None and lay.npe > 0:
        specs.append((lp.gather.edge, lay.edge_offsets, lay.npe))
    if lp.gather.corner is not None:
        specs.append((lp.gather.corner, lay.corner_cols, 1))

    cr_g = [[] for _ in range(n_shards)]
    cr_grp = [[] for _ in range(n_shards)]
    next_id = 0
    for (oe, ol, om, _gmap), offsets, width in specs:
        valid = om > 0
        oe64 = oe.astype(np.int64)
        sh = oe64 // B
        mn = np.where(valid, sh, n_shards).min(axis=1)
        mx = np.where(valid, sh, -1).max(axis=1)
        gi = np.nonzero((mx >= 0) & (mn != mx))[0]  # cross groups
        if len(gi) == 0:
            continue
        # one psum segment per (cell group, in-cell position): position i
        # of every owner cell is the SAME fine DOF (the plan's canonical
        # in-cell order aligns owner columns — what the cell-granular
        # gather combine's elementwise owner sum relies on too)
        base_ids = next_id + np.arange(len(gi), dtype=np.int64) * width
        next_id += len(gi) * width
        rsel, jsel = np.nonzero(valid[gi])  # (cross group, valid owner)
        e = oe64[gi[rsel], jsel]
        l = ol[gi[rsel], jsel].astype(np.int64)
        s = e // B
        offs = np.asarray(offsets, dtype=np.int64)
        base = (e - s * B) * n_local + offs[l]  # [K]
        pos = np.arange(width, dtype=np.int64)
        flat = (base[:, None] + pos).ravel()
        grp = (base_ids[rsel][:, None] + pos).ravel()
        # one stable sort by shard instead of n_shards boolean passes
        s_w = np.repeat(s, width)
        order = np.argsort(s_w, kind="stable")
        bounds = np.searchsorted(s_w[order], np.arange(n_shards + 1))
        flat_o, grp_o = flat[order], grp[order]
        for s_i in range(n_shards):
            sl = slice(bounds[s_i], bounds[s_i + 1])
            cr_g[s_i].append(flat_o[sl])
            cr_grp[s_i].append(grp_o[sl])

    cat = lambda rows: [
        np.concatenate(r) if r else np.empty(0, dtype=np.int64) for r in rows
    ]
    cr_g = cat(cr_g)
    cr_grp = cat(cr_grp)
    return ShardedLevelTables(
        cross_gather=_pad_rows(cr_g, 0),
        cross_scatter=_pad_rows(cr_g, size_local),  # OOR pad -> dropped
        cross_group=_pad_rows(cr_grp, next_id),
        n_cross_groups=next_id + 1,
    )


def build_sharded_gather_tables(plan: GridPlan, level: int, n_shards: int, E_pad: int):
    """Per-shard gather-combine tables (see ops/plan.py GatherCombineTables).

    Each shard keeps every cell its block touches, with owner lists masked to
    in-shard owners only — local cells get complete sums, cross-shard cells
    partial ones; the flat cross-group psum fix-up (ShardedLevelTables)
    overwrites the partials with globally summed values afterwards. All
    arrays are padded to common shapes with a leading [n_shards] axis.
    Returns {class: (oe [S,Gmax,M], ol, om, gmap [S,B,L])} with class absent
    when the level has no such DOFs.
    """
    B = E_pad // n_shards
    E = plan.base.nelements
    gt = plan.levels[level].gather
    out = {}
    for name in ("face", "edge", "corner"):
        tabs = getattr(gt, name)
        if tabs is None:
            continue
        o_elem, o_local, o_mask, gmap = tabs
        L = gmap.shape[1]
        M = o_elem.shape[1]
        ncells = o_elem.shape[0]
        gmap_pad = np.zeros((E_pad, L), dtype=np.int64)
        gmap_pad[:E] = gmap
        # fully vectorized over shards (the round-3 per-shard np.unique
        # loop was O(S) host passes — it dominated table build at S=64):
        # key = shard * ncells + cell; one global unique gives every
        # shard's sorted touched-cell list (grouped by shard, cells sorted
        # within — identical to per-shard np.unique), `inv` gives every
        # entry's rank, and rank - shard_start is the per-shard local id.
        s_of_row = np.arange(E_pad, dtype=np.int64) // B
        keys = s_of_row[:, None] * ncells + gmap_pad
        uk, inv = np.unique(keys, return_inverse=True)
        us = uk // ncells  # shard of each unique (shard, cell)
        ucell = uk % ncells
        start = np.searchsorted(us, np.arange(n_shards, dtype=np.int64))
        counts = np.diff(np.append(start, len(uk)))
        Gmax = int(counts.max())
        GM = (inv.reshape(E_pad, L) - start[s_of_row][:, None]).astype(
            np.int32
        ).reshape(n_shards, B, L)
        pos = np.arange(len(uk), dtype=np.int64) - start[us]
        lo = (us * B)[:, None]
        oe_u = o_elem[ucell].astype(np.int64)
        in_shard = (oe_u >= lo) & (oe_u < lo + B)
        OE = np.zeros((n_shards, Gmax, M), dtype=np.int32)
        OL = np.zeros((n_shards, Gmax, M), dtype=np.int32)
        # bool owner mask: 8x less HBM than the f64 round-1 form; the
        # combine's einsum casts to the state dtype on the fly
        OM = np.zeros((n_shards, Gmax, M), dtype=bool)
        OE[us, pos] = np.where(in_shard, oe_u - lo, 0)
        OL[us, pos] = o_local[ucell]
        OM[us, pos] = (o_mask[ucell] > 0) & in_shard
        out[name] = (OE, OL, OM, GM)
    return out


def _pad_elems(a: np.ndarray, E_pad: int, fill=0.0):
    pad = E_pad - a.shape[0]
    if pad == 0:
        return a
    return np.concatenate(
        [a, np.full((pad,) + a.shape[1:], fill, dtype=a.dtype)], axis=0
    )


# ---------------------------------------------------------------------------
# the sharded solver
# ---------------------------------------------------------------------------
class ShardedMultigridSolver:
    """MultigridSolver over a 1D device mesh, element axis sharded.

    Public API mirrors MultigridSolver: states are global (padded) arrays
    with NamedSharding; ``vcycle`` is one jitted shard_map program.
    """

    def __init__(
        self,
        plan: GridPlan,
        mesh: Mesh,
        dtype=jnp.float32,
        smoothing_steps: int = 3,
        coarse_smoothing_steps: int = 2,
        coarse: str = "chol",
        coarse_cg_tol: float = 1e-10,
        coarse_cg_maxiter: int = 200,
        smoother: str = "cg",
        cheb_ratio: float = 30.0,
        coarse_mg_tol: float = 1e-8,
        coarse_mg_maxiter: int = 40,
        coarse_prec_cycles: int = 1,
        coarse_prec_smooth: int = 2,
        coarse_mg_dense_limit: int = 4000,
        apply_precision=None,
    ):
        assert len(mesh.axis_names) == 1 and mesh.axis_names[0] == AXIS
        self.plan = plan
        self.mesh = mesh
        self.dtype = dtype
        self.nlevels = plan.nlevels
        self.smoothing_steps = smoothing_steps
        self.coarse_smoothing_steps = coarse_smoothing_steps
        self.coarse_kind = coarse
        self.coarse_cg_tol = coarse_cg_tol
        self.coarse_cg_maxiter = coarse_cg_maxiter
        self.smoother = smoother
        self.cheb_ratio = cheb_ratio
        self.coarse_mg_tol = coarse_mg_tol
        self.coarse_mg_maxiter = coarse_mg_maxiter
        self.coarse_prec_cycles = coarse_prec_cycles
        self.coarse_prec_smooth = coarse_prec_smooth

        S = mesh.devices.size
        E = plan.base.nelements
        self.n_shards = S
        self.E_pad = ((E + S - 1) // S) * S
        self.E = E

        # reuse the dense per-level reference stacks from the single-chip
        # path; for coarse="mg" the inner solver also owns the aux hierarchy
        inner = MultigridSolver(
            plan,
            dtype=dtype,
            coarse="mg" if coarse == "mg" else "cg",
            coarse_mg_tol=coarse_mg_tol,
            coarse_mg_maxiter=coarse_mg_maxiter,
            coarse_prec_cycles=coarse_prec_cycles,
            coarse_prec_smooth=coarse_prec_smooth,
            coarse_mg_dense_limit=coarse_mg_dense_limit,
            apply_precision=apply_precision,
        )
        self.apply_precision = inner.apply_precision
        self._np_dtype = np.dtype(jnp.dtype(dtype).name)

        self.sharding = NamedSharding(mesh, P(AXIS, None))
        self.replicated = NamedSharding(mesh, P())

        def dev(a, spec):
            return jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))

        valid = np.zeros(self.E_pad)
        valid[:E] = 1.0
        self.valid_mask = dev(valid, P(AXIS))
        self.row_layout = inner.row_layout

        self.levels = []
        for k in range(self.nlevels):
            lp = plan.levels[k]
            tabs = build_sharded_tables(plan, k, S, self.E_pad)
            gtabs = build_sharded_gather_tables(plan, k, S, self.E_pad)
            gdev = {
                name: tuple(
                    dev(a, P(AXIS, *([None] * (a.ndim - 1)))) for a in arrs
                )
                for name, arrs in gtabs.items()
            }
            self.levels.append(
                dict(
                    gather=gdev,
                    stack=dev(inner.levels[k].stack, P()),
                    boundary_mask=dev(
                        _pad_elems(lp.boundary_mask, self.E_pad), P(AXIS, None)
                    ),
                    first_copy_mask=dev(
                        _pad_elems(lp.first_copy_mask, self.E_pad), P(AXIS, None)
                    ),
                    P_up=dev(inner.levels[k].P_up, P()) if k > 0 else None,
                    cross_gather=dev(tabs.cross_gather, P(AXIS, None)),
                    cross_scatter=dev(tabs.cross_scatter, P(AXIS, None)),
                    cross_group=dev(tabs.cross_group, P(AXIS, None)),
                    n_cross_groups=tabs.n_cross_groups,
                )
            )

        self.base_elements = dev(
            _pad_elems(plan.base.elements.astype(np.int32), self.E_pad, fill=0),
            P(AXIS, None),
        )
        self.n_base_nodes = plan.base.nnodes
        self.interior_idx = dev(plan.interior_base_nodes.astype(np.int32), P())
        self._inner = inner

        self._power_fn = {}
        self._vcycle = jax.jit(self._make_vcycle())

    # -- coefficients / coarse factor (host) ------------------------------ #
    def coefficients(self, sigma_el, lam: float):
        c = self._inner.coefficients(sigma_el, lam)
        return jax.device_put(
            jnp.asarray(_pad_elems(np.asarray(c), self.E_pad)), self.sharding
        )

    def coarse_cholesky(self, sigma_el, lam: float):
        return jax.device_put(self._inner.coarse_cholesky(sigma_el, lam), self.replicated)

    def coarse_setup(self, sigma_el, lam: float):
        """Replicated coarse-solve payload (see MultigridSolver.coarse_setup):
        base-mesh vectors/hierarchies are O(N_base), tiny next to the fine
        levels, so every shard carries and solves them identically."""
        if self.coarse_kind == "chol":
            return self.coarse_cholesky(sigma_el, lam)
        if self.coarse_kind == "inv":
            return jax.device_put(
                self._inner.coarse_inverse(sigma_el, lam), self.replicated
            )
        if self.coarse_kind == "cg":
            return jax.device_put(
                jnp.zeros((0, 0), dtype=self.dtype), self.replicated
            )
        return jax.device_put(self._inner.coarse_setup(sigma_el, lam), self.replicated)

    def zero_states(self):
        z = jax.device_put(
            jnp.zeros(
                (self.E_pad, self.plan.n_local(self.nlevels - 1)), dtype=self.dtype
            ),
            self.sharding,
        )
        return z, z

    def put(self, x_np, level=None):
        """Pad + shard a global element-leading array ([E, n_local] or [E])."""
        x_np = _pad_elems(np.asarray(x_np, dtype=self._np_dtype), self.E_pad)
        spec = P(AXIS, *([None] * (x_np.ndim - 1)))
        return jax.device_put(jnp.asarray(x_np), NamedSharding(self.mesh, spec))

    # -- traced building blocks (run inside shard_map on local blocks) ---- #
    def _combine(self, x, L, k, valid):
        """Intra-shard gather combine + cross-shard psum fix-up.

        x: local [B, n] block; gather tables arrive as [1, ...] slices. The
        gather pass rebuilds all interface blocks from in-shard owner sums
        (cross cells get partial sums); the flat cross-group pass then
        overwrites cross slots with globally psum-med sums — O(surface)
        scatter only.
        """
        from ..ops.interfaces import combine_gather_rows

        gt = {name: tuple(a[0] for a in arrs) for name, arrs in L["gather"].items()}
        for name in ("face", "edge", "corner"):
            gt.setdefault(name, None)
        out = combine_gather_rows(x, gt, self.row_layout[k])
        out = out * valid[:, None]

        shape = out.shape
        outf = out.reshape(-1)
        xf = x.reshape(-1)
        cg = L["cross_gather"][0]
        cs = L["cross_scatter"][0]
        cgr = L["cross_group"][0]
        if L["n_cross_groups"] > 1:
            ok = cs < xf.shape[0]
            vals = jnp.where(ok, xf[cg], 0)
            partial = jax.ops.segment_sum(vals, cgr, num_segments=L["n_cross_groups"])
            total = jax.lax.psum(partial, AXIS)
            outf = outf.at[cs].set(total[cgr], mode="drop", unique_indices=True)
        return outf.reshape(shape)

    def _apply_op(self, x, coeff, L):
        from ..ops.apply import element_apply

        return element_apply(x, coeff, L["stack"])

    def _dot(self, a, b):
        return jax.lax.psum(jnp.vdot(a, b), AXIS)

    def _smooth(self, x, b, coeff, L, k, valid, steps, lam_max=None):
        if self.smoother in CHEBYSHEV_SMOOTHERS:
            if lam_max is not None and jnp.ndim(lam_max) == 1:
                lam_max = lam_max[k]  # per-level estimates (k is static)
            return self._smooth_chebyshev(x, b, coeff, L, k, valid, steps, lam_max)
        return self._smooth_cg(x, b, coeff, L, k, valid, steps)

    def _smooth_cg(self, x, b, coeff, L, k, valid, steps):
        bm = L["boundary_mask"]
        r = self._combine((b - self._apply_op(x, coeff, L)) * bm, L, k, valid)
        p = r
        rs = self._dot(r, r)
        safe = MultigridSolver._safe_div
        for _ in range(steps):
            Ap = self._combine(self._apply_op(p, coeff, L) * bm, L, k, valid)
            alpha = safe(rs, self._dot(p, Ap))
            x = x + alpha * p
            r = r - alpha * Ap
            rs_new = self._dot(r, r)
            p = r + safe(rs_new, rs) * p
            rs = rs_new
        return x, r

    def _diagonal(self, coeff, L, k, valid):
        """Interface-combined assembled diagonal on the duplicated layout
        (mirrors MultigridSolver.diagonal)."""
        d_ref = jnp.diagonal(L["stack"], axis1=1, axis2=2)  # [P, n]
        d = jnp.einsum("ep,pn->en", coeff, d_ref)
        return self._combine(d, L, k, valid)

    def _smooth_chebyshev(self, x, b, coeff, L, k, valid, steps, lam_max):
        """Jacobi-preconditioned Chebyshev smoother — no dot products, hence
        no cross-chip psum per step (the smoother whose rationale IS
        multi-chip; single-device form: solver/multigrid.py). Returns
        (x, r_loc) with the residual in LOCAL (pre-combine) form, maintained
        incrementally (r_loc -= A p): under reduced-precision applies the
        error scales with ||p|| instead of ||x|| (the recompute form
        measured a hard 190M stall — PERFORMANCE.md round 4), and the
        V-cycle restricts the maintained residual directly."""
        bm = L["boundary_mask"]
        d = self._diagonal(coeff, L, k, valid)
        dinv = jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0), 0.0)
        fourth = self.smoother == "chebyshev4"
        lam_min = lam_max / self.cheb_ratio
        theta = 0.5 * (lam_max + lam_min)
        delta = 0.5 * (lam_max - lam_min)

        r_loc = (b - self._apply_op(x, coeff, L)) * bm
        z = dinv * self._combine(r_loc, L, k, valid)
        p = ((4.0 / 3.0) / lam_max if fourth else 1.0 / theta) * z
        x = x + p
        sigma = theta / delta
        rho = 1.0 / sigma
        for j in range(2, steps + 1):
            r_loc = r_loc - self._apply_op(p, coeff, L) * bm
            z = dinv * self._combine(r_loc, L, k, valid)
            if fourth:
                p = (
                    ((2.0 * j - 3.0) / (2.0 * j + 1.0)) * p
                    + ((8.0 * j - 4.0) / (2.0 * j + 1.0) / lam_max) * z
                )
            else:
                rho_new = 1.0 / (2.0 * sigma - rho)
                p = rho_new * rho * p + (2.0 * rho_new / delta) * z
                rho = rho_new
            x = x + p
        # final-direction update: dead code (DCE) when the caller ignores r
        r_loc = r_loc - self._apply_op(p, coeff, L) * bm
        return x, r_loc

    def _coarse_chol(self, b0, chol, elements):
        u = jnp.zeros((self.n_base_nodes,), dtype=b0.dtype)
        u = u.at[elements.reshape(-1)].add(b0.reshape(-1))
        u = jax.lax.psum(u, AXIS)
        b_int = u[self.interior_idx]
        sol_int = jax.scipy.linalg.cho_solve((chol, True), b_int)
        sol = jnp.zeros((self.n_base_nodes,), dtype=b0.dtype)
        sol = sol.at[self.interior_idx].set(sol_int)
        return sol[elements]

    def _coarse_inv(self, b0, Ainv, elements):
        u = jnp.zeros((self.n_base_nodes,), dtype=b0.dtype)
        u = u.at[elements.reshape(-1)].add(b0.reshape(-1))
        u = jax.lax.psum(u, AXIS)
        sol_int = jnp.matmul(
            Ainv, u[self.interior_idx], precision=self.apply_precision
        )
        sol = jnp.zeros((self.n_base_nodes,), dtype=b0.dtype)
        sol = sol.at[self.interior_idx].set(sol_int)
        return sol[elements]

    def _coarse_cg(self, b0, coeff, L, valid):
        w = L["first_copy_mask"]
        bm = L["boundary_mask"]

        def dot(a, b):
            return jax.lax.psum(jnp.vdot(a * w, b), AXIS)

        b = self._combine(b0, L, 0, valid) * bm
        x = jnp.zeros_like(b)
        r = b
        p = r
        rs = dot(r, r)
        eps2 = jnp.asarray(self.coarse_cg_tol, b.dtype) ** 2 * (rs + 1e-30)
        safe = MultigridSolver._safe_div

        def body(state):
            x, r, p, rs, i = state
            Ap = self._combine(self._apply_op(p, coeff, L) * bm, L, 0, valid)
            alpha = safe(rs, dot(p, Ap))
            x = x + alpha * p
            r = r - alpha * Ap
            rs_new = dot(r, r)
            p = r + safe(rs_new, rs) * p
            return x, r, p, rs_new, i + 1

        def cond(state):
            _, _, _, rs_c, i = state
            return jnp.logical_and(rs_c > eps2, i < self.coarse_cg_maxiter)

        x, *_ = jax.lax.while_loop(cond, body, (x, r, p, rs, 0))
        return x

    def _coarse_mg(self, b0, coeff, aux, L, elements, valid):
        """Sharded coarse solve via CG on the exact level-0 operator with a
        replicated aux-hierarchy V-cycle preconditioner: the base-node vector
        is psum-assembled once per preconditioner application and the aux
        problem (O(N_base), tiny) is solved identically on every shard."""
        w = L["first_copy_mask"]
        bm = L["boundary_mask"]
        inner_aux = self._inner.aux_solver
        safe = MultigridSolver._safe_div

        def dot(a, b):
            return jax.lax.psum(jnp.vdot(a * w, b), AXIS)

        def Aop(v):
            return self._combine(self._apply_op(v, coeff, L) * bm, L, 0, valid)

        nu = self.coarse_prec_smooth

        def aux_correct(rc):
            u = jnp.zeros((self.n_base_nodes,), rc.dtype)
            u = u.at[elements.reshape(-1)].add((rc * w).reshape(-1))
            r_glob = jax.lax.psum(u, AXIS)
            b_aux = r_glob[aux["node_map"]] * aux["aux_first_mask"]
            x_a = jnp.zeros_like(b_aux)
            for _ in range(self.coarse_prec_cycles):
                x_a, _ = inner_aux._vcycle_impl(
                    x_a,
                    b_aux,
                    aux["coeff"],
                    aux["chol"],
                    aux["Ls"],
                    aux["base_elements"],
                    aux["interior_idx"],
                    aux["lam_max"],
                )
            z_glob = x_a.reshape(-1)[aux["aux_first_flat"]]
            return z_glob[elements] * bm

        def prec(r):
            # junction-level MG cycle: exact-operator Chebyshev smoothing
            # around the sigma-averaged aux correction (see single-device)
            b_loc = r * w
            x1 = jnp.zeros_like(r)
            if nu > 0:
                x1, _ = self._smooth_chebyshev(
                    x1, b_loc, coeff, L, 0, valid, nu, aux["lam_max0"]
                )
            rc = self._combine((b_loc - self._apply_op(x1, coeff, L)) * bm, L, 0, valid)
            x1 = x1 + aux_correct(rc)
            if nu > 0:
                x1, _ = self._smooth_chebyshev(
                    x1, b_loc, coeff, L, 0, valid, nu, aux["lam_max0"]
                )
            return x1

        b = self._combine(b0, L, 0, valid) * bm
        x = jnp.zeros_like(b)
        r = b
        z = prec(r)
        p = z
        rz = dot(r, z)
        rs = dot(r, r)
        eps2 = jnp.asarray(self.coarse_mg_tol, b.dtype) ** 2 * (rs + 1e-300)

        def body(state):
            x, r, p, rz, rs, i = state
            Ap = Aop(p)
            alpha = safe(rz, dot(p, Ap))
            x = x + alpha * p
            r = r - alpha * Ap
            z = prec(r)
            rz_new = dot(r, z)
            p = z + safe(rz_new, rz) * p
            return x, r, p, rz_new, dot(r, r), i + 1

        def cond(state):
            *_, rs_c, i = state
            return jnp.logical_and(rs_c > eps2, i < self.coarse_mg_maxiter)

        x, *_ = jax.lax.while_loop(cond, body, (x, r, p, rz, rs, 0))
        return x

    _LEVEL_SPECS = dict(
        gather=None,  # handled specially below (nested dict of arrays)
        stack=P(),
        boundary_mask=P(AXIS, None),
        first_copy_mask=P(AXIS, None),
        P_up=P(),
        cross_gather=P(AXIS, None),
        cross_scatter=P(AXIS, None),
        cross_group=P(AXIS, None),
    )

    def _level_args(self, k):
        out = {
            key: self.levels[k][key]
            for key in self._LEVEL_SPECS
            if key != "gather" and self.levels[k][key] is not None
        }
        out["gather"] = self.levels[k]["gather"]
        return out

    def _level_specs(self, k):
        out = {
            key: self._LEVEL_SPECS[key]
            for key in self._LEVEL_SPECS
            if key != "gather" and self.levels[k][key] is not None
        }
        out["gather"] = {
            name: tuple(P(AXIS, *([None] * (a.ndim - 1))) for a in arrs)
            for name, arrs in self.levels[k]["gather"].items()
        }
        return out

    def _level_statics(self, k):
        return dict(n_cross_groups=self.levels[k]["n_cross_groups"])

    def _coarse_dispatch(self, b0, coeff, chol, L0, elements, valid):
        if self.coarse_kind == "chol":
            return self._coarse_chol(b0, chol, elements)
        if self.coarse_kind == "inv":
            return self._coarse_inv(b0, chol, elements)
        if self.coarse_kind == "mg":
            return self._coarse_mg(b0, coeff, chol, L0, elements, valid)
        return self._coarse_cg(b0, coeff, L0, valid)

    def _cycle_body(
        self, x_top, b_top, coeff, chol, elements, valid, lam_max, Ls,
        top=None,
    ):
        """One V-cycle on shard-local arrays (valid inside shard_map);
        ``top`` starts at a sub-finest level (the FMG ascent)."""
        from ..ops.transfer import prolong_add, restrict

        top = self.nlevels - 1 if top is None else top
        xs = [None] * self.nlevels
        bs = [None] * self.nlevels
        xs[top], bs[top] = x_top, b_top
        B = x_top.shape[0]

        def descend(k):
            if k == 0:
                xs[0] = self._coarse_dispatch(
                    bs[0], coeff, chol, Ls[0], elements, valid
                )
                return None
            steps = (
                self.smoothing_steps if k == top else self.coarse_smoothing_steps
            )
            cheb = self.smoother in CHEBYSHEV_SMOOTHERS
            x, r = self._smooth(xs[k], bs[k], coeff, Ls[k], k, valid, steps, lam_max)
            if cheb:
                # the chebyshev smoothers maintain the local residual —
                # restriction reads it directly (no separate apply)
                r_local = r
            else:
                r_local = (bs[k] - self._apply_op(x, coeff, Ls[k])) * Ls[k][
                    "boundary_mask"
                ]
            bs[k - 1] = restrict(r_local, Ls[k]["P_up"])
            if k - 1 > 0:
                xs[k - 1] = jnp.zeros((B, self.plan.n_local(k - 1)), x_top.dtype)
            descend(k - 1)
            x = prolong_add(x, xs[k - 1], Ls[k]["P_up"])
            x, r = self._smooth(x, bs[k], coeff, Ls[k], k, valid, steps, lam_max)
            xs[k] = x
            if cheb and k == top:
                # combined convention for the reported finest residual
                return self._combine(r, Ls[k], k, valid)
            return r

        r_fine = descend(top)
        return xs[top], r_fine

    def _make_vcycle(self):
        statics = [self._level_statics(k) for k in range(self.nlevels)]

        def body(x_top, b_top, coeff, chol, elements, valid, lam_max, *level_arrays):
            Ls = [dict(**level_arrays[k], **statics[k]) for k in range(self.nlevels)]
            return self._cycle_body(
                x_top, b_top, coeff, chol, elements, valid, lam_max, Ls
            )

        state_spec = P(AXIS, None)
        in_specs = (
            state_spec,
            state_spec,
            P(AXIS, None),  # coeff
            P(),  # chol factor or coarse_setup pytree (replicated)
            P(AXIS, None),  # elements
            P(AXIS),  # valid element mask
            P(),  # lam_max scalar
            *[self._level_specs(k) for k in range(self.nlevels)],
        )
        out_specs = (state_spec, P(AXIS, None))

        smapped = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=in_specs,
            out_specs=out_specs,
            check_vma=False,
        )

        def vcycle(x, b, coeff, chol, lam_max):
            return smapped(
                x,
                b,
                coeff,
                chol,
                self.base_elements,
                self.valid_mask,
                lam_max,
                *[self._level_args(k) for k in range(self.nlevels)],
            )

        return vcycle

    # -- public ------------------------------------------------------------ #
    def vcycle(self, x, b, coeff, chol=None, lam_max=None):
        if chol is None:
            assert self.coarse_kind not in ("chol", "inv", "mg"), (
                "pass coarse_setup(sigma, lam) as chol"
            )
            chol = jnp.zeros((0, 0), dtype=self.dtype)
        if lam_max is None:
            assert self.smoother not in CHEBYSHEV_SMOOTHERS, (
                "pass lam_max=estimate_lambda_max(coeff)"
            )
            lam_max = jnp.zeros((), dtype=self.dtype)
        else:
            lam_max = jnp.asarray(lam_max, dtype=self.dtype)
        return self._vcycle(x, b, coeff, chol, lam_max)

    # -- pcg / fmg outer solves (same API as MultigridSolver) --------------- #
    def _pcg_rnorm(self, r, L, k, valid):
        rc = self._combine(r, L, k, valid) * L["boundary_mask"]
        rc = rc * L["first_copy_mask"]
        return jnp.sqrt(self._dot(rc, rc))

    def _common_specs(self):
        return (
            P(AXIS, None),  # coeff
            P(),  # chol / coarse setup
            P(AXIS, None),  # elements
            P(AXIS),  # valid
            P(),  # lam_max
            *[self._level_specs(k) for k in range(self.nlevels)],
        )

    def _common_args(self, coeff, chol, lam_max):
        return (
            coeff, chol, self.base_elements, self.valid_mask, lam_max,
            *[self._level_args(k) for k in range(self.nlevels)],
        )

    def _make_pcg_programs(self):
        top = self.nlevels - 1
        statics = [self._level_statics(k) for k in range(self.nlevels)]
        state = P(AXIS, None)
        common = self._common_specs()
        safe = MultigridSolver._safe_div

        def mk_Ls(level_arrays):
            return [
                dict(**level_arrays[k], **statics[k]) for k in range(self.nlevels)
            ]

        def init(x, b, coeff, chol, elements, valid, lam_max, *level_arrays):
            Ls = mk_Ls(level_arrays)
            L = Ls[top]
            r = (b - self._apply_op(x, coeff, L)) * L["boundary_mask"]
            z, _ = self._cycle_body(
                jnp.zeros_like(x), r, coeff, chol, elements, valid, lam_max, Ls
            )
            return x, r, z, self._dot(z, r), self._pcg_rnorm(r, L, top, valid)

        def mk_step(fl):
            def step(x, r, p, rz, coeff, chol, elements, valid, lam_max, *level_arrays):
                Ls = mk_Ls(level_arrays)
                L = Ls[top]
                Ap = self._apply_op(p, coeff, L) * L["boundary_mask"]
                alpha = safe(rz, self._dot(p, Ap))
                x = x + alpha * p
                r_new = r - alpha * Ap
                z, _ = self._cycle_body(
                    jnp.zeros_like(x), r_new, coeff, chol, elements, valid,
                    lam_max, Ls,
                )
                rz_new = self._dot(z, r_new)
                num = rz_new - self._dot(z, r) if fl else rz_new
                p = z + safe(num, rz) * p
                return x, r_new, p, rz_new, self._pcg_rnorm(r_new, L, top, valid)

            return step

        init_sm = jax.shard_map(
            init, mesh=self.mesh, in_specs=(state, state) + common,
            out_specs=(state, state, state, P(), P()), check_vma=False,
        )
        steps = {}
        donate = () if jax.default_backend() == "cpu" else (0, 1, 2)
        for fl in (False, True):
            sm = jax.shard_map(
                mk_step(fl), mesh=self.mesh,
                in_specs=(state, state, state, P()) + common,
                out_specs=(state, state, state, P(), P()), check_vma=False,
            )
            steps[fl] = jax.jit(sm, donate_argnums=donate)
        return jax.jit(init_sm), steps

    def pcg(
        self, b, coeff, chol=None, lam_max=None, x=None, *, iters: int = 50,
        tol: float = 0.0, flexible: bool | None = None,
    ):
        """V-cycle-preconditioned (flexible) CG, sharded — see
        MultigridSolver.pcg for the math and the chebyshev requirement."""
        assert self.smoother in CHEBYSHEV_SMOOTHERS, (
            "pcg needs a linear SPD preconditioner: construct the solver "
            "with smoother='chebyshev'/'chebyshev4'"
        )
        assert lam_max is not None, "pass lam_max=estimate_lambda_max(coeff)"
        if chol is None:
            assert self.coarse_kind not in ("chol", "inv", "mg")
            chol = jnp.zeros((0, 0), dtype=self.dtype)
        if flexible is None:
            flexible = self.coarse_kind not in ("chol", "inv")
        if not hasattr(self, "_pcg_cache"):
            self._pcg_cache = self._make_pcg_programs()
        init_jit, steps = self._pcg_cache
        lam_max = jnp.asarray(lam_max, self.dtype)
        if x is None:
            x, _ = self.zero_states()
        tail = self._common_args(coeff, chol, lam_max)
        x, r, p, rz, rn = init_jit(x, b, *tail)
        history = [float(rn)]
        step = steps[bool(flexible)]
        for _ in range(iters):
            x, r, p, rz, rn = step(x, r, p, rz, *tail)
            history.append(float(rn))
            if tol and history[-1] <= tol * history[0]:
                break
        return x, history

    def pcg_stepper(self, coeff, chol=None, lam_max=None, *, flexible=None):
        """Stepwise pcg (see MultigridSolver.pcg_stepper): (init, step) with
        state = (x, r, p, rz, rn) — what the homogenization driver's
        inner="pcg" mode drives on the general-mesh sharded solver."""
        assert self.smoother in CHEBYSHEV_SMOOTHERS, (
            "pcg needs a linear SPD preconditioner "
            "(smoother='chebyshev'/'chebyshev4')"
        )
        assert lam_max is not None, "pass lam_max=estimate_lambda_max(coeff)"
        if chol is None:
            assert self.coarse_kind not in ("chol", "inv", "mg")
            chol = jnp.zeros((0, 0), dtype=self.dtype)
        if flexible is None:
            flexible = self.coarse_kind not in ("chol", "inv")
        if not hasattr(self, "_pcg_cache"):
            self._pcg_cache = self._make_pcg_programs()
        init_jit, steps = self._pcg_cache
        step_jit = steps[bool(flexible)]
        lam_max = jnp.asarray(lam_max, self.dtype)
        tail = self._common_args(coeff, chol, lam_max)

        def init(b, x=None):
            if x is None:
                x, _ = self.zero_states()
            return init_jit(x, b, *tail)

        def step(state):
            x, r, p, rz, _ = state
            return step_jit(x, r, p, rz, *tail)

        return init, step

    def _make_fmg(self, nu: int):
        from ..ops.transfer import prolong_add, restrict

        top = self.nlevels - 1
        statics = [self._level_statics(k) for k in range(self.nlevels)]
        state = P(AXIS, None)

        def body(b, coeff, chol, elements, valid, lam_max, *level_arrays):
            Ls = [
                dict(**level_arrays[k], **statics[k]) for k in range(self.nlevels)
            ]
            bs = [None] * self.nlevels
            bs[top] = b
            for k in range(top, 0, -1):
                bs[k - 1] = restrict(
                    bs[k] * Ls[k]["boundary_mask"], Ls[k]["P_up"]
                )
            x = self._coarse_dispatch(bs[0], coeff, chol, Ls[0], elements, valid)
            B = b.shape[0]
            r = None
            for k in range(1, top + 1):
                x = prolong_add(
                    jnp.zeros((B, self.plan.n_local(k)), b.dtype), x,
                    Ls[k]["P_up"],
                )
                for _ in range(nu):
                    x, r = self._cycle_body(
                        x, bs[k], coeff, chol, elements, valid, lam_max, Ls,
                        top=k,
                    )
            return x, r

        sm = jax.shard_map(
            body, mesh=self.mesh, in_specs=(state,) + self._common_specs(),
            out_specs=(state, state), check_vma=False,
        )
        return jax.jit(sm)

    def fmg(self, b, coeff, chol=None, lam_max=None, nu: int = 1):
        """Full-multigrid (F-cycle) start, sharded — see MultigridSolver.fmg."""
        nu = int(nu)
        assert nu >= 1 and self.nlevels >= 2
        if chol is None:
            assert self.coarse_kind not in ("chol", "inv", "mg")
            chol = jnp.zeros((0, 0), dtype=self.dtype)
        if self.smoother in CHEBYSHEV_SMOOTHERS:
            assert lam_max is not None, "pass lam_max=estimate_lambda_max(coeff)"
        lam_max = jnp.asarray(0.0 if lam_max is None else lam_max, self.dtype)
        if not hasattr(self, "_fmg_cache"):
            self._fmg_cache = {}
        if nu not in self._fmg_cache:
            self._fmg_cache[nu] = self._make_fmg(nu)
        return self._fmg_cache[nu](b, *self._common_args(coeff, chol, lam_max))

    def estimate_lambda_max(
        self, coeff, k=None, iters: int = 30, seed: int = 0,
        method: str = "lanczos",
    ):
        """Sharded lambda_max(D^{-1} A) estimate at level k (default
        finest): local apply/combine per shard, psum-reduced dots, one
        jitted shard_map loop (mirrors MultigridSolver.estimate_lambda_max
        incl. the lanczos/power methods; the (k, iters, method) cache key
        keeps estimate_lambda_max_levels and overrides honest)."""
        k = self.nlevels - 1 if k is None else k
        key = (k, iters, method)
        if key not in self._power_fn:
            statics = self._level_statics(k)

            def body_fn(coeff, v, valid, *level_arrays):
                L = dict(**level_arrays[0], **statics)
                w = L["first_copy_mask"]
                bm = L["boundary_mask"]
                d = self._diagonal(coeff, L, k, valid)
                dinv = jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0), 0.0)
                v = self._combine(v, L, k, valid) * bm

                def dot(a, b):
                    return jax.lax.psum(jnp.vdot(a, b), AXIS)

                def matvec(u):
                    return dinv * self._combine(
                        self._apply_op(u, coeff, L) * bm, L, k, valid
                    )

                if method == "power":

                    def step(_, state):
                        v, _ = state
                        y = matvec(v)
                        lam = dot(v * w, y) / dot(v * w, v)
                        nrm = jnp.sqrt(dot(y * w, y))
                        return y / jnp.where(nrm == 0, 1.0, nrm), lam

                    _, lam = jax.lax.fori_loop(
                        0, iters, step, (v, jnp.zeros((), v.dtype))
                    )
                    return lam

                # D-inner-product Lanczos (see MultigridSolver._lam_body)
                def ddot(a, b_):
                    return dot(a * w, d * b_)

                nrm0 = jnp.sqrt(ddot(v, v))
                v1 = v / jnp.where(nrm0 == 0, 1.0, nrm0)

                def step(carry, _):
                    v_j, v_prev, beta_prev = carry
                    u = matvec(v_j)
                    alpha = ddot(u, v_j)
                    u = u - alpha * v_j - beta_prev * v_prev
                    beta = jnp.sqrt(jnp.maximum(ddot(u, u), 0.0))
                    v_next = u / jnp.where(beta == 0, 1.0, beta)
                    return (v_next, v_j, beta), (alpha, beta)

                _, (alphas, betas) = jax.lax.scan(
                    step, (v1, jnp.zeros_like(v1), jnp.zeros((), v.dtype)),
                    None, length=iters,
                )
                # tiny tridiagonal eigensolve runs on host (_lanczos_top)
                return alphas, betas

            smapped = jax.shard_map(
                body_fn,
                mesh=self.mesh,
                in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS), self._level_specs(k)),
                out_specs=P() if method == "power" else (P(), P()),
                check_vma=False,
            )
            self._power_fn[key] = jax.jit(
                lambda coeff, v: smapped(
                    coeff, v, self.valid_mask, self._level_args(k)
                )
            )
        rng = np.random.default_rng(seed)
        v0 = self.put(
            rng.standard_normal((self.E, self.plan.n_local(k))).astype(
                self._np_dtype
            )
        )
        out = self._power_fn[key](coeff, v0)
        lam = (
            float(out)
            if method == "power"
            else MultigridSolver._lanczos_top(*out)
        )
        return lam * MultigridSolver._LAM_SAFETY[method]

    def estimate_lambda_max_levels(self, coeff, iters: int = 30, seed: int = 0):
        """Per-level lam_max array (mirrors
        MultigridSolver.estimate_lambda_max_levels; this class is not a
        subclass, so the surface is restated here)."""
        return jnp.asarray(
            [
                self.estimate_lambda_max(coeff, k, iters=iters, seed=seed)
                for k in range(self.nlevels)
            ],
            dtype=self.dtype,
        )

    def residual_norm(self, r, k=None):
        k = self.nlevels - 1 if k is None else k
        rr = r * self.levels[k]["first_copy_mask"]
        return jnp.sqrt(jnp.vdot(rr, rr))

    def initial_residual_norm(self, b, coeff, x=None):
        """First-copy norm of the constrained combined residual b - A x
        (x=None means zero) — solve()'s normalization anchor, sharded
        (mirrors MultigridSolver.initial_residual_norm)."""
        k = self.nlevels - 1
        if not hasattr(self, "_resid_fn"):
            statics = self._level_statics(k)

            def body(x, b, coeff, valid, *level_arrays):
                L = dict(**level_arrays[0], **statics)
                r = b - self._apply_op(x, coeff, L)
                rc = self._combine(r, L, k, valid) * L["boundary_mask"]
                rc = rc * L["first_copy_mask"]
                return jax.lax.psum(jnp.vdot(rc, rc), AXIS)

            smapped = jax.shard_map(
                body,
                mesh=self.mesh,
                in_specs=(
                    P(AXIS, None), P(AXIS, None), P(AXIS, None), P(AXIS),
                    self._level_specs(k),
                ),
                out_specs=P(),
                check_vma=False,
            )
            self._resid_fn = jax.jit(
                lambda x, b, coeff: smapped(
                    x, b, coeff, self.valid_mask, self._level_args(k)
                )
            )
        if x is None:
            x = jnp.zeros_like(b)
        return jnp.sqrt(self._resid_fn(x, b, coeff))

    def solve(
        self, b, sigma_el, lam: float = 0.0, *, tol: float = 1e-8,
        max_cycles: int = 100, method: str = "auto", x=None,
        verbose: bool = False,
    ):
        """One-call tolerance-driven solve, sharded — the shared
        ``solve_driver`` over this class's sharded primitives (same
        semantics and normalization as MultigridSolver.solve)."""
        from ..solver.multigrid import solve_driver

        return solve_driver(
            self, b, sigma_el, lam, tol=tol, max_cycles=max_cycles,
            method=method, x=x, verbose=verbose,
        )
