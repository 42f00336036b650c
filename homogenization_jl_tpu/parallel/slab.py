"""Slab-sharded multigrid on structured boxes (the 1e9-DOF design).

``SlabShardedMultigridSolver`` shards the element axis of a cube-major
full-box hypercube plan into contiguous x-plane slabs over a 1D
``jax.sharding.Mesh`` and inherits the ENTIRE single-device V-cycle
(smoothers cg / cg_exact / chebyshev, coarse chol / inv / cg / mg with the
aux hierarchy) from ``MultigridSolver`` by overriding five primitives:

  * ``_combine``    -> ops/structured.py::combine_structured_slab — the
    shifted-slice-add combine on a halo-extended slab; communication is ONE
    ppermute of ``pad`` edge planes of interface columns per direction
    (O(surface) bytes over ICI) — no flat slot tables, no gather tables,
    no per-shard Python loops (everything round 2's single-chip path
    eliminated stays eliminated here);
  * ``_constrain``  -> slab structured constraint (static shells + a dynamic
    axis-0 iota mask; no resident boundary masks) — or the plain mask
    multiply under ``constraint="mask"`` (lattice-mode driver);
  * ``_vdot``       -> psum-reduced dots;
  * ``_to_global`` / ``_assemble_base`` / ``_diag_global`` -> per-shard
    scatter-add + one psum of the (tiny) base-node vector; the coarse
    solves then run replicated on every shard exactly as written.

This is the element-axis domain decomposition the reference expresses with
threads over shared memory (src/apply_local_operators.jl:40-46); here each
shard owns a contiguous slab and the interface reduction across address
spaces is the halo exchange (src/implicit_fine_grid.jl:209-328 is the
in-memory analog). BASELINE config 5 (~1e9 DOFs on 8 chips) maps to
n=64 cubes, 5 levels: 190M DOFs/shard — the measured single-chip bench
config per chip, with one plane (~50 MB) of halo per combine.

Requirements: ``hypercube(order="cube")`` base (contiguous planes), shard
count dividing the cube count, W = n/S >= the orbit delta radius (1 for
simplex meshes). Use ``parallel.sharding.ShardedMultigridSolver`` (gather +
psum halo) for unstructured bases.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.interfaces import copy_to_base
from ..ops.plan import GridPlan
from ..ops.structured import combine_structured_slab, constrain_structured_slab
from ..solver.multigrid import MultigridSolver

AXIS = "e"


class SlabShardedMultigridSolver(MultigridSolver):
    """MultigridSolver over a 1D device mesh; element axis slab-sharded.

    Public API mirrors MultigridSolver: states are global arrays with
    NamedSharding; ``vcycle`` is one jitted shard_map program.
    """

    def __init__(self, plan: GridPlan, mesh: Mesh, dtype=jnp.float32, **kwargs):
        assert len(mesh.axis_names) == 1 and mesh.axis_names[0] == AXIS
        kwargs.setdefault("combine", "structured")
        super().__init__(plan, dtype=dtype, **kwargs)
        # the single-device lattice-stencil coarse path (ops/stencil.py)
        # assumes full-box [E, d+1] inputs; inside shard_map the inputs are
        # shard-local x-slab blocks, so _level0_ops below replaces it with
        # the slab form: per-shard PARTIAL stencil weights / rhs built with
        # static slices on the local slab, placed at the shard's x-offset,
        # and psum-reduced (W and the assembled rhs are additive over
        # elements); the operator application then runs replicated.
        self._slab_stencil = self.lattice_stencil
        self.lattice_stencil = None
        assert self.combine_kind == "structured", (
            "slab sharding requires a structured (full-box hypercube) base; "
            "use parallel.sharding.ShardedMultigridSolver otherwise"
        )
        sc0 = self.structured[0]
        assert sc0.order == "cube", (
            "slab sharding requires hypercube(order='cube') — contiguous "
            "x-plane slabs; order='type' interleaves planes across types"
        )
        S = int(mesh.devices.size)
        n = sc0.n
        assert n % S == 0, f"shard count {S} must divide the cube count {n}"
        self.mesh = mesh
        self.n_shards = S
        self.W = n // S
        assert self.W >= max(sc.pad for sc in self.structured), (
            "slab width must cover the orbit delta radius"
        )
        self.E = plan.base.nelements

        self.sharding = NamedSharding(mesh, P(AXIS, None))
        self.replicated = NamedSharding(mesh, P())

        # re-place per-level arrays: element-leading arrays sharded, the
        # rest (reference stacks, prolongations) replicated
        def place(a):
            return jax.device_put(jnp.asarray(a), NamedSharding(mesh, self._spec_of(a)))

        self.levels = [jax.tree.map(place, L) for L in self.levels]
        self.base_elements = jax.device_put(self.base_elements, self.sharding)

        self._combine_sm: dict = {}
        self._power_sm: dict = {}
        donate = () if jax.default_backend() == "cpu" else (0,)
        self._vcycle = jax.jit(self._make_vcycle(), donate_argnums=donate)

    # -- sharding specs ---------------------------------------------------- #
    def _spec_of(self, a):
        if hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == self.E:
            return P(AXIS, *([None] * (a.ndim - 1)))
        return P()

    def _ls_specs(self):
        return jax.tree.map(self._spec_of, tuple(self.levels))

    # -- overridden primitives (valid inside shard_map) --------------------- #
    def _vdot(self, a, b):
        return jax.lax.psum(jnp.vdot(a, b), AXIS)

    def _combine(self, x, k, Ls=None):
        return combine_structured_slab(
            x, self.structured[k], self.row_layout[k], self.W, self.n_shards,
            AXIS,
        )

    def _constrain(self, x, k, Ls=None):
        bm = (Ls or self.levels)[k].boundary_mask
        if bm.size == 0:
            return constrain_structured_slab(
                x, self.structured[k], self.row_layout[k], self.W, AXIS
            )
        return x * bm

    def _combine_constrained(self, x, k, Ls=None):
        bm = (Ls or self.levels)[k].boundary_mask
        if bm.size == 0:
            return combine_structured_slab(
                x, self.structured[k], self.row_layout[k], self.W,
                self.n_shards, AXIS, constrain=True,
            )
        return self._combine(x, k, Ls) * bm

    def _to_global(self, y, base_elements):
        u = jnp.zeros((self.n_base_nodes,), y.dtype)
        u = u.at[base_elements.reshape(-1)].add(y.reshape(-1))
        return jax.lax.psum(u, AXIS)

    def _level0_ops(self, coeff, Ls, base_elements, m):
        """Slab form of the lattice-stencil coarse machinery: the stencil
        weights and assembled rhs are ADDITIVE over elements, so each shard
        builds its x-slab's partial with static slices (same tables as
        ops/stencil.py), places it at its x-offset, and one psum of the
        [K, (n+1)^d] weight field / [N] rhs replicates them; the operator
        application then runs replicated (identical on every shard). The
        13x coarse-solve speedup of the single-chip stencil path
        (PERFORMANCE.md) carries to the 1e9-DOF sharded configuration."""
        st = self._slab_stencil
        if st is None:
            return super()._level0_ops(coeff, Ls, base_elements, m)

        from ..ops.stencil import lattice_apply

        n, d, ept = st.n, st.dim, st.ept
        Wp = self.W
        K = len(st.deltas)
        lat = (n + 1,) * d
        tail_n = (n,) * (d - 1)
        x0 = jax.lax.axis_index(AXIS) * Wp
        z0 = jnp.zeros((), x0.dtype)  # index literals must match x0's dtype

        def local_slice(a):
            # lattice slice of the local slab block for corner offset a
            return (slice(a[0], a[0] + Wp),) + tuple(
                slice(a[kk], a[kk] + n) for kk in range(1, d)
            )

        def to_g(y0):
            y3 = y0.reshape((Wp,) + tail_n + (ept, d + 1))
            B = jnp.zeros((Wp + 1,) + (n + 1,) * (d - 1), y0.dtype)
            for t in range(ept):
                for i in range(d + 1):
                    B = B.at[local_slice(st.corner[t][i])].add(y3[..., t, i])
            full = jax.lax.dynamic_update_slice(
                jnp.zeros(lat, y0.dtype), B, (x0,) + (z0,) * (d - 1)
            )
            return jax.lax.psum(full.reshape(-1), AXIS)

        stack0 = Ls[0].stack
        c3 = coeff.reshape((Wp,) + tail_n + (ept, -1))
        Wl = jnp.zeros((K, Wp + 1) + (n + 1,) * (d - 1), coeff.dtype)
        for t, i, j, k in st.entries:
            # HIGHEST for the same reason as ops/stencil.py::lattice_weights
            s = jnp.einsum(
                "...p,p->...", c3[..., t, :], stack0[:, i, j],
                precision=jax.lax.Precision.HIGHEST,
            )
            Wl = Wl.at[(k,) + local_slice(st.corner[t][i])].add(s)
        Wfull = jax.lax.psum(
            jax.lax.dynamic_update_slice(
                jnp.zeros((K,) + lat, coeff.dtype), Wl,
                (z0, x0) + (z0,) * (d - 1),
            ),
            AXIS,
        )

        def dist(u):
            Ul = jax.lax.dynamic_slice(
                u.reshape(lat), (x0,) + (z0,) * (d - 1),
                (Wp + 1,) + (n + 1,) * (d - 1),
            )
            cols = [
                jnp.stack(
                    [
                        Ul[local_slice(st.corner[t][i])].reshape(-1)
                        for i in range(d + 1)
                    ],
                    axis=1,
                )
                for t in range(ept)
            ]
            # cube-order local layout: e_loc = q_loc * ept + t
            return jnp.stack(cols, axis=1).reshape(-1, d + 1)

        return (
            lambda u: lattice_apply(u, Wfull, st) * m,
            to_g,
            dist,
        )

    def _assemble_base(self, b0, base_elements):
        return jax.lax.psum(
            copy_to_base(b0, base_elements, self.n_base_nodes), AXIS
        )

    # -- setup-time helpers (wrap their own shard_map) ---------------------- #
    def _diag_global(self, coeff0):
        # cached: coarse_setup calls this once per (sigma, lam), and the
        # lattice driver halves lambda every outer step — rebuilding the
        # shard_map program each call would retrace + recompile per step
        if "diag_global" not in self._combine_sm:
            d_ref = jnp.diagonal(self.levels[0].stack, axis1=1, axis2=2)

            def body(coeff, elements):
                d = jnp.einsum("ep,pn->en", coeff, d_ref)
                return self._to_global(d, elements)

            self._combine_sm["diag_global"] = jax.jit(
                jax.shard_map(
                    body,
                    mesh=self.mesh,
                    in_specs=(P(AXIS, None), P(AXIS, None)),
                    out_specs=P(),
                    check_vma=False,
                )
            )
        return self._combine_sm["diag_global"](coeff0, self.base_elements)

    def estimate_lambda_max(
        self, coeff, k=None, iters: int = 30, seed: int = 0,
        method: str = "lanczos",
    ):
        """Sharded lambda_max(D^{-1}A) estimate at level k: the shared
        estimator body (MultigridSolver._lam_body — lanczos or power; its
        dots go through self._vdot, which psums here) wrapped in ONE jitted
        shard_map loop."""
        k = self.nlevels - 1 if k is None else k
        # key by (k, iters, method): the loop bound is baked into the
        # closure, so a later call with different args must not reuse it
        key = (k, iters, method)
        if key not in self._power_sm:
            self._power_sm[key] = jax.jit(
                jax.shard_map(
                    self._lam_body(k, iters, method),
                    mesh=self.mesh,
                    in_specs=(P(AXIS, None), P(AXIS, None), self._ls_specs()),
                    out_specs=P() if method == "power" else (P(), P()),
                    check_vma=False,
                )
            )
        rng = np.random.default_rng(seed)
        v0 = self.put(
            rng.standard_normal((self.E, self.plan.n_local(k))).astype(
                self._np_dtype
            )
        )
        out = self._power_sm[key](coeff, v0, tuple(self.levels))
        lam = float(out) if method == "power" else self._lanczos_top(*out)
        return lam * self._LAM_SAFETY[method]

    # -- jitted V-cycle ----------------------------------------------------- #
    def _make_vcycle(self):
        def body(x, b, coeff, chol, Ls, elements, interior, lam_max):
            return self._vcycle_impl(
                x, b, coeff, chol, Ls, elements, interior, lam_max
            )

        state = P(AXIS, None)
        return jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(
                state, state, P(AXIS, None), P(), self._ls_specs(),
                P(AXIS, None), P(), P(),
            ),
            out_specs=(state, state),
            check_vma=False,
        )

    def _pcg_programs(self):
        """shard_map-wrapped V-cycle-preconditioned CG programs: the impls
        are inherited unchanged — _vdot/psum makes every dot and the
        reported norm global, states stay slab-sharded."""
        state = P(AXIS, None)
        common = (P(AXIS, None), P(), self._ls_specs(), P(AXIS, None), P(), P())

        init = jax.shard_map(
            self._pcg_init_impl,
            mesh=self.mesh,
            in_specs=(state, state) + common,
            out_specs=(state, state, state, P(), P()),
            check_vma=False,
        )

        def mk(fl):
            def body(x, r, p, rz, coeff, chol, Ls, elements, interior, lam_max):
                return self._pcg_step_impl(
                    x, r, p, rz, coeff, chol, Ls, elements, interior, lam_max, fl
                )

            sm = jax.shard_map(
                body,
                mesh=self.mesh,
                in_specs=(state, state, state, P()) + common,
                out_specs=(state, state, state, P(), P()),
                check_vma=False,
            )
            donate = () if jax.default_backend() == "cpu" else (0, 1, 2)
            return jax.jit(sm, donate_argnums=donate)

        return jax.jit(init), {fl: mk(fl) for fl in (False, True)}

    def _mixed_pcg_programs(self, inner):
        """shard_map-wrapped mixed-precision PCG programs (impls shared
        with the single-device form via _mixed_pcg_impls): the f64 Krylov
        state stays slab-sharded, the multiplicity-rescaled downcast runs
        shard-locally on the halo-extended structured combine, and every
        dot/norm is a psum. This is the below-f32-floor story for the
        1e9-DOF sharded regime — the accuracy the reference gets for free
        from CPU float64 (src/multigrid.jl:46-71), engineered across
        shards here."""
        from ..solver.multigrid import _mixed_pcg_impls

        assert isinstance(inner, SlabShardedMultigridSolver), (
            "the slab outer needs a slab inner (same plan, same mesh)"
        )
        assert inner.mesh is self.mesh, "solvers must share one device mesh"
        init_impl, step_impl = _mixed_pcg_impls(self, inner)
        state = P(AXIS, None)
        # (im, co_o, ls_o, co_i, ch_i, ls_i, els, it_i, lm_i)
        common = (
            state, P(AXIS, None), self._ls_specs(), P(AXIS, None), P(),
            inner._ls_specs(), P(AXIS, None), P(), P(),
        )
        init_sm = jax.shard_map(
            init_impl,
            mesh=self.mesh,
            in_specs=(state, state) + common,
            out_specs=(state, state, state, P(), P()),
            check_vma=False,
        )
        step_sm = jax.shard_map(
            step_impl,
            mesh=self.mesh,
            in_specs=(state, state, state, P()) + common,
            out_specs=(state, state, state, P(), P()),
            check_vma=False,
        )
        donate = () if jax.default_backend() == "cpu" else (0, 1, 2)
        return (
            jax.jit(init_sm, donate_argnums=donate[:1]),
            jax.jit(step_sm, donate_argnums=donate),
        )

    def _fmg_program(self, nu: int):
        """shard_map-wrapped FMG sweep (impl inherited unchanged)."""
        state = P(AXIS, None)

        def body(b, coeff, chol, Ls, elements, interior, lam_max):
            return self._fmg_impl(
                b, coeff, chol, Ls, elements, interior, lam_max, nu
            )

        sm = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(
                state, P(AXIS, None), P(), self._ls_specs(), P(AXIS, None),
                P(), P(),
            ),
            out_specs=(state, state),
            check_vma=False,
        )
        return jax.jit(sm)

    # -- public state helpers ----------------------------------------------- #
    def initial_residual_norm(self, b, coeff, x=None, Ls=None):
        """shard_map-wrapped form of MultigridSolver.initial_residual_norm:
        the slab's combine/constrain primitives are only valid inside
        shard_map, so the inherited eager form cannot run here — this
        override is what makes the inherited one-call solve() work on the
        slab solver."""
        top = self.nlevels - 1
        # x=None means r = b: skip the fine-level apply entirely (the most
        # expensive single kernel) instead of materializing zeros for it
        key = "init_resid" if x is not None else "init_resid_b0"
        if key not in self._combine_sm:

            def body_x(x, b, coeff, Ls):
                r = b - self._apply_op(x, coeff, top, Ls)
                rc = self._combine_constrained(r, top, Ls)
                rr = rc * Ls[top].first_copy_mask
                return jnp.sqrt(self._vdot(rr, rr))

            def body_b0(b, Ls):
                rc = self._combine_constrained(b, top, Ls)
                rr = rc * Ls[top].first_copy_mask
                return jnp.sqrt(self._vdot(rr, rr))

            if x is not None:
                body, specs = body_x, (
                    P(AXIS, None), P(AXIS, None), P(AXIS, None),
                    self._ls_specs(),
                )
            else:
                body, specs = body_b0, (P(AXIS, None), self._ls_specs())
            self._combine_sm[key] = jax.jit(
                jax.shard_map(
                    body,
                    mesh=self.mesh,
                    in_specs=specs,
                    out_specs=P(),
                    check_vma=False,
                )
            )
        Ls_t = tuple(self.levels) if Ls is None else tuple(Ls)
        if x is None:
            return self._combine_sm[key](b, Ls_t)
        return self._combine_sm[key](x, b, coeff, Ls_t)

    def put(self, a, spec=None):
        """Place a global element-leading array with the slab sharding."""
        a = jnp.asarray(np.asarray(a, dtype=self._np_dtype))
        if spec is None:
            spec = P(AXIS, *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(self.mesh, spec))

    def zero_states(self):
        z = jax.device_put(
            jnp.zeros((self.E, self.plan.n_local(self.nlevels - 1)), self.dtype),
            self.sharding,
        )
        return z, z

    def coefficients(self, sigma_el, lam: float):
        return jax.device_put(super().coefficients(sigma_el, lam), self.sharding)

    def combine(self, x, k=None):
        """Interface combine as a standalone sharded program."""
        k = self.nlevels - 1 if k is None else k
        if k not in self._combine_sm:
            self._combine_sm[k] = jax.jit(
                jax.shard_map(
                    lambda v: self._combine(v, k),
                    mesh=self.mesh,
                    in_specs=P(AXIS, None),
                    out_specs=P(AXIS, None),
                    check_vma=False,
                )
            )
        return self._combine_sm[k](x)

    def constrain(self, x, k=None):
        """Zero-Dirichlet constraint as a standalone sharded program."""
        k = self.nlevels - 1 if k is None else k
        key = ("constrain", k)
        if key not in self._combine_sm:
            self._combine_sm[key] = jax.jit(
                jax.shard_map(
                    lambda v, L: self._constrain(v, k, Ls=None)
                    if self.constraint_kind == "structured"
                    else v * L,
                    mesh=self.mesh,
                    in_specs=(P(AXIS, None), P(AXIS, None)),
                    out_specs=P(AXIS, None),
                    check_vma=False,
                )
            )
        bm = self.levels[k].boundary_mask
        if bm.size == 0:
            bm = jnp.zeros((self.E, 1), dtype=bool)  # unused placeholder
        return self._combine_sm[key](x, bm)
