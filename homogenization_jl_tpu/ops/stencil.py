"""Lattice-stencil form of the level-0 (base P1) operator on box meshes.

The global-space coarse solves (solver/multigrid.py::_coarse_solve_cg/_mg)
apply the assembled base operator matrix-free as

    gather u[elements] -> element_apply (tiny [E, d+1] matmuls) -> segment_sum

Each step is dominated by per-scalar gather/relayout cost on TPU: the
[E, d+1] arrays pad their 4-wide minor dimension to the (8,128) tile (32x),
and the flat permutation gather + segment_sum run at ~17 ns/scalar — ~34 ms
per operator application at a 196k-element base for a 36k-node operator
(scripts/time_coarse.py, round 3).

On a full-box hypercube base (the bench, the lattice driver, st1) the same
operator is a fixed-footprint STENCIL on the (n+1)^d node lattice:

    y[a] = sum_delta W_delta[a] * u[a + delta]

with at most 3^d offsets delta in {-1,0,1}^d. Because the mesh's node ids
are lattice-lexicographic, u.reshape((n+1,)*d) is free; the apply is K <= 3^d
shifted elementwise multiply-adds (~0.3 MB of traffic at n=32 vs ~100 MB of
padded-tile traffic for the gather form). The weights are linear in the
per-element apply coefficients: every (simplex type t, local i, local j)
pair contributes the [n]^d slab

    W_{beta-alpha}[q + alpha] += sum_p coeff3d[t, q, p] * stack0[p, i, j]

where alpha/beta in {0,1}^d are the lattice corner offsets of local nodes
i/j of type t relative to its cube q — ept*(d+1)^2 static slice-adds, built
once per coefficient set inside the jitted solve (XLA hoists it out of the
CG while_loop).

This is the structured-combine idea (ops/structured.py) applied to the
coarse path: the reference's equivalent work is the explicit CSC assembly +
SpMV of `assemble_checkerboard` (src/examples/homogenized_coefficients.jl:
358-402) it feeds to a direct factorization.

The same (t, i) -> alpha tables give lattice forms of the once-per-solve
plumbing: `lattice_assemble` ([E, d+1] local contributions -> [N], equals
``_to_global``) and `lattice_distribute` ([N] -> [E, d+1], equals
``distribute``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LatticeStencil:
    dim: int
    n: int  # cubes per axis; (n+1)^dim lattice nodes
    ept: int  # elements (simplices) per cube
    order: str  # "cube" (e = q*ept + t) or "type" (e = t*n^d + q)
    # corner offset alpha[t][i] in {0,1}^dim of sorted-local node i of type t
    corner: tuple  # [ept][d+1] -> dim-tuple
    # weight entries: (t, i, j, k) with k indexing deltas; delta_k = corner
    # [t][j] - corner[t][i]
    entries: tuple
    deltas: tuple  # K dim-tuples in {-1,0,1}^dim


def build_lattice_stencil(base) -> LatticeStencil | None:
    """Stencil tables for a lexicographic full-box hypercube base, else None.

    Requires (and verifies): lattice-lexicographic node numbering and the
    identical-per-cube element split (``detect_structured``)."""
    from ..solver.coarse import detect_box
    from .structured import detect_structured

    st = detect_structured(base)
    if st is None:
        return None
    n, ept, order = st
    origin, _, h = detect_box(base)
    d = base.dim

    # node id must equal the lexicographic lattice index (x slowest)
    coords = np.round((base.nodes - origin[None, :]) / h).astype(np.int64)
    ids = coords[:, 0]
    for k in range(1, d):
        ids = ids * (n + 1) + coords[:, k]
    if not np.array_equal(ids, np.arange(base.nnodes)):
        return None

    # corner offsets of each type's sorted-local nodes, from cube 0
    # (detect_structured verified every cube carries the same split)
    corner = []
    for t in range(ept):
        e0 = t * (n**d) if order == "type" else t  # type t of cube 0
        corner.append(tuple(tuple(coords[v]) for v in base.elements[e0]))

    deltas: list = []
    dindex: dict = {}
    entries = []
    for t in range(ept):
        for i in range(d + 1):
            for j in range(d + 1):
                delta = tuple(
                    corner[t][j][a] - corner[t][i][a] for a in range(d)
                )
                if delta not in dindex:
                    dindex[delta] = len(deltas)
                    deltas.append(delta)
                entries.append((t, i, j, dindex[delta]))

    return LatticeStencil(
        dim=d, n=n, ept=ept, order=order, corner=tuple(map(tuple, corner)),
        entries=tuple(entries), deltas=tuple(deltas),
    )


def _coeff_lattice(coeff, st: LatticeStencil):
    """[E, P] -> [ept, n^d, P] with the cube axis in lattice-lex order."""
    P = coeff.shape[1]
    nd = st.n**st.dim
    if st.order == "type":
        return coeff.reshape(st.ept, nd, P)
    return jnp.swapaxes(coeff.reshape(nd, st.ept, P), 0, 1)


def lattice_weights(coeff, stack0, st: LatticeStencil):
    """[K, (n+1)^dim] stencil weight fields from the apply coefficients.

    Exactly the assembled base matrix: W_k[a] = A[a, a + delta_k]."""
    n, d = st.n, st.dim
    c3 = _coeff_lattice(coeff, st).reshape((st.ept,) + (n,) * d + (-1,))
    W = jnp.zeros((len(st.deltas),) + (n + 1,) * d, dtype=coeff.dtype)
    for t, i, j, k in st.entries:
        # HIGHEST: the default TPU matmul runs bf16 multiplies, which would
        # put ~1e-3 relative error into the coarse operator this docstring
        # promises is exactly the assembled base matrix
        s = jnp.einsum(
            "...p,p->...", c3[t], stack0[:, i, j],
            precision=jax.lax.Precision.HIGHEST,
        )  # [n]^d
        idx = (k,) + tuple(
            slice(a, a + n) for a in st.corner[t][i]
        )
        W = W.at[idx].add(s)
    return W


def lattice_apply(u, W, st: LatticeStencil):
    """y = A u via K shifted elementwise multiply-adds. u, y: flat [N]."""
    n, d = st.n, st.dim
    U = u.reshape((n + 1,) * d)
    y = jnp.zeros_like(U)
    for k, delta in enumerate(st.deltas):
        dst = tuple(
            slice(max(-dd, 0), n + 1 + min(-dd, 0)) for dd in delta
        )
        src = tuple(slice(max(dd, 0), n + 1 + min(dd, 0)) for dd in delta)
        y = y.at[dst].add(W[(k,) + dst] * U[src])
    return y.reshape(-1)


def lattice_assemble(y_local, st: LatticeStencil):
    """Sum duplicated-layout local contributions to global nodes:
    [E, d+1] -> [N]. Equals MultigridSolver._to_global on box bases."""
    n, d = st.n, st.dim
    nd = n**d
    if st.order == "type":
        y3 = y_local.reshape((st.ept,) + (n,) * d + (d + 1,))
    else:
        y3 = jnp.swapaxes(
            y_local.reshape(nd, st.ept, d + 1), 0, 1
        ).reshape((st.ept,) + (n,) * d + (d + 1,))
    B = jnp.zeros((n + 1,) * d, dtype=y_local.dtype)
    for t in range(st.ept):
        for i in range(d + 1):
            sl = tuple(slice(a, a + n) for a in st.corner[t][i])
            B = B.at[sl].add(y3[t][..., i])
    return B.reshape(-1)


def lattice_distribute(u, st: LatticeStencil):
    """Global node vector -> duplicated [E, d+1] layout (every copy gets
    the nodal value). Equals ops.interfaces.distribute on box bases."""
    n, d = st.n, st.dim
    U = u.reshape((n + 1,) * d)
    cols = []
    for t in range(st.ept):
        cols.append(
            jnp.stack(
                [
                    U[tuple(slice(a, a + n) for a in st.corner[t][i])].reshape(-1)
                    for i in range(d + 1)
                ],
                axis=1,
            )
        )
    out = jnp.stack(cols, axis=0)  # [ept, n^d, d+1]
    if st.order == "type":
        return out.reshape(-1, d + 1)
    return jnp.swapaxes(out, 0, 1).reshape(-1, d + 1)
