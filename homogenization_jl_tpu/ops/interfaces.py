"""Interface combine / constraint / base-grid transfer ops (device, JAX).

Rebuild of broadcast_interfaces!, apply_constraint!, zero_out_all_but_one!,
copy_to_base! and distribute! (src/implicit_fine_grid.jl:80-386) as pure
functions over the [E, n_local] state with static index tables (ops/plan.py).

Slots are addressed by *flattened* indices (elem * n_local + node): XLA's
scatter compiles orders of magnitude faster for rank-1 updates than for the
equivalent two-index-vector form (measured: 1.3s vs 134s on the CPU backend
for the same table).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# one-hot selector matmuls must not round values through bf16
_PRECISION = jax.lax.Precision.HIGHEST


def _sel(a, S):
    return jnp.matmul(a, S, precision=_PRECISION)


def combine_interfaces(x, slot_flat, slot_group, n_groups: int):
    """Sum duplicated interface DOFs and write the sum back to every copy.

    Reference: broadcast_interfaces!, src/implicit_fine_grid.jl:209-328
    (sequential gather-sum-scatter per shared cell) -> one gather +
    segment_sum + scatter. x: [E, n_local].
    """
    if n_groups == 0:
        return x
    shape = x.shape
    xf = x.reshape(-1)
    vals = xf[slot_flat]
    sums = jax.ops.segment_sum(vals, slot_group, num_segments=n_groups)
    xf = xf.at[slot_flat].set(sums[slot_group], unique_indices=True, mode="drop")
    return xf.reshape(shape)


def interface_sums(x, slot_flat, slot_group, n_groups: int):
    """Just the per-group sums (used by the sharded halo-exchange variant)."""
    vals = x.reshape(-1)[slot_flat]
    return jax.ops.segment_sum(vals, slot_group, num_segments=n_groups)


def scatter_groups(x, sums, slot_flat, slot_group):
    """Write group values back to every slot copy."""
    shape = x.shape
    xf = x.reshape(-1).at[slot_flat].set(
        sums[slot_group], unique_indices=True, mode="drop"
    )
    return xf.reshape(shape)


def apply_mask(x, mask):
    """Zero Dirichlet constraint / first-copy selection as a mask multiply.

    Reference: apply_constraint! (src/implicit_fine_grid.jl:94-139),
    zero_out_all_but_one! (:334-386).
    """
    return x * mask


def copy_to_base(b, base_elements, n_base_nodes: int):
    """Accumulate the duplicated-layout rhs onto global base-mesh nodes.

    Equivalent to broadcast_interfaces! followed by taking the first copy
    (reference: vcycle! coarsest branch, src/multigrid.jl:75-81): summing all
    copies directly gives the same vector by linearity.
    b: [E, N] -> [n_base_nodes].
    """
    u = jnp.zeros((n_base_nodes,), dtype=b.dtype)
    return u.at[base_elements.reshape(-1)].add(b.reshape(-1))


def distribute(u, base_elements):
    """Scatter a global base-node vector to the duplicated layout
    (reference: distribute!, src/implicit_fine_grid.jl:178-202)."""
    return u[base_elements]


def combine_gather_rows(x, gt: dict, lay: dict):
    """Gather-based interface combine at cell-row granularity.

    The production combine (supersedes the retired combine_gather /
    combine_rowwise_contig forms, measured 69.9 -> 10.7 ms at
    [196608, 969] on a v5e): the contiguous layout makes each class span an
    [E, L*W] block, reshapeable to [E*L, W] rows — one row per (element,
    local cell). Owner values are then ONE gather with flat indices
    oe*L + ol (no L-way window selects, no per-owner-slot gather ops), the
    group sums are one masked reduction over the owner axis, and each
    element's class block is rebuilt by ONE [E, L]-indexed gather. Row
    traffic drops from (M*L + L)*O(E) tiny rows to (M + 1)*O(E) exact rows;
    TPU row gathers cost per ROW, which is what made the combine ~30% of the
    V-cycle before this.
    """
    i0 = lay["iface_start"]
    parts = [x[:, :i0]] if i0 > 0 else []
    E = x.shape[0]

    def class_blocks(tables, offsets, width):
        oe, ol, om, gmap = tables  # [G, M], [G, M], [G, M], [E, L]
        G, M = oe.shape
        L = len(offsets)
        c0 = min(offsets)
        xr = x[:, c0 : c0 + L * width].reshape(E * L, width)
        flat = oe.astype(jnp.int32) * L + ol.astype(jnp.int32)  # [G, M]
        rows = xr[flat]  # ONE gather of G*M width-W rows
        sums = jnp.einsum(
            "gmw,gm->gw", rows, om.astype(x.dtype), precision=_PRECISION
        )
        return [sums[gmap].reshape(E, L * width)]  # ONE rebuild gather

    if gt.get("face") is not None:
        parts += class_blocks(gt["face"], lay["face_off"], lay["npf"])
    if gt.get("edge") is not None and lay["npe"] > 0:
        parts += class_blocks(gt["edge"], lay["edge_off"], lay["npe"])
    if gt.get("corner") is not None:
        parts += class_blocks(gt["corner"], lay["corner_cols"], 1)

    return jnp.concatenate(parts, axis=1)
