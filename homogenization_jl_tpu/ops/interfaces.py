"""Interface combine / constraint / base-grid transfer ops (device, JAX).

Rebuild of broadcast_interfaces!, apply_constraint!, zero_out_all_but_one!,
copy_to_base! and distribute! (src/implicit_fine_grid.jl:80-386) as pure
functions over the [E, n_local] state with static index tables (ops/plan.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def combine_interfaces(x, slot_elem, slot_node, slot_group, n_groups: int):
    """Sum duplicated interface DOFs and write the sum back to every copy.

    Reference: broadcast_interfaces!, src/implicit_fine_grid.jl:209-328
    (sequential gather-sum-scatter per shared cell) -> one gather +
    segment_sum + scatter.
    """
    if n_groups == 0:
        return x
    vals = x[slot_elem, slot_node]
    sums = jax.ops.segment_sum(vals, slot_group, num_segments=n_groups)
    return x.at[slot_elem, slot_node].set(
        sums[slot_group], unique_indices=True, mode="drop"
    )


def interface_sums(x, slot_elem, slot_node, slot_group, n_groups: int):
    """Just the per-group sums (used by the sharded halo-exchange variant)."""
    vals = x[slot_elem, slot_node]
    return jax.ops.segment_sum(vals, slot_group, num_segments=n_groups)


def scatter_groups(x, sums, slot_elem, slot_node, slot_group):
    """Write group values back to every slot copy."""
    return x.at[slot_elem, slot_node].set(
        sums[slot_group], unique_indices=True, mode="drop"
    )


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
    return u.at[base_elements].add(b)


def distribute(u, base_elements):
    """Scatter a global base-node vector to the duplicated layout
    (reference: distribute!, src/implicit_fine_grid.jl:178-202)."""
    return u[base_elements]
