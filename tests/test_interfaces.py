"""Interface-table correctness (reference key test: test/implicit_grid.jl —
physical coordinates of duplicated interface DOFs coincide across all owning
elements, at every level)."""

import numpy as np
import pytest

from homogenization_jl_tpu.mesh.grid import affine_maps, hypercube
from homogenization_jl_tpu.mesh.refine import refine_uniformly
from homogenization_jl_tpu.ops.plan import build_grid_plan


@pytest.mark.parametrize("dim,n,levels", [(2, 3, 4), (3, 2, 3)])
def test_interface_slots_coincide_physically(dim, n, levels):
    base = hypercube(dim, n)
    plan = build_grid_plan(base, levels)
    J, shift, _, _ = affine_maps(base)

    for k in range(levels):
        lp = plan.levels[k]
        t = lp.combine
        if t.n_groups == 0:
            continue
        ref_nodes = plan.reference.levels[k].nodes
        # physical coordinates of every slot
        xs = (
            np.einsum("sij,sj->si", J[t.slot_elem], ref_nodes[t.slot_node])
            + shift[t.slot_elem]
        )
        # group -> first slot coordinate; all slots must match their group's
        first = np.zeros((t.n_groups, dim))
        seen = np.zeros(t.n_groups, dtype=bool)
        for s in range(len(t.slot_group)):
            g = t.slot_group[s]
            if not seen[g]:
                first[g] = xs[s]
                seen[g] = True
        assert seen.all(), "every group must have at least one slot"
        err = np.abs(xs - first[t.slot_group]).max()
        assert err < 1e-12, f"level {k}: slot/group coordinate mismatch {err}"
        # every group has >= 2 slots (it is an interface DOF)
        counts = np.bincount(t.slot_group, minlength=t.n_groups)
        assert counts.min() >= 2


@pytest.mark.parametrize("dim,n,levels", [(2, 2, 3), (3, 2, 2)])
def test_interface_groups_match_explicit_mesh(dim, n, levels):
    """Count check against the explicitly refined mesh: the number of distinct
    physical fine DOFs must equal nnodes(explicit fine mesh); interface groups
    + single-copy slots partition them."""
    base = hypercube(dim, n)
    plan = build_grid_plan(base, levels)
    fine = refine_uniformly(base, times=levels - 1)

    k = levels - 1
    t = plan.levels[k].combine
    E = base.nelements
    n_local = plan.n_local(k)

    # all physical coords of the duplicated layout
    J, shift, _, _ = affine_maps(base)
    ref_nodes = plan.reference.levels[k].nodes
    allx = (
        np.einsum("eij,nj->eni", J, ref_nodes) + shift[:, None, :]
    ).reshape(-1, dim)
    uniq = np.unique(np.round(allx * 2**18).astype(np.int64), axis=0)
    assert len(uniq) == fine.nnodes

    # slots marked interface + the rest must add up: every duplicated coord is
    # covered by exactly one group
    dup_total = E * n_local - fine.nnodes
    slots_in_groups = len(t.slot_group)
    counts = np.bincount(t.slot_group, minlength=t.n_groups)
    assert (counts - 1).sum() == dup_total


@pytest.mark.parametrize("dim,n,levels", [(2, 3, 3), (3, 2, 3)])
def test_boundary_mask_geometry(dim, n, levels):
    """boundary_mask zeroes exactly the DOFs on the domain boundary."""
    base = hypercube(dim, n)
    plan = build_grid_plan(base, levels)
    J, shift, _, _ = affine_maps(base)
    for k in range(levels):
        mask = plan.levels[k].boundary_mask
        ref_nodes = plan.reference.levels[k].nodes
        allx = np.einsum("eij,nj->eni", J, ref_nodes) + shift[:, None, :]
        on_bnd = np.any((np.abs(allx) < 1e-12) | (np.abs(allx - n) < 1e-12), axis=2)
        assert np.array_equal(mask == 0.0, on_bnd), f"level {k}"


@pytest.mark.parametrize("dim,n,levels", [(2, 3, 3), (3, 2, 2)])
def test_first_copy_mask_counts(dim, n, levels):
    """first_copy_mask keeps exactly one slot per physical fine DOF."""
    base = hypercube(dim, n)
    plan = build_grid_plan(base, levels)
    fine = refine_uniformly(base, times=levels - 1)
    mask = plan.levels[levels - 1].first_copy_mask
    assert int(mask.sum()) == fine.nnodes


@pytest.mark.parametrize("dim,n,levels", [(2, 3, 4), (3, 2, 3)])
def test_combine_forms_agree(dim, n, levels):
    """All interface-combine implementations (flat slot segment-sum oracle,
    row-granular gather, structured) produce the identical combined state."""
    import jax.numpy as jnp

    from homogenization_jl_tpu.ops.interfaces import (
        combine_gather_rows,
        combine_interfaces,
    )
    from homogenization_jl_tpu.solver.multigrid import MultigridSolver

    from homogenization_jl_tpu.ops.structured import (
        build_structured_combine,
        combine_structured,
    )

    plan = build_grid_plan(hypercube(dim, n), levels)
    solver = MultigridSolver(plan, coarse="cg", combine="gather")
    rng = np.random.default_rng(0)
    for k in range(levels):
        L = solver.levels[k]
        x = jnp.asarray(rng.standard_normal((plan.base.nelements, plan.n_local(k))))
        ct = plan.levels[k].combine
        ref = combine_interfaces(
            x,
            jnp.asarray(ct.flat(plan.n_local(k))),
            jnp.asarray(ct.slot_group),
            ct.n_groups,
        )
        lay = solver.row_layout[k]
        g2 = combine_gather_rows(x, L.row["gather"], lay)
        sc = build_structured_combine(plan, k)
        assert sc is not None
        g3 = combine_structured(x, sc, lay)
        assert float(jnp.abs(g2 - ref).max()) < 1e-12
        assert float(jnp.abs(g3 - ref).max()) < 1e-12
