"""Mesh-core invariants (reference tests: test/generated_grids.jl,
test/refined_reference_element.jl, test/list_faces.jl)."""

import numpy as np
import pytest

from homogenization_jl_tpu.mesh.grid import (
    Mesh,
    affine_maps,
    boundary_faces,
    boundary_nodes,
    hypercube,
    interior_nodes,
    list_faces,
    unique_edges,
)
from homogenization_jl_tpu.mesh.refine import refine_once, refine_uniformly
from homogenization_jl_tpu.mesh.reference import refined_reference


def test_hypercube_tri_counts():
    n = 7
    m = hypercube(2, n)
    assert m.nnodes == (n + 1) ** 2
    assert m.nelements == 2 * n * n
    assert np.all(np.diff(m.elements, axis=1) > 0)  # rows sorted
    # total area = n^2
    _, _, detJ, _ = affine_maps(m)
    assert np.isclose(detJ.sum() / 2.0, n * n)


def test_hypercube_tet_counts():
    # reference invariant: hypercube(Tet, 20) -> 21^3 nodes, 6*20^3 elements
    n = 5
    m = hypercube(3, n)
    assert m.nnodes == (n + 1) ** 3
    assert m.nelements == 6 * n**3
    assert np.all(np.diff(m.elements, axis=1) > 0)
    _, _, detJ, _ = affine_maps(m)
    assert np.isclose(detJ.sum() / 6.0, n**3)


@pytest.mark.parametrize("dim", [2, 3])
def test_refine_counts_and_volume(dim):
    m = hypercube(dim, 2)
    fine, edges = refine_once(m)
    n_children = 4 if dim == 2 else 8
    assert fine.nelements == n_children * m.nelements
    assert fine.nnodes == m.nnodes + len(edges)
    # old nodes are a prefix
    assert np.allclose(fine.nodes[: m.nnodes], m.nodes)
    # volume preserved
    vol = 1.0 / 2.0 if dim == 2 else 1.0 / 6.0
    _, _, dc, _ = affine_maps(m)
    _, _, df, _ = affine_maps(fine)
    assert np.isclose(df.sum() * vol, dc.sum() * vol)
    # no degenerate children
    assert df.min() > 0


@pytest.mark.parametrize("dim", [2, 3])
def test_boundary_interior_nodes(dim):
    n = 3
    m = hypercube(dim, n)
    bn = boundary_nodes(m)
    inn = interior_nodes(m)
    assert len(bn) + len(inn) == m.nnodes
    # geometric check: boundary nodes touch the cube surface
    coords = m.nodes[bn]
    on_surface = np.any((coords == 0) | (coords == n), axis=1)
    assert np.all(on_surface)
    coords_in = m.nodes[inn]
    assert np.all((coords_in > 0) & (coords_in < n))
    assert len(inn) == (n - 1) ** dim


def test_boundary_faces_count_2d():
    n = 4
    m = hypercube(2, n)
    assert len(boundary_faces(m)) == 4 * n


def test_boundary_faces_count_3d():
    n = 2
    m = hypercube(3, n)
    # each cube face shows 2 triangles per unit square x 6 cube faces
    assert len(boundary_faces(m)) == 6 * n * n * 2


def test_refined_reference_counts():
    """Closed forms from test/refined_reference_element.jl:5-37."""
    L = 5
    ref3 = refined_reference(3, L)
    for k in range(L):
        n_edge = (1 << k) + 1  # nodes per edge (incl. endpoints)
        num = ref3.numbering[k]
        for e in range(6):
            assert len(num.edges.full[e]) == n_edge
            assert len(num.edges.interior[e]) == n_edge - 2
        npf = n_edge * (n_edge + 1) // 2  # nodes per face
        for f in range(4):
            assert len(num.faces.full[f]) == npf
            inner = npf - 3 * (n_edge - 1)
            assert len(num.faces.interior[f]) == inner
    ref2 = refined_reference(2, L)
    for k in range(L):
        n_edge = (1 << k) + 1
        num = ref2.numbering[k]
        for e in range(3):
            assert len(num.edges.full[e]) == n_edge
            assert len(num.edges.interior[e]) == n_edge - 2
        # total nodes of refined triangle
        assert ref2.levels[k].nnodes == n_edge * (n_edge + 1) // 2


def test_refined_reference_volumes():
    for dim, vol in [(2, 0.5), (3, 1.0 / 6.0)]:
        ref = refined_reference(dim, 4)
        for m in ref.levels:
            _, _, detJ, _ = affine_maps(m)
            scale = 0.5 if dim == 2 else 1.0 / 6.0
            assert np.isclose(detJ.sum() * scale, vol)
            assert detJ.min() > 0
