"""Golden-file regression for the VTU export path (the analog of the
reference's Paraview eyeball tests, test/visualize_implicit_grid.jl:11-137:
exploded implicit grid with interface-class coloring + a solution field).

The golden fixture (tests/fixtures/vtk_golden.npz) pins the exploded-grid
geometry, connectivity, per-DOF interface-class coloring and an interpolated
affine solution; any change to the reference numbering, the layout, the
affine maps or the exploded-grid construction trips it. The .vtu writer
itself is checked by re-parsing the written binary DataArrays.
"""

import base64
import os
import re
import struct

import numpy as np

from homogenization_jl_tpu.mesh.grid import affine_maps, hypercube
from homogenization_jl_tpu.ops.plan import build_grid_plan
from homogenization_jl_tpu.utils.vtk import construct_full_grid, write_vtu

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "vtk_golden.npz")


def interface_classes(plan, k):
    """[n_local] class id per reference-mesh column: 0 element-interior,
    1 face-interior, 2 edge-interior, 3 corner."""
    lay = plan.reference.layout[k]
    n_local = plan.reference.levels[k].nnodes
    cls = np.zeros(n_local, dtype=np.int32)
    for off in lay.face_offsets:
        cls[off : off + lay.npf] = 1
    for off in lay.edge_offsets:
        cls[off : off + lay.npe] = 2
    for c in lay.corner_cols:
        cls[c] = 3
    return cls


def exploded_grid_payload(explode=0.25):
    """(nodes, elements, classes, affine solution values) for a 2D 3-level
    implicit grid, with each base element shrunk toward its centroid."""
    base = hypercube(2, 2)
    plan = build_grid_plan(base, 3)
    k = plan.nlevels - 1
    full = construct_full_grid(plan, k)
    E = base.nelements
    n_local = plan.n_local(k)
    nodes = full.nodes.reshape(E, n_local, 2)
    centers = nodes.mean(axis=1, keepdims=True)
    nodes = (1 - explode) * nodes + explode * centers  # explode apart
    nodes = nodes.reshape(-1, 2)

    cls = np.tile(interface_classes(plan, k), E)
    # affine field u = 1 + 2x + 3y sampled at the (pre-explosion) DOFs
    J, shift, _, _ = affine_maps(base)
    coords = np.einsum("eij,nj->eni", J, plan.reference.levels[k].nodes) + shift[:, None, :]
    u = 1.0 + 2.0 * coords[..., 0] + 3.0 * coords[..., 1]
    return nodes, full.elements, cls, u.reshape(-1)


def test_exploded_grid_matches_golden():
    nodes, elements, cls, u = exploded_grid_payload()
    g = np.load(FIXTURE)
    assert np.array_equal(g["elements"], elements)
    assert np.array_equal(g["classes"], cls)
    assert np.abs(g["nodes"] - nodes).max() == 0.0
    assert np.abs(g["u"] - u).max() == 0.0


def _parse_vtu_arrays(path):
    text = open(path).read()
    out = {}
    for m in re.finditer(
        r'<DataArray type="(\w+)" Name="([^"]+)"[^>]*format="binary">([^<]+)<',
        text,
    ):
        t, name, payload = m.groups()
        raw = base64.b64decode(payload)
        (nbytes,) = struct.unpack("<I", raw[:4])
        body = raw[4 : 4 + nbytes]
        np_t = {
            "Float64": np.float64, "Float32": np.float32,
            "Int64": np.int64, "Int32": np.int32, "UInt8": np.uint8,
        }[t]
        out[name] = np.frombuffer(body, dtype=np_t)
    return out

def test_vtu_roundtrip(tmp_path):
    """write_vtu emits parseable binary arrays carrying the exact values."""
    from homogenization_jl_tpu.mesh.grid import Mesh

    nodes, elements, cls, u = exploded_grid_payload()
    mesh = Mesh(nodes, elements)
    path = write_vtu(
        str(tmp_path / "g"), mesh,
        point_data={"class": cls.astype(np.int32), "u": u},
    )
    arrs = _parse_vtu_arrays(path)
    pts = arrs["Points"].reshape(-1, 3)
    assert np.array_equal(pts[:, :2], nodes)
    assert np.array_equal(arrs["connectivity"].reshape(-1, 3), elements)
    assert np.array_equal(arrs["class"], cls)
    assert np.array_equal(arrs["u"], u)
