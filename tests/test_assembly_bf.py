"""Generic bilinear-form assembly (capability parity with the reference's
assemble_matrix(mesh, bf) closure form, src/assembly.jl:4-60)."""

import numpy as np

from homogenization_jl_tpu.fem.assembly import (
    assemble_laplace,
    assemble_matrix,
    assemble_operator,
)
from homogenization_jl_tpu.mesh.grid import hypercube


def test_bf_dot_matches_laplace():
    for dim in (2, 3):
        mesh = hypercube(dim, 3)
        A1 = assemble_matrix(mesh, lambda gu, gv, x: (gu * gv).sum(-1))
        A2 = assemble_laplace(mesh)
        assert abs((A1 - A2)).max() < 1e-13


def test_bf_anisotropic_matches_operator():
    dim = 2
    mesh = hypercube(dim, 3)
    rng = np.random.default_rng(0)
    # element-constant diagonal sigma expressed as an x-dependent closure
    sigma = rng.choice([1.0, 9.0], size=(mesh.nelements, dim))
    centers = mesh.nodes[mesh.elements].mean(axis=1)

    def bf(gu, gv, x):
        # lookup sigma by quadrature position (cells are unit squares here,
        # sigma constant per ELEMENT, two triangles per cell may differ --
        # match by nearest element center along leading axes)
        # broadcast trick: x has shape [E, Q, N, N, d]; sigma per element
        s = sigma[:, None, None, None, :]
        return (gu * s * gv).sum(-1)

    A1 = assemble_matrix(mesh, bf)
    A2 = assemble_operator(mesh, sigma, 0.0)
    assert abs((A1 - A2)).max() < 1e-13


def test_bf_x_dependent_coefficient():
    """A smooth x-dependent coefficient: degree-2 quadrature integrates
    a(x) = 1 + x0 exactly against constant P1 gradients; compare with a
    per-element-averaged assembly (the centroid value equals the element
    average of an affine coefficient)."""
    dim = 2
    mesh = hypercube(dim, 4)
    A1 = assemble_matrix(
        mesh, lambda gu, gv, x: (1.0 + x[..., 0]) * (gu * gv).sum(-1)
    )
    centers = mesh.nodes[mesh.elements].mean(axis=1)
    a_el = 1.0 + centers[:, 0]
    A2 = assemble_operator(mesh, np.repeat(a_el[:, None], dim, axis=1), 0.0)
    assert abs((A1 - A2)).max() < 1e-13
