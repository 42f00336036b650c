"""Lattice-stencil level-0 operator (ops/stencil.py) vs the gather/global
forms it replaces.

The stencil path is a pure reformulation of the assembled base operator
(reference: the matrix `assemble_checkerboard` builds explicitly,
src/examples/homogenized_coefficients.jl:358-402); every test pins exact
agreement with the existing global-space machinery."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke lane (pytest -m "not slow")

import jax.numpy as jnp
import numpy as np

from homogenization_jl_tpu.mesh.grid import hypercube
from homogenization_jl_tpu.ops.interfaces import distribute
from homogenization_jl_tpu.ops.plan import build_grid_plan
from homogenization_jl_tpu.ops.stencil import (
    build_lattice_stencil,
    lattice_apply,
    lattice_assemble,
    lattice_distribute,
    lattice_weights,
)
from homogenization_jl_tpu.solver.multigrid import MultigridSolver


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("order", ["cube", "type"])
def test_stencil_matches_global_ops(dim, order):
    n = 8 if dim == 2 else 6
    base = hypercube(dim, n, order=order)
    plan = build_grid_plan(base, 2, slot_tables=False)
    rng = np.random.default_rng(0)
    sigma = rng.uniform(1, 9, size=(base.nelements, dim))
    s = MultigridSolver(plan, dtype=jnp.float64, coarse="cg")
    coeff = s.coefficients(sigma, 0.7)
    st = build_lattice_stencil(base)
    assert st is not None
    Ls = tuple(s.levels)

    u = jnp.asarray(rng.standard_normal(base.nnodes))
    m = jnp.ones(base.nnodes)
    y_ref = s._global_apply(u, coeff, Ls, s.base_elements, m)
    W = lattice_weights(coeff, Ls[0].stack, st)
    assert float(jnp.max(jnp.abs(y_ref - lattice_apply(u, W, st)))) < 1e-12

    yl = jnp.asarray(rng.standard_normal((base.nelements, dim + 1)))
    assert (
        float(
            jnp.max(
                jnp.abs(
                    s._to_global(yl, s.base_elements) - lattice_assemble(yl, st)
                )
            )
        )
        < 1e-12
    )
    assert np.array_equal(
        np.asarray(distribute(u, s.base_elements)),
        np.asarray(lattice_distribute(u, st)),
    )


def test_stencil_none_on_non_box():
    """Shrunken / reordered driver domains must fall back to the gather path."""
    from homogenization_jl_tpu.models.checkerboard import ordered_hypercube

    mesh, _, _ = ordered_hypercube(2, 4)
    assert build_lattice_stencil(mesh) is None


@pytest.mark.parametrize("coarse", ["cg", "mg"])
def test_solver_equivalence_with_and_without_stencil(coarse):
    """Full V-cycle solve: stencil coarse path == gather coarse path."""
    n, levels = 8, 3
    base = hypercube(2, n, order="type")
    plan = build_grid_plan(base, levels, slot_tables=False)
    rng = np.random.default_rng(1)
    sigma = rng.uniform(1, 9, size=(base.nelements, 2))

    def run(disable):
        s = MultigridSolver(
            plan, dtype=jnp.float64, coarse=coarse, coarse_mg_dense_limit=20
        )
        if disable:
            s.lattice_stencil = None
        assert (s.lattice_stencil is None) == disable
        coeff = s.coefficients(sigma, 0.3)
        setup = s.coarse_setup(sigma, 0.3)
        x, b = s.zero_states()
        b = b + 1.0
        for _ in range(6):
            x, r = s.vcycle(x, b, coeff, setup)
        return np.asarray(x), float(s.residual_norm(r))

    x_st, rn_st = run(False)
    x_ref, rn_ref = run(True)
    scale = np.abs(x_ref).max()
    assert np.abs(x_st - x_ref).max() < 1e-9 * scale
    assert abs(rn_st - rn_ref) < 1e-9 * max(rn_ref, 1.0)
