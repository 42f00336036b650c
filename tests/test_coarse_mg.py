"""Base-mesh coarsening (coarse="mg"): the aux-hierarchy-preconditioned CG
coarse solve must reproduce the direct (Cholesky) coarse solve's V-cycle to
solver tolerance. This is the scaling replacement for the reference's
BaseLevel direct solve (src/multigrid.jl:30-41) when the base mesh is large.
"""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke lane (pytest -m "not slow")

import numpy as np
import jax.numpy as jnp

from homogenization_jl_tpu.fem.local_operators import load_vector
from homogenization_jl_tpu.mesh.grid import affine_maps, hypercube
from homogenization_jl_tpu.models.checkerboard import (
    conductivity_per_element,
    generate_conductivity,
)
from homogenization_jl_tpu.ops.plan import build_grid_plan
from homogenization_jl_tpu.solver.coarse import build_coarse_geometry, detect_box
from homogenization_jl_tpu.solver.multigrid import MultigridSolver


def _setup(dim, n, levels, lam=0.0, seed=3):
    base = hypercube(dim, n)
    rng = np.random.default_rng(seed)
    field = generate_conductivity(dim, n, rng)
    sigma = conductivity_per_element(base, field, np.zeros(dim))
    plan = build_grid_plan(base, levels)
    b_ref = load_vector(plan.reference.levels[levels - 1])
    _, _, detJ, _ = affine_maps(base)
    b = detJ[:, None] * b_ref[None, :]
    return plan, sigma, b


def test_detect_box():
    assert detect_box(hypercube(2, 4)) is not None
    assert detect_box(hypercube(3, 4, scale=0.5, origin=(-1.0, 0.0, 2.0))) is not None
    # a shrunken prefix mesh is not a box
    from homogenization_jl_tpu.models.checkerboard import ordered_hypercube
    from homogenization_jl_tpu.mesh.grid import Mesh

    mesh, _, cn = ordered_hypercube(2, 3)
    cut = Mesh(mesh.nodes, mesh.elements[: mesh.nelements // 2])
    assert detect_box(cut) is None


@pytest.mark.parametrize("dim,n,levels", [(2, 8, 3), (3, 4, 2)])
def test_coarse_geometry_invariants(dim, n, levels):
    plan = build_grid_plan(hypercube(dim, n), levels)
    g = build_coarse_geometry(plan, dense_limit=4)
    assert g is not None and g.m >= 1
    # every base node covered exactly once by the first-copy mask
    assert int(g.aux_first_mask.sum()) == plan.base.nnodes
    # node_map slots agree with base coordinates through the first-flat table
    E0, n_aux = g.node_map.shape
    assert g.aux_first_flat.max() < E0 * n_aux
    # cube averaging conserves the mean for constant fields
    sig = np.ones((plan.base.nelements, dim))
    assert np.allclose(g.average_sigma(sig), 1.0)


@pytest.mark.parametrize(
    "dim,n,levels,lam", [(2, 8, 3, 0.0), (2, 8, 3, 0.7), (3, 4, 2, 0.3)]
)
def test_mg_coarse_matches_chol_coarse(dim, n, levels, lam):
    plan, sigma, b_np = _setup(dim, n, levels)

    ref = MultigridSolver(plan, coarse="chol")
    coeff = ref.coefficients(sigma, lam)
    chol = ref.coarse_cholesky(sigma, lam)
    x, _ = ref.zero_states()
    b = jnp.asarray(b_np)

    mg = MultigridSolver(plan, coarse="mg", coarse_mg_dense_limit=4, coarse_mg_tol=1e-12)
    coeff_m = mg.coefficients(sigma, lam)
    setup_m = mg.coarse_setup(sigma, lam)
    x_m, _ = mg.zero_states()

    norms = []
    for _ in range(6):
        x, r = ref.vcycle(x, b, coeff, chol)
        x_m, r_m = mg.vcycle(x_m, b, coeff_m, setup_m)
        norms.append(float(mg.residual_norm(r_m)))

    scale = float(jnp.abs(x).max())
    err = float(jnp.abs(x_m - x).max()) / scale
    # the coarse solves agree to coarse_mg_tol, so the V-cycle iterates do too
    assert err < 1e-9, err
    # and the mg-coarse cycle contracts like the chol-coarse one
    assert norms[-1] < 1e-2 * norms[0], norms
    assert abs(norms[-1] - float(ref.residual_norm(r))) < 1e-9 * norms[0]


def test_inv_coarse_matches_chol_coarse():
    """coarse='inv' (dense-inverse matmul, MXU-friendly) == coarse='chol'
    in f64 up to inverse roundoff."""
    plan, sigma, b_np = _setup(2, 4, 3)
    lam = 0.2

    ref = MultigridSolver(plan, coarse="chol")
    coeff = ref.coefficients(sigma, lam)
    chol = ref.coarse_setup(sigma, lam)
    x, _ = ref.zero_states()
    b = jnp.asarray(b_np)

    inv = MultigridSolver(plan, coarse="inv")
    setup_i = inv.coarse_setup(sigma, lam)
    x_i, _ = inv.zero_states()

    for _ in range(5):
        x, r = ref.vcycle(x, b, coeff, chol)
        x_i, r_i = inv.vcycle(x_i, b, coeff, setup_i)
    err = float(jnp.abs(x_i - x).max()) / float(jnp.abs(x).max())
    assert err < 1e-11, err


def test_mg_coarse_contraction_deep():
    """Deeper coarsening (m=2) still converges: n=8 3D base, dense_limit=4
    forces mesh_0 = hypercube(2)."""
    plan, sigma, b_np = _setup(3, 8, 2)
    mg = MultigridSolver(plan, coarse="mg", coarse_mg_dense_limit=4)
    g = mg.coarse_geom
    assert g.m == 2
    coeff = mg.coefficients(sigma, 0.0)
    setup = mg.coarse_setup(sigma, 0.0)
    x, _ = mg.zero_states()
    b = jnp.asarray(b_np)
    norms = []
    for _ in range(8):
        x, r = mg.vcycle(x, b, coeff, setup)
        norms.append(float(mg.residual_norm(r)))
    assert norms[-1] < 1e-4 * norms[0], norms
