"""The key oracle test (reference: test/test_operator.jl): the matrix-free
implicit apply + interface combine must match the explicitly assembled global
operator on the same refined geometry, elementwise to ~machine precision."""

import numpy as np
import jax.numpy as jnp
import pytest

from homogenization_jl_tpu.fem.assembly import assemble_laplace, assemble_operator
from homogenization_jl_tpu.fem.local_operators import element_coefficients
from homogenization_jl_tpu.mesh.grid import affine_maps, hypercube
from homogenization_jl_tpu.mesh.refine import refine_uniformly
from homogenization_jl_tpu.ops.apply import element_apply
from homogenization_jl_tpu.ops.interfaces import combine_interfaces
from homogenization_jl_tpu.ops.plan import build_grid_plan
from homogenization_jl_tpu.solver.multigrid import MultigridSolver


def _coordinate_mapping(plan, level, fine):
    """Map each duplicated-layout slot (e, i) to a global fine-mesh node by
    exact (dyadic) coordinate keys."""
    base = plan.base
    J, shift, _, _ = affine_maps(base)
    ref_nodes = plan.reference.levels[level].nodes
    allx = np.einsum("eij,nj->eni", J, ref_nodes) + shift[:, None, :]
    scale = 2**20
    keys = np.round(allx.reshape(-1, base.dim) * scale).astype(np.int64)
    fine_keys = np.round(fine.nodes * scale).astype(np.int64)

    def keyify(a):
        a = np.ascontiguousarray(a)
        return a.view([("", np.int64)] * a.shape[1]).ravel()

    fk = keyify(fine_keys)
    order = np.argsort(fk)
    pos = np.searchsorted(fk[order], keyify(keys))
    mapping = order[pos]
    assert np.array_equal(fk[mapping], keyify(keys)), "unmatched node"
    return mapping  # [E * n_local] -> fine node id


@pytest.mark.parametrize(
    "dim,n,levels,aniso",
    [(2, 2, 4, False), (2, 2, 3, True), (3, 2, 3, False), (3, 2, 3, True)],
)
def test_matrix_free_matches_assembled(dim, n, levels, aniso):
    rng = np.random.default_rng(42)
    base = hypercube(dim, n)
    plan = build_grid_plan(base, levels)
    fine = refine_uniformly(base, times=levels - 1)

    if aniso:
        sigma = rng.choice([1.0, 9.0], size=(base.nelements, dim))
        lam = 0.7
    else:
        sigma = np.ones((base.nelements, dim))
        lam = 0.0

    solver = MultigridSolver(plan, dtype=jnp.float64, coarse="cg")
    coeff = solver.coefficients(sigma, lam)
    k = levels - 1
    L = solver.levels[k]

    # consistent random x (combine makes duplicates agree)
    ct = plan.levels[k].combine
    slot_flat = jnp.asarray(ct.flat(plan.n_local(k)))
    slot_group = jnp.asarray(ct.slot_group)
    x = jnp.asarray(rng.standard_normal((base.nelements, plan.n_local(k))))
    x = combine_interfaces(x, slot_flat, slot_group, ct.n_groups)

    y = element_apply(x, coeff, L.stack)
    y = combine_interfaces(y, slot_flat, slot_group, ct.n_groups)

    # explicit path: conductivity of each fine element = its base parent's
    mapping = _coordinate_mapping(plan, k, fine)
    children = fine.nelements // base.nelements
    sigma_fine = np.repeat(sigma, children, axis=0)
    A = assemble_operator(fine, sigma_fine, lam)

    x_np = np.asarray(x).reshape(-1)
    total_x = np.zeros(fine.nnodes)
    total_x[mapping] = x_np  # duplicates agree, any copy works
    assert np.allclose(total_x[mapping], x_np)
    total_y = A @ total_x

    err = np.abs(total_y[mapping] - np.asarray(y).reshape(-1)).max()
    scale = np.abs(total_y).max()
    assert err <= 1e-12 * max(scale, 1.0), f"max err {err} (scale {scale})"


@pytest.mark.parametrize("dim", [2, 3])
def test_matrix_free_matches_assembled_tensor_sigma(dim):
    """Full-tensor (symmetric anisotropic) conductivity: matrix-free apply
    == explicit assembly (beyond the reference, whose sigma is diagonal)."""
    rng = np.random.default_rng(7)
    n, levels = 2, 3
    base = hypercube(dim, n)
    plan = build_grid_plan(base, levels)
    fine = refine_uniformly(base, times=levels - 1)

    # random SPD tensor per element: Q diag(w) Q^T with rotations Q
    W = rng.standard_normal((base.nelements, dim, dim))
    sigma = np.einsum("eki,elj,ekl->eij", W, W, np.eye(dim)[None]) + 0.5 * np.eye(dim)[None]
    lam = 0.3

    solver = MultigridSolver(plan, dtype=jnp.float64, coarse="cg")
    coeff = solver.coefficients(sigma, lam)
    k = levels - 1
    L = solver.levels[k]

    ct = plan.levels[k].combine
    slot_flat = jnp.asarray(ct.flat(plan.n_local(k)))
    slot_group = jnp.asarray(ct.slot_group)
    x = jnp.asarray(rng.standard_normal((base.nelements, plan.n_local(k))))
    x = combine_interfaces(x, slot_flat, slot_group, ct.n_groups)

    y = element_apply(x, coeff, L.stack)
    y = combine_interfaces(y, slot_flat, slot_group, ct.n_groups)

    mapping = _coordinate_mapping(plan, k, fine)
    children = fine.nelements // base.nelements
    sigma_fine = np.repeat(sigma, children, axis=0)
    A = assemble_operator(fine, sigma_fine, lam)

    x_np = np.asarray(x).reshape(-1)
    total_x = np.zeros(fine.nnodes)
    total_x[mapping] = x_np
    total_y = A @ total_x

    err = np.abs(total_y[mapping] - np.asarray(y).reshape(-1)).max()
    scale = np.abs(total_y).max()
    assert err <= 1e-12 * max(scale, 1.0), f"max err {err} (scale {scale})"


def test_assembled_laplace_sanity():
    """Row sums of a stiffness matrix vanish (constants in the kernel)."""
    m = refine_uniformly(hypercube(2, 2), times=2)
    A = assemble_laplace(m)
    assert np.abs(A @ np.ones(m.nnodes)).max() < 1e-12


def test_apply_accumulate_forms_agree():
    """The "loop" accumulation (f64-on-TPU memory form, ops/apply.py) and
    the default "unroll" form run the same matmuls in the same order and
    must agree to machine precision (XLA FMA-fusion choices differ between
    the two program shapes, so not bitwise) — the loop form is what mixed_precision_pcg's f64
    outer apply compiles at scale (round 5: unrolled f64 was a 42 GB
    compile-time OOM at 190M DOFs)."""
    import jax

    rng = np.random.default_rng(3)
    from homogenization_jl_tpu.solver.multigrid import MultigridSolver

    base = hypercube(3, 2)
    plan = build_grid_plan(base, 2)
    k = 1
    solver = MultigridSolver(plan, dtype=jnp.float64)
    L = solver.levels[k]
    sigma = rng.choice([1.0, 9.0], size=(base.nelements, 3))
    coeff = jnp.asarray(element_coefficients(base, sigma, 0.25, np.float64))
    x = jnp.asarray(rng.standard_normal((base.nelements, plan.n_local(k))))
    stack = L.stack

    y_unroll = jax.jit(
        lambda a, b, c: element_apply(a, b, c, accumulate="unroll")
    )(x, coeff, stack)
    y_loop = jax.jit(
        lambda a, b, c: element_apply(a, b, c, accumulate="loop")
    )(x, coeff, stack)
    err = np.abs(np.asarray(y_unroll) - np.asarray(y_loop)).max()
    scale = np.abs(np.asarray(y_unroll)).max()
    assert err <= 4 * np.finfo(np.float64).eps * scale, (err, scale)
