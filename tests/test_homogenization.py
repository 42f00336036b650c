"""Checkerboard homogenization driver tests.

Cross-language RNG prevents reproducing the reference's exact sigma values
(SURVEY.md §6); instead we pin our own conductivity fixtures and check
(a) determinism, (b) the known asymptotics E[xi.A xi] = 5 with sigma in a
plausible band (reference values for n=5, 2D: 1.61/1.89/1.95 for refinements
1/2/3), and (c) agreement of the k=0 recurrence step against an explicit
direct solve of the same shifted problem."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke lane (pytest -m "not slow")

import numpy as np
import jax.numpy as jnp

import scipy.sparse.linalg as spl

from homogenization_jl_tpu.fem.assembly import assemble_operator
from homogenization_jl_tpu.fem.local_operators import (
    mass_matrix,
    partial_derivative_functionals,
)
from homogenization_jl_tpu.mesh.grid import affine_maps, interior_nodes
from homogenization_jl_tpu.mesh.refine import refine_uniformly
from homogenization_jl_tpu.models.checkerboard import (
    checkerboard_homogenization,
    compute_boundary_layer,
    compute_box_radius,
    conductivity_per_element,
    generate_conductivity,
    initial_rhs,
    ordered_hypercube,
    prefix_in_radius,
)


def test_schedule_values():
    # reference docstring: n=5 2D initial domain [-37,37]^2, n=3 3D [-13,13]^3
    assert compute_box_radius(0, 5) + compute_boundary_layer(1.0, 5) == 56  # 2^5 + 24
    assert compute_box_radius(0, 3) + compute_boundary_layer(1.0, 3) == 24
    # (the docstring's 37 = 32 + ... uses 4(n+1)sqrt(1)=24 -> 56? The quoted
    # [-37,37] in the reference docstring corresponds to refinements-dependent
    # sizes; the formulas here are the reference's own, :9-10.)
    assert compute_boundary_layer(0.5, 3) == int(16 / np.sqrt(0.5))
    assert compute_box_radius(2, 5) == 16  # floor(2^(5 - 2*0.5))
    assert compute_box_radius(3, 5) == 11  # floor(2^3.5)


def test_ordered_hypercube_prefix_properties():
    mesh, node_norms, center_norms = ordered_hypercube(2, 4)
    assert np.all(np.diff(node_norms) >= 0)
    assert np.all(np.diff(center_norms) >= 0)
    # prefix of elements within radius 2 covers the [-2,2]^2 box: 2*(4)^2 tris
    ne = prefix_in_radius(center_norms, 2)
    assert ne == 2 * 16
    nn = prefix_in_radius(node_norms, 2, eps=1e-12)
    assert nn == 25
    # element rows sorted, indices within node prefix
    assert np.all(np.diff(mesh.elements, axis=1) > 0)
    assert mesh.elements[:ne].max() < nn


def test_conductivity_lookup():
    mesh, _, _ = ordered_hypercube(2, 2)
    rng = np.random.default_rng(0)
    field = generate_conductivity(2, 4, rng)
    sig = conductivity_per_element(mesh, field, np.array([2.0, 2.0]))
    # both triangles of a unit cell share the cell's conductivity
    centers = mesh.nodes[mesh.elements].mean(axis=1)
    idx = np.floor(centers + 2.0).astype(int)
    assert np.array_equal(sig, field[idx[:, 0], idx[:, 1]])
    assert set(np.unique(sig)) <= {1.0, 9.0}


def test_initial_rhs_matches_explicit_assembly():
    """b0 must equal the explicit assembly of F(v) = -int (sigma xi) . grad v
    over the refined mesh, elementwise on the duplicated layout."""
    from homogenization_jl_tpu.ops.plan import build_grid_plan
    from homogenization_jl_tpu.mesh.grid import hypercube

    dim, n, levels = 2, 2, 3
    base = hypercube(dim, n)
    rng = np.random.default_rng(5)
    sigma = rng.choice([1.0, 9.0], size=(base.nelements, dim))
    xi = np.ones(dim) / np.sqrt(dim)
    plan = build_grid_plan(base, levels)
    b0 = initial_rhs(plan, sigma, xi)  # [E, n_local]

    # explicit: per fine element t (child of base e), local contribution to
    # node i:  -int_t (sigma_e xi) . grad phi_i
    fine = refine_uniformly(base, times=levels - 1)
    children = fine.nelements // base.nelements
    sigma_fine = np.repeat(sigma, children, axis=0)
    from homogenization_jl_tpu.fem.quadrature import basis_gradients, simplex_measure

    _, _, detJ, Jinv = affine_maps(fine)
    ghat = basis_gradients(dim)
    G = np.einsum("tdk,km->tdm", np.swapaxes(Jinv, 1, 2), ghat)  # phys grads
    w = simplex_measure(dim) * detJ
    contrib = -np.einsum("t,td,tdm->tm", w, sigma_fine * xi, G)
    b_explicit = np.zeros(fine.nnodes)
    np.add.at(b_explicit, fine.elements, contrib)

    # combine the duplicated b0 and compare through the coordinate mapping
    from homogenization_jl_tpu.ops.interfaces import combine_interfaces
    from homogenization_jl_tpu.solver.multigrid import MultigridSolver

    solver = MultigridSolver(plan, coarse="cg")
    ct = plan.levels[levels - 1].combine
    b0c = combine_interfaces(
        jnp.asarray(b0),
        jnp.asarray(ct.flat(plan.n_local(levels - 1))),
        jnp.asarray(ct.slot_group),
        ct.n_groups,
    )

    J, shift, _, _ = affine_maps(base)
    refn = plan.reference.levels[levels - 1].nodes
    allx = (np.einsum("eij,nj->eni", J, refn) + shift[:, None, :]).reshape(-1, dim)

    def key(a):
        return (
            np.ascontiguousarray(np.round(a * 2**20).astype(np.int64))
            .view([("", np.int64)] * dim)
            .ravel()
        )

    fk = key(fine.nodes)
    order = np.argsort(fk)
    mapping = order[np.searchsorted(fk[order], key(allx))]
    err = np.abs(b_explicit[mapping] - np.asarray(b0c).reshape(-1)).max()
    assert err < 1e-13


def test_homogenization_2d_deterministic_and_plausible():
    s1 = checkerboard_homogenization(2, dim=2, refinements=1, tolerance=1e-4, seed=7)
    s2 = checkerboard_homogenization(2, dim=2, refinements=1, tolerance=1e-4, seed=7)
    assert s1 == s2  # bit-exact determinism with a pinned seed
    # plausible band: sigma corrects E=5 toward a_hom in (1, 5)
    assert 0.5 < s1 < 4.0


@pytest.mark.parametrize("geometry", ["ordered", "lattice"])
def test_homogenization_k0_against_direct_solve(geometry):
    """For k=0 the recurrence computes sigma_0 = int v0 (b-density + M v0) /
    area with (lam - div a grad) v0 = -div(a xi). Solve the same problem
    directly on the explicit mesh and compare the integral. The oracle is
    geometry-independent, so it gates BOTH drivers: the reference-parity
    ordered/prefix-shrink one and the lattice pad-and-mask one."""
    dim, n_exp, refinements = 2, 2, 1
    tol = 1e-10
    sig, trace = checkerboard_homogenization(
        n_exp,
        dim=dim,
        refinements=refinements,
        tolerance=tol,
        seed=11,
        max_cycles=300,
        return_trace=True,
        geometry=geometry,
    )

    # replicate setup
    lam = 1.0
    box_radius = compute_box_radius(0, n_exp)
    total_radius = box_radius + compute_boundary_layer(lam, n_exp)
    base, node_norms, center_norms = ordered_hypercube(dim, total_radius)
    rng = np.random.default_rng(11)
    field = generate_conductivity(dim, 2 * total_radius, rng)
    sigma_el = conductivity_per_element(base, field, np.full(dim, float(total_radius)))
    xi = np.ones(dim) / np.sqrt(dim)

    fine = refine_uniformly(base, times=refinements)
    children = fine.nelements // base.nelements
    sigma_fine = np.repeat(sigma_el, children, axis=0)

    # assemble (lam*M + A) and rhs -int (sigma xi) . grad v
    A = assemble_operator(fine, sigma_fine, lam)
    from homogenization_jl_tpu.fem.quadrature import basis_gradients, simplex_measure

    _, _, detJ, Jinv = affine_maps(fine)
    G = np.einsum("tdk,km->tdm", np.swapaxes(Jinv, 1, 2), basis_gradients(dim))
    w = simplex_measure(dim) * detJ
    b = np.zeros(fine.nnodes)
    np.add.at(b, fine.elements, -np.einsum("t,td,tdm->tm", w, sigma_fine * xi, G))

    ii = interior_nodes(fine)
    v0 = np.zeros(fine.nnodes)
    v0[ii] = spl.spsolve(A[np.ix_(ii, ii)].tocsc(), b[ii])

    # sigma_0 = int_box v0 (f + v0) with f the rhs density, via FEM integrals:
    # = v0 . b_box + v0 . M_box v0 over the box subset
    n_box = prefix_in_radius(center_norms, box_radius)
    keep = np.zeros(base.nelements, dtype=bool)
    keep[:n_box] = True
    keep_fine = np.repeat(keep, children)
    Mbox = mass_matrix_subset(fine, keep_fine)
    bbox = rhs_subset(fine, keep_fine, sigma_fine, xi)
    area = float(np.sum(detJ[keep_fine]) * simplex_measure(dim))
    integral = v0 @ bbox + v0 @ (Mbox @ v0)
    sigma0_direct = integral / area

    assert abs(trace.sigma_steps[0] - sigma0_direct) < 5e-7, (
        trace.sigma_steps[0],
        sigma0_direct,
    )


def mass_matrix_subset(mesh, keep):
    """Mass matrix assembled over a subset of elements."""
    import scipy.sparse as sp
    from homogenization_jl_tpu.fem.quadrature import basis_values, quad_rule

    d = mesh.dim
    pts, wq = quad_rule(d)
    phi = basis_values(pts)
    _, _, detJ, _ = affine_maps(mesh)
    M_ref = np.einsum("q,qi,qj->ij", wq, phi, phi)
    M_loc = (detJ * keep)[:, None, None] * M_ref[None]
    el = mesh.elements
    N = el.shape[1]
    rows = np.broadcast_to(el[:, :, None], M_loc.shape).ravel()
    cols = np.broadcast_to(el[:, None, :], M_loc.shape).ravel()
    return sp.coo_matrix((M_loc.ravel(), (rows, cols)), shape=(mesh.nnodes,) * 2).tocsr()


def rhs_subset(mesh, keep, sigma_fine, xi):
    from homogenization_jl_tpu.fem.quadrature import basis_gradients, simplex_measure

    d = mesh.dim
    _, _, detJ, Jinv = affine_maps(mesh)
    G = np.einsum("tdk,km->tdm", np.swapaxes(Jinv, 1, 2), basis_gradients(d))
    w = simplex_measure(d) * detJ * keep
    b = np.zeros(mesh.nnodes)
    np.add.at(b, mesh.elements, -np.einsum("t,td,tdm->tm", w, sigma_fine * xi, G))
    return b


def _coord_key(a, dim):
    return (
        np.ascontiguousarray(np.round(a * 2**20).astype(np.int64))
        .view([("", np.int64)] * dim)
        .ravel()
    )


@pytest.mark.parametrize("geometry", ["ordered", "lattice"])
def test_homogenization_k1_against_direct_solve(monkeypatch, geometry):
    """Two-step recurrence oracle: v1 computed by a direct sparse solve of
    (lam/2 M + A) v1 = lam/2 M v0 on the explicitly refined shrunken mesh
    must reproduce the driver's Delta-sigma_1 (integrate_terms + next_rhs +
    the prefix-shrink chain, reference homogenized_coefficients.jl:634-713).

    The reference schedule constants only allow a k=1 step for n >= 5 (a
    25k-element domain); the oracle is about the recurrence algebra, not the
    schedule, so the boundary layer is monkeypatched smaller to make a tiny
    two-step run."""
    import homogenization_jl_tpu.models.checkerboard as cb
    from homogenization_jl_tpu.mesh.grid import Mesh
    from homogenization_jl_tpu.fem.quadrature import simplex_measure

    def small_layer(lam, n):
        return int(np.floor((n + 1) * lam**-0.5))

    monkeypatch.setattr(cb, "compute_boundary_layer", small_layer)

    dim, n_exp, refinements = 2, 2, 1
    sig, trace = cb.checkerboard_homogenization(
        n_exp,
        dim=dim,
        refinements=refinements,
        tolerance=1e-11,
        seed=13,
        max_cycles=400,
        return_trace=True,
        geometry=geometry,
    )
    assert len(trace.sigma_steps) >= 2, "schedule did not reach a k=1 step"

    # ---- step 0: direct solve on the full domain --------------------------
    lam = 1.0
    box0 = cb.compute_box_radius(0, n_exp)
    R0 = box0 + small_layer(lam, n_exp)
    base, node_norms, center_norms = cb.ordered_hypercube(dim, R0)
    rng = np.random.default_rng(13)
    field = cb.generate_conductivity(dim, 2 * R0, rng)
    sigma_el = cb.conductivity_per_element(base, field, np.full(dim, float(R0)))
    xi = np.ones(dim) / np.sqrt(dim)

    fine = refine_uniformly(base, times=refinements)
    children = fine.nelements // base.nelements
    sigma_fine = np.repeat(sigma_el, children, axis=0)
    A = assemble_operator(fine, sigma_fine, lam)
    keep_all = np.ones(fine.nelements, dtype=bool)
    b = rhs_subset(fine, keep_all, sigma_fine, xi)
    ii = interior_nodes(fine)
    v0 = np.zeros(fine.nnodes)
    v0[ii] = spl.spsolve(A[np.ix_(ii, ii)].tocsc(), b[ii])

    # ---- shrink to the k=1 domain (prefix slices) -------------------------
    lam = 0.5
    box1 = cb.compute_box_radius(1, n_exp)
    R1 = box1 + small_layer(lam, n_exp)
    assert R1 <= R0
    n_nodes = cb.prefix_in_radius(node_norms, R1, eps=1e-12)
    n_elems = cb.prefix_in_radius(center_norms, R1)
    base1 = Mesh(base.nodes[:n_nodes], base.elements[:n_elems])
    sigma_fine1 = np.repeat(sigma_el[:n_elems], children, axis=0)
    fine1 = refine_uniformly(base1, times=refinements)

    # v_prev: v0 restricted to the shrunken fine mesh (coordinate match),
    # zeroed on the new boundary (driver: slice + apply_mask)
    fk = _coord_key(fine.nodes, dim)
    order = np.argsort(fk)
    mapping = order[np.searchsorted(fk[order], _coord_key(fine1.nodes, dim))]
    v_prev = v0[mapping]
    ii1 = interior_nodes(fine1)
    interior_mask = np.zeros(fine1.nnodes)
    interior_mask[ii1] = 1.0
    v_prev = v_prev * interior_mask

    # ---- step 1: b1 = lam M v_prev; solve (lam M + A) v1 = b1 -------------
    M1 = mass_matrix_subset(fine1, np.ones(fine1.nelements, dtype=bool))
    b1 = lam * (M1 @ v_prev)
    A1 = assemble_operator(fine1, sigma_fine1, lam)
    v1 = np.zeros(fine1.nnodes)
    v1[ii1] = spl.spsolve(A1[np.ix_(ii1, ii1)].tocsc(), b1[ii1])

    # ---- Delta-sigma_1 = 2^1 int_box (v1 + v_prev) M v1 / area ------------
    n_box = cb.prefix_in_radius(center_norms[:n_elems], box1)
    keep = np.zeros(base1.nelements, dtype=bool)
    keep[:n_box] = True
    keep_fine = np.repeat(keep, children)
    Mbox = mass_matrix_subset(fine1, keep_fine)
    _, _, detJ1, _ = affine_maps(fine1)
    area = float(np.sum(detJ1[keep_fine]) * simplex_measure(dim))
    dsigma1_direct = 2.0 * ((v1 + v_prev) @ (Mbox @ v1)) / area

    dsigma1_driver = trace.sigma_steps[1] - trace.sigma_steps[0]
    assert abs(dsigma1_driver - dsigma1_direct) < 1e-6, (
        dsigma1_driver,
        dsigma1_direct,
    )


def test_checkpoint_resume_matches_uninterrupted(tmp_path):
    """Resuming from a step-0 checkpoint reproduces the uninterrupted run."""
    kwargs = dict(dim=2, refinements=1, tolerance=1e-4, seed=21)
    full = checkerboard_homogenization(2, checkpoint_dir=str(tmp_path), **kwargs)
    resumed = checkerboard_homogenization(
        2, resume_from=str(tmp_path / "step_0.npz"), **kwargs
    )
    assert resumed == full


def test_lattice_checkpoint_resume(tmp_path):
    kwargs = dict(dim=2, refinements=1, tolerance=1e-4, seed=23,
                  geometry="lattice")
    full = checkerboard_homogenization(2, checkpoint_dir=str(tmp_path), **kwargs)
    resumed = checkerboard_homogenization(
        2, resume_from=str(tmp_path / "step_0.npz"), **kwargs
    )
    assert resumed == full


def test_lattice_sharded_driver_matches_single():
    """geometry='lattice' + device_mesh runs the slab solver end to end and
    reproduces the single-device lattice sigma (the sharded flagship)."""
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:8]), ("e",))
    # lattice_order pinned so both runs share element order -> identical
    # random inits -> sigma comparable at 1e-9 (not just solve tolerance)
    kwargs = dict(dim=2, refinements=1, tolerance=1e-6, seed=29,
                  max_cycles=100, geometry="lattice", lattice_order="cube")
    s1 = checkerboard_homogenization(2, **kwargs)
    s8 = checkerboard_homogenization(2, device_mesh=mesh, **kwargs)
    assert abs(s8 - s1) < 1e-9 * abs(s1), (s1, s8)


def test_sharded_checkpoint_resume(tmp_path):
    """checkpoint_dir + device_mesh compose: resuming a slab-sharded
    lattice run from its step-0 file reproduces the uninterrupted sharded
    sigma (the sharded flagship's recovery story for multi-hour runs)."""
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:8]), ("e",))
    kwargs = dict(dim=2, refinements=1, tolerance=1e-4, seed=31,
                  geometry="lattice", lattice_order="cube", device_mesh=mesh)
    full = checkerboard_homogenization(2, checkpoint_dir=str(tmp_path), **kwargs)
    resumed = checkerboard_homogenization(
        2, resume_from=str(tmp_path / "step_0.npz"), **kwargs
    )
    assert resumed == full


@pytest.mark.parametrize("geometry", ["ordered", "lattice"])
def test_driver_inner_pcg_matches_vcycle(geometry):
    """inner="pcg" (V-cycle-preconditioned CG inner solves under the same
    sigma-increment stopping rule) produces the same sigma as the
    reference-parity plain-V-cycle inner loop, within the tolerance."""
    kw = dict(dim=2, refinements=1, tolerance=1e-6, seed=3,
              dtype=jnp.float64, geometry=geometry)
    s_v = checkerboard_homogenization(2, **kw)
    s_p, tr = checkerboard_homogenization(
        2, smoother="chebyshev", inner="pcg", return_trace=True, **kw
    )
    assert abs(s_v - s_p) < 50 * 1e-6, (s_v, s_p)
    assert all(c >= 1 for c in tr.cycles_per_step)


def test_driver_inner_pcg_sharded_matches_single():
    """inner="pcg" end to end on both sharded drivers == single-device."""
    import jax
    from jax.sharding import Mesh

    mesh8 = Mesh(np.array(jax.devices()[:8]), ("e",))
    # ordered geometry -> general-mesh sharded solver
    kw_o = dict(dim=2, refinements=1, tolerance=1e-5, seed=7,
                smoother="chebyshev", inner="pcg", geometry="ordered")
    s1 = checkerboard_homogenization(1, **kw_o)
    s8 = checkerboard_homogenization(1, device_mesh=mesh8, **kw_o)
    assert abs(s8 - s1) < 1e-9 * max(abs(s1), 1e-300), (s1, s8)
    # lattice geometry -> slab solver (4 shards divide the 14-cube box? use
    # a box the shard count divides: n=1 -> 2*R0 cubes; R0=box+layer)
    kw_l = dict(dim=2, refinements=1, tolerance=1e-5, seed=7,
                smoother="chebyshev", inner="pcg", geometry="lattice",
                lattice_order="cube")
    l1 = checkerboard_homogenization(1, **kw_l)
    mesh4 = Mesh(np.array(jax.devices()[:4]), ("e",))
    l4 = checkerboard_homogenization(1, device_mesh=mesh4, **kw_l)
    assert abs(l4 - l1) < 1e-9 * max(abs(l1), 1e-300), (l1, l4)
