"""VTK export, FFT fields, checkpointing."""

import os

import numpy as np
import jax
import pytest

from homogenization_jl_tpu.mesh.grid import hypercube
from homogenization_jl_tpu.ops.plan import build_grid_plan
from homogenization_jl_tpu.utils.checkpoint import load_step, save_step
from homogenization_jl_tpu.utils.fft_field import generate_field
from homogenization_jl_tpu.utils.vtk import (
    construct_full_grid,
    export_solution,
    write_vtu,
)


def test_write_vtu_roundtrip_structure(tmp_path):
    m = hypercube(2, 3)
    f = write_vtu(
        str(tmp_path / "mesh"),
        m,
        point_data={"u": np.arange(m.nnodes, dtype=np.float64)},
        cell_data={"sigma": np.ones((m.nelements, 2))},
    )
    content = open(f).read()
    assert content.startswith("<?xml")
    assert f'NumberOfPoints="{m.nnodes}"' in content
    assert f'NumberOfCells="{m.nelements}"' in content
    assert 'Name="u"' in content and 'Name="sigma"' in content


def test_construct_full_grid_counts():
    # reference: construct_full_grid repeats interface nodes
    base = hypercube(2, 2)
    plan = build_grid_plan(base, 3)
    full = construct_full_grid(plan, 2)
    ref = plan.reference.levels[2]
    assert full.nnodes == base.nelements * ref.nnodes
    assert full.nelements == base.nelements * ref.nelements


def test_export_solution(tmp_path):
    base = hypercube(3, 1)
    plan = build_grid_plan(base, 2)
    x = np.ones((base.nelements, plan.n_local(1)))
    f = export_solution(str(tmp_path / "sol"), plan, 1, x)
    assert os.path.exists(f)


def test_fft_field_properties():
    key = jax.random.PRNGKey(0)
    f = generate_field(key, (16, 16), p=1.5, alpha=3.0)
    f = np.asarray(f)
    assert f.shape == (16, 16)
    assert np.all(f >= 1.0)  # exp(alpha*|x|) >= 1
    assert np.isfinite(f).all()
    # deterministic under the same key
    f2 = np.asarray(generate_field(key, (16, 16), p=1.5, alpha=3.0))
    assert np.array_equal(f, f2)
    # 3d path
    f3 = np.asarray(generate_field(key, (8, 8, 8)))
    assert f3.shape == (8, 8, 8) and np.isfinite(f3).all()


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((10, 6))
    path = save_step(
        str(tmp_path / "step0"),
        k=1,
        sigma=1.23,
        lam=0.5,
        box_radius=8,
        total_radius=24,
        x=x,
        b=x * 2,
        v_prev=None,
        cond_field=rng.choice([1.0, 9.0], size=(4, 4, 2)),
        xi=np.ones(2) / np.sqrt(2),
        n=3,
        refinements=1,
    )
    state = load_step(path)
    assert state["k"] == 1 and state["sigma"] == 1.23 and state["lam"] == 0.5
    assert np.array_equal(state["x"], x)
    assert state["v_prev"] is None


def test_st1_example_end_to_end(tmp_path):
    """st1 spectral-field solve (reference: st1_example,
    tools/generate_st1_field.jl:122-136)."""
    from homogenization_jl_tpu.models.st1 import st1_example

    mesh, u, sigma_el = st1_example(n=8, dim=2, lam=1.0, alpha=2.0, seed=1,
                                    save=str(tmp_path / "st1"))
    assert np.isfinite(u).all() and np.abs(u).max() > 0
    assert sigma_el.shape == (mesh.nelements,)
    assert (sigma_el >= 1.0).all()
    assert os.path.exists(tmp_path / "st1.vtu")


@pytest.mark.slow  # ~10s solve; smoke lane skips it
def test_st1_multigrid_matches_direct():
    """st1 solve on the implicit fine grid == direct solve of the explicitly
    refined mesh with the same per-base-element field (the scalable path the
    reference tool never had)."""
    import scipy.sparse.linalg as spl

    from homogenization_jl_tpu.fem.assembly import assemble_operator
    from homogenization_jl_tpu.fem.local_operators import load_vector
    from homogenization_jl_tpu.mesh.grid import affine_maps, interior_nodes
    from homogenization_jl_tpu.mesh.refine import refine_uniformly
    from homogenization_jl_tpu.models.st1 import (
        conductivity_per_cell,
        st1_multigrid,
    )

    n, dim, refinements, lam = 6, 2, 2, 1.0
    history, x, solver, sigma_el = st1_multigrid(
        n=n, dim=dim, refinements=refinements, lam=lam, alpha=2.0, seed=3,
        max_cycles=14,
    )
    assert history[-1] < 1e-6 * history[0]

    plan = solver.plan
    base = plan.base
    fine = refine_uniformly(base, times=refinements)
    # fine elements inherit the parent base element's scalar sigma: look the
    # field value up at fine-element centers (cells align with unit cells)
    from homogenization_jl_tpu.utils.fft_field import st1_conductivity
    import jax

    field = st1_conductivity(jax.random.PRNGKey(3), n, dim, p=1.5, alpha=2.0)
    sigma_fine = conductivity_per_cell(fine, field)
    A = assemble_operator(fine, sigma_fine, lam)
    b = load_vector(fine)
    ii = interior_nodes(fine)
    u = np.zeros(fine.nnodes)
    u[ii] = spl.spsolve(A[np.ix_(ii, ii)].tocsc(), b[ii])

    J, shift, _, _ = affine_maps(base)
    refn = plan.reference.levels[refinements].nodes
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
    err = np.abs(u[mapping] - np.asarray(x).reshape(-1)).max()
    assert err < 1e-6, f"solution error {err}"


@pytest.mark.slow  # ~10s solve; smoke lane skips it
def test_multishift_demo_matches_per_shift_cg():
    from homogenization_jl_tpu.models.multishift import multishift_demo

    worst, res = multishift_demo(dim=2, n=3, levels=2, n_shifts=3, iters=120)
    assert worst < 1e-6, worst
    assert (res < 1e-6).all()
