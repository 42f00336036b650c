"""Interpolation exactness (reference: test/interpolation.jl:8-35 — P1
prolongation reproduces affine functions exactly across all levels)."""

import numpy as np
import pytest

from homogenization_jl_tpu.mesh.reference import (
    prolongation_dense,
    refined_reference,
    with_contiguous_interface_layout,
)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("contiguous", [False, True])
def test_prolongation_exact_on_affine(dim, contiguous):
    L = 5
    ref = refined_reference(dim, L)
    if contiguous:
        ref = with_contiguous_interface_layout(ref)
    rng = np.random.default_rng(0)
    a = rng.standard_normal(dim)
    c = rng.standard_normal()

    def f(nodes):
        return nodes @ a + c

    for k in range(L - 1):
        coarse_vals = f(ref.levels[k].nodes)
        fine_vals = f(ref.levels[k + 1].nodes)
        P = prolongation_dense(ref, k)
        err = np.abs(P @ coarse_vals - fine_vals).max()
        assert err < 1e-13, f"level {k}: {err}"


@pytest.mark.parametrize("dim", [2, 3])
def test_level_in_level_maps_match_coordinates(dim):
    """level_in_level(k, m) must point at the same physical node."""
    ref = with_contiguous_interface_layout(refined_reference(dim, 4))
    for k in range(4):
        for m in range(k, 4):
            idx = ref.level_in_level(k, m)
            err = np.abs(ref.levels[m].nodes[idx] - ref.levels[k].nodes).max()
            assert err < 1e-14, (k, m, err)


@pytest.mark.parametrize("dim", [2, 3])
def test_prolongation_rows_sum_to_one(dim):
    """Partition of unity: P 1 = 1 (constants preserved)."""
    ref = with_contiguous_interface_layout(refined_reference(dim, 4))
    for k in range(3):
        P = prolongation_dense(ref, k)
        assert np.abs(P.sum(axis=1) - 1.0).max() < 1e-14
