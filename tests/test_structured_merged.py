"""The merged-trailing-dim combine variants produce BITWISE-identical
output to the production combine (same pieces, same addition order): the
merged view only changes how slices tile on device, never what is added.
Covers both element orders, with and without the folded constraint, and
the prepad / direct-face sub-variants (scripts/bench_combine.py picks the
fastest on hardware)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from homogenization_jl_tpu.mesh.grid import hypercube
from homogenization_jl_tpu.ops.plan import build_grid_plan
from homogenization_jl_tpu.ops import structured as st


@pytest.mark.parametrize("order", ["type", "cube"])
@pytest.mark.parametrize(
    "prepad,direct_face",
    [(False, False), (True, False), (False, True), (True, True)],
)
def test_merged_combine_bitwise_equal(order, prepad, direct_face, monkeypatch):
    base = hypercube(3, 4, order=order)
    plan = build_grid_plan(base, 4, slot_tables=False)
    k = 3
    sc = st.build_structured_combine(plan, k)
    lay_ref = plan.reference.layout[k]
    i0 = int(
        min(
            list(lay_ref.face_offsets)
            + list(lay_ref.edge_offsets)
            + list(lay_ref.corner_cols)
        )
    )
    lay = dict(iface_start=i0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((base.nelements, plan.n_local(k))))

    monkeypatch.setattr(st, "_PREPAD", prepad)
    monkeypatch.setattr(st, "_DIRECT_FACE", direct_face)
    for constrain in (False, True):
        ref = jax.jit(
            lambda a: st.combine_structured(a, sc, lay, constrain=constrain, merged=False)
        )(x)
        got = jax.jit(
            lambda a: st.combine_structured(a, sc, lay, constrain=constrain, merged=True)
        )(x)
        assert float(jnp.max(jnp.abs(got - ref))) == 0.0, (constrain,)
