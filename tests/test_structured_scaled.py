"""Rescaled orbit derivation (build_structured_combine_scaled) equals the
direct per-group census — structurally and on device, bitwise.

The scaled build derives orbit rules on two small boxes and extrapolates
every anchor range affinely in n; its internal validation checks global
group/boundary counts exactly and a sampled owner-set match against the
real gather tables (ops/structured.py). Here we additionally assert full
structural equality with the direct build and bitwise-equal combine output.
(Reference operation: broadcast_interfaces!, src/implicit_fine_grid.jl:209-328.)
"""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke lane (pytest -m "not slow")

import numpy as np
import jax.numpy as jnp

from homogenization_jl_tpu.mesh.grid import hypercube
from homogenization_jl_tpu.ops.plan import build_grid_plan
from homogenization_jl_tpu.ops import structured as st


@pytest.mark.parametrize(
    "d,n,nlevels,order",
    [(2, 12, 3, "type"), (3, 9, 3, "cube"), (3, 8, 3, "type")],
)
def test_scaled_equals_direct(d, n, nlevels, order):
    base = hypercube(d, n, order=order)
    plan = build_grid_plan(base, nlevels, slot_tables=False)
    rng = np.random.default_rng(0)
    for k in range(1, nlevels):
        sc_d = st.build_structured_combine(plan, k)
        sc_s = st.build_structured_combine_scaled(plan, k)
        assert sc_d.pad == sc_s.pad and sc_d.order == sc_s.order
        assert set(sc_d.classes) == set(sc_s.classes)
        for name in sc_d.classes:
            od, rd, ofd, wd = sc_d.classes[name]
            os_, rs, ofs, ws = sc_s.classes[name]
            assert ofd == ofs and wd == ws
            by_pat_d = {o.pattern: o for o in od}
            by_pat_s = {o.pattern: o for o in os_}
            assert by_pat_d == by_pat_s, name
            for key in rd:
                oi_d, dl_d = rd[key]
                oi_s, dl_s = rs[key]
                assert dl_d == dl_s
                assert od[oi_d].pattern == os_[oi_s].pattern

        E, nl = base.nelements, plan.n_local(k)
        x = jnp.asarray(rng.standard_normal((E, nl)))
        lay_ref = plan.reference.layout[k]
        i0 = int(
            min(
                list(lay_ref.face_offsets)
                + list(lay_ref.edge_offsets)
                + list(lay_ref.corner_cols)
            )
        )
        lay = dict(iface_start=i0)
        for constrain in (False, True):
            y_d = st.combine_structured(x, sc_d, lay, constrain=constrain)
            y_s = st.combine_structured(x, sc_s, lay, constrain=constrain)
            assert float(jnp.max(jnp.abs(y_d - y_s))) == 0.0
