"""The merged-trailing-dim combine variants produce BITWISE-identical
output to the production combine (same pieces, same addition order): the
merged view only changes how slices tile on device, never what is added.
Covers both element orders, with and without the folded constraint, and
the prepad / direct-face sub-variants (scripts/bench_combine.py picks the
fastest on hardware)."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke lane (pytest -m "not slow")

import numpy as np
import jax
import jax.numpy as jnp

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


def test_merged_slab_combine_and_vcycle_bitwise_equal(monkeypatch):
    """Slab-sharded merged combine == slab current combine, bitwise, on the
    8-virtual-device mesh — including the folded-constraint path via two
    full V-cycles (cg_exact smoothing exercises combine_constrained)."""
    from jax.sharding import Mesh
    from homogenization_jl_tpu.fem.local_operators import load_vector
    from homogenization_jl_tpu.mesh.grid import affine_maps
    from homogenization_jl_tpu.parallel.slab import SlabShardedMultigridSolver

    base = hypercube(3, 8, order="cube")
    plan = build_grid_plan(base, 3, slot_tables=False)
    mesh = Mesh(np.array(jax.devices()[:8]), ("e",))
    rng = np.random.default_rng(1)
    sigma = rng.choice([1.0, 9.0], size=(base.nelements, 3))
    b_ref = load_vector(plan.reference.levels[2])
    _, _, detJ, _ = affine_maps(base)
    b_np = detJ[:, None] * b_ref[None, :]
    xs = [
        rng.standard_normal((base.nelements, plan.n_local(k)))
        for k in range(plan.nlevels)
    ]

    def run(merged):
        # the knob is read at TRACE time — set it, then build AND use
        monkeypatch.setattr(st, "_MERGED", merged)
        sh = SlabShardedMultigridSolver(
            plan, mesh, dtype=jnp.float64, coarse="cg", smoother="cg_exact"
        )
        coeff = sh.coefficients(sigma, 0.2)
        setup = sh.coarse_setup(sigma, 0.2)
        combs = [np.asarray(sh.combine(sh.put(xs[k]), k)) for k in range(plan.nlevels)]
        x, _ = sh.zero_states()
        bb = sh.put(b_np)
        for _ in range(2):
            x, r = sh.vcycle(x, bb, coeff, setup)
        return combs, np.asarray(x), np.asarray(r)

    combs_a, x_a, r_a = run(False)
    combs_b, x_b, r_b = run(True)
    for k, (a, b) in enumerate(zip(combs_a, combs_b)):
        assert np.abs(a - b).max() == 0.0, k
    assert np.abs(x_a - x_b).max() == 0.0
    assert np.abs(r_a - r_b).max() == 0.0
