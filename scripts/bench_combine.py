"""Time the structured interface-combine layout variants on hardware
(NEXT.md item 1: the finest-level combine is ~25% of the V-cycle).

All variants are bitwise-identical in output (tests/test_structured_merged.py);
this script picks the fastest on the target chip. Run:
    python scripts/bench_combine.py [n]        (BC_LEVELS, BC_ORDER env knobs)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.85")

from homogenization_jl_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the host's axon TPU plugin overrides the env var alone
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from homogenization_jl_tpu.mesh.grid import hypercube
from homogenization_jl_tpu.ops.plan import build_grid_plan
from homogenization_jl_tpu.ops import structured as st

n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
order = os.environ.get("BC_ORDER", "type")
nlevels = int(os.environ.get("BC_LEVELS", "5"))
k = nlevels - 1
base = hypercube(3, n, order=order)
plan = build_grid_plan(base, nlevels, slot_tables=False)
sc = st.build_structured_combine_scaled(plan, k)
lay_ref = plan.reference.layout[k]
i0 = int(min(list(lay_ref.face_offsets) + list(lay_ref.edge_offsets) + list(lay_ref.corner_cols)))
lay = dict(iface_start=i0)
E = base.nelements
n_local = plan.n_local(k)
print(f"n={n} order={order} E={E} n_local={n_local} i0={i0}", flush=True)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((E, n_local)), jnp.float32)

VARIANTS = {
    "current": dict(merged=False),
    "merged": dict(merged=True),
    "merged+prepad": dict(merged=True, prepad=True),
    "merged+directface": dict(merged=True, direct_face=True),
    "merged+prepad+directface": dict(merged=True, prepad=True, direct_face=True),
}


def run(v, constrain=False):
    kw = VARIANTS[v]
    st._PREPAD = kw.get("prepad", False)
    st._DIRECT_FACE = kw.get("direct_face", False)
    fn = jax.jit(
        lambda a: st.combine_structured(
            a, sc, lay, constrain=constrain, merged=kw["merged"]
        )
    )
    return fn(x)


def timeit(name, v, constrain, reps=30):
    kw = VARIANTS[v]
    st._PREPAD = kw.get("prepad", False)
    st._DIRECT_FACE = kw.get("direct_face", False)

    @jax.jit
    def jfn(a):
        def body(i, s):
            out = st.combine_structured(
                a + s * jnp.asarray(1e-30, a.dtype), sc, lay,
                constrain=constrain, merged=kw["merged"],
            )
            return jnp.sum(out) * jnp.asarray(1e-30, a.dtype)

        return jax.lax.fori_loop(0, reps, body, jnp.zeros((), a.dtype))

    float(jfn(x))
    t0 = time.perf_counter()
    float(jfn(x))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:46s} {dt * 1e3:9.3f} ms", flush=True)
    return dt


for constrain in (False, True):
    tag = " constrain" if constrain else ""
    ref = run("current", constrain)
    for v in VARIANTS:
        if v == "current":
            continue
        diff = float(jnp.max(jnp.abs(run(v, constrain) - ref)))
        print(f"{v}{tag}: max|diff| = {diff:.3e}", flush=True)
        assert diff == 0.0, v

for constrain in (False, True):
    tag = " constrain" if constrain else ""
    for v in VARIANTS:
        timeit(f"{v}{tag}", v, constrain)
