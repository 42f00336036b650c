"""Microbenchmark of the element-apply kernel at solver-realistic shapes.

Measures (on the real chip): the XLA loop-accumulated apply at HIGHEST
(f32, 6-pass) and HIGH (bf16x3, 3-pass) precision, with native (969) and
128-padded (1024) n_local. Prints one JSON line per variant with TFLOP/s
and %-of-roofline against the v5e bf16 peak of 197 TFLOP/s (HIGHEST peak =
197/6, HIGH = 197/3 — the corrected bookkeeping in PERFORMANCE.md).

A hand-fused Pallas variant was benchmarked here through round 3 and
retired: 104.8 vs 87.6 ms at HIGHEST (E=196608), and Mosaic's dot lowering
does not implement Precision.HIGH, while the HIGH regime is compute-bound
(~6.5 ms of HBM traffic inside a 44.8 ms op) so fusion has nothing to win.

Usage: python scripts/bench_apply.py [E] [reps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.85")

from homogenization_jl_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the host's axon TPU plugin overrides the env var alone
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from homogenization_jl_tpu.fem.local_operators import build_level_operators
from homogenization_jl_tpu.mesh.grid import hypercube
from homogenization_jl_tpu.mesh.reference import refined_reference
from homogenization_jl_tpu.ops.apply import element_apply

BF16_PEAK = 197e12  # v5e bf16 peak (corrected bookkeeping, PERFORMANCE.md)

E = int(sys.argv[1]) if len(sys.argv) > 1 else 196_608
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
nlevels = 5

ref = refined_reference(3, nlevels)
ops = build_level_operators(ref, dtype=np.float64)
stack = np.asarray(ops[nlevels - 1].stack, dtype=np.float32)  # [P, n, n]
P, n, _ = stack.shape
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((E, n)), dtype=jnp.float32)
coeff = jnp.asarray(rng.standard_normal((E, P)), dtype=jnp.float32)
stack_d = jnp.asarray(stack)

n_pad = -(-n // 128) * 128
xp = jnp.pad(x, ((0, 0), (0, n_pad - n)))
stack_p = jnp.pad(stack_d, ((0, 0), (0, n_pad - n), (0, n_pad - n)))

PREC = {
    "highest": (jax.lax.Precision.HIGHEST, 6),
    "high": (jax.lax.Precision.HIGH, 3),
}


def timed(fn, x, c):
    """Sequential-dependence harness: the carry perturbs the input by
    s * 1e-30 and is recomputed from the full output sum, so XLA can neither
    hoist the body out of the loop nor dead-code-eliminate it."""

    @jax.jit
    def run(x, c):
        def body(i, s):
            y = fn(x + s * jnp.asarray(1e-30, x.dtype), c)
            return jnp.sum(y) * jnp.asarray(1e-30, x.dtype)

        return jax.lax.fori_loop(0, reps, body, jnp.zeros((), x.dtype))

    float(run(x, c))  # compile + warm
    t0 = time.perf_counter()
    float(run(x, c))
    return (time.perf_counter() - t0) / reps


results = []
for prec_name, (prec, passes) in PREC.items():
    flops = 2.0 * E * n * n * P
    flops_pad = 2.0 * E * n_pad * n_pad * P
    peak = BF16_PEAK / passes

    dt = timed(lambda xx, cc: element_apply(xx, cc, stack_d, precision=prec), x, coeff)
    results.append(
        dict(kind="xla", prec=prec_name, n=n, ms=dt * 1e3,
             tflops=flops / dt / 1e12, roofline=flops / dt / peak)
    )
    print(json.dumps(results[-1]), flush=True)

    dtp = timed(
        lambda xx, cc: element_apply(xx, cc, stack_p, precision=prec), xp, coeff
    )
    results.append(
        dict(kind="xla_pad", prec=prec_name, n=n_pad, ms=dtp * 1e3,
             tflops=flops_pad / dtp / 1e12, roofline=flops_pad / dtp / peak,
             useful_roofline=flops / dtp / peak)
    )
    print(json.dumps(results[-1]), flush=True)


