"""Full-scale flagship driver run on TPU (round-3 verdict item 5).

Runs checkerboard_homogenization end to end — 3D, lattice geometry
(structured combine every outer step), f32, mixed-precision smoothing —
at the largest single-chip size, with per-step timings and the sigma /
cycles-to-tolerance record for ACCURACY.md.

Usage: python scripts/run_flagship.py [refinements] [n] [tolerance]
"""

import json
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

from homogenization_jl_tpu.models.checkerboard import checkerboard_homogenization

# defaults = the recorded 190M-unknown run (ACCURACY.md); n=3 at
# refinements=4 is a 643M-DOF domain that exceeds the 495M single-chip
# ceiling (PERFORMANCE.md) — use the slab-sharded driver for that regime
refinements = int(sys.argv[1]) if len(sys.argv) > 1 else 4
n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
tol = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-4

# FLAGSHIP_INNER: pcg (default since the round-4 TPU A/B: 7 iters x
# 0.69 s vs 12 x 0.73 s per outer step, sigma agreement 6e-5 — see
# ACCURACY.md "Flagship driver") or vcycle (the round-3 configuration)
inner = os.environ.get("FLAGSHIP_INNER", "pcg")
t0 = time.perf_counter()
sigma, trace = checkerboard_homogenization(
    n,
    dim=3,
    refinements=refinements,
    tolerance=tol,
    seed=7,
    dtype=jnp.float32,
    geometry="lattice",
    coarse="mg",
    smoother="chebyshev" if inner == "pcg" else "cg_exact",
    inner=inner,
    solver_opts=dict(smooth_precision="high", coarse_mg_tol=5e-2),
    verbose=True,
    return_trace=True,
)
wall = time.perf_counter() - t0
print(
    json.dumps(
        dict(
            sigma=sigma,
            sigma_steps=trace.sigma_steps,
            cycles_per_step=trace.cycles_per_step,
            residuals=trace.residuals,
            wall_s=round(wall, 1),
            n=n,
            refinements=refinements,
            tolerance=tol,
        )
    )
)
