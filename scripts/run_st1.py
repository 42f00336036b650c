"""Large high-contrast st1 spectral-field solve on TPU (round-3 item 9).

Runs st1_multigrid — the implicit-grid scalable path the reference tool
(tools/generate_st1_field.jl:122-136) only ever ran through explicit global
assembly — at a 3D 190M-DOF scale with a high-contrast field (alpha >= 10,
i.e. conductivity contrast exp(2*alpha*max|f|)), and records the V-cycle
convergence history for ACCURACY.md.

Usage: python scripts/run_st1.py [n] [refinements] [alpha] [cycles]
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
import numpy as np

from homogenization_jl_tpu.models.st1 import st1_multigrid

n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
refinements = int(sys.argv[2]) if len(sys.argv) > 2 else 4
alpha = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
cycles = int(sys.argv[4]) if len(sys.argv) > 4 else 20
# "pcg" = V-cycle-preconditioned CG (chebyshev smoothing) — the
# contrast-robust outer solve; "vcycle" = bare V-cycle iteration
method = os.environ.get("ST1_METHOD", "vcycle")

t0 = time.perf_counter()
history, x, solver, sigma_el = st1_multigrid(
    n,
    dim=3,
    refinements=refinements,
    lam=1.0,
    alpha=alpha,
    seed=3,
    max_cycles=cycles,
    coarse="mg",
    dtype=jnp.float32,
    method=method,
    tol=float(os.environ.get("ST1_TOL", 0.0)),
    smoothing_steps=int(os.environ.get("ST1_SMOOTH_STEPS", 3)),
    solver_opts=dict(
        smoother=(
            "chebyshev" if method == "pcg"
            else os.environ.get("ST1_SMOOTHER", "cg_exact")
        ),
        smooth_precision=os.environ.get("ST1_SMOOTH_PRECISION", "high"),
        coarse_mg_tol=float(os.environ.get("ST1_COARSE_MG_TOL", 5e-2)),
    ),
)
wall = time.perf_counter() - t0
sig = np.asarray(sigma_el)
print(
    json.dumps(
        dict(
            n=n,
            refinements=refinements,
            alpha=alpha,
            dofs=solver.plan.base.nelements * solver.plan.n_local(refinements),
            contrast=float(sig.max() / sig.min()),
            sigma_min=float(sig.min()),
            sigma_max=float(sig.max()),
            residuals=history,
            contraction_last5=float(
                (history[-1] / history[-6]) ** 0.2
            ) if len(history) > 6 else None,
            wall_s=round(wall, 1),
        )
    )
)
