"""Cycles-to-tolerance on the bench config (north-star metric wording).

BASELINE.json phrases the north star as "iters to 1e-3 checkerboard tol";
bench.py reports steady-state s/V-cycle and the residual after a fixed
cycle count. This script runs the identical bench configuration one
V-cycle at a time and records, for PERFORMANCE.md:

  * cycles until ||r||/||b|| < 1e-3 (and < 1e-4),
  * the per-cycle contraction factor over the geometric tail,
  * wall time to each tolerance (steady-state cycle time x cycles).

Usage: python scripts/iters_to_tol.py [n] [levels] [max_cycles]
Env: same BENCH_* knobs as bench.py (smoother, precisions, coarse).
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

from homogenization_jl_tpu.fem.local_operators import load_vector
from homogenization_jl_tpu.mesh.grid import affine_maps, hypercube
from homogenization_jl_tpu.models.checkerboard import (
    conductivity_per_element,
    generate_conductivity,
)
from homogenization_jl_tpu.ops.plan import build_grid_plan
from homogenization_jl_tpu.solver.multigrid import MultigridSolver

n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
nlevels = int(sys.argv[2]) if len(sys.argv) > 2 else 5
max_cycles = int(sys.argv[3]) if len(sys.argv) > 3 else 30
dtype = jnp.float32

base = hypercube(3, n, order=os.environ.get("BENCH_ORDER", "type"))
rng = np.random.default_rng(0)
field = generate_conductivity(3, n, rng)
sigma = conductivity_per_element(base, field, np.zeros(3))
plan = build_grid_plan(base, nlevels, slot_tables=False)
dofs = plan.base.nelements * plan.n_local(nlevels - 1)

coarse = os.environ.get(
    "BENCH_COARSE", "chol" if len(plan.interior_base_nodes) <= 8000 else "mg"
)
solver = MultigridSolver(
    plan,
    dtype=dtype,
    coarse=coarse,
    smoother=os.environ.get("BENCH_SMOOTHER", "cg_exact"),
    apply_precision=os.environ.get("BENCH_PRECISION", "highest"),
    smooth_precision=os.environ.get("BENCH_SMOOTH_PRECISION", "high"),
    direction_dtype=os.environ.get("BENCH_DIRECTION_DTYPE") or None,
    coarse_mg_tol=float(os.environ.get("BENCH_COARSE_MG_TOL", 5e-2)),
    smoothing_steps=int(os.environ.get("BENCH_SMOOTH_STEPS", 3)),
)
coeff = solver.coefficients(sigma, 0.0)
chol = solver.coarse_setup(sigma, 0.0)
b_ref = load_vector(plan.reference.levels[nlevels - 1])
_, _, detJ, _ = affine_maps(base)
b = jnp.asarray(detJ[:, None] * b_ref[None, :], dtype=dtype)

x, _ = solver.zero_states()
bb = b * solver.levels[-1].first_copy_mask
b_norm = float(jnp.sqrt(jnp.vdot(bb, bb)))

# BENCH_FMG=1: start from one full-multigrid sweep (~1.14 V-cycle cost,
# counted as one cycle below) instead of x=0.
# BENCH_PCG=1: V-cycle-preconditioned CG outer iteration (requires
# BENCH_SMOOTHER=chebyshev; ~1.2 V-cycle cost per iteration — one V-cycle
# + one fine apply). Composes with BENCH_FMG (FMG start, then PCG).
use_fmg = os.environ.get("BENCH_FMG", "0") == "1"
use_pcg = os.environ.get("BENCH_PCG", "0") == "1"
# BENCH_LAM_LEVELS=1: per-level lam_max (each level's chebyshev targets
# its own spectrum); BENCH_LAM_ITERS: power-iteration count (the 190M bare
# chebyshev stall diagnostic: a top-spectrum under-estimate amplifies).
lam_max = None
if solver.smoother in ("chebyshev", "chebyshev4"):
    lam_iters = int(os.environ.get("BENCH_LAM_ITERS", 30))
    # BENCH_LAM_METHOD=power reproduces the round-1..3 estimator (the
    # 30-iteration power method whose 190M under-estimate stalled the bare
    # chebyshev cycle); default is the Lanczos estimator
    lam_method = os.environ.get("BENCH_LAM_METHOD", "lanczos")
    if os.environ.get("BENCH_LAM_LEVELS", "0") == "1":
        lam_max = solver.estimate_lambda_max_levels(coeff, iters=lam_iters)
        print("per-level lam_max:", [float(v) for v in lam_max])
    else:
        lam_max = solver.estimate_lambda_max(
            coeff, iters=lam_iters, method=lam_method
        )
        print("lam_max:", lam_max, f"({lam_method})")
history = []
t0 = time.perf_counter()
if use_fmg:
    x, r = solver.fmg(b, coeff, chol, lam_max=lam_max)
    history.append(float(solver.residual_norm(r)) / b_norm)
if use_pcg:
    # stop at 1e-4 relative to b: pcg's tol is relative to its own start
    # residual, which is history[0]*b_norm after an FMG start and ~b_norm
    # from x=0
    tol_pcg = 1e-4 / history[0] if history else 1e-4
    x, hist_p = solver.pcg(
        b, coeff, chol, lam_max=lam_max, x=x, iters=max_cycles,
        tol=tol_pcg,
    )
    # hist_p[0] is the (already recorded, under fmg) initial residual
    history.extend(h / b_norm for h in hist_p[1:])
else:
    for k in range(max_cycles - len(history)):
        x, r = solver.vcycle(x, b, coeff, chol, lam_max=lam_max)
        history.append(float(solver.residual_norm(r)) / b_norm)
        if history[-1] < 1e-4:
            break
wall = time.perf_counter() - t0


def cycles_to(tol):
    for i, h in enumerate(history):
        if h < tol:
            return i + 1
    return None


tail = min(5, len(history) - 1)
contraction = (history[-1] / history[-1 - tail]) ** (1.0 / tail) if tail else None
print(
    json.dumps(
        dict(
            dofs=dofs,
            b_norm=b_norm,
            cycles_to_1e3=cycles_to(1e-3),
            cycles_to_1e4=cycles_to(1e-4),
            contraction_tail=contraction,
            rel_residuals=history,
            wall_s=round(wall, 1),
            coarse=coarse,
        )
    )
)
