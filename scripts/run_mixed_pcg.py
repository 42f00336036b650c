"""Mixed-precision PCG at scale: f64 Krylov loop around the f32 V-cycle.

Usage: python scripts/run_mixed_pcg.py [n] [levels] [iters] [tol]

Measures what the f32-only path cannot do — converge below its ~9.4e-4
relative floor (PERFORMANCE.md) — and what full f64 V-cycles would pay ~10x
emulation for: per-iteration cost = one emulated-f64 fine apply + f64 BLAS-1
+ one f32 V-cycle. Records per-iteration wall time and the residual history.
Reference capability being matched: the Julia implementation runs everything
in native CPU float64 (src/multigrid.jl:46-71).
"""

import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.85")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from homogenization_jl_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the host's axon TPU plugin overrides the env var alone
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from homogenization_jl_tpu.fem.local_operators import load_vector
from homogenization_jl_tpu.mesh.grid import affine_maps, hypercube
from homogenization_jl_tpu.models.checkerboard import (
    conductivity_per_element,
    generate_conductivity,
)
from homogenization_jl_tpu.ops.plan import build_grid_plan
from homogenization_jl_tpu.solver.multigrid import (
    MultigridSolver,
    mixed_precision_pcg,
    mixed_precision_setup,
)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    nlevels = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    tol = float(sys.argv[4]) if len(sys.argv) > 4 else 1e-10
    dim = 3

    base = hypercube(dim, n, order="type")
    rng = np.random.default_rng(0)
    field = generate_conductivity(dim, n, rng)
    sigma = conductivity_per_element(base, field, np.zeros(dim))
    plan = build_grid_plan(base, nlevels, slot_tables=False)
    dofs = plan.base.nelements * plan.n_local(nlevels - 1)
    print(f"n={n} levels={nlevels} dofs={dofs:,}", flush=True)

    coarse = "chol" if len(plan.interior_base_nodes) <= 8000 else "mg"
    inner = MultigridSolver(
        plan, dtype=jnp.float32, smoother="chebyshev", coarse=coarse,
        smooth_precision="high", coarse_mg_tol=5e-2,
    )
    outer = MultigridSolver(
        plan, dtype=jnp.float64, smoother="chebyshev", coarse=coarse,
    )
    b_ref = load_vector(plan.reference.levels[nlevels - 1])
    _, _, detJ, _ = affine_maps(base)
    b = jnp.asarray(detJ[:, None] * b_ref[None, :], dtype=jnp.float64)

    t0 = time.perf_counter()
    setup = mixed_precision_setup(outer, inner, sigma)
    print(f"setup (coeffs+coarse+lam_max): {time.perf_counter() - t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    x, hist = mixed_precision_pcg(outer, inner, b, setup=setup, iters=2, tol=0.0)
    print(f"compile+2 iters: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    x, hist = mixed_precision_pcg(
        outer, inner, b, setup=setup, iters=iters, tol=tol
    )
    dt = time.perf_counter() - t0
    for i, h in enumerate(hist):
        print(f"  iter {i}: |r| = {h:.4e}  rel = {h / hist[0]:.4e}")
    print(
        f"mixed pcg: {len(hist) - 1} iters, rel residual "
        f"{hist[-1] / hist[0]:.3e}, {dt:.1f}s "
        f"({dt / (len(hist) - 1):.3f} s/iter)"
    )


if __name__ == "__main__":
    main()
