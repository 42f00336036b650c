"""Mixed-precision PCG at scale: f64 Krylov loop around the f32 V-cycle.

Usage: python scripts/run_mixed_pcg.py [n] [levels] [iters] [tol]

Measures what the f32-only path cannot do — converge below its ~9.4e-4
relative floor (PERFORMANCE.md) — and what full f64 V-cycles would pay ~10x
emulation for: per-iteration cost = one emulated-f64 fine apply + f64 BLAS-1
+ one f32 V-cycle. Records per-iteration wall time and the residual history.
Reference capability being matched: the Julia implementation runs everything
in native CPU float64 (src/multigrid.jl:46-71).

MIXED_SLAB=8 runs the SLAB-SHARDED mixed PCG instead, on an 8-virtual-device
CPU mesh (re-exec with xla_force_host_platform_device_count, as
run_slab_big.py): n=32 f64 Krylov state does not fit one 16G v5e — measured
26.75G compile-time peak after the round-5 HBM fixes (down from 42.1G), vs
an intrinsic ~17G floor of 3 donated f64 Krylov vectors + transients — so
the 190M-DOF below-f32-floor record runs sharded (native-f64 CPU backend),
exactly the multi-chip path a >16G problem takes on real hardware.
"""

import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.85")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SLAB = int(os.environ.get("MIXED_SLAB", "0"))
if N_SLAB and os.environ.get("_HZT_MIXED_SLAB_CHILD") != "1":
    # re-exec: the forced CPU device count must be set before jax import
    import subprocess

    env = dict(os.environ)
    env["_HZT_MIXED_SLAB_CHILD"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = (
        flags
        + f" --xla_force_host_platform_device_count={N_SLAB}"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
        + " --xla_cpu_collective_timeout_seconds=7200"
    ).strip()
    raise SystemExit(
        subprocess.run([sys.executable, "-u"] + sys.argv, env=env).returncode
    )

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

    base = hypercube(dim, n, order="cube" if N_SLAB else "type")
    rng = np.random.default_rng(0)
    field = generate_conductivity(dim, n, rng)
    sigma = conductivity_per_element(base, field, np.zeros(dim))
    plan = build_grid_plan(base, nlevels, slot_tables=False)
    dofs = plan.base.nelements * plan.n_local(nlevels - 1)
    print(f"n={n} levels={nlevels} dofs={dofs:,} slab={N_SLAB}", flush=True)

    coarse = "chol" if len(plan.interior_base_nodes) <= 8000 else "mg"
    if N_SLAB:
        from jax.sharding import Mesh

        from homogenization_jl_tpu.parallel.slab import (
            SlabShardedMultigridSolver,
        )

        mesh = Mesh(np.array(jax.devices()[:N_SLAB]), ("e",))
        inner = SlabShardedMultigridSolver(
            plan, mesh, dtype=jnp.float32, smoother="chebyshev",
            coarse=coarse, smooth_precision="high", coarse_mg_tol=5e-2,
        )
        outer = SlabShardedMultigridSolver(
            plan, mesh, dtype=jnp.float64, smoother="chebyshev",
            coarse=coarse,
        )
    else:
        inner = MultigridSolver(
            plan, dtype=jnp.float32, smoother="chebyshev", coarse=coarse,
            smooth_precision="high", coarse_mg_tol=5e-2,
        )
        outer = MultigridSolver(
            plan, dtype=jnp.float64, smoother="chebyshev", coarse=coarse,
        )
    b_ref = load_vector(plan.reference.levels[nlevels - 1])
    _, _, detJ, _ = affine_maps(base)
    b_np = (detJ[:, None] * b_ref[None, :]).astype(np.float64)
    b = outer.put(b_np) if N_SLAB else jnp.asarray(b_np, dtype=jnp.float64)

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
