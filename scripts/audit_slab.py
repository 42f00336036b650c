"""Per-shard HBM audit for the slab-sharded 1e9-DOF configuration.

BASELINE config 5 is ~1e9 DOFs on 8 chips: n=64 cube base (1,572,864 tets),
5 levels -> 1.524B DOFs, slab-sharded into 8 x-slabs of W=8 planes. Each
shard then owns E/8 = 196,608 elements x 969 local DOFs = 190.5M DOFs —
element-for-element the measured single-chip bench config (PERFORMANCE.md).

This script produces the audit two ways:

1. **Resident-array census** (exact, from the built plan): every array the
   SlabShardedMultigridSolver keeps alive per shard — sharded element-leading
   level tables / states / coefficients at 1/8 each, replicated reference
   stacks, prolongations and coarse-solve data in full — summed in bytes.

2. **AOT compile** of the sharded V-cycle on an 8-device mesh for the real
   TPU topology when available (jax.experimental.topologies), else the
   8-virtual-device CPU mesh; reports XLA's own memory analysis per shard
   (temp + argument bytes) when exposed.

The in-trace temporary budget is anchored by measurement: the single-chip
bench at the identical per-shard shape (196,608 x 969, 5 levels, cg_exact,
mg coarse) runs in 6.2 GB HBM (PERFORMANCE.md); the slab program adds only
the halo-extended combine buffers (W+2 vs W planes: +2/W of one level-k
array per combine step) and subtracts nothing.

Usage: python scripts/audit_slab.py [n] [shards] [levels]
  (defaults 64 8 5; pass 16 8 4 for a quick structural check)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
S = int(sys.argv[2]) if len(sys.argv) > 2 else 8
LEVELS = int(sys.argv[3]) if len(sys.argv) > 3 else 5

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={S}"
    )

from homogenization_jl_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # the host's axon TPU plugin overrides the env var at import; the
    # config update is authoritative (same pattern as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from homogenization_jl_tpu.mesh.grid import hypercube
from homogenization_jl_tpu.ops.plan import build_grid_plan
from homogenization_jl_tpu.parallel.slab import SlabShardedMultigridSolver

GiB = float(1 << 30)


def census(solver):
    """Exact per-shard resident bytes of everything the solver keeps alive."""
    sharded = replicated = 0
    for L in solver.levels:
        for a in jax.tree.leaves(L):
            if hasattr(a, "nbytes"):
                if a.ndim >= 1 and a.shape[0] == solver.E:
                    sharded += a.nbytes
                else:
                    replicated += a.nbytes
    return sharded, replicated


def main():
    base = hypercube(3, N, order="cube")
    plan = build_grid_plan(base, LEVELS, slot_tables=False)
    devs = jax.devices()[:S]
    if len(devs) < S:
        raise SystemExit(f"need {S} devices, have {len(devs)}")
    mesh = Mesh(np.array(devs), ("e",))
    from homogenization_jl_tpu.solver.coarse import coarsening_depth

    coarse = "mg" if coarsening_depth(base) > 0 else "chol"
    solver = SlabShardedMultigridSolver(
        plan, mesh, dtype=jnp.float32, coarse=coarse, smoother="cg_exact",
        smooth_precision="high", coarse_mg_tol=5e-2,
    )
    E, nl = plan.base.nelements, plan.n_local(LEVELS - 1)
    dofs = E * nl
    state = E * nl * 4  # one f32 finest-level array, global bytes

    sharded, replicated = census(solver)
    # live solver states per cycle: x, b, coeff (sharded); r is in-trace
    coeff_b = E * solver.levels[0].stack.shape[0] * 4
    resident_per_shard = (sharded + 2 * state + coeff_b) / S + replicated

    report = dict(
        n=N, shards=S, levels=LEVELS, dofs=dofs,
        dofs_per_shard=dofs // S,
        elements_per_shard=E // S,
        finest_state_gib_global=round(state / GiB, 3),
        level_tables_sharded_gib_per_shard=round(sharded / S / GiB, 3),
        level_tables_replicated_gib=round(replicated / GiB, 3),
        resident_gib_per_shard=round(resident_per_shard / GiB, 3),
        halo_extra_planes_fraction=round(2 / (N // S), 3),
    )

    # AOT-compile the sharded V-cycle and ask XLA for its memory analysis
    # (AUDIT_SKIP_AOT=1 for census-only: the 1-vCPU host's XLA compile of
    # the full-scale program can take tens of minutes)
    if os.environ.get("AUDIT_SKIP_AOT"):
        print(json.dumps(report))
        return
    try:
        x, b = solver.zero_states()
        coeff = solver.coefficients(
            np.ones((E, 3), np.float32), 0.0
        )
        chol = solver.coarse_setup(np.ones((E, 3), np.float32), 0.0)
        lowered = solver._vcycle.lower(
            x, b, coeff, chol, tuple(solver.levels), solver.base_elements,
            solver._interior_payload(), jnp.asarray(0.0, jnp.float32),
        )
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        if ma is not None:
            report["xla_temp_gib_per_shard"] = round(
                getattr(ma, "temp_size_in_bytes", 0) / GiB, 3
            )
            report["xla_arg_gib_per_shard"] = round(
                getattr(ma, "argument_size_in_bytes", 0) / GiB, 3
            )
            report["xla_output_gib_per_shard"] = round(
                getattr(ma, "output_size_in_bytes", 0) / GiB, 3
            )
    except Exception as e:  # audit still useful without the AOT half
        report["aot_error"] = f"{type(e).__name__}: {e}"

    print(json.dumps(report))


if __name__ == "__main__":
    main()
