"""Host-side GridPlan construction benchmark (VERDICT round-1 item 8).

Measures build_grid_plan wall time (and the structured-combine rule build)
at increasing base-mesh sizes up to ~1e6 tets — the setup path the driver
re-runs per outer step. Pure host/NumPy; run with JAX_PLATFORMS=cpu to keep
the TPU out of it.

Usage: python scripts/bench_plan.py [max_n]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from homogenization_jl_tpu.mesh.grid import hypercube
from homogenization_jl_tpu.ops.plan import build_grid_plan
from homogenization_jl_tpu.ops.structured import build_structured_combine

max_n = int(sys.argv[1]) if len(sys.argv) > 1 else 56
levels = 5

for n in (16, 32, 48, 56):
    if n > max_n:
        break
    t0 = time.perf_counter()
    base = hypercube(3, n)
    t_mesh = time.perf_counter() - t0
    t0 = time.perf_counter()
    # production path (bench + lattice driver): no flat slot tables
    plan = build_grid_plan(base, levels, slot_tables=False)
    t_plan = time.perf_counter() - t0
    t0 = time.perf_counter()
    scs = [build_structured_combine(plan, k) for k in range(levels)]
    t_struct = time.perf_counter() - t0
    assert all(sc is not None for sc in scs)
    print(
        json.dumps(
            dict(
                n=n,
                tets=base.nelements,
                dofs_5lvl=base.nelements * plan.n_local(levels - 1),
                mesh_s=round(t_mesh, 2),
                plan_s=round(t_plan, 2),
                structured_s=round(t_struct, 2),
            )
        ),
        flush=True,
    )
