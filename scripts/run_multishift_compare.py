"""Measure the multishift (one-Lanczos-pass) recurrence vs the per-step driver.

Round-4 verdict item 5 / BASELINE config 4: the capability existed
(models/multishift.py, wired as checkerboard_homogenization(solver=
"multishift")) but was never measured. This script pins one conductivity
field and runs the SAME fixed-domain recurrence three ways:

  vcycle     per-outer-step plain V-cycles (reference semantics,
             src/examples/homogenized_coefficients.jl:269-290, shrink off)
  pcg        per-outer-step V-cycle-preconditioned CG (the round-4 adopted
             inner solve), shrink off
  multishift ONE generalized-Lanczos pass serving every recurrence step
             (the reference's out-of-tree tools/multishift_cg.jl:67-166 idea)

and reports sigma, wall-clock, and operator-apply counts for each.

Usage: python scripts/run_multishift_compare.py [n] [dim] [refinements] [tol]
Env:   MS_DTYPE=float32|float64 (default float64; use float32 on TPU),
       MS_LANCZOS=120, MS_SEED=7
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.85")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from homogenization_jl_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
if os.environ.get("MS_DTYPE", "float64") == "float64":
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from homogenization_jl_tpu.models.checkerboard import (
    checkerboard_homogenization,
    compute_boundary_layer,
    compute_box_radius,
    generate_conductivity,
)
from homogenization_jl_tpu.models.multishift import homogenization_multishift


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    refinements = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    tol = float(sys.argv[4]) if len(sys.argv) > 4 else 1e-6
    lanczos = int(os.environ.get("MS_LANCZOS", 120))
    seed = int(os.environ.get("MS_SEED", 7))
    dtype = (
        jnp.float64
        if os.environ.get("MS_DTYPE", "float64") == "float64"
        else jnp.float32
    )

    R0 = compute_box_radius(0, n) + compute_boundary_layer(1.0, n)
    field = generate_conductivity(dim, 2 * R0, np.random.default_rng(seed))
    xi = np.ones(dim) / np.sqrt(dim)
    common = dict(
        dim=dim,
        refinements=refinements,
        cond_field=field,
        xi=xi,
        dtype=dtype,
        tolerance=tol,
        shrink=False,
    )

    out = {
        "n": n,
        "dim": dim,
        "refinements": refinements,
        "tolerance": tol,
        "dtype": np.dtype(dtype).name,
        "lanczos_iters_budget": lanczos,
        "device": str(jax.devices()[0]),
    }

    for name, kwargs in (
        ("vcycle", dict(solver="vcycle", inner="vcycle")),
        ("pcg", dict(solver="vcycle", inner="pcg", smoother="chebyshev")),
        ("multishift", dict(solver="multishift", lanczos_iters=lanczos)),
    ):
        t0 = time.perf_counter()
        sigma, trace = checkerboard_homogenization(
            n, return_trace=True, **common, **kwargs
        )
        wall = time.perf_counter() - t0
        rec = {"sigma": float(sigma), "wall_s": wall}
        if isinstance(trace, dict):  # multishift stats
            for key in ("A_applies", "M_applies", "lanczos_iters"):
                if key in trace:
                    rec[key] = trace[key]
            if "sigma_steps" in trace:
                rec["sigma_steps"] = [float(s) for s in trace["sigma_steps"]]
        else:  # HomogenizationTrace
            rec["cycles_per_step"] = list(trace.cycles_per_step)
            rec["sigma_steps"] = [float(s) for s in trace.sigma_steps]
        out[name] = rec
        print(f"  {name}: sigma={sigma!r} wall={wall:.2f}s", flush=True)

    # direct call (no driver wrapper) with stats, for the apply counts
    t0 = time.perf_counter()
    sig_d, stats = homogenization_multishift(
        n,
        dim=dim,
        refinements=refinements,
        lanczos_iters=lanczos,
        cond_field=field,
        xi=xi,
        dtype=dtype,
        return_stats=True,
    )
    out["multishift_direct"] = {
        "sigma": float(sig_d),
        "wall_s": time.perf_counter() - t0,
        "A_applies": stats["A_applies"],
        "M_applies": stats["M_applies"],
        "lanczos_iters": stats["lanczos_iters"],
    }

    ref = out["vcycle"]["sigma"]
    for name in ("pcg", "multishift", "multishift_direct"):
        out[name]["rel_diff_vs_vcycle"] = abs(out[name]["sigma"] - ref) / max(
            abs(ref), 1e-300
        )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
