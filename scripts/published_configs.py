"""Reproduce the reference's PUBLISHED sigma configurations (BASELINE.md
rows 1-6) on this framework — the exact invocations behind ACCURACY.md's
"Refinement-trend anchors" table.

The reference's values are single samples of an UNSEEDED Julia RNG
(src/examples/homogenized_coefficients.jl:156-171), so agreement is at
distribution level here (rtol-1e-6 equality on a PINNED field is what
scripts/julia_parity.jl asserts when a Julia runtime is present).

Usage:
    python scripts/published_configs.py 2d [refinements]   # n=5, tol 1e-5
    python scripts/published_configs.py 3d [refinements]   # n=3, tol 1e-4
    python scripts/published_configs.py 3d-seeds           # 8-seed spread, r=1

CPU f64 wall times (1 core): 2d all three ~104 s total; 3d r=1/2/3 =
140 s / 323 s / 3621 s (109.5M fine-grid unknowns at r=3).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from homogenization_jl_tpu.models.checkerboard import checkerboard_homogenization

mode = sys.argv[1] if len(sys.argv) > 1 else "2d"
seed = int(os.environ.get("PUB_SEED", 2026))

if mode == "2d":
    refs = [int(sys.argv[2])] if len(sys.argv) > 2 else [1, 2, 3]
    for r in refs:
        t0 = time.perf_counter()
        s = checkerboard_homogenization(
            5, dim=2, refinements=r, tolerance=1e-5, seed=seed,
            dtype=jnp.float64, geometry="lattice",
        )
        print(f"2D n=5 refinements={r}: sigma = {s!r} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
elif mode == "3d":
    refs = [int(sys.argv[2])] if len(sys.argv) > 2 else [1, 2, 3]
    for r in refs:
        t0 = time.perf_counter()
        s = checkerboard_homogenization(
            3, dim=3, refinements=r, tolerance=1e-4, seed=seed,
            dtype=jnp.float64, geometry="lattice",
        )
        print(f"3D n=3 refinements={r}: sigma = {s!r} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
elif mode == "3d-seeds":
    vals = []
    for sd in range(8):
        s = checkerboard_homogenization(
            3, dim=3, refinements=1, tolerance=1e-4, seed=sd,
            dtype=jnp.float64, geometry="lattice",
        )
        vals.append(s)
        print(f"seed {sd}: sigma = {s!r}", flush=True)
    a = np.array(vals)
    print(f"mean {a.mean():.6f} std {a.std(ddof=1):.6f} "
          f"range [{a.min():.6f}, {a.max():.6f}]")
else:
    raise SystemExit(f"unknown mode {mode!r}")
