"""Generate the Julia-parity fixtures and print the exact closing commands.

For each parity config (the ones tests/test_julia_parity.py runs) this
writes the pinned conductivity fixture, runs THIS framework's driver on it
in f64, and prints (a) sigma from this framework and (b) the exact julia
invocation that must reproduce it at rtol 1e-6. Any environment with a
Julia runtime and a haampie/Homogenization.jl checkout can then close the
cross-language loop in minutes, without installing this package:

    python scripts/make_parity_fixture.py --out /tmp/parity
    julia --project=<checkout> scripts/julia_parity.jl \
          /tmp/parity/field_2d_n2.txt 2 2 <refinements> 1e-8

Reference values being matched: the sigma estimator of
/root/reference/src/examples/homogenized_coefficients.jl:174-343 (its
docstring table :156-171 is RNG-dependent; the fixture removes that).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CONFIGS = [(2, 2, 1), (2, 2, 2)]  # (dim, n, refinements)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/parity")
    ap.add_argument("--tol", type=float, default=1e-8)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)  # parity runs are f64

    from homogenization_jl_tpu.models.checkerboard import (
        checkerboard_homogenization,
        compute_boundary_layer,
        compute_box_radius,
        generate_conductivity,
    )
    from tests.test_julia_parity import write_field_fixture

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for dim, n, refinements in CONFIGS:
        R0 = compute_box_radius(0, n) + compute_boundary_layer(1.0, n)
        rng = np.random.default_rng(1234)  # same seed as the pytest
        field = generate_conductivity(dim, 2 * R0, rng)
        fx = os.path.join(args.out, f"field_{dim}d_n{n}.txt")
        write_field_fixture(fx, field)
        sigma = checkerboard_homogenization(
            n, dim=dim, refinements=refinements, tolerance=args.tol,
            cond_field=field, seed=0,
        )
        print(f"config dim={dim} n={n} refinements={refinements}:")
        print(f"  fixture: {fx}")
        print(f"  sigma (this framework, f64): {sigma!r}")
        print(
            "  close the loop: julia --project=<Homogenization.jl> "
            f"{repo}/scripts/julia_parity.jl {fx} {n} {dim} "
            f"{refinements} {args.tol}"
        )
        print("  (its SIGMA= line must match at rtol 1e-6)")


if __name__ == "__main__":
    main()
