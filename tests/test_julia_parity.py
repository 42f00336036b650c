"""End-to-end sigma parity vs the Julia reference (BASELINE north star).

The reference's published sigma values depend on Julia's RNG (SURVEY.md §6),
so parity runs through a PINNED conductivity fixture: the same field is fed
to both drivers (scripts/julia_parity.jl overrides the reference's
`generate_conductivity`; our driver takes `cond_field=`), and the sigmas
must agree at rtol 1e-6 in f64.

Skipped when no `julia` executable (this environment ships none — SURVEY.md
§6 anticipated that); with a Julia checkout of haampie/Homogenization.jl the
check is one invocation away:

    HOMOGENIZATION_JL=<checkout> python -m pytest tests/test_julia_parity.py

Closing the loop WITHOUT this framework installed (e.g. any machine that
has Julia): `python scripts/make_parity_fixture.py --out /tmp/parity`
regenerates the fixtures and re-prints this table; the recorded
expectations (seed 1234, tolerance 1e-8, f64, generated 2026-08-19) are:

    config (dim=2, n=2, refinements=1) — this framework: sigma = 1.5758748053757337
      julia --project=<checkout> scripts/julia_parity.jl \
            /tmp/parity/field_2d_n2.txt 2 2 1 1e-08
    config (dim=2, n=2, refinements=2) — this framework: sigma = 1.7677523493266987
      julia --project=<checkout> scripts/julia_parity.jl \
            /tmp/parity/field_2d_n2.txt 2 2 2 1e-08

Each julia run prints a SIGMA= line that must match at rtol 1e-6.
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

from homogenization_jl_tpu.models.checkerboard import (
    checkerboard_homogenization,
    compute_boundary_layer,
    compute_box_radius,
    generate_conductivity,
)

JULIA = shutil.which("julia")
REF_PROJECT = os.environ.get("HOMOGENIZATION_JL", "/root/reference")


def write_field_fixture(path, field):
    """Text fixture: header "n dim", then n^dim rows of dim values, first
    axis fastest (Fortran order) — the layout scripts/julia_parity.jl
    reshapes back into the reference's `Conductivity.σ` array."""
    ncells, dim = field.shape[0], field.shape[-1]
    flat = np.reshape(field, (ncells**dim, dim), order="F")
    with open(path, "w") as f:
        f.write(f"{ncells} {dim}\n")
        np.savetxt(f, flat, fmt="%.1f")
    return path


def test_field_fixture_roundtrip(tmp_path):
    """The Fortran-order text layout reconstructs the field exactly (the
    part of the parity harness that can run without Julia)."""
    rng = np.random.default_rng(0)
    field = generate_conductivity(2, 6, rng)
    p = write_field_fixture(tmp_path / "f.txt", field)
    raw = np.loadtxt(p, skiprows=1)
    back = np.reshape(raw, field.shape, order="F")
    assert np.array_equal(back, field)
    # 3D as well
    field3 = generate_conductivity(3, 4, rng)
    p3 = write_field_fixture(tmp_path / "f3.txt", field3)
    back3 = np.reshape(np.loadtxt(p3, skiprows=1), field3.shape, order="F")
    assert np.array_equal(back3, field3)


@pytest.mark.skipif(JULIA is None, reason="no julia runtime on PATH")
@pytest.mark.parametrize("dim,n,refinements", [(2, 2, 1), (2, 2, 2)])
def test_sigma_matches_julia_reference(tmp_path, dim, n, refinements):
    tol = 1e-8
    R0 = compute_box_radius(0, n) + compute_boundary_layer(1.0, n)
    rng = np.random.default_rng(1234)
    field = generate_conductivity(dim, 2 * R0, rng)
    fixture = write_field_fixture(tmp_path / "field.txt", field)

    sigma_ours = checkerboard_homogenization(
        n, dim=dim, refinements=refinements, tolerance=tol,
        cond_field=field, seed=0,
    )

    out = subprocess.run(
        [
            JULIA, f"--project={REF_PROJECT}",
            os.path.join(os.path.dirname(__file__), "..", "scripts", "julia_parity.jl"),
            str(fixture), str(n), str(dim), str(refinements), str(tol),
        ],
        capture_output=True, text=True, timeout=3600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("SIGMA=")][-1]
    sigma_julia = float(line.split("=")[1])
    assert abs(sigma_ours - sigma_julia) < 1e-6 * abs(sigma_julia), (
        sigma_ours, sigma_julia,
    )
