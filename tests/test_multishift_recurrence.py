"""Multishift recurrence (BASELINE config 4): one generalized-Lanczos pass
reproduces the fixed-domain homogenization recurrence with fewer operator
applications than the per-step V-cycle driver.

(Reference: tools/multishift_cg.jl — one Krylov space for the whole
lambda-halving family; here lifted from (A + lam I) x = b to the recurrence's
(A, M) pencil resolvent chain.)"""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke lane (pytest -m "not slow")

import numpy as np


@pytest.fixture()
def small_schedule(monkeypatch):
    import homogenization_jl_tpu.models.checkerboard as cb

    monkeypatch.setattr(
        cb,
        "compute_boundary_layer",
        lambda lam, n: int(np.floor((n + 1) * lam**-0.5)),
    )
    return cb


def test_multishift_matches_fixed_domain_driver(small_schedule):
    cb = small_schedule
    from homogenization_jl_tpu.models.multishift import homogenization_multishift

    s_ref, tr = cb.checkerboard_homogenization(
        2, dim=2, refinements=1, tolerance=1e-8, seed=13,
        max_cycles=200, shrink=False, return_trace=True,
    )
    assert len(tr.sigma_steps) >= 2  # the schedule reaches k=1

    s_ms, st = homogenization_multishift(
        2, dim=2, refinements=1, lanczos_iters=100, seed=13, return_stats=True
    )
    assert abs(s_ms - s_ref) < 5e-4, (s_ms, s_ref)
    # every recurrence step came out of ONE Lanczos pass: the count of
    # A-applies is the basis size, independent of the number of steps —
    # fewer than the V-cycle driver's finest-level applies (~8 per cycle)
    driver_applies = sum(tr.cycles_per_step) * 8
    assert st["A_applies"] < driver_applies, (st["A_applies"], driver_applies)


def test_multishift_dispatch_from_driver(small_schedule):
    cb = small_schedule
    s1 = cb.checkerboard_homogenization(
        1, dim=2, refinements=1, seed=3, solver="multishift", lanczos_iters=60
    )
    from homogenization_jl_tpu.models.multishift import homogenization_multishift

    s2 = homogenization_multishift(1, dim=2, refinements=1, lanczos_iters=60, seed=3)
    assert s1 == s2


def test_two_pass_matches_one_pass():
    """two_pass=True (no stored Lanczos basis: scalar pass + accumulation
    pass) reproduces the stored-basis recurrence — the variant that lifts
    the [m, E, n_local] storage cap (round-2 verdict item 10). The mat-vec
    stream is identical; the v_k assembly differs only in reduction shape
    (einsum over the stacked basis vs incremental axpys), so agreement is
    to rounding (~1e-13 rel in f64, the docstring contract), not bitwise."""
    from homogenization_jl_tpu.models.multishift import homogenization_multishift

    kw = dict(dim=2, refinements=1, lanczos_iters=25, seed=3, return_stats=True)
    s1, st1 = homogenization_multishift(1, **kw)
    s2, st2 = homogenization_multishift(1, two_pass=True, **kw)
    assert abs(s1 - s2) <= 1e-12 * abs(s1), (s1, s2)
    assert st1["lanczos_iters"] == st2["lanczos_iters"]
    # pass 2 re-runs the mat-vec stream: ~2x applies, O(K) state arrays
    assert st2["A_applies"] < 2 * st1["A_applies"] + 2
