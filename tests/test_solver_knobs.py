"""Coverage for the solver knobs the round-4 TPU A/Bs promote toward
production defaults: smoothing_steps (degree of the smoothing polynomial /
inner-CG run), and the restrict_precision / krylov_precision mixed-precision
controls on the chebyshev PCG path.

The reference has exactly one configuration (3 CG smoothing steps, f64
everywhere, /root/reference/src/multigrid.jl:46-71); these knobs are the
TPU-side trade space around it, so each must (a) converge and (b) plumb
through without touching anything else. On CPU, lax Precision settings are
arithmetic no-ops for f32 (they only select bf16-pass strategies on TPU
MXUs), which turns (b) into a bitwise assertion.
"""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke lane (pytest -m "not slow")

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


def _setup(dim, n, levels, seed=3):
    base = hypercube(dim, n)
    rng = np.random.default_rng(seed)
    sigma = conductivity_per_element(
        base, generate_conductivity(dim, n, rng), np.zeros(dim)
    )
    plan = build_grid_plan(base, levels, slot_tables=False)
    b_ref = load_vector(plan.reference.levels[levels - 1])
    _, _, detJ, _ = affine_maps(base)
    return plan, sigma, detJ[:, None] * b_ref[None, :]


@pytest.mark.parametrize("steps", [1, 2])
def test_smoothing_steps_pcg_converges(steps):
    """Degree-1/2 chebyshev smoothing still yields a convergent PCG outer
    (weaker preconditioner, more iterations — never divergence)."""
    plan, sigma, b_np = _setup(3, 2, 3)
    s = MultigridSolver(plan, smoother="chebyshev", smoothing_steps=steps)
    coeff = s.coefficients(sigma, 0.0)
    chol = s.coarse_cholesky(sigma, 0.0)
    lam_max = s.estimate_lambda_max(coeff)
    x, hist = s.pcg(
        jnp.asarray(b_np), coeff, chol, lam_max=lam_max, iters=40, tol=1e-8
    )
    assert hist[-1] < 1e-8 * hist[0], (steps, hist)
    # fewer smoothing steps may never converge FASTER (outer iterations)
    s3 = MultigridSolver(plan, smoother="chebyshev", smoothing_steps=3)
    _, hist3 = s3.pcg(
        jnp.asarray(b_np), coeff, chol, lam_max=lam_max, iters=40, tol=1e-8
    )
    assert len(hist) >= len(hist3), (steps, len(hist), len(hist3))


def test_precision_knobs_cpu_bitwise_noop():
    """restrict_precision / krylov_precision must change ONLY the matmul
    precision attribute. On the CPU backend that attribute is inert for
    f32, so the full PCG trajectory must be bitwise identical — any
    difference is a wiring bug (wrong operand, reordered reduction)."""
    plan, sigma, b_np = _setup(3, 2, 3)
    runs = {}
    for tag, kw in {
        "default": {},
        "high": {"restrict_precision": "high", "krylov_precision": "high"},
    }.items():
        s = MultigridSolver(
            plan, dtype=jnp.float32, smoother="chebyshev", **kw
        )
        coeff = s.coefficients(sigma, 0.0)
        chol = s.coarse_cholesky(sigma, 0.0)
        lam_max = s.estimate_lambda_max(coeff)
        b = jnp.asarray(b_np, jnp.float32)
        x, hist = s.pcg(b, coeff, chol, lam_max=lam_max, iters=10)
        runs[tag] = (np.asarray(x), hist)
    xa, ha = runs["default"]
    xb, hb = runs["high"]
    assert ha == hb, (ha, hb)
    assert np.array_equal(xa, xb)


def test_smoothing_steps2_slab_matches_single_device():
    """smoothing_steps=2 plumbs through the slab-sharded solver: identical
    PCG history and solution vs single-device at f64 resolution."""
    from jax.sharding import Mesh
    import jax

    from homogenization_jl_tpu.parallel.slab import SlabShardedMultigridSolver

    base = hypercube(3, 8, order="cube")
    rng = np.random.default_rng(3)
    sigma = conductivity_per_element(
        base, generate_conductivity(3, 8, rng), np.zeros(3)
    )
    plan = build_grid_plan(base, 3, slot_tables=False)
    b_ref = load_vector(plan.reference.levels[2])
    _, _, detJ, _ = affine_maps(base)
    b_np = detJ[:, None] * b_ref[None, :]

    kw = dict(
        dtype=jnp.float64, coarse="chol", smoother="chebyshev",
        smoothing_steps=2,
    )
    ref = MultigridSolver(plan, **kw)
    coeff = ref.coefficients(sigma, 0.0)
    chol = ref.coarse_cholesky(sigma, 0.0)
    lam_max = ref.estimate_lambda_max(coeff)
    x, hist = ref.pcg(jnp.asarray(b_np), coeff, chol, lam_max=lam_max, iters=6)

    mesh = Mesh(np.array(jax.devices()[:8]), ("e",))
    sh = SlabShardedMultigridSolver(plan, mesh, **kw)
    coeff_s = sh.coefficients(sigma, 0.0)
    chol_s = sh.coarse_setup(sigma, 0.0)
    lam_s = sh.estimate_lambda_max(coeff_s)
    x_s, hist_s = sh.pcg(sh.put(b_np), coeff_s, chol_s, lam_max=lam_s, iters=6)

    assert len(hist) == len(hist_s)
    for a, c in zip(hist, hist_s):
        assert abs(a - c) < 1e-9 * max(abs(a), 1e-300), (a, c)
    err = float(jnp.abs(x_s - x).max()) / max(float(jnp.abs(x).max()), 1e-300)
    assert err < 1e-9, err
