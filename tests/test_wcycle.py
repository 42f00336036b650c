"""W-cycles (cycle="W", gamma=2): stronger coarse correction per cycle
than V-cycles at ~2x sub-top cost — capability beyond the reference's
V-only multigrid (src/multigrid.jl:73-119)."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke lane (pytest -m "not slow")

import numpy as np
import jax.numpy as jnp

from homogenization_jl_tpu.fem.local_operators import load_vector
from homogenization_jl_tpu.mesh.grid import affine_maps, hypercube
from homogenization_jl_tpu.ops.plan import build_grid_plan
from homogenization_jl_tpu.solver.multigrid import MultigridSolver


@pytest.mark.parametrize("smoother", ["cg_exact", "cg"])
def test_wcycle_converges_at_least_as_fast(smoother):
    base = hypercube(2, 8)
    plan = build_grid_plan(base, 4, slot_tables=False)
    rng = np.random.default_rng(7)
    sigma = rng.choice([1.0, 9.0], size=(base.nelements, 2))
    b_ref = load_vector(plan.reference.levels[3])
    _, _, detJ, _ = affine_maps(base)
    b = jnp.asarray(detJ[:, None] * b_ref[None, :])

    res = {}
    for cycle in ("V", "W"):
        s = MultigridSolver(plan, smoother=smoother, cycle=cycle)
        coeff = s.coefficients(sigma, 0.0)
        chol = s.coarse_cholesky(sigma, 0.0)
        x, _ = s.zero_states()
        hist = []
        for _ in range(10):
            x, r = s.vcycle(x, b, coeff, chol)
            hist.append(float(s.residual_norm(r)))
        res[cycle] = (hist, x)

    hv, xv = res["V"]
    hw, xw = res["W"]
    assert hw[-1] <= hv[-1], (hw[-1], hv[-1])
    assert hw[-1] < 1e-3 * hw[0]
