"""Microtimings of V-cycle components at the 190M-DOF bench config (TPU).

Run from the repo root: python scripts/time_coarse.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.85")

from homogenization_jl_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the host's axon TPU plugin overrides the env var alone
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from homogenization_jl_tpu.mesh.grid import hypercube
from homogenization_jl_tpu.models.checkerboard import (
    conductivity_per_element,
    generate_conductivity,
)
from homogenization_jl_tpu.ops.plan import build_grid_plan
from homogenization_jl_tpu.solver.multigrid import MultigridSolver

n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
nlevels = 5
base = hypercube(3, n, order=os.environ.get("TC_ORDER", "cube"))
rng = np.random.default_rng(0)
field = generate_conductivity(3, n, rng)
sigma = conductivity_per_element(base, field, np.zeros(3))
plan = build_grid_plan(base, nlevels, slot_tables=False)
print("plan built", flush=True)
import os as _os
solver = MultigridSolver(
    plan, dtype=jnp.float32, coarse="mg", coarse_mg_tol=1e-2,
    smoother=_os.environ.get("TC_SMOOTHER", "cg_exact"),
    smooth_precision=_os.environ.get("TC_SMOOTH_PRECISION") or None,
)
print("solver built", flush=True)
coeff = solver.coefficients(sigma, 0.0)
aux = solver.coarse_setup(sigma, 0.0)
print("coarse setup done", flush=True)
Ls = tuple(solver.levels)
E = plan.base.nelements


def timeit(name, fn, x, reps=30):
    """Time fn(x) inside one jitted fori_loop. The carry scalar perturbs the
    input by s * 1e-30 and is recomputed as the FULL sum of the output —
    a sequential dependence XLA can neither hoist out of the loop nor DCE
    (a 0.0 * y coupling gets simplified away and the body hoisted; measured
    14.8 "ms" for an apply whose true cost is ~100 ms)."""

    @jax.jit
    def jfn(x):
        def body(i, s):
            out = fn(x + s * jnp.asarray(1e-30, x.dtype))
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.sum(leaf) * jnp.asarray(1e-30, x.dtype)

        return jax.lax.fori_loop(0, reps, body, jnp.zeros((), x.dtype))

    float(jfn(x))
    t0 = time.perf_counter()
    float(jfn(x))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt * 1e3:9.3f} ms", flush=True)
    return dt


x0 = jnp.asarray(np.random.default_rng(1).standard_normal((E, 4)), jnp.float32)
xt = jnp.asarray(np.random.default_rng(1).standard_normal((E, 969)), jnp.float32)
uN = jnp.asarray(
    np.random.default_rng(2).standard_normal((plan.base.nnodes,)), jnp.float32
)

import jax.lax

top = nlevels - 1
m_N = solver._interior_mask_N
import json as _json
SEL = set((_os.environ.get("TC_ONLY") or "").split(",")) - {""}

def maybe(name, *a, **k):
    if SEL and name.split()[0] not in SEL:
        return
    timeit(name, *a, **k)

maybe("apply finest HIGHEST [E,969]", lambda v: solver._apply_op(v, coeff, top, Ls), xt)
maybe(
    "applyhigh finest HIGH (bf16x3)",
    lambda v: solver._apply_op(v, coeff, top, Ls, precision=jax.lax.Precision.HIGH),
    xt,
)
maybe("combine finest [E,969]", lambda v: solver._combine(v, top, Ls), xt)
for _k in range(1, nlevels - 1):
    _w = plan.n_local(_k)
    _xk = jnp.asarray(
        np.random.default_rng(_k).standard_normal((E, _w)), jnp.float32
    )
    maybe(
        f"combinek level{_k} [E,{_w}]",
        (lambda kk: lambda v: solver._combine(v, kk, Ls))(_k),
        _xk,
    )
maybe("constrain finest", lambda v: solver._constrain(v, top, Ls), xt)
from homogenization_jl_tpu.ops.transfer import prolong_add, restrict
maybe("restrict finest", lambda v: restrict(v, Ls[top].P_up), xt)
maybe(
    "smooth finest (3 CG steps)",
    lambda v: solver._smooth_cg(jnp.zeros_like(v), v, coeff, k=top, steps=3, Ls=Ls)[0],
    xt,
    reps=10,
)
maybe(
    "smoothexact finest cg_exact (3 steps)",
    lambda v: solver._smooth_cg_exact(jnp.zeros_like(v), v, coeff, k=top, steps=3, Ls=Ls)[0],
    xt,
    reps=10,
)
maybe("combine0 level0 [E,4]", lambda v: solver._combine(v, 0, Ls), x0)
maybe("to_global [E,4]->[N]", lambda v: solver._to_global(v, solver.base_elements), x0)
maybe(
    "globalapply [N]",
    lambda u: solver._global_apply(u, coeff, Ls, solver.base_elements, m_N),
    uN,
)
maybe(
    "coarse mg solve tol=1e-2",
    lambda v: solver._coarse_solve_mg(v, coeff, aux, Ls, solver.base_elements, m_N),
    x0,
    reps=10,
)
_lam = None
if solver.smoother in ("chebyshev", "chebyshev4"):
    _lam = jnp.asarray(solver.estimate_lambda_max(coeff), jnp.float32)
    maybe(
        "smoothcheb finest (3 steps, smooth_precision)",
        lambda v: solver._smooth(
            jnp.zeros_like(v), v, coeff, k=top, steps=3, Ls=Ls, lam_max=_lam
        )[0],
        xt,
        reps=10,
    )
    maybe(
        "pcgmatvec finest Ap HIGHEST + constrain",
        lambda v: solver._constrain(
            solver._apply_op(v, coeff, top, Ls), top, Ls
        ),
        xt,
    )
maybe(
    "vcycle FULL",
    lambda v: solver._vcycle_impl(
        jnp.zeros_like(v), v, coeff, aux, Ls, solver.base_elements, m_N, _lam
    )[0],
    xt,
    reps=5,
)
