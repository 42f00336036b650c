"""Matrix-free element apply (device, JAX) — the hot kernel.

Rebuild of the reference's per-element sparse mat-vec
(src/apply_local_operators.jl:85-133): there, each base element does (d^2+1)
CSC SpMVs against shared [n_local, n_local] reference matrices. Here the
reference matrices are densified and stacked ([P, n, n], see
fem/local_operators.py), the per-element geometry coefficients are
precomputed ([E, P]), and the apply is a batched contraction that XLA maps
onto the MXU:

    y[e, m] = sum_p coeff[e, p] * sum_n stack[p, m, n] * x[e, n]

The symmetric fold keeps P = d(d+1)/2 + 1 (4 in 2D, 7 in 3D) instead of
d^2 + 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# f32 on the MXU defaults to bf16 multiplies; CG needs better. f64 is emulated
# and ignores the flag. Measured on a v5e at [24576, 969] x 7 pieces:
# DEFAULT 4.7ms (rel err 2.4e-3), HIGH 7.7ms (1.0e-5), HIGHEST 13.2ms.
_PRECISION = jax.lax.Precision.HIGHEST


def element_apply(
    x: jnp.ndarray,
    coeff: jnp.ndarray,
    stack: jnp.ndarray,
    precision=_PRECISION,
    accumulate: str | None = None,
) -> jnp.ndarray:
    """y[e] = sum_p coeff[e, p] * (stack[p] @ x[e]).

    x: [E, n], coeff: [E, P], stack: [P, n, n] (symmetric slices).

    Accumulates over the P pieces instead of materializing the [E, P, n]
    einsum intermediate (P+2 times the state size in HBM — the single
    largest allocation at large E; this form keeps temps at O(E n)).

    ``accumulate``: "unroll" (default for native dtypes) emits P separate
    matmuls that XLA software-pipelines onto the MXU (the 88%-of-roofline
    f32 form); "loop" runs a sequential ``fori_loop``. For f64 off-CPU the
    loop is the default: f64 matmuls are EMULATED on TPU and XLA batches
    the unrolled chain into materialized [P+1, E, n] f32 temp stacks —
    measured 3 x 6 GB at 190M DOFs, a 42 GB compile-time OOM for the
    mixed-precision-PCG init program (round 5) — while MXU pipelining is
    irrelevant at emulation throughput. Both forms accumulate the pieces
    in the same order and agree to machine precision (FMA fusion differs
    between the program shapes; tests/test_operator_oracle).
    """
    P = stack.shape[0]
    if accumulate is None:
        accumulate = (
            "loop"
            if x.dtype == jnp.float64 and jax.default_backend() != "cpu"
            else "unroll"
        )
    if accumulate == "loop":
        def body(p, y):
            z = jnp.matmul(x, stack[p].T, precision=precision)
            c = jax.lax.dynamic_slice_in_dim(coeff, p, 1, axis=1)
            return y + c * z

        return jax.lax.fori_loop(0, P, body, jnp.zeros_like(x))
    assert accumulate == "unroll", accumulate
    y = jnp.zeros_like(x)
    for p in range(P):
        z = jnp.matmul(x, stack[p].T, precision=precision)
        y = y + coeff[:, p : p + 1] * z
    return y


def mass_apply(x: jnp.ndarray, mass: jnp.ndarray) -> jnp.ndarray:
    """y[e] = Mhat @ x[e] with the symmetric reference mass matrix [n, n]."""
    return jnp.einsum("mn,en->em", mass, x, precision=_PRECISION)
