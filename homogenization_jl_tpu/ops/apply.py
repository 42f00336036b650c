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
) -> jnp.ndarray:
    """y[e] = sum_p coeff[e, p] * (stack[p] @ x[e]).

    x: [E, n], coeff: [E, P], stack: [P, n, n] (symmetric slices).

    Accumulates over the P pieces instead of materializing the [E, P, n]
    einsum intermediate (P+2 times the state size in HBM — the single
    largest allocation at large E; this form keeps temps at O(E n)).
    """
    P = stack.shape[0]
    y = jnp.zeros_like(x)
    for p in range(P):
        z = jnp.matmul(x, stack[p].T, precision=precision)
        y = y + coeff[:, p : p + 1] * z
    return y


def mass_apply(x: jnp.ndarray, mass: jnp.ndarray) -> jnp.ndarray:
    """y[e] = Mhat @ x[e] with the symmetric reference mass matrix [n, n]."""
    return jnp.einsum("mn,en->em", mass, x, precision=_PRECISION)
