"""Grid transfer: prolongation / restriction (device, JAX).

Rebuild of interpolate_and_sum_to! / restrict_to! (src/interpolation.jl:52-74).
The per-level prolongation P_k is [n_{k+1}, n_k] (identity prefix + half/half
midpoint rows, see mesh/reference.py); batched over base elements both
transfers are single dense matmuls on the MXU — the element axis is the batch
axis, so they need no communication at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PRECISION = jax.lax.Precision.HIGHEST


def prolong_add(x_fine, x_coarse, P):
    """x_fine + x_coarse @ P^T  (reference: xk += P x_{k-1})."""
    return x_fine + jnp.einsum("ec,fc->ef", x_coarse, P, precision=_PRECISION)


def restrict(r_fine, P):
    """P^T r, batched: [E, n_f] @ [n_f, n_c] (reference: b_{k-1} = P' r_k)."""
    return jnp.einsum("ef,fc->ec", r_fine, P, precision=_PRECISION)
