"""Spectral random coefficient fields (device, jnp.fft).

Rebuild of tools/generate_st1_field.jl: white noise -> real FFT -> spectral
filter 1/(1+|k|)^p -> inverse FFT -> exp(alpha * |.|), producing log-normal-ish
conductivity fields with power-law correlations (the "st1" test fields).

TPU-native: jnp.fft.rfftn on device (XLA FFT), jax PRNG instead of host
randn, one jitted program. Multi-chip: shard the leading axis and let XLA's
distributed FFT handle it, or generate per-shard and halo-smooth — field
generation is setup cost, not the hot path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("shape", "p", "alpha"))
def generate_field(key, shape: tuple, p: float = 1.5, alpha: float = 100.0):
    """Random positive field on an n^d grid (reference: generate_field,
    tools/generate_st1_field.jl:86-120)."""
    dim = len(shape)
    assert all(s % 2 == 0 for s in shape), "even sizes required"
    noise = jax.random.normal(key, shape, dtype=jnp.float32)
    F = jnp.fft.rfftn(noise)

    # |k| with the reference's folded coordinate convention
    # (coord(m, i) = abs(abs(i - m - 1) - m), tools/generate_st1_field.jl:39):
    # frequencies fold symmetrically around the Nyquist index.
    k2 = jnp.zeros(F.shape, jnp.float32)
    for ax in range(dim):
        n = shape[ax]
        if ax == dim - 1:  # rfft axis: 0..n//2
            k = jnp.arange(F.shape[ax], dtype=jnp.float32)
        else:
            i = jnp.arange(n, dtype=jnp.float32)
            k = jnp.abs(jnp.abs(i - n // 2) - n // 2)
        sh = [1] * dim
        sh[ax] = F.shape[ax]
        k2 = k2 + (k.reshape(sh)) ** 2
    F = F / (1.0 + jnp.sqrt(k2)) ** p
    field = jnp.fft.irfftn(F, s=shape)
    return jnp.exp(alpha * jnp.abs(field))


def st1_conductivity(key, n: int, dim: int, p: float = 1.5, alpha: float = 100.0):
    """Per-cell isotropic conductivity on an n^dim unit-cell grid."""
    return generate_field(key, (n,) * dim, p=p, alpha=alpha)
