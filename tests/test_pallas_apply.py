"""Pallas element-apply kernel vs the XLA einsum reference (interpret mode
on CPU; the real TPU path is exercised by bench.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from homogenization_jl_tpu.ops.apply import element_apply
from homogenization_jl_tpu.ops.pallas_apply import element_apply_padded


@pytest.mark.parametrize("E,n,P", [(16, 45, 4), (8, 165, 7), (32, 130, 7)])
def test_pallas_matches_einsum(E, n, P):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((E, n)), jnp.float32)
    coeff = jnp.asarray(rng.standard_normal((E, P)), jnp.float32)
    # symmetric stack slices (as produced by the symmetric fold)
    s = rng.standard_normal((P, n, n))
    stack = jnp.asarray(s + np.swapaxes(s, 1, 2), jnp.float32)

    y_ref = element_apply(x, coeff, stack)
    y_pl = element_apply_padded(x, coeff, stack, interpret=True)
    err = np.abs(np.asarray(y_pl) - np.asarray(y_ref)).max()
    scale = np.abs(np.asarray(y_ref)).max()
    assert err < 5e-4 * scale, f"pallas mismatch {err} vs {scale}"
