"""Pallas TPU kernel for the matrix-free element apply.

The XLA-einsum path (ops/apply.py) materializes z[e, p, m] = stack[p] @ x[e]
in HBM — (P+2)x the state traffic of one array. This kernel fuses the piece
loop and the coefficient weighting:

    y[e, m] = sum_p coeff[e, p] * sum_n stack[p, m, n] x[e, n]
            = rowcat_p(coeff[e, p] * x[e, :])  @  rowcat_p(stack[p, :, :])^T

i.e. ONE [TE, P*TN] x [P*TN, TM] matmul per tile — a bigger contraction for
the MXU and exactly one read of x and one write of y in HBM. The stack slices
are symmetric (symmetric fold, fem/local_operators.py), so the kernel reads
the (n, m) block of stack where it needs the transposed (m, n) block — no
transposes anywhere.

Requirements: n_local padded to a multiple of 128 and E to a multiple of the
element tile (ops/plan.py-level padding is handled by the solver; this module
also provides a padding wrapper for standalone use).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    x_ref, c_ref, a_ref, y_ref, *, n_pieces: int, first_grid_axis: int,
    precision=jax.lax.Precision.HIGHEST,
):
    # grid = (E/TE, n/TM, n/TN); the TN axis is innermost -> y block resident
    nn = pl.program_id(2)

    xb = x_ref[:]  # [TE, TN]
    cb = c_ref[:]  # [TE, P]
    TE, TN = xb.shape
    # weighted copies of x, one per operator piece: [TE, P*TN]
    xw = (cb[:, :, None] * xb[:, None, :]).reshape(TE, n_pieces * TN)
    # stack block is the (nn, m) sub-block of the symmetric stack: [P, TN, TM]
    ab = a_ref[:].reshape(n_pieces * TN, -1)  # [P*TN, TM]
    part = jax.lax.dot_general(
        xw,
        ab,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    ).astype(y_ref.dtype)

    @pl.when(nn == 0)
    def _():
        y_ref[:] = part

    @pl.when(nn != 0)
    def _():
        y_ref[:] = y_ref[:] + part


def element_apply_pallas(
    x: jnp.ndarray,
    coeff: jnp.ndarray,
    stack: jnp.ndarray,
    *,
    tile_e: int = 256,
    tile_m: int = 256,
    tile_n: int = 256,
    interpret: bool = False,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """y[e] = sum_p coeff[e,p] * (stack[p] @ x[e]) with pre-padded shapes.

    x: [E, n] (E % tile_e == 0, n % tile_n == n % tile_m == 0),
    coeff: [E, P], stack: [P, n, n] with symmetric slices.
    """
    E, n = x.shape
    Pp = stack.shape[0]
    tile_m = min(tile_m, n)
    tile_n = min(tile_n, n)
    tile_e = min(tile_e, E)
    assert E % tile_e == 0 and n % tile_m == 0 and n % tile_n == 0

    grid = (E // tile_e, n // tile_m, n // tile_n)
    kernel = functools.partial(
        _kernel, n_pieces=Pp, first_grid_axis=0, precision=precision
    )

    flops = 2 * E * n * n * Pp
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_e, tile_n), lambda e, m, nn: (e, nn), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_e, Pp), lambda e, m, nn: (e, 0), memory_space=pltpu.VMEM
            ),
            # (nn, m) block of each symmetric stack slice == transposed (m, nn)
            pl.BlockSpec(
                (Pp, tile_n, tile_m),
                lambda e, m, nn: (0, nn, m),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_e, tile_m), lambda e, m, nn: (e, m), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((E, n), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x.size + x.size + coeff.size + stack.size) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, coeff, stack)


def element_apply_padded(x, coeff, stack, interpret: bool = False):
    """Standalone wrapper: pads x/stack to 128-multiples and E to the element
    tile, calls the kernel, slices back. For production use, keep the whole
    solver state padded instead (MultigridSolver(pad_local=True))."""
    E, n = x.shape
    n_pad = -(-n // 128) * 128
    tile_e = 256 if E >= 256 else max(8, E)
    E_pad = -(-E // tile_e) * tile_e
    xp = jnp.pad(x, ((0, E_pad - E), (0, n_pad - n)))
    cp = jnp.pad(coeff, ((0, E_pad - E), (0, 0)))
    sp = jnp.pad(stack, ((0, 0), (0, n_pad - n), (0, n_pad - n)))
    y = element_apply_pallas(xp, cp, sp, tile_e=tile_e, interpret=interpret)
    return y[:E, :n]
