"""Experiments on the structured interface combine (NEXT.md item 1).

Times the finest-level combine variants at the bench config on TPU and
asserts they produce identical values. Run: python scripts/bench_combine.py [n]
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
from homogenization_jl_tpu.ops.plan import build_grid_plan
from homogenization_jl_tpu.ops import structured as st

n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
order = os.environ.get("BC_ORDER", "type")
nlevels = int(os.environ.get("BC_LEVELS", "5"))
k = nlevels - 1
base = hypercube(3, n, order=order)
plan = build_grid_plan(base, nlevels, slot_tables=False)
sc = st.build_structured_combine(plan, k)
lay_ref = plan.reference.layout[k]
i0 = int(min(list(lay_ref.face_offsets) + list(lay_ref.edge_offsets) + list(lay_ref.corner_cols)))
lay = dict(iface_start=i0)
E = base.nelements
n_local = plan.n_local(k)
print(f"n={n} order={order} E={E} n_local={n_local} i0={i0}", flush=True)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((E, n_local)), jnp.float32)


# --------------------------------------------------------------------- #
# variant: merged trailing dims — type blocks viewed as [n]*(d-1) + [n*width]
# so the minor two dims are (n, n*width) instead of (n, width): edge (15)
# and corner (1) blocks stop padding 8-128x to the (8,128) tile.
# --------------------------------------------------------------------- #
def combine_merged(x, sc, lay, constrain=False, prepad=False, direct_face=False):
    n, d, ept = sc.n, sc.d, sc.ept
    E, n_local = x.shape
    nd = n**d
    tb_cache = {}

    def type_block(t, col, width):
        """merged view [n]*(d-1) + [n*width]; optionally pre-padded by
        sc.pad on every grid axis so all shifted reads are interior."""
        key = (t, col, width)
        if key not in tb_cache:
            if sc.order == "type":
                blk = jax.lax.slice(x, (t * nd, col), ((t + 1) * nd, col + width))
            else:
                blk = jax.lax.slice(x, (t, col), (E, col + width), (ept, 1))
            blk = blk.reshape((n,) * (d - 1) + (n * width,))
            if prepad:
                p = sc.pad
                pads = tuple((p, p) for _ in range(d - 1)) + ((p * width, p * width),)
                blk = jnp.pad(blk, pads)
            tb_cache[key] = blk
        return tb_cache[key]

    def shifted(t, col, width, lo, hi):
        lo = np.asarray(lo)
        hi = np.asarray(hi)
        blk = type_block(t, col, width)
        if prepad:
            p = sc.pad
            idx = tuple(slice(int(a + p), int(b + p)) for a, b in zip(lo[:-1], hi[:-1]))
            idx = idx + (slice(int((lo[-1] + p) * width), int((hi[-1] + p) * width)),)
            return blk[idx]
        lo_c = np.clip(lo, 0, n)
        hi_c = np.clip(hi, 0, n)
        idx = tuple(slice(int(a), int(b)) for a, b in zip(lo_c[:-1], hi_c[:-1]))
        idx = idx + (slice(int(lo_c[-1] * width), int(hi_c[-1] * width)),)
        piece = blk[idx]
        pads = tuple((int(lc - l), int(h - hc)) for l, lc, h, hc in zip(lo[:-1], lo_c[:-1], hi[:-1], hi_c[:-1]))
        pads = pads + ((int((lo_c[-1] - lo[-1]) * width), int((hi[-1] - hi_c[-1]) * width)),)
        if any(p != (0, 0) for p in pads):
            piece = jnp.pad(piece, pads)
        return piece

    def zero_shell(acc, p_lo, ob):
        if ob.int_lo is None:
            return jnp.zeros_like(acc)
        lo = np.array(ob.int_lo) - p_lo
        hi = np.array(ob.int_hi) + 1 - p_lo
        ext = np.array(ob.p_max) - np.array(ob.p_min) + 1
        if (lo == 0).all() and (hi == ext).all():
            return acc
        # merged last axis: interior cut at multiples of width
        w = acc.shape[-1] // ext[-1]
        idx = tuple(slice(int(a), int(b)) for a, b in zip(lo[:-1], hi[:-1]))
        idx = idx + (slice(int(lo[-1] * w), int(hi[-1] * w)),)
        pads = tuple((int(a), int(e - b)) for a, b, e in zip(lo[:-1], hi[:-1], ext[:-1]))
        pads = pads + ((int(lo[-1] * w), int((ext[-1] - hi[-1]) * w)),)
        return jnp.pad(acc[idx], pads)

    class_sums = {}
    for name, (orbits, rebuild, offsets, width) in sc.classes.items():
        if direct_face and name == "face":
            continue
        sums = []
        for ob in orbits:
            p_lo = np.array(ob.p_min)
            p_hi = np.array(ob.p_max) + 1
            acc = None
            for dlt, t, l in ob.pattern:
                piece = shifted(t, offsets[l], width, p_lo + np.array(dlt), p_hi + np.array(dlt))
                acc = piece if acc is None else acc + piece
            if constrain:
                acc = zero_shell(acc, p_lo, ob)
            sums.append((p_lo, acc))
        class_sums[name] = sums

    i0 = lay["iface_start"]
    tails = []
    for t in range(ept):
        cols = []
        for name in ("face", "edge", "corner"):
            if name not in sc.classes:
                continue
            orbits, rebuild, offsets, width = sc.classes[name]
            for l in range(len(offsets)):
                oi, dlt = rebuild[(t, l)]
                if direct_face and name == "face":
                    # valence-2 orbits: rebuild directly from the inputs
                    ob = orbits[oi]
                    acc = None
                    for dlt2, t2, l2 in ob.pattern:
                        s = np.array(dlt2) - np.array(dlt)
                        piece = shifted(t2, offsets[l2], width, s, s + n)
                        acc = piece if acc is None else acc + piece
                    if constrain:
                        p_lo2 = np.array(dlt)  # anchor of cell c is c - dlt
                        acc = zero_shell_cell(acc, dlt, ob, n, width)
                    blk = acc
                else:
                    p_lo, acc = class_sums[name][oi]
                    lo = -np.array(dlt) - p_lo
                    idx = tuple(slice(int(a), int(a) + n) for a in lo[:-1])
                    idx = idx + (slice(int(lo[-1] * width), int((lo[-1] + n) * width)),)
                    blk = acc[idx]
                cols.append(blk.reshape((n,) * d + (width,)))
        tail_t = jnp.concatenate(cols, axis=-1)
        tails.append(tail_t.reshape(nd, -1))
    if sc.order == "type":
        tail = jnp.concatenate(tails, axis=0)
    else:
        tail = jnp.stack(tails, axis=1).reshape(E, -1)
    if i0 == 0:
        return tail
    return jax.lax.dynamic_update_slice(x, tail, (0, i0))


def zero_shell_cell(acc, dlt, ob, n, width):
    """Zero-shell for a direct per-cell block: anchors of cell block c are
    c - dlt; keep c in [int_lo+dlt, int_hi+dlt]."""
    if ob.int_lo is None:
        return jnp.zeros_like(acc)
    lo = np.clip(np.array(ob.int_lo) + np.array(dlt), 0, n)
    hi = np.clip(np.array(ob.int_hi) + 1 + np.array(dlt), 0, n)
    if (lo == 0).all() and (hi == n).all():
        return acc
    idx = tuple(slice(int(a), int(b)) for a, b in zip(lo[:-1], hi[:-1]))
    idx = idx + (slice(int(lo[-1] * width), int(hi[-1] * width)),)
    pads = tuple((int(a), int(n - b)) for a, b in zip(lo[:-1], hi[:-1]))
    pads = pads + ((int(lo[-1] * width), int((n - hi[-1]) * width)),)
    return jnp.pad(acc[idx], pads)


def timeit(name, fn, x, reps=30):
    @jax.jit
    def jfn(x):
        def body(i, s):
            out = fn(x + s * jnp.asarray(1e-30, x.dtype))
            return jnp.sum(out) * jnp.asarray(1e-30, x.dtype)

        return jax.lax.fori_loop(0, reps, body, jnp.zeros((), x.dtype))

    float(jfn(x))
    t0 = time.perf_counter()
    float(jfn(x))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt * 1e3:9.3f} ms", flush=True)
    return dt


ref = jax.jit(lambda v: st.combine_structured(v, sc, lay))(x)
variants = {
    "merged": dict(),
    "merged+prepad": dict(prepad=True),
    "merged+directface": dict(direct_face=True),
    "merged+prepad+directface": dict(prepad=True, direct_face=True),
}
for name, kw in variants.items():
    out = jax.jit(lambda v: combine_merged(v, sc, lay, **kw))(x)
    diff = float(jnp.max(jnp.abs(out - ref)))
    print(f"{name}: max|diff| = {diff:.3e}", flush=True)
    assert diff == 0.0, name

refc = jax.jit(lambda v: st.combine_structured(v, sc, lay, constrain=True))(x)
for name, kw in variants.items():
    out = jax.jit(lambda v: combine_merged(v, sc, lay, constrain=True, **kw))(x)
    diff = float(jnp.max(jnp.abs(out - refc)))
    print(f"{name} constrain: max|diff| = {diff:.3e}", flush=True)
    assert diff == 0.0, name

timeit("combine current", lambda v: st.combine_structured(v, sc, lay), x)
for name, kw in variants.items():
    timeit(f"combine {name}", lambda v, kw=kw: combine_merged(v, sc, lay, **kw), x)
timeit(
    "combine current constrain",
    lambda v: st.combine_structured(v, sc, lay, constrain=True),
    x,
)
for name, kw in variants.items():
    timeit(
        f"combine {name} constrain",
        lambda v, kw=kw: combine_merged(v, sc, lay, constrain=True, **kw),
        x,
    )
