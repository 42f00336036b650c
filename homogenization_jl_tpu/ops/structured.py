"""Structured-mesh fast path for the interface combine (device, JAX).

On a full-box lexicographic hypercube base (the flagship/benchmark geometry:
``hypercube(d, n)``, elements ordered cube-major with ``ept`` = 2 (2D) / 6
(3D) simplices per cube, identical split in every cube), the interface
topology is TRANSLATION INVARIANT: the owners of every shared face/edge/
corner group sit at fixed (cube-offset, simplex-type, local-cell) positions
relative to the group's lattice anchor.

The general combine (ops/interfaces.py::combine_gather_rows) is gather-based
and therefore DESCRIPTOR-RATE bound on TPU (~11 ns per gathered row; the
~5.9M narrow edge/corner rows at a 196k-element base cost ~66 ms per combine
— measured, PERFORMANCE.md round 2). This module replaces every gather with
static SLICES of the state viewed as ``[n]*d + [ept, n_local]``:

    sums[orbit]   = sum over the orbit's (delta, t, l) pattern of
                    Xpad[p + delta, t, cols(l)]          (shifted slice-adds)
    combined[t,l] = sums[orbit(t, l)][c - delta(t, l)]   (one slice each)

— pure contiguous copies at HBM bandwidth, no per-row descriptors.

The orbit patterns are NOT hand-derived from the Kuhn-split geometry: they
are extracted (and cross-validated) from the general gather tables the plan
already builds, so the fast path provably computes the same sums. Boundary
groups fall out automatically: their missing out-of-range owners read
zero-padding, which is exactly the partial sum the general path computes.
(Reference baseline for the operation: broadcast_interfaces!,
src/implicit_fine_grid.jl:209-328.)
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp

# layout knobs for the structured combine, overridable per process for A/B
# timing on hardware (scripts/bench_combine.py measures every variant; all
# variants are asserted bitwise-identical in tests)
_MERGED = os.environ.get("HZT_COMBINE_MERGED", "0") == "1"
_PREPAD = os.environ.get("HZT_COMBINE_PREPAD", "0") == "1"
_DIRECT_FACE = os.environ.get("HZT_COMBINE_DIRECT_FACE", "0") == "1"


@dataclasses.dataclass(frozen=True)
class Orbit:
    """One translation-invariant family of interface groups."""

    pattern: tuple  # ((delta (d-tuple), t, l), ...) — the owners
    p_min: tuple  # componentwise anchor range over this orbit's groups
    p_max: tuple
    # anchors inside [int_lo, int_hi] (inclusive) are INTERIOR groups; the
    # rest lie on the domain boundary (zero-Dirichlet). None = every group
    # of this orbit is boundary. Validated exhaustively against the plan's
    # boundary mask at build time.
    int_lo: tuple | None = None
    int_hi: tuple | None = None


@dataclasses.dataclass(frozen=True)
class StructuredCombine:
    """Static shift rules for one level of one plan."""

    n: int
    d: int
    ept: int
    n_local: int
    order: str  # "cube" (e = cube*ept + t) or "type" (e = t*n^d + cube)
    # per class: (orbits, rebuild) with rebuild[(t, l)] = (orbit_idx, delta)
    classes: dict  # name -> (orbits: list[Orbit], rebuild: dict, offsets, width)
    pad: int  # halo padding applied to the state view


def _cube_coords(e: np.ndarray, n: int, d: int, ept: int, order: str):
    if order == "cube":
        cube = e // ept
        t = e % ept
    else:  # type-major
        t = e // n**d
        cube = e % n**d
    out = np.empty((len(e), d), dtype=np.int64)
    for k in range(d - 1, -1, -1):
        out[:, k] = cube % n
        cube = cube // n
    return out, t


def detect_structured(base) -> tuple | None:
    """(n, ept, order) if ``base`` is a lexicographic full-box hypercube
    mesh in cube-major or type-major generator order, else None."""
    from ..solver.coarse import detect_box

    box = detect_box(base)
    if box is None:
        return None
    origin, n, h = box
    d = base.dim
    ept = 2 if d == 2 else 6
    # centroid of element e must lie in the cube its order implies
    centers = base.nodes[base.elements].mean(axis=1)
    cube_of = np.floor((centers - origin[None, :]) / h).astype(np.int64)
    cube_of = np.clip(cube_of, 0, n - 1)
    e = np.arange(base.nelements)
    order = None
    for cand in ("cube", "type"):
        expect, _ = _cube_coords(e, n, d, ept, cand)
        if np.array_equal(cube_of, expect):
            order = cand
            break
    if order is None:
        return None

    # verify identical per-cube split: node pattern of cube 0 replicated
    def els_of_cube(c):
        if order == "cube":
            return base.elements[c * ept : (c + 1) * ept]
        return base.elements[c :: n**d]

    nid_stride = np.array([(n + 1) ** (d - 1 - k) for k in range(d)])
    first = els_of_cube(0)
    for c in (1, base.nelements // ept - 1):
        blk = els_of_cube(c)
        coord = np.array(np.unravel_index(c, (n,) * d))
        off = (coord * nid_stride).sum()
        if not np.array_equal(np.sort(blk.reshape(-1)) - off, np.sort(first.reshape(-1))):
            return None
        if not np.array_equal(blk - blk.min(), first - first.min()):
            return None
    return n, ept, order


def build_structured_combine(
    plan, k: int, det: "tuple | None" = None
) -> "StructuredCombine | None":
    """Derive the shift rules for level ``k`` from the general gather
    tables, or None when the base is not a structured box."""
    base = plan.base
    if det is None:
        det = detect_structured(base)
    if det is None or plan.reference.layout is None:
        return None
    n, ept, order = det
    d = base.dim
    lp = plan.levels[k]
    lay = plan.reference.layout[k]
    n_local = plan.n_local(k)

    class_specs = []
    if lp.gather.face is not None:
        class_specs.append(("face", lp.gather.face, lay.face_offsets, lay.npf))
    if lp.gather.edge is not None and lay.npe > 0:
        class_specs.append(("edge", lp.gather.edge, lay.edge_offsets, lay.npe))
    if lp.gather.corner is not None:
        class_specs.append(("corner", lp.gather.corner, lay.corner_cols, 1))

    classes = {}
    max_abs_delta = 1
    for name, (oe, ol, om, gmap), offsets, width in class_specs:
        G, M = oe.shape
        valid = om > 0
        c_all, t_all = _cube_coords(
            oe.reshape(-1).astype(np.int64), n, d, ept, order
        )
        c_all = c_all.reshape(G, M, d)
        t_all = t_all.reshape(G, M)
        l_all = ol.astype(np.int64)

        counts = valid.sum(axis=1)
        # canonical per-group pattern key relative to the min owner cube
        a_min = np.where(valid[:, :, None], c_all, np.iinfo(np.int64).max).min(axis=1)
        delta = c_all - a_min[:, None, :]
        # encode (delta in [0..3]^d, t, l) as one small int; invalid -> big
        code = np.zeros((G, M), dtype=np.int64)
        for kk in range(d):
            dk = delta[:, :, kk]
            assert ((dk >= 0) & (dk <= 3) | ~valid).all()
            code = code * 4 + np.where(valid, dk, 0)
        code = (code * ept + np.where(valid, t_all, 0)) * 64 + np.where(
            valid, l_all, 0
        )
        code = np.where(valid, code, np.iinfo(np.int64).max)
        code_sorted = np.sort(code, axis=1)  # valid codes first, sentinels last

        # valence can legitimately differ between orbits (e.g. axis edges vs
        # the cube diagonal): peel orbits off in decreasing valence until
        # every group is classified. Interior (full-valence) groups define
        # each orbit's pattern; lower-valence boundary groups attach to an
        # existing orbit when their owners are exactly the in-range part of
        # its pattern — which is also the proof that zero-padded shifts
        # reproduce their partial sums.
        orbit_patterns: list[list] = []
        orbit_of = np.full(G, -1, dtype=np.int64)
        anchor = np.zeros((G, d), dtype=np.int64)

        def decode(cd):
            l = cd % 64
            cd //= 64
            t = cd % ept
            cd //= ept
            dl = []
            for _ in range(d):
                dl.append(cd % 4)
                cd //= 4
            return tuple(reversed(dl)), int(t), int(l)

        remaining = np.arange(G)
        while len(remaining):
            cnt_r = counts[remaining]
            top = cnt_r.max()
            cand = remaining[cnt_r == top]
            # attach to existing orbits first (a boundary group of a
            # high-valence orbit can tie an interior group of a lower one)
            attached = np.zeros(len(cand), dtype=bool)
            for oi, pat in enumerate(orbit_patterns):
                att = _try_attach(
                    cand, c_all, t_all, l_all, valid, pat, n, orbit_of, anchor, oi
                )
                attached |= att
            todo = cand[~attached]
            if len(todo):
                rows_t = code_sorted[todo]
                uniq2, inv2 = np.unique(rows_t, axis=0, return_inverse=True)
                for ui, u in enumerate(uniq2):
                    pat = [decode(int(cd)) for cd in u if cd != np.iinfo(np.int64).max]
                    oi = len(orbit_patterns)
                    orbit_patterns.append(pat)
                    grp = todo[inv2 == ui]
                    ok = _try_attach(
                        grp, c_all, t_all, l_all, valid, pat, n, orbit_of, anchor, oi
                    )
                    assert ok.all(), f"{name}: self-attach failed"
            new_remaining = remaining[orbit_of[remaining] < 0]
            assert len(new_remaining) < len(remaining), (
                f"{name}: no classification progress ({len(remaining)} left)"
            )
            remaining = new_remaining

        # rebuild map: every (t, l) belongs to exactly one (orbit, delta)
        rebuild: dict = {}
        for oi, pat in enumerate(orbit_patterns):
            for dlt, t, l in pat:
                key = (t, l)
                val = (oi, dlt)
                assert rebuild.get(key, val) == val, (
                    f"{name}: ({t},{l}) in two orbits"
                )
                rebuild[key] = val
        L = gmap.shape[1]
        assert len(rebuild) == ept * L, (
            f"{name}: rebuild covers {len(rebuild)} != {ept * L} cells"
        )

        # cross-validate: every group's owners == pattern ∩ range, and gmap
        # agrees with the anchor arithmetic
        _validate(
            name, G, M, c_all, t_all, l_all, valid, orbit_of, anchor,
            orbit_patterns, n, gmap, ept, order,
        )

        # boundary classification: a group is boundary iff its cells are
        # zeroed by the Dirichlet mask (cells zero as whole blocks). For a
        # full box this must be an axis-aligned anchor-range condition per
        # orbit — asserted exhaustively, which is what licenses the
        # structured constraint (zeroing static shells of the sums arrays).
        bmask = lp.boundary_mask
        g_boundary = (
            bmask[oe[:, 0].astype(np.int64), np.asarray(offsets)[ol[:, 0]]] == 0
        )

        orbits = []
        for oi, pat in enumerate(orbit_patterns):
            sel = orbit_of == oi
            p = anchor[sel]
            gb = g_boundary[sel]
            if gb.all():
                int_lo = int_hi = None
            else:
                pi = p[~gb]
                int_lo = tuple(int(v) for v in pi.min(axis=0))
                int_hi = tuple(int(v) for v in pi.max(axis=0))
                inside = ((p >= pi.min(axis=0)) & (p <= pi.max(axis=0))).all(axis=1)
                assert (inside == ~gb).all(), (
                    f"{name}: orbit {oi} boundary set is not an anchor box"
                )
            orbits.append(
                Orbit(
                    pattern=tuple((tuple(int(x) for x in dlt), int(t), int(l)) for dlt, t, l in pat),
                    p_min=tuple(int(v) for v in p.min(axis=0)),
                    p_max=tuple(int(v) for v in p.max(axis=0)),
                    int_lo=int_lo,
                    int_hi=int_hi,
                )
            )
            for dlt, _, _ in pat:
                max_abs_delta = max(max_abs_delta, *(abs(int(x)) for x in dlt))

        classes[name] = (orbits, rebuild, tuple(int(o) for o in offsets), int(width))

    # element-interior (head) columns must never carry boundary DOFs — what
    # licenses the structured constraint to touch only interface columns
    if class_specs:
        i0 = min(min(offs) for _, _, offs, w in class_specs if len(offs))
        assert (plan.levels[k].boundary_mask[:, :i0] != 0).all(), (
            "element-interior columns unexpectedly contain boundary DOFs"
        )

    return StructuredCombine(
        n=n, d=d, ept=ept, n_local=n_local, order=order, classes=classes,
        pad=max_abs_delta,
    )


# cache of small boxes used by the rescaled build, keyed by
# (dim, nlevels, order, n_small) -> GridPlan / (..., k) -> StructuredCombine
_SMALL_CACHE: dict = {}


def build_structured_combine_auto(
    plan, k: int, threshold: int = 16, det: "tuple | None" = None
) -> "StructuredCombine | None":
    """Direct orbit derivation for small bases, rescaled small-box
    derivation (O(1) in base size) at n >= ``threshold`` where the direct
    census over all groups starts to dominate plan setup. ``det`` feeds a
    precomputed detect_structured result through (the detection is an O(E)
    centroid pass — callers building every level pass it once)."""
    if det is None:
        det = detect_structured(plan.base)
    if det is None or plan.reference.layout is None:
        return None
    if det[0] >= threshold:
        return build_structured_combine_scaled(plan, k, det=det)
    return build_structured_combine(plan, k, det=det)


def build_structured_combine_scaled(
    plan, k: int, n_small: tuple = (6, 7), det: "tuple | None" = None
) -> "StructuredCombine | None":
    """Like :func:`build_structured_combine` but O(1) in the base size: the
    orbit rules are translation invariant, so they are derived once on two
    small boxes (n0, n0+1) and every anchor range — affine in n with slope
    0 or 1 — is rescaled to the plan's n. The direct build's census over
    all G groups (~65 s at a 1.5M-element base) collapses to two seconds of
    small-box work plus an exact global count check and a 4096-group sampled
    owner-set validation against the plan's real gather tables.
    """
    if det is None:
        det = detect_structured(plan.base)
    if det is None or plan.reference.layout is None:
        return None
    n, ept, order = det
    n0, n1 = n_small
    assert n1 == n0 + 1
    if n <= n1:
        return build_structured_combine(plan, k, det=det)
    from ..mesh.grid import hypercube
    from .plan import build_grid_plan

    d = plan.base.dim
    nlevels = plan.nlevels
    scs = []
    for ns in n_small:
        ck = (d, nlevels, order, ns, k)
        sc = _SMALL_CACHE.get(ck)
        if sc is None:
            pk = (d, nlevels, order, ns)
            plan_s = _SMALL_CACHE.get(pk)
            if plan_s is None:
                plan_s = build_grid_plan(
                    hypercube(d, ns, order=order), nlevels, slot_tables=False
                )
                _SMALL_CACHE[pk] = plan_s
            sc = build_structured_combine(plan_s, k)
            _SMALL_CACHE[ck] = sc
        scs.append(sc)
    sc0, sc1 = scs

    def affine(v0, v1):
        # componentwise: slope must be 0 or 1 (ranges are either pinned to
        # the origin side or track the far boundary)
        out = []
        for a, b in zip(v0, v1):
            s = b - a
            assert s in (0, 1), f"anchor range slope {s} not in {{0,1}}"
            out.append(int(a + s * (n - n0)))
        return tuple(out)

    assert set(sc0.classes) == set(sc1.classes)
    classes = {}
    for name in sc0.classes:
        orbits0, rebuild0, offsets0, width0 = sc0.classes[name]
        orbits1, rebuild1, offsets1, width1 = sc1.classes[name]
        assert offsets0 == offsets1 and width0 == width1, name
        by_pat1 = {ob.pattern: i for i, ob in enumerate(orbits1)}
        assert len(by_pat1) == len(orbits1), f"{name}: duplicate patterns"
        assert len(orbits0) == len(orbits1), (
            f"{name}: orbit count differs between n={n0} and n={n1}"
        )
        orbits = []
        o_map = {}  # sc0 orbit index -> scaled orbit (same index order)
        for oi, ob0 in enumerate(orbits0):
            ob1 = orbits1[by_pat1[ob0.pattern]]
            o_map[by_pat1[ob0.pattern]] = oi
            assert (ob0.int_lo is None) == (ob1.int_lo is None), name
            orbits.append(
                Orbit(
                    pattern=ob0.pattern,
                    p_min=affine(ob0.p_min, ob1.p_min),
                    p_max=affine(ob0.p_max, ob1.p_max),
                    int_lo=None if ob0.int_lo is None else affine(ob0.int_lo, ob1.int_lo),
                    int_hi=None if ob0.int_hi is None else affine(ob0.int_hi, ob1.int_hi),
                )
            )
        # the (t, l) -> (orbit, delta) map must agree between the two sizes
        assert set(rebuild0) == set(rebuild1), name
        for key, (oi1, dlt1) in rebuild1.items():
            oi0, dlt0 = rebuild0[key]
            assert o_map[oi1] == oi0 and dlt0 == dlt1, f"{name}: rebuild mismatch {key}"
        classes[name] = (orbits, dict(rebuild0), offsets0, width0)

    assert sc0.pad == sc1.pad
    sc = StructuredCombine(
        n=n, d=d, ept=ept, n_local=plan.n_local(k), order=order,
        classes=classes, pad=sc0.pad,
    )
    _validate_scaled(plan, k, sc)
    return sc


def _validate_scaled(plan, k: int, sc: StructuredCombine, n_sample: int = 4096):
    """Exact global checks + sampled owner-set check of a rescaled
    StructuredCombine against the plan's real gather tables."""
    n, d, ept, order = sc.n, sc.d, sc.ept, sc.order
    lp = plan.levels[k]
    lay = plan.reference.layout[k]
    bmask = lp.boundary_mask
    specs = {}
    if lp.gather.face is not None:
        specs["face"] = (lp.gather.face, lay.face_offsets)
    if lp.gather.edge is not None and lay.npe > 0:
        specs["edge"] = (lp.gather.edge, lay.edge_offsets)
    if lp.gather.corner is not None:
        specs["corner"] = (lp.gather.corner, lay.corner_cols)
    assert set(specs) == set(sc.classes)

    stride = np.array([n ** (d - 1 - kk) for kk in range(d)], dtype=np.int64)

    def eid(pos, t):
        cube = int((pos * stride).sum())
        return cube * ept + t if order == "cube" else t * n**d + cube

    rng = np.random.default_rng(0)
    for name, ((oe, ol, om, gmap), offsets) in specs.items():
        orbits, rebuild, offs, width = sc.classes[name]
        G, M = oe.shape
        E, L = gmap.shape
        # exact: total group count == sum over orbits of the anchor-box size
        tot = sum(
            int(np.prod([hi - lo + 1 for lo, hi in zip(ob.p_min, ob.p_max)]))
            for ob in orbits
        )
        assert tot == G, f"{name}: scaled anchor boxes cover {tot} != {G} groups"
        # exact: boundary-group count == sum of (box - interior box) sizes
        g_bnd = bmask[oe[:, 0].astype(np.int64), np.asarray(offs)[ol[:, 0]]] == 0
        tot_b = 0
        for ob in orbits:
            box = int(np.prod([hi - lo + 1 for lo, hi in zip(ob.p_min, ob.p_max)]))
            if ob.int_lo is None:
                tot_b += box
            else:
                tot_b += box - int(
                    np.prod([hi - lo + 1 for lo, hi in zip(ob.int_lo, ob.int_hi)])
                )
        assert tot_b == int(g_bnd.sum()), (
            f"{name}: scaled boundary boxes cover {tot_b} != {int(g_bnd.sum())}"
        )
        # sampled: the group each (element, cell) rebuilds from has exactly
        # the owner set the orbit pattern predicts at the implied anchor
        sample = rng.choice(E * L, size=min(n_sample, E * L), replace=False)
        e_s = (sample // L).astype(np.int64)
        l_s = (sample % L).astype(np.int64)
        c_e, t_e = _cube_coords(e_s, n, d, ept, order)
        for i in range(len(sample)):
            oi, dlt = rebuild[(int(t_e[i]), int(l_s[i]))]
            ob = orbits[oi]
            p = c_e[i] - np.asarray(dlt)
            assert (p >= ob.p_min).all() and (p <= ob.p_max).all(), (
                f"{name}: anchor {p} outside scaled box of orbit {oi}"
            )
            gi = int(gmap[e_s[i], l_s[i]])
            actual = {
                (int(oe[gi, j]), int(ol[gi, j])) for j in range(M) if om[gi, j] > 0
            }
            expect = set()
            for dlt2, t2, l2 in ob.pattern:
                pos = p + np.asarray(dlt2)
                if ((pos >= 0) & (pos < n)).all():
                    expect.add((eid(pos, t2), l2))
            assert actual == expect, (
                f"{name}: owner set mismatch at group {gi} (anchor {p})"
            )
            bnd = bool(g_bnd[gi])
            inside = ob.int_lo is not None and (
                (p >= ob.int_lo).all() and (p <= ob.int_hi).all()
            )
            assert bnd == (not inside), f"{name}: boundary flag mismatch at {gi}"

    # element-interior (head) columns must never carry boundary DOFs
    i0 = min(
        min(offs) for (_, _, offs, _) in sc.classes.values() if len(offs)
    )
    assert (bmask[:, :i0] != 0).all(), (
        "element-interior columns unexpectedly contain boundary DOFs"
    )


def _try_attach(groups, c_all, t_all, l_all, valid, pat, n, orbit_of, anchor, oi):
    """Vectorized: attach each group in ``groups`` to orbit ``pat`` if its
    owners are exactly the pattern entries whose position lands in range.
    Returns a bool mask over ``groups``; updates orbit_of/anchor in place."""
    d = c_all.shape[2]
    pat_map = {(t, l): np.array(dlt) for dlt, t, l in pat}
    nG = len(groups)
    ok = np.ones(nG, dtype=bool)
    anch = np.full((nG, d), np.iinfo(np.int64).min)
    have = np.zeros(nG, dtype=np.int64)
    M = c_all.shape[1]
    for j in range(M):
        v = valid[groups, j]
        tj = t_all[groups, j]
        lj = l_all[groups, j]
        cj = c_all[groups, j]
        dlt = np.full((nG, d), np.iinfo(np.int64).min)
        known = np.zeros(nG, dtype=bool)
        for (t, l), dv in pat_map.items():
            m = v & (tj == t) & (lj == l)
            dlt[m] = dv
            known[m] = True
        ok &= ~v | known
        imp = cj - dlt
        first = v & known & (anch[:, 0] == np.iinfo(np.int64).min)
        anch[first] = imp[first]
        same = (~(v & known)) | (imp == anch).all(axis=1)
        ok &= same
        have += (v & known).astype(np.int64)
    # all pattern entries within range must be present
    exp = np.zeros(nG, dtype=np.int64)
    for (t, l), dv in pat_map.items():
        pos = anch + dv[None, :]
        inside = ((pos >= 0) & (pos < n)).all(axis=1)
        exp += inside.astype(np.int64)
    ok &= have == exp
    ok &= anch[:, 0] != np.iinfo(np.int64).min
    g_ok = groups[ok]
    fresh = orbit_of[g_ok] < 0
    orbit_of[g_ok[fresh]] = oi
    anchor[g_ok[fresh]] = anch[ok][fresh]
    return ok


def _validate(
    name, G, M, c_all, t_all, l_all, valid, orbit_of, anchor, orbit_patterns,
    n, gmap, ept, order,
):
    """Sampled check that anchor arithmetic reproduces gmap exactly."""
    E, L = gmap.shape
    d = c_all.shape[2]
    e = np.arange(E)
    c_e, t_e = _cube_coords(e, n, d, ept, order)
    # group lookup keyed by (orbit, flattened anchor)
    flat_anchor = np.zeros(G, dtype=np.int64)
    for kk in range(d):
        flat_anchor = flat_anchor * (n + 3) + (anchor[:, kk] + 1)
    key = orbit_of * (n + 3) ** d + flat_anchor
    order = np.argsort(key)
    key_sorted = key[order]
    assert (np.diff(key_sorted) > 0).all(), f"{name}: duplicate (orbit, anchor)"
    rebuild = {}
    for oi, pat in enumerate(orbit_patterns):
        for dlt, t, l in pat:
            rebuild[(t, l)] = (oi, np.asarray(dlt))
    rng = np.random.default_rng(0)
    sample = rng.choice(E * L, size=min(4096, E * L), replace=False)
    for s in sample:
        ee, ll = int(s // L), int(s % L)
        oi, dlt = rebuild[(int(t_e[ee]), ll)]
        p = c_e[ee] - dlt
        fa = 0
        for kk in range(d):
            fa = fa * (n + 3) + (int(p[kk]) + 1)
        q = oi * (n + 3) ** d + fa
        pos = np.searchsorted(key_sorted, q)
        assert pos < G and key_sorted[pos] == q, (
            f"{name}: no group at orbit {oi} anchor {p}"
        )
        assert order[pos] == gmap[ee, ll], f"{name}: gmap mismatch at ({ee},{ll})"


# --------------------------------------------------------------------- #
# device combine
# --------------------------------------------------------------------- #
def _zero_shell(acc, p_lo, ob: Orbit):
    """Zero every position of the orbit's sums array whose anchor is a
    boundary group (outside the orbit's interior box): slice the interior
    block out and pad zeros back — two static ops, no masks in HBM."""
    if ob.int_lo is None:
        return jnp.zeros_like(acc)
    lo = np.array(ob.int_lo) - p_lo
    hi = np.array(ob.int_hi) + 1 - p_lo
    ext = np.array(ob.p_max) - np.array(ob.p_min) + 1
    if (lo == 0).all() and (hi == ext).all():
        return acc
    idx = tuple(slice(int(a), int(b)) for a, b in zip(lo, hi))
    pads = tuple(
        (int(a), int(e - b)) for a, b, e in zip(lo, hi, ext)
    ) + ((0, 0),)
    return jnp.pad(acc[idx], pads)


def combine_structured(
    x, sc: StructuredCombine, lay: dict, constrain: bool = False,
    merged: bool | None = None,
):
    """Interface combine via shifted slice-adds (see module docstring).

    x: [E, n_local] with E = ept * n^d in cube-major order. Returns the
    combined state in the same layout (identical values to
    combine_gather_rows up to summation order; tests assert 1e-12 in f64).

    Memory discipline (matters at 500M+ DOFs): no padded copy of the whole
    state — out-of-range shifts pad per-slice; and each simplex-type's
    interface tail is CONCATENATED wide along the last axis before the
    single stack over types, so XLA never tiles tensors with tiny trailing
    dims (a [n,n,n,L,15] stack pads ~3-10x on TPU tiles).

    ``merged`` selects the merged-trailing-dim variant (bitwise-identical
    output, tests/test_structured_merged.py): the per-class work tensors
    become [n]*(d-1) + [n*width] so narrow classes stop padding the minor
    tile dim (an edge [n,n,n,15] block pads 15->128 = 8.5x amplification;
    merged [n,n,n*15] pads 480->512 = 1.07x; corners 128x -> 4x). Default
    from env HZT_COMBINE_MERGED until TPU-timed.
    """
    if merged is None:
        merged = _MERGED
    if merged:
        return _combine_structured_merged(
            x, sc, lay, constrain, _PREPAD, _DIRECT_FACE
        )
    n, d, ept = sc.n, sc.d, sc.ept
    E, n_local = x.shape

    # never materialize the [n]*d + [ept, n_local] view of the full state
    # (XLA retiles it — TWO full-state copies in the OOM dump at 643M DOFs):
    # the rows of simplex type t are a stride-ept slice of the 2D array, so
    # each (type, column-block) piece is a small [n^d, width] strided slice
    # reshaped to the grid — ~40 MB at the 643M config, fused freely.
    tb_cache: dict = {}
    nd = n**sc.d

    def type_block(t, col, width):
        key = (t, col, width)
        if key not in tb_cache:
            if sc.order == "type":
                # contiguous rows — a free view
                blk = jax.lax.slice(x, (t * nd, col), ((t + 1) * nd, col + width))
            else:
                blk = jax.lax.slice(x, (t, col), (E, col + width), (ept, 1))
            tb_cache[key] = blk.reshape((n,) * d + (width,))
        return tb_cache[key]

    def shifted(t, col, width, lo, hi):
        """type_block[lo:hi per grid dim, clipped to [0, n]], zero-padded
        back to the requested extent."""
        lo = np.asarray(lo)
        hi = np.asarray(hi)
        lo_c = np.clip(lo, 0, n)
        hi_c = np.clip(hi, 0, n)
        idx = tuple(slice(int(a), int(b)) for a, b in zip(lo_c, hi_c))
        piece = type_block(t, col, width)[idx]
        pads = tuple(
            (int(lc - l), int(h - hc)) for l, lc, h, hc in zip(lo, lo_c, hi, hi_c)
        ) + ((0, 0),)
        if any(p != (0, 0) for p in pads):
            piece = jnp.pad(piece, pads)
        return piece

    # group sums per orbit, per class (optionally with the zero-Dirichlet
    # constraint folded in: combine(constrain(y)) == constrain(combine(y))
    # == zero boundary groups, since every copy of a boundary DOF is zeroed)
    class_sums = {}
    for name, (orbits, rebuild, offsets, width) in sc.classes.items():
        sums = []
        for ob in orbits:
            p_lo = np.array(ob.p_min)
            p_hi = np.array(ob.p_max) + 1
            acc = None
            for dlt, t, l in ob.pattern:
                piece = shifted(
                    t, offsets[l], width, p_lo + np.array(dlt), p_hi + np.array(dlt)
                )
                acc = piece if acc is None else acc + piece
            if constrain:
                acc = _zero_shell(acc, p_lo, ob)
            sums.append((p_lo, acc))
        class_sums[name] = sums

    # rebuild: for each simplex type, concatenate every class's cell blocks
    # wide (layout order: faces | edges | corners), then one stack over types
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
                p_lo, acc = class_sums[name][oi]
                lo = -np.array(dlt) - p_lo
                idx = tuple(slice(int(a), int(a) + n) for a in lo)
                cols.append(acc[idx])
        tail_t = jnp.concatenate(cols, axis=-1)  # [n]*d + [tail_width]
        tails.append(tail_t.reshape(n**d, -1))
    if sc.order == "type":
        # contiguous type blocks: plain row-concat, no interleaving stack
        # (the [n^d, ept, tail] stack pads ept 6->8 on TPU tiles — 1.7x at
        # the 643M-DOF config, and it was the peak allocation there)
        tail = jnp.concatenate(tails, axis=0)
    else:
        tail = jnp.stack(tails, axis=1).reshape(E, -1)

    if i0 == 0:
        return tail
    # dynamic_update_slice instead of concatenate([head, tail]): when x is
    # dead after the combine XLA updates in place — the explicit head copy
    # (3x ~0.9 GB live in the 495M-DOF OOM dump) disappears
    return jax.lax.dynamic_update_slice(x, tail, (0, i0))


def _zero_shell_merged(acc, p_lo, ob: Orbit, width: int):
    """_zero_shell for a merged-last-axis sums array: the interior cut on
    the last grid axis lands at multiples of ``width``."""
    if ob.int_lo is None:
        return jnp.zeros_like(acc)
    lo = np.array(ob.int_lo) - p_lo
    hi = np.array(ob.int_hi) + 1 - p_lo
    ext = np.array(ob.p_max) - np.array(ob.p_min) + 1
    if (lo == 0).all() and (hi == ext).all():
        return acc
    idx = tuple(slice(int(a), int(b)) for a, b in zip(lo[:-1], hi[:-1]))
    idx = idx + (slice(int(lo[-1] * width), int(hi[-1] * width)),)
    pads = tuple((int(a), int(e - b)) for a, b, e in zip(lo[:-1], hi[:-1], ext[:-1]))
    pads = pads + ((int(lo[-1] * width), int((ext[-1] - hi[-1]) * width)),)
    return jnp.pad(acc[idx], pads)


def _zero_shell_cell_merged(acc, dlt, ob: Orbit, n: int, width: int):
    """Zero-shell for a direct per-cell rebuilt block: the block's position
    c rebuilds the group at anchor c - dlt, so keep c in
    [int_lo + dlt, int_hi + dlt] (clipped to the domain)."""
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


def _combine_structured_merged(
    x, sc: StructuredCombine, lay: dict, constrain: bool,
    prepad: bool, direct_face: bool,
):
    """Merged-trailing-dim form of combine_structured: every work tensor is
    viewed [n]*(d-1) + [n*width] so the minor two tile dims are (n, n*width)
    instead of (n, width) — narrow classes (edge width 15, corner width 1)
    stop amplifying 8-128x against the (8, 128) f32 tile. Identical values
    (same pieces, same addition order — asserted bitwise in tests).

    ``prepad``: pad every type block by sc.pad on each grid axis once so
    all shifted reads are interior slices (trades pad ops for copies).
    ``direct_face``: rebuild valence-2 face cells straight from the inputs
    instead of materializing face orbit sums (halves face-class traffic:
    group sums for faces are consumed by exactly two cells).
    """
    n, d, ept = sc.n, sc.d, sc.ept
    E, n_local = x.shape
    nd = n**d
    tb_cache: dict = {}

    def type_block(t, col, width):
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
        pads = tuple(
            (int(lc - l), int(h - hc))
            for l, lc, h, hc in zip(lo[:-1], lo_c[:-1], hi[:-1], hi_c[:-1])
        )
        pads = pads + (
            (int((lo_c[-1] - lo[-1]) * width), int((hi[-1] - hi_c[-1]) * width)),
        )
        if any(p != (0, 0) for p in pads):
            piece = jnp.pad(piece, pads)
        return piece

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
                piece = shifted(
                    t, offsets[l], width, p_lo + np.array(dlt), p_hi + np.array(dlt)
                )
                acc = piece if acc is None else acc + piece
            if constrain:
                acc = _zero_shell_merged(acc, p_lo, ob, width)
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
                    # valence-2 orbits: each group sum feeds exactly two
                    # cells — rebuild both directly from the inputs
                    ob = orbits[oi]
                    acc = None
                    for dlt2, t2, l2 in ob.pattern:
                        s = np.array(dlt2) - np.array(dlt)
                        piece = shifted(t2, offsets[l2], width, s, s + n)
                        acc = piece if acc is None else acc + piece
                    if constrain:
                        acc = _zero_shell_cell_merged(acc, dlt, ob, n, width)
                    blk = acc
                else:
                    p_lo, acc = class_sums[name][oi]
                    lo = -np.array(dlt) - p_lo
                    idx = tuple(slice(int(a), int(a) + n) for a in lo[:-1])
                    idx = idx + (
                        slice(int(lo[-1] * width), int((lo[-1] + n) * width)),
                    )
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


# --------------------------------------------------------------------- #
# slab-sharded combine (shard_map, cube-major x-plane slabs)
# --------------------------------------------------------------------- #
def combine_structured_slab(
    x, sc: StructuredCombine, lay: dict, W: int, n_shards: int,
    axis_name: str, constrain: bool = False, merged: bool | None = None,
):
    """Interface combine for one shard of a cube-major state slab-sharded
    along grid axis 0 (x-planes of cubes).

    ``merged`` selects the merged-trailing-dim work-tensor layout (see
    combine_structured; bitwise-identical, defaults from HZT_COMBINE_MERGED).

    ``x``: the shard's local [B, n_local] block, B = W * n^{d-1} * ept, rows
    = cube-major order of the shard's W contiguous x-planes. The combine is
    the single-device shifted-slice-add algorithm run on a halo-extended
    slab: each shard ppermutes its ``pad`` edge planes of interface columns
    to both neighbors (the ONLY communication — O(surface) bytes over ICI),
    computes orbit group sums for every anchor its elements read, and
    rebuilds its own rows. Shards at the domain ends receive ppermute's
    zero fill, which is exactly the zero-padding the boundary groups'
    partial sums require. Anchors in the one-plane overlap are computed by
    both neighbors from identical inputs in identical order -> identical
    float values on every copy, the invariant iterative solvers need.
    (This is the cross-address-space form of broadcast_interfaces!,
    src/implicit_fine_grid.jl:209-328 — which the reference never needed:
    its threads share memory.)

    ``constrain=True`` folds the zero-Dirichlet constraint in: the axis-0
    interior-anchor test becomes a dynamic iota mask against the shard's
    global plane offset (axis_index * W); other axes stay static slices.
    """
    n, d, ept, pad = sc.n, sc.d, sc.ept, sc.pad
    assert sc.order == "cube", "slab sharding requires cube-major order"
    assert n % n_shards == 0 and W == n // n_shards and W >= pad
    n2 = n ** (d - 1)
    B, n_local = x.shape
    assert B == W * n2 * ept
    i0 = lay["iface_start"]
    tw = n_local - i0
    A = W + 2 * pad  # halo-extended plane count
    rpp = n2 * ept  # rows per plane

    tail = jax.lax.slice(x, (0, i0), (B, n_local))
    lo_edge = jax.lax.slice(tail, (0, 0), (pad * rpp, tw))
    hi_edge = jax.lax.slice(tail, (B - pad * rpp, 0), (B, tw))
    # left halo = left neighbor's highest planes; shard 0 receives zeros
    halo_lo = jax.lax.ppermute(
        hi_edge, axis_name, [(s, s + 1) for s in range(n_shards - 1)]
    )
    halo_hi = jax.lax.ppermute(
        lo_edge, axis_name, [(s + 1, s) for s in range(n_shards - 1)]
    )
    T = jnp.concatenate([halo_lo, tail, halo_hi], axis=0)  # [A*rpp, tw]

    if merged is None:
        merged = _MERGED
    grid = (A,) + (n,) * (d - 1)
    tb_cache: dict = {}

    def type_block(t, col, width):
        key = (t, col, width)
        if key not in tb_cache:
            Tv = T.reshape((A * n2, ept, tw))
            blk = jax.lax.slice(
                Tv, (0, t, col - i0), (A * n2, t + 1, col - i0 + width)
            )
            if merged:
                # last grid axis merged with the width axis (tile-friendly
                # minor dims, see combine_structured)
                tb_cache[key] = blk.reshape((A,) + (n,) * (d - 2) + (n * width,))
            else:
                tb_cache[key] = blk.reshape(grid + (width,))
        return tb_cache[key]

    def shifted(t, col, width, lo, hi):
        """Ext-coordinate slice; axis 0 always in range (halo covers it),
        axes 1+ clipped to [0, n] and zero-padded back."""
        lo = np.asarray(lo)
        hi = np.asarray(hi)
        assert 0 <= lo[0] and hi[0] <= A
        lo_c = lo.copy()
        hi_c = hi.copy()
        lo_c[1:] = np.clip(lo[1:], 0, n)
        hi_c[1:] = np.clip(hi[1:], 0, n)
        if merged:
            idx = tuple(slice(int(a), int(b)) for a, b in zip(lo_c[:-1], hi_c[:-1]))
            idx = idx + (slice(int(lo_c[-1] * width), int(hi_c[-1] * width)),)
            piece = type_block(t, col, width)[idx]
            pads = tuple(
                (int(lc - l), int(h - hc))
                for l, lc, h, hc in zip(lo[:-1], lo_c[:-1], hi[:-1], hi_c[:-1])
            ) + (
                (int((lo_c[-1] - lo[-1]) * width), int((hi[-1] - hi_c[-1]) * width)),
            )
        else:
            idx = tuple(slice(int(a), int(b)) for a, b in zip(lo_c, hi_c))
            piece = type_block(t, col, width)[idx]
            pads = tuple(
                (int(lc - l), int(h - hc)) for l, lc, h, hc in zip(lo, lo_c, hi, hi_c)
            ) + ((0, 0),)
        if any(p != (0, 0) for p in pads):
            piece = jnp.pad(piece, pads)
        return piece

    # global plane coordinate of ext anchor index 0 (traced, per shard)
    gstart = jax.lax.axis_index(axis_name) * W - pad
    Wp = W + pad  # anchors computed: ext [0, W + pad)

    def zero_shell_slab(acc, p_lo, ob: Orbit, width: int):
        if ob.int_lo is None:
            return jnp.zeros_like(acc)
        # axes 1+: static interior slice + zero pad
        lo = np.array(ob.int_lo[1:]) - p_lo[1:]
        hi = np.array(ob.int_hi[1:]) + 1 - p_lo[1:]
        ext = np.array(ob.p_max[1:]) - np.array(ob.p_min[1:]) + 1
        if not ((lo == 0).all() and (hi == ext).all()):
            if merged:
                idx = (slice(None),) + tuple(
                    slice(int(a), int(b)) for a, b in zip(lo[:-1], hi[:-1])
                ) + (slice(int(lo[-1] * width), int(hi[-1] * width)),)
                pads = ((0, 0),) + tuple(
                    (int(a), int(e - b)) for a, b, e in zip(lo[:-1], hi[:-1], ext[:-1])
                ) + ((int(lo[-1] * width), int((ext[-1] - hi[-1]) * width)),)
            else:
                idx = (slice(None),) + tuple(
                    slice(int(a), int(b)) for a, b in zip(lo, hi)
                )
                pads = ((0, 0),) + tuple(
                    (int(a), int(e - b)) for a, b, e in zip(lo, hi, ext)
                ) + ((0, 0),)
            acc = jnp.pad(acc[idx], pads)
        # axis 0: dynamic mask against the global anchor coordinate
        g = gstart + jnp.arange(acc.shape[0])
        m = (g >= ob.int_lo[0]) & (g <= ob.int_hi[0])
        return acc * m.astype(acc.dtype).reshape((-1,) + (1,) * (acc.ndim - 1))

    class_sums = {}
    for name, (orbits, rebuild, offsets, width) in sc.classes.items():
        sums = []
        for ob in orbits:
            # ext coords: axis 0 anchors [0, Wp); axes 1+ the orbit's range
            p_lo = np.array((0,) + ob.p_min[1:])
            p_hi = np.array((Wp,) + tuple(v + 1 for v in ob.p_max[1:]))
            acc = None
            for dlt, t, l in ob.pattern:
                piece = shifted(
                    t, offsets[l], width,
                    p_lo + np.array(dlt), p_hi + np.array(dlt),
                )
                acc = piece if acc is None else acc + piece
            if constrain:
                acc = zero_shell_slab(acc, p_lo, ob, width)
            sums.append((np.array((0,) + ob.p_min[1:]), acc))
        class_sums[name] = sums

    tails = []
    for t in range(ept):
        cols = []
        for name in ("face", "edge", "corner"):
            if name not in sc.classes:
                continue
            orbits, rebuild, offsets, width = sc.classes[name]
            for l in range(len(offsets)):
                oi, dlt = rebuild[(t, l)]
                p_lo, acc = class_sums[name][oi]
                # own planes sit at ext [pad, W + pad); anchor = plane - dlt
                lo0 = pad - dlt[0]
                if merged:
                    idx = (slice(lo0, lo0 + W),) + tuple(
                        slice(int(-dlt[ax] - p_lo[ax]), int(-dlt[ax] - p_lo[ax]) + n)
                        for ax in range(1, d - 1)
                    )
                    last = int(-dlt[d - 1] - p_lo[d - 1])
                    idx = idx + (slice(last * width, (last + n) * width),)
                    cols.append(
                        acc[idx].reshape((W,) + (n,) * (d - 1) + (width,))
                    )
                else:
                    idx = (slice(lo0, lo0 + W),) + tuple(
                        slice(int(-dlt[ax] - p_lo[ax]), int(-dlt[ax] - p_lo[ax]) + n)
                        for ax in range(1, d)
                    )
                    cols.append(acc[idx])
        tail_t = jnp.concatenate(cols, axis=-1)  # [W, n, .., tw]
        tails.append(tail_t.reshape(W * n2, tw))
    tail_out = jnp.stack(tails, axis=1).reshape(B, tw)
    if i0 == 0:
        return tail_out
    return jax.lax.dynamic_update_slice(x, tail_out, (0, i0))


def constrain_structured_slab(
    x, sc: StructuredCombine, lay: dict, W: int, axis_name: str
):
    """Zero-Dirichlet constraint for one cube-major slab shard: static
    shell zeroing per (type, cell) in axes 1+, a dynamic iota mask against
    the shard's global plane coordinate in axis 0. No halo needed (pure
    masking) and no resident [B, n_local] mask."""
    n, d, ept, pad = sc.n, sc.d, sc.ept, sc.pad
    assert sc.order == "cube"
    n2 = n ** (d - 1)
    B, n_local = x.shape
    i0 = lay["iface_start"]
    tw = n_local - i0
    x0 = jax.lax.axis_index(axis_name) * W
    xg = x0 + jnp.arange(W)  # global plane coordinate of local planes

    def type_block(t, col, width):
        xv = x.reshape((W * n2, ept, n_local))
        blk = jax.lax.slice(xv, (0, t, col), (W * n2, t + 1, col + width))
        return blk.reshape((W,) + (n,) * (d - 1) + (width,))

    tails = []
    for t in range(ept):
        cols = []
        for name in ("face", "edge", "corner"):
            if name not in sc.classes:
                continue
            orbits, rebuild, offsets, width = sc.classes[name]
            for l in range(len(offsets)):
                oi, dlt = rebuild[(t, l)]
                ob = orbits[oi]
                blk = type_block(t, offsets[l], width)
                if ob.int_lo is None:
                    cols.append(jnp.zeros_like(blk))
                    continue
                # axes 1+: keep anchors (c - dlt) inside the interior box
                lo = np.maximum(
                    np.array(ob.int_lo[1:]) + np.array(dlt[1:]), 0
                )
                hi = np.minimum(
                    np.array(ob.int_hi[1:]) + 1 + np.array(dlt[1:]), n
                )
                if (lo >= hi).any():
                    cols.append(jnp.zeros_like(blk))
                    continue
                if not ((lo == 0).all() and (hi == n).all()):
                    idx = (slice(None),) + tuple(
                        slice(int(a), int(b)) for a, b in zip(lo, hi)
                    )
                    pads = ((0, 0),) + tuple(
                        (int(a), int(n - b)) for a, b in zip(lo, hi)
                    ) + ((0, 0),)
                    blk = jnp.pad(blk[idx], pads)
                # axis 0: dynamic global test on the anchor plane
                g = xg - int(dlt[0])
                m = (g >= ob.int_lo[0]) & (g <= ob.int_hi[0])
                blk = blk * m.astype(blk.dtype).reshape(
                    (-1,) + (1,) * (blk.ndim - 1)
                )
                cols.append(blk)
        tail_t = jnp.concatenate(cols, axis=-1)
        tails.append(tail_t.reshape(W * n2, tw))
    tail_out = jnp.stack(tails, axis=1).reshape(B, tw)
    if i0 == 0:
        return tail_out
    return jax.lax.dynamic_update_slice(x, tail_out, (0, i0))


def constrain_structured(x, sc: StructuredCombine, lay: dict):
    """Zero-Dirichlet constraint without a resident [E, n_local] mask.

    The boundary slots of cell (t, l) are exactly the elements whose cell's
    group anchor (c - delta) falls outside the orbit's interior box, so the
    constraint on each per-type cell block is keep-inner-box + zero-pad —
    static slices, like the combine. Element-interior (head) columns carry
    no boundary DOFs (asserted at build). Matches apply_mask(x, bmask) for
    full-box meshes (reference: apply_constraint!,
    src/implicit_fine_grid.jl:94-139).
    """
    n, d, ept = sc.n, sc.d, sc.ept
    E, n_local = x.shape
    nd = n**d

    def type_block(t, col, width):
        if sc.order == "type":
            blk = jax.lax.slice(x, (t * nd, col), ((t + 1) * nd, col + width))
        else:
            blk = jax.lax.slice(x, (t, col), (E, col + width), (ept, 1))
        return blk.reshape((n,) * d + (width,))

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
                ob = orbits[oi]
                blk = type_block(t, offsets[l], width)
                if ob.int_lo is None:
                    cols.append(jnp.zeros_like(blk))
                    continue
                lo = np.maximum(np.array(ob.int_lo) + np.array(dlt), 0)
                hi = np.minimum(np.array(ob.int_hi) + 1 + np.array(dlt), n)
                if (lo == 0).all() and (hi == n).all():
                    cols.append(blk)
                    continue
                if (lo >= hi).any():
                    cols.append(jnp.zeros_like(blk))
                    continue
                idx = tuple(slice(int(a), int(b)) for a, b in zip(lo, hi))
                pads = tuple(
                    (int(a), int(n - b)) for a, b in zip(lo, hi)
                ) + ((0, 0),)
                cols.append(jnp.pad(blk[idx], pads))
        tail_t = jnp.concatenate(cols, axis=-1)
        tails.append(tail_t.reshape(nd, -1))
    if sc.order == "type":
        tail = jnp.concatenate(tails, axis=0)
    else:
        tail = jnp.stack(tails, axis=1).reshape(E, -1)
    if i0 == 0:
        return tail
    return jax.lax.dynamic_update_slice(x, tail, (0, i0))
