"""The gather-derived cross-shard tables (parallel/sharding.py::
build_sharded_tables) partition the duplicated interface DOFs identically
to the per-DOF slot expansion (CombineTable) — the independent oracle the
plan can still build with slot_tables=True. The production sharded solver
no longer needs the O(volume) slot tables; this pins that the O(surface)
derivation is exactly equivalent."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy; excluded from the smoke lane (pytest -m "not slow")

import numpy as np

from homogenization_jl_tpu.mesh.grid import hypercube
from homogenization_jl_tpu.ops.plan import build_grid_plan
from homogenization_jl_tpu.parallel import sharding as sd


def _partition_from_slots(plan, level, n_shards, E_pad):
    """Cross-group partition {frozenset of (shard, local flat slot)} read
    straight off the per-DOF slot tables."""
    t = plan.levels[level].combine
    n_local = plan.n_local(level)
    B = E_pad // n_shards
    slot_shard = t.slot_elem.astype(np.int64) // B
    G = t.n_groups
    min_s = np.full(G, n_shards, dtype=np.int64)
    max_s = np.full(G, -1, dtype=np.int64)
    np.minimum.at(min_s, t.slot_group, slot_shard)
    np.maximum.at(max_s, t.slot_group, slot_shard)
    cross = min_s != max_s
    flat = (t.slot_elem.astype(np.int64) - slot_shard * B) * n_local + t.slot_node
    parts: dict = {}
    for g, s, f in zip(t.slot_group, slot_shard, flat):
        if cross[g]:
            parts.setdefault(int(g), set()).add((int(s), int(f)))
    return set(frozenset(v) for v in parts.values())


def _partition_from_tables(tabs, n_shards):
    parts: dict = {}
    for s in range(n_shards):
        g = np.asarray(tabs.cross_gather[s])
        grp = np.asarray(tabs.cross_group[s])
        valid = grp < tabs.n_cross_groups - 1
        for f, gg in zip(g[valid], grp[valid]):
            parts.setdefault(int(gg), set()).add((s, int(f)))
    return set(frozenset(v) for v in parts.values())


@pytest.mark.parametrize("dim,n,levels,S", [(2, 4, 3, 4), (3, 4, 3, 8), (3, 6, 2, 4)])
def test_cross_tables_match_slot_expansion(dim, n, levels, S):
    base = hypercube(dim, n)
    plan = build_grid_plan(base, levels, slot_tables=True)
    E_pad = ((base.nelements + S - 1) // S) * S
    for k in range(levels):
        po = _partition_from_slots(plan, k, S, E_pad)
        pn = _partition_from_tables(sd.build_sharded_tables(plan, k, S, E_pad), S)
        assert po == pn, (k, len(po), len(pn))
