"""Deterministic random walks (queries.part_random_walks): planted-graph
equality vs a sequential hop-by-hop replay of the md5 next-step rule."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from biomedical_ner_ray import queries as Q
from biomedical_ner_ray.kernels.hashing import stable_u64_md5


def _write_lineitem(tmp_path, edges):
    rows = {"l_orderkey": [], "l_partkey": []}
    for ok, (u, v) in enumerate(edges):
        rows["l_orderkey"] += [ok, ok]
        rows["l_partkey"] += [u, v]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(rows["l_orderkey"], pa.int64()),
                "l_partkey": pa.array(rows["l_partkey"], pa.int64()),
            }
        ),
        os.path.join(tmp_path, "lineitem.parquet"),
    )
    return str(tmp_path)


def _brute_walks(edges, seed_mod, steps):
    """Sequential reference: identical seed gate and next-step rule."""
    nbrs: dict[int, list[int]] = {}
    for u, v in edges:
        nbrs.setdefault(u, []).append(v)
        nbrs.setdefault(v, []).append(u)
    for n in nbrs:
        nbrs[n] = sorted(nbrs[n])
    seeds = sorted(
        n
        for n in nbrs
        if stable_u64_md5(f"rw:{n}".encode("utf-8")) % seed_mod == 0
    )
    rows = []
    for w in seeds:
        c = w
        rows.append((w, 0, c))
        for s in range(steps):
            idx = stable_u64_md5(f"rw:{w}:{s}:{c}".encode("utf-8")) % len(nbrs[c])
            c = nbrs[c][idx]
            rows.append((w, s + 1, c))
    return (
        pd.DataFrame(rows, columns=["walk_id", "step", "node"])
        .sort_values(["walk_id", "step"], ignore_index=True)
        .astype({"walk_id": "int64", "step": "int64", "node": "int64"})
    )


def test_random_walks_planted_exact(ray_session, tmp_path, monkeypatch):
    """Skewed planted graph (hub + ring + tail): every hop must equal the
    sequential replay, all walks have exactly RW_STEPS + 1 positions
    (no dead ends in an undirected graph), every hop is a real edge."""
    hub = [(100, i) for i in range(6)]
    ring = [(i, (i + 1) % 6) for i in range(6)]
    tail = [(5, 200), (200, 201)]
    edges = hub + ring + tail
    sf = _write_lineitem(tmp_path, edges)
    monkeypatch.setattr(Q, "TRI_SAMPLE_MOD", 1)
    monkeypatch.setattr(Q, "RW_SEED_MOD", 2)
    exp = _brute_walks(edges, 2, Q.RW_STEPS)
    assert len(exp)  # the gate seeded something
    out = Q.part_random_walks(sf)
    pd.testing.assert_frame_equal(out, exp)
    eset = {frozenset(e) for e in edges}
    for w, g in out.groupby("walk_id"):
        assert len(g) == Q.RW_STEPS + 1
        ns = g.sort_values("step")["node"].tolist()
        assert ns[0] == w
        for a, b in zip(ns, ns[1:]):
            assert frozenset((a, b)) in eset


def test_random_walks_cache_reuse(ray_session, tmp_path, monkeypatch):
    """Second invocation reuses the ranked-adjacency cache (manifest
    complete, no rebuild) and reproduces identical walks."""
    from biomedical_ner_ray.state import manifest as mf

    edges = [(1, 2), (2, 3), (3, 1), (3, 4)]
    sf = _write_lineitem(tmp_path, edges)
    monkeypatch.setattr(Q, "TRI_SAMPLE_MOD", 1)
    monkeypatch.setattr(Q, "RW_SEED_MOD", 1)
    first = Q.part_random_walks(sf)
    adj_dir = Q._adjacency_rank_cache(sf)
    mtimes = {
        f: os.path.getmtime(os.path.join(root, f))
        for root, _, fs in os.walk(adj_dir)
        for f in fs
    }
    second = Q.part_random_walks(sf)
    pd.testing.assert_frame_equal(first, second)
    after = {
        f: os.path.getmtime(os.path.join(root, f))
        for root, _, fs in os.walk(adj_dir)
        for f in fs
    }
    assert mtimes == after  # cache untouched on the second run
