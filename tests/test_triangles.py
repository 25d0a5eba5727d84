"""Degree-oriented distributed triangle counting (queries.
part_triangle_counts): planted-graph exactness vs brute force, and the
DOULION sampling coin's determinism."""

import itertools
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from biomedical_ner_ray import queries as Q
from biomedical_ner_ray.kernels.hashing import stable_u64_md5


def _write_lineitem(tmp_path, edges):
    """Encode an explicit edge list as a lineitem table: one synthetic
    order per edge containing exactly its two parts."""
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


def _brute_counts(edges):
    es = {tuple(sorted(e)) for e in edges}
    nodes = sorted({n for e in es for n in e})
    counts = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_planted_graph_exact(ray_session, tmp_path, monkeypatch):
    """Sampling off (p=1): the degree-oriented wedge closure must count
    every triangle of a skewed planted graph exactly — includes a hub
    node, a clique, and triangle-free appendages."""
    monkeypatch.setattr(Q, "TRI_SAMPLE_MOD", 1)
    clique = list(itertools.combinations([10, 11, 12, 13, 14], 2))
    hub = [(1, x) for x in range(20, 30)] + [(20, 21), (22, 23)]
    chain = [(40, 41), (41, 42), (42, 43)]
    edges = clique + hub + chain + [(1, 10), (1, 11)]
    sf = _write_lineitem(tmp_path, edges)
    got = (
        Q.part_triangle_counts(sf)
        .to_pandas()
        .sort_values("part_id", ignore_index=True)
    )
    exp = _brute_counts(edges)
    assert dict(zip(got.part_id, got.n_triangles)) == exp
    # clique of 5: each node in C(4,2)=6 triangles
    assert exp[12] == 6


def test_sampling_coin_deterministic_and_monotone(ray_session, tmp_path, monkeypatch):
    """The md5 edge coin keeps exactly the edges whose canonical-key
    hash lands in the residue class — the sampled result is the full
    pipeline run on that exact subgraph."""
    edges = list(itertools.combinations(range(12), 2))  # K12
    sf = _write_lineitem(tmp_path, edges)
    monkeypatch.setattr(Q, "TRI_SAMPLE_MOD", 2)
    got = Q.part_triangle_counts(sf).to_pandas()
    kept = [
        (u, v)
        for u, v in edges
        if stable_u64_md5(f"tri:{u}:{v}".encode()) % 2 == 0
    ]
    exp = _brute_counts(kept)
    assert dict(zip(got.part_id, got.n_triangles)) == exp
    assert 0 < len(kept) < len(edges)  # the coin actually split the set


def test_frequent_pairs_brute_force(ray_session, tmp_path, monkeypatch):
    """part_frequent_pairs == exact per-pair distinct-order counts with
    the support threshold, on a planted basket table."""
    import itertools

    monkeypatch.setattr(Q, "FREQ_PAIR_MIN_SUPPORT", 2)
    rows = {"l_orderkey": [], "l_partkey": []}
    baskets = [
        [1, 2, 3], [1, 2], [1, 2, 4], [3, 4], [3, 4], [5],
        [2, 2, 1],  # duplicate part in one order counts once
    ]
    for ok, parts in enumerate(baskets):
        for p in parts:
            rows["l_orderkey"].append(ok)
            rows["l_partkey"].append(p)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(rows["l_orderkey"], pa.int64()),
                "l_partkey": pa.array(rows["l_partkey"], pa.int64()),
            }
        ),
        os.path.join(tmp_path, "lineitem.parquet"),
    )
    got = Q.part_frequent_pairs(str(tmp_path)).to_pandas()
    exp = {}
    for parts in baskets:
        for a, b in itertools.combinations(sorted(set(parts)), 2):
            exp[(a, b)] = exp.get((a, b), 0) + 1
    exp = {k: v for k, v in exp.items() if v >= 2}
    assert {(a, b): s for a, b, s in zip(got.part_a, got.part_b, got.support)} == exp
