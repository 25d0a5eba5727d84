"""Weighted multi-source SSSP (queries.part_sssp_weighted) and the
per-user exponentially-decayed purchase score (queries.events_decay_score)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from biomedical_ner_ray import queries as Q
from biomedical_ner_ray.kernels.hashing import stable_u64_md5

SF = "/root/testdata/sf0.001"


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


def _edge_weight(u, v, w_mod):
    return 1 + int(
        (stable_u64_md5(f"tri:{u}:{v}".encode("utf-8")) >> 32) % w_mod
    )


def _brute_sssp(edges, seed_mod, rounds, w_mod):
    """Reference synchronous Bellman-Ford with the same md5 seed gate
    and coin-derived weights, capped at ``rounds`` relaxation rounds."""
    adj: dict[int, list[tuple[int, int]]] = {}
    for u, v in edges:
        w = _edge_weight(u, v, w_mod)
        adj.setdefault(u, []).append((v, w))
        adj.setdefault(v, []).append((u, w))
    dist = {
        n: 0
        for n in adj
        if stable_u64_md5(f"sssp:{n}".encode("utf-8")) % seed_mod == 0
    }
    for _ in range(rounds):
        nxt = dict(dist)
        for n, d in dist.items():
            for o, w in adj[n]:
                if d + w < nxt.get(o, 1 << 62):
                    nxt[o] = d + w
        if nxt == dist:
            break
        dist = nxt
    return dist


def test_sssp_planted_exact(ray_session, tmp_path, monkeypatch):
    """Path graph + detached island: distances equal the brute
    synchronous Bellman-Ford replay (same md5 gates and coin weights);
    a seedless component is absent."""
    path = [(i, i + 1) for i in range(10)]
    island = [(200, 201), (201, 202)]
    edges = path + island
    sf = _write_lineitem(tmp_path, edges)
    monkeypatch.setattr(Q, "TRI_SAMPLE_MOD", 1)
    monkeypatch.setattr(Q, "SSSP_SEED_MOD", 2)
    expected = _brute_sssp(edges, 2, Q.SSSP_ROUNDS, Q.SSSP_W_MOD)
    out = Q.part_sssp_weighted(sf)
    got = dict(zip(out["part_id"].tolist(), out["dist"].tolist()))
    assert got == expected
    assert any(v > 0 for v in got.values())  # relaxation actually ran
    # weighted distances differ from hop counts somewhere (weights load-bearing)
    assert any(v > 1 for v in got.values())


def test_sssp_seedless_empty(ray_session, tmp_path, monkeypatch):
    sf = _write_lineitem(tmp_path, [(1, 2), (2, 3)])
    monkeypatch.setattr(Q, "TRI_SAMPLE_MOD", 1)
    monkeypatch.setattr(Q, "SSSP_SEED_MOD", 2**63)
    assert _brute_sssp([(1, 2), (2, 3)], 2**63, Q.SSSP_ROUNDS, Q.SSSP_W_MOD) == {}
    out = Q.part_sssp_weighted(sf)
    assert len(out) == 0
    assert list(out.columns) == ["part_id", "dist"]


def test_sssp_sf001(ray_session):
    """Real-fixture equality vs the brute replay over the SAME
    md5-sparsified edge set and coin-derived weights."""
    li = pq.read_table(
        os.path.join(SF, "lineitem.parquet"), columns=["l_orderkey", "l_partkey"]
    ).to_pandas()
    d = li.drop_duplicates()
    m = d.merge(d, on="l_orderkey")
    m = m[m["l_partkey_x"] < m["l_partkey_y"]]
    edges = sorted(
        {(int(a), int(b)) for a, b in zip(m["l_partkey_x"], m["l_partkey_y"])}
    )
    sampled = [
        (u, v)
        for u, v in edges
        if stable_u64_md5(f"tri:{u}:{v}".encode("utf-8")) % Q.TRI_SAMPLE_MOD == 0
    ]
    expected = _brute_sssp(sampled, Q.SSSP_SEED_MOD, Q.SSSP_ROUNDS, Q.SSSP_W_MOD)
    out = Q.part_sssp_weighted(SF)
    got = dict(zip(out["part_id"].tolist(), out["dist"].tolist()))
    assert got == expected
    assert 0 in set(got.values())  # the fixture gate seeds something


def test_decay_score_sf001(ray_session):
    """Partial-top-K exchange == a pandas window replay (rank over
    (ts desc, event_id desc), weight 2^(K-1-rank))."""
    ev = pq.read_table(os.path.join(SF, "events.parquet")).to_pandas()
    p = ev[ev["event_type"] == "purchase"].copy()
    p["cents"] = (p["value"] * 100).round().astype("int64")
    p["ts_us"] = p["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
    p = p.sort_values(
        ["user_id", "ts_us", "event_id"], ascending=[True, False, False]
    )
    p["rank"] = p.groupby("user_id").cumcount()
    top = p[p["rank"] < Q.DECAY_K].copy()
    top["wcents"] = top["cents"] * np.left_shift(
        np.int64(1), (Q.DECAY_K - 1 - top["rank"].to_numpy()).astype("int64")
    )
    exp = (
        top.groupby("user_id", as_index=False)
        .agg(n_recent=("wcents", "size"), decay_score=("wcents", "sum"))
        .astype({"user_id": "int64", "n_recent": "int64", "decay_score": "int64"})
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    out = (
        Q.events_decay_score(SF).to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp)
    # the window is load-bearing: nobody exceeds K, someone hits it
    assert out["n_recent"].max() <= Q.DECAY_K
    per_user = p.groupby("user_id").size()
    if (per_user > Q.DECAY_K).any():
        assert out["n_recent"].max() == Q.DECAY_K


def test_decay_score_blocking_invariance(ray_session, tmp_path):
    """A hot user split across many blocks merges to the same top-K as
    a single-block run (the partial-top-k merge is exact)."""
    n = 64
    t = pa.table(
        {
            "event_id": pa.array(list(range(n)), pa.int64()),
            "ts": pa.array(
                (
                    np.datetime64("2024-01-01", "us")
                    + np.arange(n) * np.timedelta64(60_000_000, "us")
                ),
                pa.timestamp("us"),
            ),
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array(["purchase"] * n, pa.string()),
            "value": pa.array([float(i) for i in range(n)], pa.float64()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = Q.events_decay_score(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert int(out["n_recent"][0]) == Q.DECAY_K
    # most recent K events are 56..63, weights 128..1 descending by recency
    cents = [i * 100 for i in range(n)]
    exp = sum(cents[n - 1 - k] * (1 << (Q.DECAY_K - 1 - k)) for k in range(Q.DECAY_K))
    assert int(out["decay_score"][0]) == exp
