"""Multi-source BFS levels (queries.part_bfs_levels) and the
role-transition matrix over transcripts (queries.kg_role_transitions)."""

import glob
import os

import numpy as np
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


def _brute_bfs(edges, seed_mod, rounds):
    """Reference multi-source BFS with the same md5 seed gate, capped at
    ``rounds`` hops; returns {node: level}."""
    nbrs: dict[int, set[int]] = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    seeds = sorted(
        n
        for n in nbrs
        if stable_u64_md5(f"bfs:{n}".encode("utf-8")) % seed_mod == 0
    )
    levels = {n: 0 for n in seeds}
    frontier = seeds
    for r in range(1, rounds + 1):
        nxt = sorted(
            {o for n in frontier for o in nbrs[n] if o not in levels}
        )
        for n in nxt:
            levels[n] = r
        frontier = nxt
        if not frontier:
            break
    return levels


def test_bfs_planted_exact(ray_session, tmp_path, monkeypatch):
    """Path graph + a detached far component: level == hop distance from
    the md5-gated seed set, nodes beyond BFS_ROUNDS hops (or in a
    seedless component) are absent. seed_mod=2 makes the gate
    non-trivial on both sides (brute force replays the same md5)."""
    path = [(i, i + 1) for i in range(12)]
    island = [(100, 101), (101, 102)]
    edges = path + island
    sf = _write_lineitem(tmp_path, edges)
    monkeypatch.setattr(Q, "TRI_SAMPLE_MOD", 1)
    monkeypatch.setattr(Q, "BFS_SEED_MOD", 2)
    expected = _brute_bfs(edges, 2, Q.BFS_ROUNDS)
    out = Q.part_bfs_levels(sf)
    got = dict(zip(out["part_id"].tolist(), out["level"].tolist()))
    assert got == expected
    assert any(v > 0 for v in got.values())  # the gate left work to do


def test_bfs_seedless_graph_empty(ray_session, tmp_path, monkeypatch):
    """A seed gate nothing passes yields the typed empty frame."""
    sf = _write_lineitem(tmp_path, [(1, 2), (2, 3)])
    monkeypatch.setattr(Q, "TRI_SAMPLE_MOD", 1)
    # 2^64-scale mod: no node's md5 hits residue 0 in practice; verify
    # via the brute replay so the test cannot silently pass the wrong way
    monkeypatch.setattr(Q, "BFS_SEED_MOD", 2**63)
    assert _brute_bfs([(1, 2), (2, 3)], 2**63, Q.BFS_ROUNDS) == {}
    out = Q.part_bfs_levels(sf)
    assert len(out) == 0
    assert list(out.columns) == ["part_id", "level"]


def test_bfs_levels_sf001(ray_session):
    """Real-fixture equality vs the brute-force replay over the SAME
    md5-sparsified edge set (coin replayed with stable_u64_md5)."""
    li = pq.read_table(
        "/root/testdata/sf0.001/lineitem.parquet",
        columns=["l_orderkey", "l_partkey"],
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
    expected = _brute_bfs(sampled, Q.BFS_SEED_MOD, Q.BFS_ROUNDS)
    out = Q.part_bfs_levels("/root/testdata/sf0.001")
    got = dict(zip(out["part_id"].tolist(), out["level"].tolist()))
    assert got == expected
    assert 0 in set(got.values())  # the fixture gate seeds something


def test_role_transitions_sf001(ray_session, tiny_fixture):
    """Exchange-paired transition counts == a pandas lag() replay over
    the fixture transcripts (conversation boundaries respected)."""
    files = sorted(glob.glob(os.path.join(tiny_fixture["transcripts"], "*.parquet")))
    t = pd.concat(
        [pq.read_table(f, columns=["conv_id", "turn_idx", "role"]).to_pandas() for f in files],
        ignore_index=True,
    ).sort_values(["conv_id", "turn_idx"])
    t["prev_role"] = t.groupby("conv_id")["role"].shift(1)
    exp = (
        t.dropna(subset=["prev_role"])
        .groupby(["prev_role", "role"], as_index=False)
        .size()
        .rename(columns={"size": "n_transitions"})
    )
    out = (
        Q.kg_role_transitions("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values(["prev_role", "role"])
        .reset_index(drop=True)
    )
    exp = exp.sort_values(["prev_role", "role"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out.astype({"n_transitions": "int64"}), exp.astype({"n_transitions": "int64"})
    )
    # first turn of every conversation is excluded by construction
    assert out["n_transitions"].sum() == len(t) - t["conv_id"].nunique()


def test_response_latency_sf001(ray_session, tiny_fixture):
    """Exchange-paired latency aggregates == a pandas lag() replay."""
    files = sorted(glob.glob(os.path.join(tiny_fixture["transcripts"], "*.parquet")))
    t = pd.concat(
        [
            pq.read_table(f, columns=["conv_id", "turn_idx", "role", "ts"]).to_pandas()
            for f in files
        ],
        ignore_index=True,
    ).sort_values(["conv_id", "turn_idx"])
    t["ts_us"] = t["ts"].values.astype("datetime64[us]").astype("int64")
    g = t.groupby("conv_id")
    t["prev_role"] = g["role"].shift(1)
    t["gap"] = t["ts_us"] - g["ts_us"].shift(1)
    m = t[(t["prev_role"] == "user") & (t["role"] == "assistant")]
    exp = (
        m.groupby("conv_id")["gap"]
        .agg(n_responses="size", sum_gap_us="sum", max_gap_us="max")
        .reset_index()
        .astype({"n_responses": "int64", "sum_gap_us": "int64", "max_gap_us": "int64"})
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    out = (
        Q.kg_response_latency("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp)


def test_topic_boundaries_sf001(ray_session, tiny_fixture):
    """Exchange-paired Jaccard == a per-conversation brute-force replay."""
    from biomedical_ner_ray.kernels.tokenize import TOKEN_RE

    files = sorted(glob.glob(os.path.join(tiny_fixture["transcripts"], "*.parquet")))
    t = pd.concat(
        [
            pq.read_table(f, columns=["conv_id", "turn_idx", "text"]).to_pandas()
            for f in files
        ],
        ignore_index=True,
    ).sort_values(["conv_id", "turn_idx"])
    rows = []
    for conv, g in t.groupby("conv_id", sort=True):
        toks = [
            {w.lower() for w in TOKEN_RE.findall(x)} for x in g["text"].tolist()
        ]
        idxs = g["turn_idx"].tolist()
        for j in range(1, len(idxs)):
            a, b = toks[j - 1], toks[j]
            inter = len(a & b)
            union = len(a | b)
            jacc = (1_000_000 * inter) // union if union else 0
            rows.append(
                (conv, idxs[j], len(a), len(b), inter, jacc,
                 int(jacc < Q.TOPIC_JACC_THRESH_MICRO))
            )
    exp = pd.DataFrame(
        rows,
        columns=["conv_id", "turn_idx", "n_prev", "n_cur", "n_inter",
                 "jacc_micro", "is_boundary"],
    ).astype({"turn_idx": "int32"})
    out = (
        Q.kg_topic_boundaries("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = exp.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp)
    # a mixed outcome is what makes the threshold load-bearing
    assert 0 < out["is_boundary"].sum() < len(out)


def _brute_label_prop(edges, rounds):
    """Reference synchronous label propagation: mode of neighbor labels,
    ties to the smallest label; returns {node: community}."""
    nbrs: dict[int, set[int]] = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    lbl = {n: n for n in nbrs}
    for _ in range(rounds):
        new = {}
        for n in nbrs:
            counts: dict[int, int] = {}
            for o in nbrs[n]:
                counts[lbl[o]] = counts.get(lbl[o], 0) + 1
            new[n] = min(
                counts, key=lambda c: (-counts[c], c)
            )
        lbl = new
    return lbl


def test_label_prop_planted_cliques(ray_session, tmp_path, monkeypatch):
    """Two 4-cliques joined by one bridge edge: each clique converges to
    its minimum node id and the bridge does not bleed communities."""
    c1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    c2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = c1 + c2 + [(3, 10)]
    sf = _write_lineitem(tmp_path, edges)
    monkeypatch.setattr(Q, "TRI_SAMPLE_MOD", 1)
    expected = _brute_label_prop(edges, Q.LP_ROUNDS)
    out = Q.part_label_prop(sf)
    got = dict(zip(out["part_id"].tolist(), out["community"].tolist()))
    assert got == expected
    assert all(got[n] == 0 for n in range(4))
    assert all(got[n] == 10 for n in range(10, 14))


def test_label_prop_sf001(ray_session):
    """Real-fixture equality vs the brute-force replay over the SAME
    md5-sparsified edge set."""
    li = pq.read_table(
        "/root/testdata/sf0.001/lineitem.parquet",
        columns=["l_orderkey", "l_partkey"],
    ).to_pandas()
    d = li.drop_duplicates()
    m = d.merge(d, on="l_orderkey")
    m = m[m["l_partkey_x"] < m["l_partkey_y"]]
    edges = sorted(
        {
            (int(u), int(v))
            for u, v in zip(m["l_partkey_x"], m["l_partkey_y"])
            if stable_u64_md5(f"tri:{u}:{v}".encode("utf-8")) % Q.TRI_SAMPLE_MOD == 0
        }
    )
    expected = _brute_label_prop(edges, Q.LP_ROUNDS)
    out = Q.part_label_prop("/root/testdata/sf0.001")
    got = dict(zip(out["part_id"].tolist(), out["community"].tolist()))
    assert got == expected
    # communities actually merged somewhere (the operator did work)
    assert len(set(got.values())) < len(got)


def test_context_window_sf001(ray_session, tiny_fixture):
    """Two-phase suffix sum == a pandas reversed-cumsum replay; the keep
    flag must be mixed (budget load-bearing) and bucket offsets must be
    exercised (conversations longer than one bucket exist)."""
    from biomedical_ner_ray.kernels.tokenize import TOKEN_RE

    files = sorted(glob.glob(os.path.join(tiny_fixture["transcripts"], "*.parquet")))
    t = pd.concat(
        [
            pq.read_table(f, columns=["conv_id", "turn_idx", "text"]).to_pandas()
            for f in files
        ],
        ignore_index=True,
    )
    t["n_tokens"] = t["text"].map(lambda x: len(TOKEN_RE.findall(x))).astype("int64")
    t = t.sort_values(["conv_id", "turn_idx"], ascending=[True, False])
    t["cum_from_end"] = t.groupby("conv_id")["n_tokens"].cumsum()
    t["kept"] = (t["cum_from_end"] <= Q.CTX_TOKEN_BUDGET).astype("int64")
    exp = (
        t[["conv_id", "turn_idx", "n_tokens", "cum_from_end", "kept"]]
        .astype({"turn_idx": "int32"})
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    out = (
        Q.kg_context_window("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp)
    assert 0 < out["kept"].sum() < len(out)
    assert (exp.groupby("conv_id")["turn_idx"].max() >= Q.CTX_BUCKET).any()


def test_burst_days_sf001(ray_session):
    """Exchange-gated burst days == a pandas replay over real events;
    the gate must be selective (some but not all user-days flagged)."""
    ev = pq.read_table(
        "/root/testdata/sf0.001/events.parquet", columns=["user_id", "ts"]
    ).to_pandas()
    ev["day"] = (
        ev["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        // 86_400_000_000
    )
    d = ev.groupby(["user_id", "day"]).size().rename("n_events").reset_index()
    u = d.groupby("user_id")["n_events"].agg(user_total="sum", n_days="size")
    m = d.merge(u, on="user_id")
    exp = (
        m[m["n_events"] * m["n_days"] > Q.BURST_FACTOR * m["user_total"]]
        .astype("int64")
        .sort_values(["user_id", "day"])
        .reset_index(drop=True)
    )
    out = (
        Q.events_burst_days("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values(["user_id", "day"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp)
    assert 0 < len(out) < len(d)


def test_kg_pagerank_sf001(ray_session):
    """Engine KG PageRank == a sequential integer replay over the same
    symmetrized canonical edge set; ranks must differentiate nodes."""
    from biomedical_ner_ray import queries as Q2
    from biomedical_ner_ray.stages.pagerank import BASE, DAMP_DEN, DAMP_NUM, SCALE

    edges = Q2._kg_edges_frame("/root/testdata/sf0.001")
    und = {
        (a, b)
        for a, b in zip(edges["subj_cui"], edges["obj_cui"])
    } | {(b, a) for a, b in zip(edges["subj_cui"], edges["obj_cui"])}
    nbrs: dict[str, list[str]] = {}
    for s, d in sorted(und):
        nbrs.setdefault(s, []).append(d)
    r = {n: SCALE for n in nbrs}
    for _ in range(Q2.PAGERANK_ITERS):
        s: dict[str, int] = {}
        for src, ds in nbrs.items():
            c = r.get(src, SCALE) // len(ds)
            for d in ds:
                s[d] = s.get(d, 0) + c
        r = {n: BASE + (DAMP_NUM * v) // DAMP_DEN for n, v in s.items()}
    out = Q2.kg_pagerank("/root/testdata/sf0.001")
    got = dict(zip(out["node_label"], out["pr_score"]))
    assert got == r
    assert len(set(got.values())) > 1


def test_kg_edge_lift_sf001(ray_session):
    """Lift values == a sequential integer replay; lift must separate
    edges (not a constant) and weigh down high-marginal endpoints."""
    from biomedical_ner_ray import queries as Q2

    edges = Q2._kg_edges_frame("/root/testdata/sf0.001")
    W = int(edges["weight"].sum())
    marg: dict[str, int] = {}
    for s, o, w in zip(edges["subj_cui"], edges["obj_cui"], edges["weight"]):
        marg[s] = marg.get(s, 0) + int(w)
        marg[o] = marg.get(o, 0) + int(w)
    out = Q2.kg_edge_lift("/root/testdata/sf0.001")
    assert len(out) == len(edges)
    for s, p, o, w, lf in zip(
        out["subj_cui"], out["pred"], out["obj_cui"], out["weight"], out["lift_micro"]
    ):
        assert lf == (1_000_000 * int(w) * W) // (marg[s] * marg[o])
    assert out["lift_micro"].nunique() > 1


def test_kg_snapshot_edges_sf001(ray_session):
    """Snapshot at the time mid-point == a replay via the provenance
    table (edges whose supporting triples have ts <= cutoff), with
    strictly less total weight than the full graph."""
    from biomedical_ner_ray import queries as Q2

    full = Q2.kg_edges("/root/testdata/sf0.001").to_pandas()
    snap = Q2.kg_snapshot_edges("/root/testdata/sf0.001").to_pandas()
    key = ["subj_cui", "pred", "obj_cui"]
    m = snap.merge(full, on=key, suffixes=("_s", "_f"))
    assert len(m) == len(snap)  # snapshot edges are a subset
    assert (m["weight_s"] <= m["weight_f"]).all()
    assert snap["weight"].sum() < full["weight"].sum()

    # independent replay from provenance-style join on raw parquet
    import glob as g2

    paths = Q2._fixture("/root/testdata/sf0.001")
    files = sorted(g2.glob(os.path.join(paths["transcripts"], "*.parquet")))
    t = pd.concat(
        [pq.read_table(f, columns=["conv_id", "turn_idx", "ts"]).to_pandas() for f in files],
        ignore_index=True,
    )
    us = t["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
    cutoff = (int(us.min()) + int(us.max())) // 2
    kept = set(
        zip(t["conv_id"][us <= cutoff].astype(str), t["turn_idx"][us <= cutoff].astype(int))
    )
    # triples from the shared annotation cache, canonical-remapped
    from biomedical_ner_ray.queries import _annotations_cache, canonical_components
    from biomedical_ner_ray.stages.explode import triples_stage
    from biomedical_ner_ray.state.manifest import list_parquet_files
    import ray.data as rd

    ann_dir, rows = _annotations_cache("/root/testdata/sf0.001")
    comp = canonical_components(rows)
    tri = triples_stage(
        rd.read_parquet(list_parquet_files(ann_dir), columns=["conv_id", "turn_idx", "triples"])
    ).to_pandas()
    tri["s"] = tri["subj_cui"].map(comp)
    tri["o"] = tri["obj_cui"].map(comp)
    tri = tri[tri["s"] != tri["o"]]
    tri = tri[
        [
            (str(c), int(i)) in kept
            for c, i in zip(tri["conv_id"], tri["turn_idx"])
        ]
    ]
    exp = (
        tri.groupby(["s", "pred", "o"])
        .agg(weight=("conv_id", "size"), n_convs=("conv_id", "nunique"))
        .reset_index()
        .rename(columns={"s": "subj_cui", "o": "obj_cui"})
        .astype({"weight": "int64", "n_convs": "int64"})
        .sort_values(key)
        .reset_index(drop=True)
    )
    got = snap.sort_values(key).reset_index(drop=True)[exp.columns.tolist()]
    pd.testing.assert_frame_equal(got, exp)


def test_kg_edge_churn_sf001(ray_session):
    """Churn == full minus snapshot, only positive deltas, new edges
    flagged; totals reconcile exactly."""
    from biomedical_ner_ray import queries as Q2

    full = Q2.kg_edges("/root/testdata/sf0.001").to_pandas()
    snap = Q2.kg_snapshot_edges("/root/testdata/sf0.001").to_pandas()
    churn = Q2.kg_edge_churn("/root/testdata/sf0.001").to_pandas()
    key = ["subj_cui", "pred", "obj_cui"]
    m = full.merge(
        snap[key + ["weight"]].rename(columns={"weight": "ws"}), on=key, how="left"
    )
    m["ws"] = m["ws"].fillna(0).astype("int64")
    exp = m[m["weight"] - m["ws"] > 0]
    assert len(churn) == len(exp)
    assert (churn["weight_delta"] > 0).all()
    # conservation: snapshot total + churn total == full total
    assert snap["weight"].sum() + churn["weight_delta"].sum() == full["weight"].sum()
    new_edges = set(map(tuple, churn.loc[churn["is_new"] == 1, key].to_numpy()))
    snap_edges = set(map(tuple, snap[key].to_numpy()))
    assert not (new_edges & snap_edges)


def test_kg_turn_dedup_sf001(ray_session, tiny_fixture):
    """Template groups == a pandas replay; within-conversation repeats
    alone must NOT qualify (the distinct-conversation gate)."""
    files = sorted(glob.glob(os.path.join(tiny_fixture["transcripts"], "*.parquet")))
    t = pd.concat(
        [pq.read_table(f, columns=["conv_id", "text"]).to_pandas() for f in files],
        ignore_index=True,
    )
    g = t.groupby("text").agg(
        n_turns=("conv_id", "size"), n_convs=("conv_id", "nunique")
    )
    exp = (
        g[g["n_convs"] >= 2]
        .reset_index()
        .astype({"n_turns": "int64", "n_convs": "int64"})
        .sort_values("text")
        .reset_index(drop=True)
    )
    out = (
        Q.kg_turn_dedup("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("text")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp)
    assert len(out) > 0
    # gate is load-bearing: some text repeats only within one conversation
    only_within = g[(g["n_turns"] >= 2) & (g["n_convs"] == 1)]
    assert len(only_within) > 0 or len(g[g["n_convs"] >= 2]) < len(g)


def test_kg_decay_edges_sequential_replay(ray_session, tiny_fixture):
    """Decayed weights == a sequential integer replay over the oracle
    triple stream; raw weights == kg_edge_provenance's; decay is
    load-bearing (some edge has decayed_micro < 1e6 · weight)."""
    sf = "/root/testdata/sf0.001"
    out = Q.kg_decay_edges(sf).to_pandas()
    prov = Q.kg_edge_provenance(sf).to_pandas()

    k = ["subj_cui", "pred", "obj_cui"]
    m = prov[k + ["weight"]].merge(
        out, on=k, how="outer", indicator=True, suffixes=("_p", "_d")
    )
    assert (m["_merge"] == "both").all()
    assert (m["weight_p"] == m["weight_d"]).all()

    # sequential decay replay from the provenance pipeline's own inputs:
    # rebuild per-occurrence (edge, ts) rows with the shared kernels
    files = sorted(glob.glob(os.path.join(tiny_fixture["transcripts"], "*.parquet")))
    ts = pd.concat(
        [
            pq.read_table(f, columns=["conv_id", "turn_idx", "ts"]).to_pandas()
            for f in files
        ],
        ignore_index=True,
    )
    us = ts["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
    mn, mx = int(us.min()), int(us.max())
    span = mx - mn
    ts = ts.assign(ts_us=us, conv_id=ts["conv_id"].astype(str))

    ann_dir, rows = Q._annotations_cache(sf)
    from biomedical_ner_ray.oracle import canonical_components
    from biomedical_ner_ray.state.manifest import list_parquet_files
    from biomedical_ner_ray.stages.explode import triples_stage

    import ray.data as rd

    comp = canonical_components(rows)
    ann = rd.read_parquet(
        list_parquet_files(ann_dir), columns=["conv_id", "turn_idx", "triples"]
    )
    tri = triples_stage(ann).to_pandas()
    tri = tri.assign(
        subj_cui=tri["subj_cui"].map(comp),
        obj_cui=tri["obj_cui"].map(comp),
        conv_id=tri["conv_id"].astype(str),
        turn_idx=tri["turn_idx"].astype("int64"),
    )
    tri = tri[tri["subj_cui"] != tri["obj_cui"]]
    j = tri.merge(
        ts[["conv_id", "turn_idx", "ts_us"]], on=["conv_id", "turn_idx"], how="inner"
    )
    if span > 0:
        kk = (Q.KG_DECAY_HALVES * (mx - j["ts_us"].to_numpy())) // span
    else:
        kk = np.zeros(len(j), dtype="int64")
    kk = np.minimum(kk, Q.KG_DECAY_MAX_SHIFT)
    j["dec"] = np.right_shift(np.int64(1_000_000), kk)
    exp = (
        j.groupby(["subj_cui", "pred", "obj_cui"])
        .agg(weight=("dec", "size"), decayed_micro=("dec", "sum"))
        .reset_index()
        .astype({"weight": "int64", "decayed_micro": "int64"})
    )
    me = exp.merge(out, on=k, suffixes=("_e", "_g"))
    assert len(me) == len(exp) == len(out)
    assert (me["weight_e"] == me["weight_g"]).all()
    assert (me["decayed_micro_e"] == me["decayed_micro_g"]).all()
    # decay is load-bearing
    assert (out["decayed_micro"] < 1_000_000 * out["weight"]).any()
