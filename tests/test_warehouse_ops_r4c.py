"""Round-4 batch-3 operators: Q21/Q15/Q6 warehouse shapes, RAG
overlapping chunker, winsorized per-source lengths, KG reciprocity.
Each checked against an independent pandas/numpy brute-force replay;
DuckDB value oracles run separately via scripts/contract_check.py."""

import re

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from biomedical_ner_ray import queries as Q

SF = "/root/testdata/sf0.001"


def _frame(x):
    return x if isinstance(x, pd.DataFrame) else x.to_pandas()


def test_supplier_last_to_ship_bruteforce(ray_session):
    got = _frame(Q.supplier_last_to_ship(SF)).reset_index(drop=True)
    lines = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    sup = pq.read_table(f"{SF}/supplier.parquet").to_pandas()
    ps = (
        lines.assign(ms=lines["l_shipdate"].astype("datetime64[us]"))
        .groupby(["l_orderkey", "l_suppkey"], as_index=False)["ms"]
        .max()
    )
    blocked = []
    for okey, g in ps.groupby("l_orderkey"):
        if len(g) < 2:
            continue
        mx = g["ms"].max()
        at = g[g["ms"] == mx]
        if len(at) == 1:
            blocked.append(int(at["l_suppkey"].iloc[0]))
    cnt = pd.Series(blocked).value_counts()
    names = dict(zip(sup["s_suppkey"], sup["s_name"]))
    exp = (
        pd.DataFrame(
            {"s_name": [names[k] for k in cnt.index], "n_blocked": cnt.to_numpy()}
        )
        .sort_values(["n_blocked", "s_name"], ascending=[False, True], kind="mergesort")
        .head(Q.Q21_TOPK)
        .reset_index(drop=True)
        .astype({"n_blocked": "int64"})
    )
    assert len(exp) > 0
    pd.testing.assert_frame_equal(got, exp)


def test_supplier_quarter_topk_bruteforce(ray_session):
    got = _frame(Q.supplier_quarter_topk(SF))
    lines = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    sup = pq.read_table(f"{SF}/supplier.parquet").to_pandas()
    lo, hi = pd.Timestamp(Q.Q15_START), pd.Timestamp(Q.Q15_END)
    d = lines[(lines["l_shipdate"] >= lo) & (lines["l_shipdate"] < hi)].copy()
    d["rev"] = (d["l_extendedprice"] * 100).round().astype("int64") * (
        100 - (d["l_discount"] * 100).round().astype("int64")
    )
    tot = d.groupby("l_suppkey", as_index=False)["rev"].sum()
    best = tot[tot["rev"] == tot["rev"].max()]
    names = dict(zip(sup["s_suppkey"], sup["s_name"]))
    exp = (
        pd.DataFrame(
            {
                "s_suppkey": best["l_suppkey"].astype("int64").to_numpy(),
                "s_name": [names[k] for k in best["l_suppkey"]],
                "total_revenue": best["rev"].astype("int64").to_numpy(),
            }
        )
        .sort_values("s_suppkey", ignore_index=True)
    )
    assert len(exp) >= 1
    pd.testing.assert_frame_equal(got, exp)


def test_lineitem_discount_revenue_bruteforce(ray_session):
    got = _frame(Q.lineitem_discount_revenue(SF))
    lines = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    lo, hi = pd.Timestamp(Q.Q6_YEAR_START), pd.Timestamp(Q.Q6_YEAR_END)
    disc = (lines["l_discount"] * 100).round().astype("int64")
    keep = (
        (lines["l_shipdate"] >= lo)
        & (lines["l_shipdate"] < hi)
        & (disc >= Q.Q6_DISC_LO)
        & (disc <= Q.Q6_DISC_HI)
        & (lines["l_quantity"] < Q.Q6_QTY_LT)
    )
    d = lines[keep]
    cents = (d["l_extendedprice"] * 100).round().astype("int64")
    dp = (d["l_discount"] * 100).round().astype("int64")
    assert int(got["n_lines"].iloc[0]) == int(keep.sum()) > 0
    assert int(got["revenue_cents_pct"].iloc[0]) == int((cents * dp).sum())


def test_doc_chunk_overlap_covers_and_overlaps(ray_session):
    got = _frame(Q.doc_chunk_overlap(SF))
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    tok = re.compile(r"[0-9A-Za-z_]+")
    n_by_doc = {
        int(r.doc_id): len(tok.findall(r.text)) for r in docs.itertuples()
    }
    for doc_id, g in got.groupby("doc_id"):
        n = n_by_doc[int(doc_id)]
        g = g.sort_values("chunk_idx").reset_index(drop=True)
        # contiguous indices, full coverage, fixed stride, W-cap
        assert (g["chunk_idx"].to_numpy() == np.arange(len(g))).all()
        assert g["start_tok"].iloc[0] == 0
        assert g["end_tok"].iloc[-1] == n
        assert (g["start_tok"].to_numpy() == np.arange(len(g)) * Q.CHUNK_S).all()
        assert (g["n_tokens"] <= Q.CHUNK_W).all() and (g["n_tokens"] >= 1).all()
        if len(g) > 1:
            # neighbors overlap by W - S tokens
            assert (
                g["end_tok"].to_numpy()[:-1] - g["start_tok"].to_numpy()[1:]
                >= 1
            ).all()
    # every non-empty doc is chunked; at least one doc has 2+ chunks
    assert set(got["doc_id"]) == {d for d, n in n_by_doc.items() if n > 0}
    assert (got.groupby("doc_id")["chunk_idx"].max() > 0).any()


def test_doc_winsorized_length_bruteforce(ray_session):
    got = _frame(Q.doc_winsorized_length(SF)).sort_values(
        "source", ignore_index=True
    )
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    rows = []
    for src, g in docs.groupby("source"):
        v = np.sort(g["n_chars"].to_numpy())
        n = len(v)
        lo = int(v[(Q.WINSOR_LO_PCT * n + 99) // 100 - 1])
        hi = int(v[(Q.WINSOR_HI_PCT * n + 99) // 100 - 1])
        csum = int(np.clip(v, lo, hi).sum())
        rows.append((src, n, lo, hi, 1_000_000 * csum // n))
    exp = pd.DataFrame(
        rows, columns=["source", "n_docs", "lo_clip", "hi_clip", "winsor_mean_micro"]
    ).sort_values("source", ignore_index=True).astype(
        {"n_docs": "int64", "lo_clip": "int64", "hi_clip": "int64",
         "winsor_mean_micro": "int64"}
    )
    # winsorization must actually clip on at least one source
    assert (exp["lo_clip"] > docs.groupby("source")["n_chars"].min().min()).any()
    pd.testing.assert_frame_equal(got, exp)


def test_kg_reciprocal_edges_bruteforce(ray_session):
    got = _frame(Q.kg_reciprocal_edges(SF))
    edges = _frame(Q.kg_edges(SF))
    fwd = set(zip(edges["subj_cui"], edges["pred"], edges["obj_cui"]))
    recs = {}
    tot = {}
    for s, p, o in fwd:
        tot[p] = tot.get(p, 0) + 1
        if (o, p, s) in fwd:
            recs[p] = recs.get(p, 0) + 1
    exp = (
        pd.DataFrame(
            {
                "pred": sorted(tot),
                "n_edges": [tot[p] for p in sorted(tot)],
                "n_reciprocal": [recs.get(p, 0) for p in sorted(tot)],
            }
        )
        .astype({"n_edges": "int64", "n_reciprocal": "int64"})
    )
    exp["recip_permille"] = (1000 * exp["n_reciprocal"] // exp["n_edges"]).astype(
        "int64"
    )
    # non-vacuous: some but not all edges are reciprocal
    assert exp["n_reciprocal"].sum() > 0
    assert exp["n_reciprocal"].sum() < exp["n_edges"].sum()
    pd.testing.assert_frame_equal(got, exp)


def test_customer_rfm_segments_bruteforce(ray_session):
    import math

    got = _frame(Q.customer_rfm_segments(SF))
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    pc = orders.assign(
        rec=orders["o_orderdate"].astype("datetime64[us]").astype("int64"),
        mon=(orders["o_totalprice"] * 100).round().astype("int64"),
    ).groupby("o_custkey").agg(
        rec=("rec", "max"), freq=("o_orderkey", "size"), mon=("mon", "sum")
    )
    n = len(pc)

    def cuts(v):
        s = np.sort(v)
        return [int(s[math.ceil(n * q) - 1]) for q in Q.RFM_QS]

    score = {}
    for m in ("rec", "freq", "mon"):
        t = cuts(pc[m].to_numpy())
        score[m] = 1 + sum((pc[m].to_numpy()[:, None] > np.array(t)[None, :]).T)
    exp = (
        pd.DataFrame(
            {"r_score": score["rec"], "f_score": score["freq"], "m_score": score["mon"]}
        )
        .groupby(["r_score", "f_score", "m_score"], as_index=False)
        .size()
        .rename(columns={"size": "n_customers"})
        .astype({"r_score": "int64", "f_score": "int64", "m_score": "int64",
                 "n_customers": "int64"})
        .sort_values(["r_score", "f_score", "m_score"], ignore_index=True)
    )
    # non-vacuous: multiple cells populated across score levels
    assert exp["r_score"].nunique() == 4 and exp["m_score"].nunique() == 4
    assert int(exp["n_customers"].sum()) == n
    pd.testing.assert_frame_equal(got, exp)


def test_events_stickiness_bruteforce(ray_session):
    got = _frame(Q.events_stickiness(SF))
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    day_us = 86_400_000_000
    ud = pd.DataFrame(
        {
            "u": ev["user_id"].astype("int64"),
            "d": ev["ts"].astype("datetime64[us]").astype("int64") // day_us,
        }
    ).drop_duplicates()
    days = sorted(ud["d"].unique())
    rows = []
    for d in days:
        dau = ud.loc[ud["d"] == d, "u"].nunique()
        wau = ud.loc[
            (ud["d"] >= d - (Q.STICKY_WIN_DAYS - 1)) & (ud["d"] <= d), "u"
        ].nunique()
        rows.append((np.int64(d * day_us).astype("datetime64[us]"), dau, wau,
                     1000 * dau // wau))
    exp = pd.DataFrame(
        rows, columns=["day", "dau", "wau", "stickiness_permille"]
    ).astype({"day": "datetime64[us]", "dau": "int64", "wau": "int64",
              "stickiness_permille": "int64"})
    # non-vacuous: the window actually widens the distinct set somewhere
    assert (exp["wau"] > exp["dau"]).any()
    pd.testing.assert_frame_equal(got, exp)
