"""Integer-exact BM25 retrieval (queries.doc_bm25_topk): planted-corpus
equality vs an independent sequential replay of the fixed-point
arithmetic, with score ties planted across blocks."""

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from biomedical_ner_ray import queries as Q


def _brute(docs: dict[int, str]):
    """Sequential reference: same milli/micro integer formulas, computed
    per doc per query with plain Python ints."""
    tok = {d: re.findall(r"\w+", t.lower()) for d, t in docs.items()}
    n = len(docs)
    tot = sum(len(ws) for ws in tok.values())
    avgdl_milli = (1000 * tot) // max(n, 1)
    terms = {t for ts in Q.BM25_QUERIES.values() for t in ts}
    df = {t: sum(1 for ws in tok.values() if t in ws) for t in terms}
    idf = {t: (1_000_000 * (n - df[t] + 1)) // (df[t] + 1) for t in terms}
    k1, b = Q.BM25_K1_MILLI, Q.BM25_B_MILLI
    rows = []
    for qid, qterms in Q.BM25_QUERIES.items():
        scored = []
        for d, ws in tok.items():
            dl = len(ws)
            ratio_milli = (dl * 1_000_000) // max(avgdl_milli, 1)
            norm_milli = ((1000 - b) * 1000 + b * ratio_milli) // 1000
            s = 0
            for t in qterms:
                tf = ws.count(t)
                if tf:
                    s += (idf[t] * (tf * (k1 + 1000))) // (
                        tf * 1000 + (k1 * norm_milli) // 1000
                    )
            if s > 0:
                scored.append((d, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        for r, (d, s) in enumerate(scored[: Q.BM25_TOPK], start=1):
            rows.append((qid, d, r, s))
    return pd.DataFrame(
        rows, columns=["query_id", "doc_id", "rank", "score_micro"]
    )


def test_bm25_planted_exact(ray_session, tmp_path):
    """Planted corpus with exact-tie duplicates (identical text, distinct
    doc_id) written as MULTIPLE parquet files so the tie crosses block
    boundaries — the (score desc, doc_id asc) tie-break must hold
    through the per-block partial top-k merge."""
    docs = {
        1: "hash join batch hash join",
        2: "hash join batch hash join",  # exact tie with doc 1, other block
        3: "window agg stream window",
        4: "scan filter vector scan filter",
        5: "customer order line table customer order",
        6: "hash hash hash hash hash hash hash hash",  # tf saturation
        7: "join",
        8: "unrelated words only here",
        9: "table line order customer table",
        10: "window stream agg scan filter",
        11: "batch batch join hash window",
        12: "a b c",
    }
    items = sorted(docs.items())
    half = len(items) // 2
    for i, chunk in enumerate((items[:half], items[half:])):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([d for d, _ in chunk], pa.int64()),
                    "text": pa.array([t for _, t in chunk], pa.string()),
                }
            ),
            os.path.join(tmp_path, f"documents_{i}.parquet"),
        )
    # _tbl reads <sf_dir>/documents.parquet — make it a directory
    ddir = os.path.join(tmp_path, "documents.parquet")
    os.mkdir(ddir)
    for f in os.listdir(tmp_path):
        if f.startswith("documents_"):
            os.rename(os.path.join(tmp_path, f), os.path.join(ddir, f))

    out = (
        Q.doc_bm25_topk(str(tmp_path))
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    exp = (
        _brute(docs).sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp)
    # the planted tie: docs 1 and 2 score identically on hash_join and
    # doc 1 must rank immediately before doc 2
    hj = out[out["query_id"] == "hash_join"].reset_index(drop=True)
    r1 = hj.loc[hj["doc_id"] == 1].index[0]
    r2 = hj.loc[hj["doc_id"] == 2].index[0]
    assert hj.loc[r1, "score_micro"] == hj.loc[r2, "score_micro"]
    assert r2 == r1 + 1


def test_bm25_fixture_invariants(ray_session):
    """sf0.001 testdata: every query returns <= K rows, ranks are dense
    from 1, scores strictly positive and non-increasing within a query."""
    out = Q.doc_bm25_topk("/root/testdata/sf0.001")
    assert set(out["query_id"]) == set(Q.BM25_QUERIES)
    for qid, g in out.groupby("query_id"):
        g = g.sort_values("rank")
        assert len(g) <= Q.BM25_TOPK
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert (g["score_micro"] > 0).all()
        assert (np.diff(g["score_micro"].to_numpy()) <= 0).all()


def _brute_rrf(docs: dict[int, str]):
    """Sequential RRF reference: fuse the BM25 replay with an
    unnormalized TF-IDF ranking via 1e6 // (60 + rank)."""
    tok = {d: re.findall(r"\w+", t.lower()) for d, t in docs.items()}
    n = len(docs)
    terms = {t for ts in Q.BM25_QUERIES.values() for t in ts}
    df = {t: sum(1 for ws in tok.values() if t in ws) for t in terms}
    idf = {t: (1_000_000 * (n - df[t] + 1)) // (df[t] + 1) for t in terms}
    bm25 = _brute(docs)
    rows = []
    for qid, qterms in Q.BM25_QUERIES.items():
        scored = []
        for d, ws in tok.items():
            s = sum(ws.count(t) * idf[t] for t in qterms)
            if s > 0:
                scored.append((d, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        tfidf_rank = {
            d: r for r, (d, _) in enumerate(scored[: Q.BM25_TOPK], start=1)
        }
        bq = bm25[bm25["query_id"] == qid]
        bm25_rank = dict(zip(bq["doc_id"], bq["rank"]))
        fused = []
        for d in set(tfidf_rank) | set(bm25_rank):
            rb, rt = bm25_rank.get(d, 0), tfidf_rank.get(d, 0)
            rrf = (1_000_000 // (Q.RRF_K_CONST + rb) if rb else 0) + (
                1_000_000 // (Q.RRF_K_CONST + rt) if rt else 0
            )
            fused.append((d, rrf, rb, rt))
        fused.sort(key=lambda x: (-x[1], x[0]))
        for r, (d, rrf, rb, rt) in enumerate(fused[: Q.RRF_TOPK], start=1):
            rows.append((qid, d, r, rrf, rb, rt))
    return pd.DataFrame(
        rows,
        columns=["query_id", "doc_id", "rank", "rrf_micro",
                 "bm25_rank", "tfidf_rank"],
    )


def test_rrf_fusion_sf001(ray_session):
    """Real-corpus equality vs the sequential RRF replay, and the fusion
    must be load-bearing: somewhere the two systems rank differently."""
    docs = dict(
        zip(
            *(
                lambda t: (t["doc_id"].to_pylist(), t["text"].to_pylist())
            )(
                pq.read_table(
                    "/root/testdata/sf0.001/documents.parquet",
                    columns=["doc_id", "text"],
                )
            )
        )
    )
    exp = (
        _brute_rrf(docs)
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    out = (
        Q.doc_rrf_fusion("/root/testdata/sf0.001")
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp)
    both = out[(out["bm25_rank"] > 0) & (out["tfidf_rank"] > 0)]
    assert (both["bm25_rank"] != both["tfidf_rank"]).any()
    # at least one doc reached the fused list from a single system
    assert ((out["bm25_rank"] == 0) | (out["tfidf_rank"] == 0)).any()


def test_stratified_topn_planted(ray_session, tmp_path):
    """Planted two-block corpus with a small and a large stratum: exact
    per-stratum quota, md5-order picks, cross-block merge correctness vs
    a sequential replay."""
    from biomedical_ner_ray.kernels.hashing import stable_u64_md5

    rows = [(i, "big") for i in range(100)] + [(1000 + i, "tiny") for i in range(3)]
    half = len(rows) // 2
    ddir = os.path.join(tmp_path, "documents.parquet")
    os.mkdir(ddir)
    for i, chunk in enumerate((rows[:half], rows[half:])):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([d for d, _ in chunk], pa.int64()),
                    "source": pa.array([s for _, s in chunk], pa.string()),
                }
            ),
            os.path.join(ddir, f"part_{i}.parquet"),
        )
    out = Q.doc_stratified_topn(str(tmp_path))
    exp_rows = []
    for src_name in ("big", "tiny"):
        ids = [d for d, s in rows if s == src_name]
        ids.sort(key=lambda d: (stable_u64_md5(f"strat:{d}".encode("utf-8")), d))
        for r, d in enumerate(ids[: Q.STRAT_N_PER_SOURCE], start=1):
            exp_rows.append((src_name, d, r))
    exp = pd.DataFrame(exp_rows, columns=["source", "doc_id", "strat_rank"])
    pd.testing.assert_frame_equal(
        out.sort_values(["source", "strat_rank"]).reset_index(drop=True),
        exp.sort_values(["source", "strat_rank"]).reset_index(drop=True),
    )
    # quota binds on the big stratum, undershoots on the tiny one
    got = out.groupby("source").size()
    assert got["big"] == Q.STRAT_N_PER_SOURCE and got["tiny"] == 3


def test_source_drift_planted(ray_session, tmp_path):
    """A source with an alien vocabulary must out-drift sources that
    mirror the corpus mix; values equal a sequential integer replay."""
    rows = (
        [(i, "mixed", "alpha beta gamma delta") for i in range(10)]
        + [(100 + i, "mixedb", "alpha beta gamma delta") for i in range(10)]
        + [(200 + i, "alien", "zeta zeta eta theta iota") for i in range(5)]
    )
    ddir = os.path.join(tmp_path, "documents.parquet")
    os.mkdir(ddir)
    half = len(rows) // 2
    for i, chunk in enumerate((rows[:half], rows[half:])):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([d for d, _, _ in chunk], pa.int64()),
                    "source": pa.array([s for _, s, _ in chunk], pa.string()),
                    "text": pa.array([t for _, _, t in chunk], pa.string()),
                }
            ),
            os.path.join(ddir, f"part_{i}.parquet"),
        )
    out = Q.doc_source_drift(str(tmp_path)).set_index("source")

    # sequential replay
    from collections import Counter

    toks = [(s, w) for _, s, t in rows for w in re.findall(r"\w+", t.lower())]
    corpus = Counter(w for _, w in toks)
    top = sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[: Q.DRIFT_K]
    t_corpus = len(toks)
    for src_name in ("mixed", "mixedb", "alien"):
        stoks = [w for s, w in toks if s == src_name]
        t_s = len(stoks)
        o = Counter(stoks)
        drift = sum(
            abs((1_000_000 * o.get(w, 0)) // t_s - (1_000_000 * c) // t_corpus)
            for w, c in top
        )
        assert out.loc[src_name, "drift_micro"] == drift
        assert out.loc[src_name, "n_tokens"] == t_s
    assert out.loc["alien", "drift_micro"] > out.loc["mixed", "drift_micro"]


def test_source_drift_zero_token_source_excluded(ray_session, tmp_path):
    """A source whose documents contain no word tokens is absent from
    the drift report on BOTH engines (the oracle's token-stream inner
    join) — the confirmed round-3 review repro."""
    rows = (
        [(i, "real", "alpha beta gamma") for i in range(5)]
        + [(100, "punct", "!!! ... ???"), (101, "punct", "")]
    )
    ddir = os.path.join(tmp_path, "documents.parquet")
    os.mkdir(ddir)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d for d, _, _ in rows], pa.int64()),
                "source": pa.array([s for _, s, _ in rows], pa.string()),
                "text": pa.array([t for _, _, t in rows], pa.string()),
            }
        ),
        os.path.join(ddir, "a.parquet"),
    )
    out = Q.doc_source_drift(str(tmp_path))
    assert set(out["source"]) == {"real"}


def test_doc_profile_planted(ray_session, tmp_path):
    """Exact distinct counts survive the cross-block hash exchange:
    duplicates planted across two files must collapse, NULLs counted."""
    ddir = os.path.join(tmp_path, "documents.parquet")
    os.mkdir(ddir)
    a = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["x", "y", None], pa.string()),
            "lang": pa.array(["en", "en", "fr"], pa.string()),
            "source": pa.array(["s1", "s1", "s2"], pa.string()),
            "n_chars": pa.array([7, None, 1], pa.int64()),
        }
    )
    b = pa.table(
        {
            "doc_id": pa.array([4, 5], pa.int64()),
            "text": pa.array(["x", None], pa.string()),  # dup "x" + null
            "lang": pa.array(["de", "en"], pa.string()),
            "source": pa.array(["s2", "s3"], pa.string()),
            "n_chars": pa.array([7, 9], pa.int64()),
        }
    )
    pq.write_table(a, os.path.join(ddir, "a.parquet"))
    pq.write_table(b, os.path.join(ddir, "b.parquet"))
    out = Q.doc_profile(str(tmp_path)).set_index("col")
    assert (out["n_rows"] == 5).all()
    assert out.loc["text", "n_null"] == 2
    assert out.loc["text", "n_distinct"] == 2  # x, y — dup across blocks collapsed
    assert out.loc["doc_id", "n_distinct"] == 5
    assert out.loc["lang", "n_distinct"] == 3
    assert out.loc["source", "n_distinct"] == 3
    # 7 appears in BOTH files; file A holds the NULL, so pandas would
    # promote file A to float64 and hash '7.0' vs '7' (the confirmed
    # inflation bug) — arrow-native stringification must count {7,1,9}=3
    assert out.loc["n_chars", "n_distinct"] == 3
    assert out.loc["n_chars", "n_null"] == 1


def test_curation_pipeline_sf001(ray_session):
    """The composed gate→dedup→order pipeline == a sequential replay of
    the three verified stages; every stage must be load-bearing."""
    import math

    from biomedical_ner_ray.kernels.hashing import stable_u64_md5
    from biomedical_ner_ray.kernels.textstats import quality_features

    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    rows = list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    m = []
    for i, x in rows:
        f = quality_features(x)
        m.append((i, f["n_tokens"], int(math.floor(f["stopword_ratio"] * 1000)), x))

    def q_disc(vals, q):
        vals = sorted(vals)
        return vals[math.ceil(q * len(vals)) - 1]

    lo_tok = q_disc([r[1] for r in m], Q.QFILTER_Q)
    lo_swr = q_disc([r[2] for r in m], Q.QFILTER_Q)
    kept = [r for r in m if r[1] >= lo_tok and r[2] >= lo_swr]
    assert 0 < len(kept) < len(m)  # gate load-bearing

    best: dict[int, tuple] = {}
    for i, nt, _, x in kept:
        h = stable_u64_md5(x.encode("utf-8"))
        if h not in best or i < best[h][0]:
            best[h] = (i, nt)
    surv = sorted(best.values())
    # (no exact-text dups exist at sf0.001 — the dedup stage's removal
    # behavior is exercised by test_curation_dedup_planted below)

    def okey(i):
        h = stable_u64_md5(f"cur8:{Q.CURATE_SEED}:{i}".encode("utf-8"))
        return (h >> 63, h % (1 << 63), i)

    ordered = sorted(surv, key=lambda r: okey(r[0]))[: Q.CURATE_HEAD]
    exp = pd.DataFrame(
        {
            "order_idx": pd.Series(range(len(ordered)), dtype="int64"),
            "doc_id": pd.Series([r[0] for r in ordered], dtype="int64"),
            "n_tokens": pd.Series([r[1] for r in ordered], dtype="int64"),
        }
    )
    out = Q.doc_curation_pipeline("/root/testdata/sf0.001").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp)
    assert len(out) == min(Q.CURATE_HEAD, len(surv))  # order head load-bearing


def test_curation_dedup_planted(ray_session, tmp_path):
    """Planted duplicate texts across blocks: the pipeline's dedup stage
    must keep exactly the min doc_id per identical text among gate
    survivors."""
    base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    rows = [(i, base + f"tail{i % 3}") for i in range(12)]  # 3 texts x 4 copies
    ddir = os.path.join(tmp_path, "documents.parquet")
    os.mkdir(ddir)
    half = len(rows) // 2
    for j, chunk in enumerate((rows[:half], rows[half:])):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([d for d, _ in chunk], pa.int64()),
                    "text": pa.array([t for _, t in chunk], pa.string()),
                }
            ),
            os.path.join(ddir, f"p{j}.parquet"),
        )
    out = Q.doc_curation_pipeline(str(tmp_path))
    # identical quality metrics -> all pass the gate; dedup keeps the
    # min doc_id of each of the 3 distinct texts: {0, 1, 2}
    assert sorted(out["doc_id"].tolist()) == [0, 1, 2]
    assert list(out["order_idx"]) == [0, 1, 2]


def test_length_percentile_sf001(ray_session):
    """Broadcast-CDF percentiles == a sequential rank replay; ties share
    the strictly-less count, extremes are 0 and < 1e6."""
    from biomedical_ner_ray.kernels.textstats import quality_features

    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    toks = {
        i: quality_features(x)["n_tokens"]
        for i, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    }
    n = len(toks)
    vals = sorted(toks.values())
    out = Q.doc_length_percentile("/root/testdata/sf0.001").to_pandas()
    assert len(out) == n
    import bisect

    for i, nt, p in zip(out["doc_id"], out["n_tokens"], out["pct_micro"]):
        assert nt == toks[i]
        assert p == (1_000_000 * bisect.bisect_left(vals, nt)) // n
    assert out["pct_micro"].min() == 0
    assert out["pct_micro"].max() < 1_000_000
    # ties share their percentile
    dup = out.groupby("n_tokens")["pct_micro"].nunique()
    assert (dup == 1).all()
