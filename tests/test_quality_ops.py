"""Boilerplate line scrub + corpus-quantile filter: controlled-corpus
semantics tests (the sf0.01 value-exact oracle comparison runs in
test_driver_contract.py like every other query)."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from biomedical_ner_ray import queries as Q


@pytest.fixture(scope="module")
def tiny_sf(tmp_path_factory):
    """30 docs: header variants (doc_id % 7) appear in <=5 docs each
    (below the 10-doc threshold), footer variants (doc_id % 3) in 10
    docs each (exactly at it) — so exactly the footer line is scrubbed."""
    d = tmp_path_factory.mktemp("qsf")
    docs = pa.table(
        {
            "doc_id": pa.array(range(30), pa.int64()),
            "text": pa.array(
                [f"unique body line number {i} with the and of words" for i in range(30)],
                pa.string(),
            ),
        }
    )
    pq.write_table(docs, os.path.join(d, "documents.parquet"))
    return str(d)


def test_boilerplate_scrub_removes_exactly_footer(ray_session, tiny_sf):
    out = Q.doc_boilerplate_scrub(tiny_sf).to_pandas()
    assert len(out) == 30
    # footer (10 distinct docs, == threshold) removed; header (<=5) kept
    assert (out["n_removed"] == 1).all()
    # clean text = header + body, reproducible
    import hashlib

    row = out[out["doc_id"] == 4].iloc[0]
    expect = "site header 4\nunique body line number 4 with the and of words"
    assert row["clean_md5"] == hashlib.md5(expect.encode()).hexdigest()


def test_quantile_filter_matches_duckdb_rank(ray_session, tiny_sf):
    got = Q.doc_quantile_filter(tiny_sf).to_pandas().sort_values("doc_id")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tiny_sf}/documents.parquet')"
    )
    import __ray_entry__ as E

    want = con.execute(E.oracle_sql()["doc_quantile_filter"]).df().sort_values("doc_id")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype({"n_tokens": "int64", "swr_milli": "int64"}),
        want.reset_index(drop=True).astype(
            {"n_tokens": "int64", "swr_milli": "int64"}
        ),
    )


def test_events_funnel_stages(ray_session, tmp_path):
    """Controlled users at every funnel stage, incl. the strict-after
    rule: a click BEFORE the first view must not count."""
    import ray.data as rd

    rows = []
    t0 = pd.Timestamp("2024-01-01")

    def ev(uid, typ, minutes):
        rows.append(
            {"event_id": len(rows), "user_id": uid, "event_type": typ,
             "ts": t0 + pd.Timedelta(minutes=minutes)}
        )

    ev(1, "error", 0)                      # stage 0
    ev(2, "view", 0)                       # stage 1
    ev(3, "view", 0); ev(3, "click", 5)    # stage 2
    ev(4, "view", 0); ev(4, "click", 5); ev(4, "purchase", 9)  # stage 3
    # click strictly BEFORE first view -> does not advance
    ev(5, "click", 0); ev(5, "view", 5)
    # purchase before the qualifying click -> stage stays 2
    ev(6, "purchase", 0); ev(6, "view", 1); ev(6, "click", 2)

    df = pd.DataFrame(rows)
    p = str(tmp_path / "events.parquet")
    df.to_parquet(p, index=False)

    from biomedical_ner_ray.queries import events_funnel

    out = events_funnel(str(tmp_path)).to_pandas().sort_values("user_id")
    assert out["stage"].tolist() == [0, 1, 2, 3, 1, 2]


def test_pack_bins_capacity_invariants(ray_session):
    """Every bin's token total fits the capacity and bin ids are a
    contiguous 0..max sequence per partition."""
    import duckdb

    from biomedical_ner_ray.queries import PACK_BIN_CAP, doc_pack_bins

    out = doc_pack_bins("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    toks = con.execute(
        r"""SELECT doc_id, g.i - 1 AS chunk_idx,
              least(64, len(ws) - (g.i - 1) * 64) AS n_tokens
            FROM (SELECT doc_id, regexp_extract_all(text, '\w+') AS ws FROM documents),
                 unnest(generate_series(1, (len(ws) + 63) // 64)) AS g(i)"""
    ).df()
    m = out.merge(toks, on=["doc_id", "chunk_idx"])
    fills = m.groupby(["pack_pid", "bin_id"])["n_tokens"].sum()
    assert (fills <= PACK_BIN_CAP).all()
    for _, g in out.groupby("pack_pid"):
        bids = sorted(g["bin_id"].unique())
        assert bids == list(range(len(bids)))


def test_repetition_stats_envelope(ray_session):
    """Counts must satisfy the structural envelope: distinct ≤ total,
    top ≤ total, top ≥ ceil(total/distinct); bigrams = words-1 for
    non-empty docs (single pass, no truncation)."""
    from biomedical_ner_ray.queries import doc_repetition_stats

    df = doc_repetition_stats("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0
    nz = df[df["n_words"] > 0]
    assert (nz["n_distinct_words"] <= nz["n_words"]).all()
    assert (nz["top_word_count"] <= nz["n_words"]).all()
    assert (
        nz["top_word_count"] * nz["n_distinct_words"] >= nz["n_words"]
    ).all()
    multi = df[df["n_words"] >= 2]
    assert (multi["n_bigrams"] == multi["n_words"] - 1).all()


def test_bigram_lm_score_envelope(ray_session):
    """Scored ≤ total bigrams; every per-bigram contribution ≤ 10⁶
    (probabilities), so score ≤ 10⁶ · n_scored; repetitive synthetic
    docs must score > 0 somewhere."""
    from biomedical_ner_ray.queries import LM_PROB_SCALE, doc_bigram_lm_score

    df = doc_bigram_lm_score("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0
    assert (df["n_scored"] <= df["n_bigrams"]).all()
    assert (df["lm_score_micro"] <= LM_PROB_SCALE * df["n_scored"]).all()
    assert (df["lm_score_micro"] > 0).any()


def test_curriculum_order_tiers_monotone(ray_session):
    """doc_curriculum_order: tiers non-increasing over the schedule
    (easy-first), deterministic across runs, and within-tier order
    follows the seeded md5 key (not doc_id order)."""
    from biomedical_ner_ray import queries as Q
    from biomedical_ner_ray.kernels.hashing import stable_u64_md5

    sf = "/root/testdata/sf0.01"
    a = Q.doc_curriculum_order(sf)
    b = Q.doc_curriculum_order(sf)
    pd.testing.assert_frame_equal(a, b)
    tiers = a["tier"].to_numpy()
    assert (tiers[:-1] >= tiers[1:]).all()
    # within the top tier, successive md5 keys must be sorted
    top = a[a["tier"] == tiers[0]]
    keys = [
        stable_u64_md5(f"curr:{Q.CURRICULUM_SEED}:{i}".encode())
        for i in top["doc_id"]
    ]
    assert keys == sorted(keys)
    assert not top["doc_id"].is_monotonic_increasing  # genuinely shuffled


def test_mad_outliers_planted_and_replay(ray_session, tmp_path):
    """Planted corpus: one 400-token giant and one 1-token runt among
    40 ~10-token docs — exactly those two must flag. Sequential replay
    of the DuckDB quantile_disc rank (ceil(n/2)) must reproduce the
    engine's median/MAD bit-for-bit."""
    import math

    import numpy as np

    from biomedical_ner_ray.queries import MAD_K, doc_mad_outliers

    texts = [f"plain body with roughly ten tokens here number {i} ok" for i in range(40)]
    texts.append(" ".join(f"w{j}" for j in range(400)))  # giant
    texts.append("x")  # runt
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(docs, os.path.join(tmp_path, "documents.parquet"))

    out = doc_mad_outliers(str(tmp_path)).to_pandas().sort_values("doc_id")
    flagged = set(out.loc[out["is_outlier"] == 1, "doc_id"].tolist())
    assert flagged == {40, 41}

    # sequential replay of median/MAD with quantile_disc rank semantics
    nt = out["n_tokens"].to_numpy()
    v = np.sort(nt)
    med = int(v[math.ceil(0.5 * len(v)) - 1])
    dv = np.sort(np.abs(nt - med))
    mad = int(dv[math.ceil(0.5 * len(dv)) - 1])
    exp = (np.abs(out["n_tokens"].to_numpy() - med) > MAD_K * mad).astype("int64")
    assert (out["is_outlier"].to_numpy() == exp).all()


def test_containment_dedup_catches_subset_low_jaccard(ray_session, tmp_path):
    """A short doc fully embedded in a much longer one must flag with
    containment 1.0 even though its Jaccard is far below the symmetric
    near-dup threshold — the signal this operator exists for. Sequential
    replay checks counts/ratios; unrelated docs must not pair."""
    import numpy as np

    from biomedical_ner_ray.kernels.hashing import shingles
    from biomedical_ner_ray.kernels.textstats import WORD_RE
    from biomedical_ner_ray.queries import (
        CONTAIN_NGRAM,
        CONTAIN_THRESH_MICRO,
        doc_containment_dedup,
    )

    small = " ".join(f"alpha{i} beta{i}" for i in range(8))  # 16 words
    big = small + " " + " ".join(f"gamma{j} delta{j}" for j in range(120))
    texts = [small, big] + [
        " ".join(f"noise{k}w{j}" for j in range(30)) for k in range(10)
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(docs, os.path.join(tmp_path, "documents.parquet"))

    out = doc_containment_dedup(str(tmp_path)).to_pandas()
    assert set(zip(out["doc_id_a"], out["doc_id_b"])) == {(0, 1)}
    row = out.iloc[0]

    s0 = shingles(WORD_RE.findall(small.lower()), n=CONTAIN_NGRAM)
    s1 = shingles(WORD_RE.findall(big.lower()), n=CONTAIN_NGRAM)
    inter = len(s0 & s1)
    assert row["n_common"] == inter
    assert row["n_a"] == len(s0) and row["n_b"] == len(s1)
    assert row["cont_a_micro"] == 1_000_000 * inter // len(s0) == 1_000_000
    assert row["cont_b_micro"] == 1_000_000 * inter // len(s1)
    # the asymmetric point: Jaccard is low, containment is total
    jacc = inter / len(s0 | s1)
    assert jacc < 0.5
    assert max(row["cont_a_micro"], row["cont_b_micro"]) >= CONTAIN_THRESH_MICRO
