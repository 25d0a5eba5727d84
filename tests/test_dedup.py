"""Unit tests for the near-dup detectors (stages/dedup.py): hash parity
with DuckDB (the oracle contract), LSH recall on planted duplicates, and
pair-set sanity."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from biomedical_ner_ray.kernels.hashing import simhash64_md5, stable_u64_md5
from biomedical_ner_ray.stages.dedup import (
    JACCARD_DEN,
    JACCARD_NUM,
    minhash_pairs,
    minhash_signature,
    shingle_hashes,
    simhash_pairs,
)


def test_stable_u64_md5_matches_duckdb():
    con = duckdb.connect()
    for s in ("abc", "hello world", "Öäü-unicode", ""):
        (got,) = con.execute("SELECT md5_number_lower(?)", [s]).fetchone()
        assert int(got) == stable_u64_md5(s.encode("utf-8")), s


def test_simhash_matches_duckdb():
    ws = ["cat", "dog", "cat", "fish", "dog", "dog"]
    con = duckdb.connect()
    (got,) = con.execute(
        """
        WITH w AS (SELECT unnest(?) AS word),
        b AS (SELECT g.p AS p,
                     sum(CASE WHEN (md5_number_lower(word) >> g.p) & 1 = 1
                         THEN 1 ELSE -1 END) AS s
              FROM w, unnest(generate_series(0, 63)) AS g(p) GROUP BY g.p)
        SELECT CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS UBIGINT) << p
                        ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) FROM b
        """,
        [ws],
    ).fetchone()
    assert int(got) == simhash64_md5(ws)


def test_minhash_signature_estimates_jaccard():
    a = shingle_hashes("the quick brown fox jumps over the lazy dog " * 5)
    b = shingle_hashes("the quick brown fox leaps over the lazy dog " * 5)
    sa, sb = minhash_signature(a), minhash_signature(b)
    est = float((sa == sb).mean())
    inter = len(set(a.tolist()) & set(b.tolist()))
    true_j = inter / (len(a) + len(b) - inter)
    assert abs(est - true_j) < 0.35  # 32 perms: coarse but correlated
    # identical input -> identical signature
    assert (minhash_signature(a) == sa).all()


def _docs_ds_factory():
    base = (
        "transcription factors bind regulatory elements controlling gene "
        "expression in lymphocyte development and differentiation pathways"
    )
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base},  # exact duplicate
        {"doc_id": 2, "text": base.replace("lymphocyte", "monocyte")},  # near-dup
        {"doc_id": 3, "text": "completely different content about weather patterns"},
        {"doc_id": 4, "text": "another unrelated short document"},
    ]
    return lambda: rd.from_pandas(pd.DataFrame(rows))


def test_minhash_pairs_finds_planted_dups(ray_session):
    pairs = minhash_pairs(_docs_ds_factory(), num_partitions=2).to_pandas()
    found = {(a, b) for a, b in zip(pairs["doc_id_a"], pairs["doc_id_b"])}
    assert (0, 1) in found  # exact dup always caught
    for a, b, nc, nu in pairs.itertuples(index=False):
        assert a < b and JACCARD_DEN * nc >= JACCARD_NUM * nu


def test_simhash_pairs_finds_planted_dups(ray_session):
    pairs = simhash_pairs(_docs_ds_factory(), num_partitions=2).to_pandas()
    found = {(a, b) for a, b in zip(pairs["doc_id_a"], pairs["doc_id_b"])}
    assert (0, 1) in found
    assert (pairs["hamming"] <= 3).all()
    assert (pairs["doc_id_a"] < pairs["doc_id_b"]).all()


def test_popcount_vectorization():
    xs = np.array([0, 1, 3, 0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    pops = np.unpackbits(xs.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
    assert pops.tolist() == [0, 1, 2, 64]


def test_minhash_join_variant_equivalent(ray_session):
    from biomedical_ner_ray.stages.dedup import minhash_pairs_join

    a = minhash_pairs(_docs_ds_factory(), num_partitions=2).to_pandas()
    b = minhash_pairs_join(_docs_ds_factory(), num_partitions=2).to_pandas()
    cols = ["doc_id_a", "doc_id_b", "n_common", "n_union"]
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols).reset_index(drop=True),
        b[cols].sort_values(cols).reset_index(drop=True),
    )


def test_minhash_join_semijoin_fallback_equivalent(ray_session):
    """broadcast_id_limit=0 forces the semi-join candidate-filter path
    (the SCALE.md fallback for id sets too large to ray.put): pairs must
    be identical to the broadcast path and to the payload path."""
    from biomedical_ner_ray.stages.dedup import minhash_pairs_join

    a = minhash_pairs(_docs_ds_factory(), num_partitions=2).to_pandas()
    b = minhash_pairs_join(
        _docs_ds_factory(), num_partitions=2, broadcast_id_limit=0
    ).to_pandas()
    cols = ["doc_id_a", "doc_id_b", "n_common", "n_union"]
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols).reset_index(drop=True),
        b[cols].sort_values(cols).reset_index(drop=True),
    )


def test_fuzzy_decontaminate_pairs_straddle_split(ray_session):
    """doc_decontaminate_fuzzy = minhash pairs restricted to cross-split
    (eval, train): every output pair must straddle the md5 80/20 split,
    sides labeled correctly, and the pair set must be exactly the
    cross-split subset of the full near-dup pair graph."""
    from biomedical_ner_ray import queries as Q

    sf = "/root/testdata/sf0.01"
    got = Q.doc_decontaminate_fuzzy(sf).to_pandas()

    def is_eval(i):
        return stable_u64_md5(str(i).encode()) % 10 >= 8

    assert len(got) > 0
    for e, t in zip(got.eval_doc_id, got.train_doc_id):
        assert is_eval(e) and not is_eval(t)

    allp = Q.doc_dedup_minhash(sf).to_pandas()
    cross = allp[
        [is_eval(a) != is_eval(b) for a, b in zip(allp.doc_id_a, allp.doc_id_b)]
    ]
    assert len(cross) == len(got)
    exp_pairs = {
        (a if is_eval(a) else b, b if is_eval(a) else a)
        for a, b in zip(cross.doc_id_a, cross.doc_id_b)
    }
    assert set(zip(got.eval_doc_id, got.train_doc_id)) == exp_pairs


def test_source_overlap_matrix_consistent(ray_session):
    """doc_source_overlap totals must equal the pair-graph size, with
    unordered (source_a <= source_b) keys."""
    from biomedical_ner_ray import queries as Q

    sf = "/root/testdata/sf0.01"
    got = Q.doc_source_overlap(sf).to_pandas()
    allp = minhash_pairs(
        lambda: rd.read_parquet(sf + "/documents.parquet", columns=["doc_id", "text"])
    ).to_pandas()
    assert int(got["n_pairs"].sum()) == len(allp)
    assert (got["source_a"] <= got["source_b"]).all()
