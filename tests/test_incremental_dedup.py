"""Incremental (ingest-time) MinHash dedup against a persisted index
(stages/dedup.build_minhash_index / incremental_minhash_pairs):
equivalence with the batch path restricted to ≥1-new pairs, bucket
pruning of the index read, and empty-ingest behavior."""

import os

import pandas as pd
import pytest
import ray.data as rd

from biomedical_ner_ray.stages.dedup import (
    INDEX_BAND_BUCKETS,
    build_minhash_index,
    incremental_minhash_pairs,
    minhash_pairs,
)

PAIR_COLS = ["doc_id_a", "doc_id_b", "n_common", "n_union"]

_BASE = (
    "transcription factors bind regulatory elements controlling gene "
    "expression in lymphocyte development and differentiation pathways"
)
_ALT = (
    "protein kinases phosphorylate serine threonine residues modulating "
    "signal transduction cascades in epithelial tissue homeostasis"
)

# old corpus: two planted near-dup clusters + noise; new batch: one doc
# duplicating cluster A (old–new pair), two exact dups of each other
# (new–new pair), one unrelated.
_OLD = [
    {"doc_id": 0, "text": _BASE},
    {"doc_id": 1, "text": _BASE},  # old–old dup: must NOT re-emit
    {"doc_id": 2, "text": _ALT},
    {"doc_id": 3, "text": "completely different content about weather patterns"},
]
_NEW = [
    {"doc_id": 10, "text": _BASE.replace("pathways", "pathway")},  # ~dup of 0/1
    {"doc_id": 11, "text": _ALT},  # exact dup of 2
    {"doc_id": 12, "text": "unrelated ingest noise about orbital mechanics"},
    {"doc_id": 13, "text": "unrelated ingest noise about orbital mechanics"},  # dup of 12
]


def _index(tmp_path):
    return build_minhash_index(
        lambda: rd.from_pandas(pd.DataFrame(_OLD)), str(tmp_path / "idx")
    )


def _sorted(df):
    return df[PAIR_COLS].sort_values(PAIR_COLS).reset_index(drop=True)


def test_incremental_matches_batch_path_restricted(ray_session, tmp_path):
    idx = _index(tmp_path)
    inc = incremental_minhash_pairs(
        lambda: rd.from_pandas(pd.DataFrame(_NEW)), idx, num_partitions=2
    ).to_pandas()
    full = minhash_pairs(
        lambda: rd.from_pandas(pd.DataFrame(_OLD + _NEW)), num_partitions=2
    ).to_pandas()
    new_ids = {r["doc_id"] for r in _NEW}
    want = full[
        full["doc_id_a"].isin(new_ids) | full["doc_id_b"].isin(new_ids)
    ]
    pd.testing.assert_frame_equal(_sorted(inc), _sorted(want))
    found = {(a, b) for a, b in zip(inc["doc_id_a"], inc["doc_id_b"])}
    assert (2, 11) in found  # old–new exact dup
    assert (12, 13) in found  # new–new exact dup
    assert (0, 1) not in found  # old–old settled at index build


def test_index_layout_and_bucket_pruning(ray_session, tmp_path):
    idx = _index(tmp_path)
    buckets = [
        d for d in os.listdir(idx["bands"]) if d.startswith("band_bucket=")
    ]
    assert buckets and len(buckets) <= INDEX_BAND_BUCKETS
    # every band row of 4 docs × 8 bands landed in some hive bucket
    import pyarrow.parquet as pq

    n = pq.read_table(idx["bands"]).num_rows
    assert n == 4 * 8
    # shingle store carries one packed blob per old doc
    assert pq.read_table(idx["shingles"]).num_rows == 4


def test_empty_ingest_batch(ray_session, tmp_path):
    idx = _index(tmp_path)
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "text": pd.Series([], dtype="object")})
    out = incremental_minhash_pairs(
        lambda: rd.from_pandas(empty), idx, num_partitions=2
    )
    # ds.to_pandas() drops columns for empty datasets (Ray quirk); the
    # dataset-level schema is the contract.
    assert out.schema().names == PAIR_COLS
    assert out.count() == 0


def test_disjoint_ingest_no_candidates(ray_session, tmp_path):
    idx = _index(tmp_path)
    out = incremental_minhash_pairs(
        lambda: rd.from_pandas(
            pd.DataFrame([{"doc_id": 20, "text": "nothing shared with corpus"}])
        ),
        idx,
        num_partitions=2,
    ).to_pandas()
    assert len(out) == 0
