"""Rendezvous (HRW) shard assignment: per-doc argmax replay, shard
balance, and the defining minimal-movement invariant — adding one
shard moves keys ONLY onto the new shard, at ~1/(N+1) rate. The DuckDB
window oracle runs separately via scripts/contract_check.py."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from biomedical_ner_ray import queries as Q
from biomedical_ner_ray.kernels.hashing import stable_u64_md5

SF = "/root/testdata/sf0.001"


def _frame(x):
    return x if isinstance(x, pd.DataFrame) else x.to_pandas()


def _hrw(doc_id: int, num_shards: int) -> int:
    scores = [
        stable_u64_md5(f"{doc_id}:{s}".encode()) for s in range(num_shards)
    ]
    return int(np.argmax(scores))


def test_shard_assign_matches_bruteforce_and_balances(ray_session):
    got = _frame(Q.doc_shard_assign(SF)).sort_values("doc_id", ignore_index=True)
    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])["doc_id"].to_pylist()
    exp = pd.DataFrame(
        {"doc_id": sorted(ids), "shard": [_hrw(d, Q.HRW_NUM_SHARDS) for d in sorted(ids)]}
    )
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))
    counts = got["shard"].value_counts()
    assert len(counts) == Q.HRW_NUM_SHARDS  # every shard used
    expect = len(got) / Q.HRW_NUM_SHARDS
    assert counts.max() < 2.5 * expect and counts.min() > 0.3 * expect


def test_shard_assign_minimal_movement_on_growth(ray_session):
    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])["doc_id"].to_pylist()
    n = Q.HRW_NUM_SHARDS
    before = {d: _hrw(d, n) for d in ids}
    after = {d: _hrw(d, n + 1) for d in ids}
    moved = [d for d in ids if before[d] != after[d]]
    # every moved key lands on the NEW shard — the HRW invariant
    assert all(after[d] == n for d in moved)
    # movement rate ~ 1/(N+1), generously banded for 500 keys
    rate = len(moved) / len(ids)
    assert 0.25 / (n + 1) < rate < 3.0 / (n + 1)
