"""kmeans_int: bit-exactness vs the DuckDB unrolled oracle, driver-path
equivalence, determinism, and the empty-cluster carry rule."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from biomedical_ner_ray.stages.kmeans import (
    QSCALE,
    _assign,
    _trunc_div,
    kmeans_int,
    kmeans_oracle_sql,
)

SF = "/root/testdata/sf0.001"


def _run(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    return con.execute(sql).df()


def test_matches_oracle_bit_exact(ray_session):
    ds = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    got = (
        kmeans_int(ds, k=8, iterations=3)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    want = _run(kmeans_oracle_sql("embeddings", k=8, iterations=3))
    want = want.astype({"vec_id": "int64", "cluster_id": "int64", "dist": "int64"})
    pd.testing.assert_frame_equal(got, want)


def test_deterministic_across_runs(ray_session):
    ds = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    a = kmeans_int(ds, k=4, iterations=2).to_pandas().sort_values("vec_id")
    b = kmeans_int(ds, k=4, iterations=2).to_pandas().sort_values("vec_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_clusters_nontrivial(ray_session):
    ds = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = kmeans_int(ds, k=8, iterations=3).to_pandas()
    assert out["cluster_id"].nunique() > 1
    assert (out["dist"] >= 0).all()


def test_trunc_div_matches_duckdb():
    s = np.array([-7, 7, -1, 1, 0, -999999], dtype=np.int64)
    n = np.array([2, 2, 3, 3, 5, 1000], dtype=np.int64)
    got = _trunc_div(s, n)
    want = np.array(
        [
            duckdb.sql(f"SELECT {int(a)} // {int(b)}").fetchone()[0]
            for a, b in zip(s, n)
        ],
        dtype=np.int64,
    )
    np.testing.assert_array_equal(got, want)


def test_assign_tie_breaks_to_smallest_cid():
    q = np.array([[0, 0]], dtype=np.int64)
    cents = np.array([[1, 0], [0, 1], [3, 3]], dtype=np.int64)  # cids 0,1 tie
    cid, dist = _assign(q, cents)
    assert cid[0] == 0 and dist[0] == 1


def test_quantize_floor_matches_duckdb():
    vals = np.array([0.0542495064, -0.2524777352, 1.0, -1.0], dtype=np.float32)
    got = np.floor(vals.astype(np.float64) * QSCALE).astype(np.int64)
    for v, g in zip(vals, got):
        w = duckdb.sql(
            f"SELECT CAST(FLOOR(CAST(CAST({float(v)!r} AS FLOAT) AS DOUBLE)"
            f" * 1000000) AS BIGINT)"
        ).fetchone()[0]
        assert g == w


def test_subspace_joint_equals_sequential(ray_session):
    """subspace_centroids_all must be bit-identical to the sequential
    per-subspace trainer it replaced (the PQ oracle replays the
    sequential semantics, so any divergence is an oracle break)."""
    import numpy as np
    import ray.data as rd

    from biomedical_ner_ray.queries import PQ_ITERS, PQ_K, PQ_M
    from biomedical_ner_ray.stages.kmeans import (
        _quantize_df,
        subspace_centroids,
        subspace_centroids_all,
    )

    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    pinned = ds.map_batches(_quantize_df, batch_format="pandas").materialize()
    dim = len(pinned.take(1)[0]["q"])
    sub = dim // PQ_M
    joint = subspace_centroids_all(pinned, PQ_K, PQ_ITERS, sub, PQ_M)
    for m in range(PQ_M):
        seq = subspace_centroids(pinned, PQ_K, PQ_ITERS, m * sub, (m + 1) * sub)
        assert np.array_equal(joint[m], seq), f"subspace {m} diverged"
