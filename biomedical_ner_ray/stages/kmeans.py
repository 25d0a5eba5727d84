"""Distributed Lloyd k-means over an embedding column — the semantic
clustering slot of the engine (SemDeDup-style curation: cluster, then
keep/inspect per cluster; also the centroid builder behind ann_topk_ivf
at scale).

ALL-INTEGER fixed-point arithmetic, like ``pagerank.py``: vectors are
quantized once to millionths (``qv = floor(float64(e) · 10^6)`` —
float32→float64 widening and the multiply are exact IEEE on both sides,
floor is exact), distances are int64 sums of squared differences, and
centroid updates are truncated integer divisions (toward zero, matching
DuckDB ``//``). Integer math is associative/commutative regardless of
partitioning or summation order, so the distributed result is
bit-identical to the driver path and to the SQL oracle — no
float-reduction nondeterminism anywhere.

Distributed shape — PIN VECTORS, MOVE CENTROIDS (the k-means analog of
pagerank's "pin edges, move ranks"):
- setup (once): one streaming pass quantizes the embedding column; the
  quantized table — the O(N·d) payload — is materialized and never
  moves again. Assignment is row-local, so no exchange exists anywhere
  in the algorithm.
- seeds: the k vectors with the smallest vec_ids, found with a partial
  top-k per block + driver combine (bounded aggregate, no sort).
- per iteration: centroids (k·d int64, tiny) broadcast via ``ray.put``;
  a local ``map_batches`` over the pinned blocks computes the argmin
  assignment VECTORIZED (N×k×d numpy) and pre-sums member vectors per
  cluster WITHIN the block; the ≤ P·k partial rows combine on the
  driver into the next centroid table. Zero per-iteration shuffle.
- ties go to the smallest cluster id (np.argmin first-hit == SQL
  ``ORDER BY dist, cid``); a cluster that loses every member keeps its
  previous centroid on both paths.

Bounds: per-dim block sums reach N_block · 5·10^6 ≈ 10^13 for
10^7-row blocks — int64-safe; at extreme block sizes split blocks
before widening to two-limb sums. The driver combine holds to P·k
rows. Iterations are a fixed small constant (the oracle unrolls them).

Reference anchor: the engine's IVF path (queries.ann_topk_ivf) uses
ad-hoc centroids; this is the principled trainer for them. Extends the
dedup family (SURVEY.md §2.7) with embedding-space clustering.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

QSCALE = 1_000_000


def _quantize_df(df: pd.DataFrame) -> pd.DataFrame:
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    q = np.floor(mat * QSCALE).astype(np.int64)
    return pd.DataFrame(
        {"vec_id": df["vec_id"].astype("int64"), "q": list(q)}
    )


def _trunc_div(s: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Integer division truncating toward zero (DuckDB ``//``)."""
    return np.sign(s) * (np.abs(s) // n)


def _assign(qmat: np.ndarray, cents: np.ndarray):
    """argmin_c Σ_d (q-c)² with first-hit (= smallest cid) tie-break.
    Returns (cid[N], dist[N]) int64."""
    # (N,1,D)-(1,K,D) -> (N,K,D); int64 squares stay exact
    diff = qmat[:, None, :] - cents[None, :, :]
    d = np.einsum("nkd,nkd->nk", diff, diff)
    cid = np.argmin(d, axis=1)
    return cid.astype(np.int64), d[np.arange(len(cid)), cid]


def kmeans_int(
    emb_ds,
    k: int = 8,
    iterations: int = 3,
):
    """emb_ds: Dataset with (vec_id int64, embedding list<float>).
    Returns a Dataset of (vec_id, cluster_id, dist) — the assignment
    after ``iterations`` Lloyd rounds from the k-smallest-vec_id seeds;
    dist is the exact int64 squared distance in quantized units."""
    import ray
    import ray.data as rd

    pinned = emb_ds.select_columns(["vec_id", "embedding"]).map_batches(
        _quantize_df, batch_format="pandas"
    ).materialize()

    # seeds: k smallest vec_ids — partial top-k per block, driver combine
    def smallest_k(df: pd.DataFrame) -> pd.DataFrame:
        return df.nsmallest(k, "vec_id")

    seed_df = (
        pinned.map_batches(smallest_k, batch_format="pandas")
        .to_pandas()
        .nsmallest(k, "vec_id")
        .sort_values("vec_id", ignore_index=True)
    )
    cents = np.stack(seed_df["q"].to_numpy()).astype(np.int64)  # (k, d)

    for _ in range(iterations):
        cref = ray.put(cents)

        def partial(df: pd.DataFrame, _c=cref) -> pd.DataFrame:
            c = ray.get(_c)
            qmat = np.stack(df["q"].to_numpy()).astype(np.int64)
            cid, _ = _assign(qmat, c)
            out = []
            for ci in np.unique(cid):
                m = qmat[cid == ci]
                out.append((int(ci), len(m), m.sum(axis=0, dtype=np.int64)))
            return pd.DataFrame(
                {
                    "cid": [o[0] for o in out],
                    "n": [o[1] for o in out],
                    "s": [o[2] for o in out],
                }
            )

        parts = pinned.map_batches(partial, batch_format="pandas").to_pandas()
        nxt = cents.copy()
        for ci, g in parts.groupby("cid"):
            n = int(g["n"].sum())
            s = np.sum(np.stack(g["s"].to_numpy()), axis=0, dtype=np.int64)
            nxt[int(ci)] = _trunc_div(s, np.int64(n))
        cents = nxt

    cref = ray.put(cents)

    def final(df: pd.DataFrame, _c=cref) -> pa.Table:
        c = ray.get(_c)
        qmat = np.stack(df["q"].to_numpy()).astype(np.int64)
        cid, dist = _assign(qmat, c)
        return pa.table(
            {
                "vec_id": pa.array(df["vec_id"].to_numpy(), pa.int64()),
                "cluster_id": pa.array(cid, pa.int64()),
                "dist": pa.array(dist, pa.int64()),
            }
        )

    return pinned.map_batches(final, batch_format="pandas")


def subspace_centroids(
    pinned, k: int, iterations: int, lo: int, hi: int
) -> np.ndarray:
    """Lloyd centroids over the dim window [lo, hi) of an already
    quantized+materialized table — the per-subspace trainer behind
    product quantization (queries.emb_pq_codes). Identical semantics to
    ``kmeans_int`` (same seeds-by-smallest-vec_id rule, first-hit
    tie-break, toward-zero centroid division, empty-cluster carry), so
    the per-subspace unrolled-CTE oracle replays it bit-for-bit."""
    import ray

    def smallest_k(df: pd.DataFrame) -> pd.DataFrame:
        return df.nsmallest(k, "vec_id")

    seed_df = (
        pinned.map_batches(smallest_k, batch_format="pandas")
        .to_pandas()
        .nsmallest(k, "vec_id")
        .sort_values("vec_id", ignore_index=True)
    )
    cents = np.stack(seed_df["q"].to_numpy()).astype(np.int64)[:, lo:hi]

    for _ in range(iterations):
        cref = ray.put(cents)

        def partial(df: pd.DataFrame, _c=cref) -> pd.DataFrame:
            c = ray.get(_c)
            qmat = np.stack(df["q"].to_numpy()).astype(np.int64)[:, lo:hi]
            cid, _ = _assign(qmat, c)
            out = []
            for ci in np.unique(cid):
                m = qmat[cid == ci]
                out.append((int(ci), len(m), m.sum(axis=0, dtype=np.int64)))
            return pd.DataFrame(
                {
                    "cid": [o[0] for o in out],
                    "n": [o[1] for o in out],
                    "s": [o[2] for o in out],
                }
            )

        parts = pinned.map_batches(partial, batch_format="pandas").to_pandas()
        nxt = cents.copy()
        for ci, g in parts.groupby("cid"):
            n = int(g["n"].sum())
            s = np.sum(np.stack(g["s"].to_numpy()), axis=0, dtype=np.int64)
            nxt[int(ci)] = _trunc_div(s, np.int64(n))
        cents = nxt
    return cents


def subspace_centroids_all(pinned, k: int, iterations: int, sub: int, m_count: int):
    """All PQ subspaces trained in ONE pass per iteration: returns the
    list ``[subspace_centroids(pinned, k, iterations, m*sub, (m+1)*sub)
    for m in range(m_count)]`` bit-for-bit (asserted by
    tests/test_kmeans.py::test_subspace_joint_equals_sequential), but
    with one seed scan + ``iterations`` partial scans total instead of
    ``m_count`` of each — the per-subspace executors were pure launch
    overhead (subspaces are independent, so their partials batch into
    one map_batches trivially)."""
    import ray

    def smallest_k(df: pd.DataFrame) -> pd.DataFrame:
        return df.nsmallest(k, "vec_id")

    seed_df = (
        pinned.map_batches(smallest_k, batch_format="pandas")
        .to_pandas()
        .nsmallest(k, "vec_id")
        .sort_values("vec_id", ignore_index=True)
    )
    seed_full = np.stack(seed_df["q"].to_numpy()).astype(np.int64)
    cents = [seed_full[:, m * sub : (m + 1) * sub].copy() for m in range(m_count)]

    for _ in range(iterations):
        cref = ray.put(cents)

        def partial(df: pd.DataFrame, _c=cref) -> pd.DataFrame:
            cs = ray.get(_c)
            full = np.stack(df["q"].to_numpy()).astype(np.int64)
            ms, cids, ns, ss = [], [], [], []
            for m in range(m_count):
                qmat = full[:, m * sub : (m + 1) * sub]
                cid, _ = _assign(qmat, cs[m])
                for ci in np.unique(cid):
                    sel = qmat[cid == ci]
                    ms.append(m)
                    cids.append(int(ci))
                    ns.append(len(sel))
                    ss.append(sel.sum(axis=0, dtype=np.int64))
            return pd.DataFrame({"m": ms, "cid": cids, "n": ns, "s": ss})

        parts = pinned.map_batches(partial, batch_format="pandas").to_pandas()
        nxt = [c.copy() for c in cents]
        for (m, ci), g in parts.groupby(["m", "cid"]):
            n = int(g["n"].sum())
            s = np.sum(np.stack(g["s"].to_numpy()), axis=0, dtype=np.int64)
            nxt[int(m)][int(ci)] = _trunc_div(s, np.int64(n))
        cents = nxt
    return cents


def kmeans_oracle_sql(table: str = "embeddings", k: int = 8, iterations: int = 3) -> str:
    """The unrolled-iteration DuckDB twin of ``kmeans_int`` — bit-exact
    because every step is integer arithmetic with identical semantics
    (floor quantize, int64 squared distances, ``ORDER BY dist, cid``
    tie-break, toward-zero centroid division, empty-cluster carry)."""
    trunc = (
        "CASE WHEN SUM(q.qv) < 0 THEN -((-SUM(q.qv)) // COUNT(*)) "
        "ELSE SUM(q.qv) // COUNT(*) END"
    )
    sql = f"""
WITH q AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS qv
  FROM {table}
),
seeds AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid
  FROM (SELECT DISTINCT vec_id FROM {table} ORDER BY vec_id LIMIT {k})
),
c0 AS (
  SELECT s.cid, q.dim, q.qv AS qc FROM seeds s JOIN q USING (vec_id)
)"""
    prev = "c0"
    for i in range(iterations):
        sql += f""",
d{i} AS (
  SELECT q.vec_id, c.cid,
         SUM((q.qv - c.qc) * (q.qv - c.qc)) AS dist
  FROM q JOIN {prev} c USING (dim)
  GROUP BY q.vec_id, c.cid
),
a{i} AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d{i}
  ) WHERE rn = 1
),
u{i} AS (
  SELECT a.cid, q.dim, {trunc} AS qc
  FROM a{i} a JOIN q USING (vec_id)
  GROUP BY a.cid, q.dim
),
c{i + 1} AS (
  SELECT p.cid, p.dim, COALESCE(u.qc, p.qc) AS qc
  FROM {prev} p LEFT JOIN u{i} u ON u.cid = p.cid AND u.dim = p.dim
)"""
        prev = f"c{i + 1}"
    sql += f"""
SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id, CAST(dist AS BIGINT) AS dist
FROM (
  SELECT q.vec_id, c.cid,
         SUM((q.qv - c.qc) * (q.qv - c.qc)) AS dist,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY SUM((q.qv - c.qc) * (q.qv - c.qc)), c.cid
         ) AS rn
  FROM q JOIN {prev} c USING (dim)
  GROUP BY q.vec_id, c.cid
) WHERE rn = 1
ORDER BY vec_id
"""
    return sql


def subspace_kmeans_ctes(k: int, iterations: int, lo: int, hi: int, sfx: str):
    """CTE fragment replaying ``subspace_centroids`` + the final
    assignment over dim window [lo, hi). Assumes ``q`` (quantized
    table) and ``seeds`` CTEs exist in the enclosing WITH. Returns
    (sql_fragment, final_centroid_cte, assignment_cte). Every iterate
    is AS MATERIALIZED (each is referenced 3× per round — inlining
    grows 3^i, the power-iteration lesson)."""
    trunc = (
        "CASE WHEN SUM(w.qv) < 0 THEN -((-SUM(w.qv)) // COUNT(*)) "
        "ELSE SUM(w.qv) // COUNT(*) END"
    )
    sql = f""",
qw{sfx} AS MATERIALIZED (
  SELECT vec_id, dim, qv FROM q WHERE dim >= {lo} AND dim < {hi}),
c{sfx}_0 AS MATERIALIZED (
  SELECT s.cid, w.dim, w.qv AS qc FROM seeds s JOIN qw{sfx} w USING (vec_id))"""
    prev = f"c{sfx}_0"
    for i in range(iterations):
        sql += f""",
d{sfx}_{i} AS MATERIALIZED (
  SELECT w.vec_id, c.cid, SUM((w.qv - c.qc) * (w.qv - c.qc)) AS dist
  FROM qw{sfx} w JOIN {prev} c USING (dim) GROUP BY w.vec_id, c.cid),
a{sfx}_{i} AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d{sfx}_{i}) WHERE rn = 1),
u{sfx}_{i} AS MATERIALIZED (
  SELECT a.cid, w.dim, {trunc} AS qc
  FROM a{sfx}_{i} a JOIN qw{sfx} w USING (vec_id) GROUP BY a.cid, w.dim),
c{sfx}_{i + 1} AS MATERIALIZED (
  SELECT p.cid, p.dim, COALESCE(u.qc, p.qc) AS qc
  FROM {prev} p LEFT JOIN u{sfx}_{i} u ON u.cid = p.cid AND u.dim = p.dim)"""
        prev = f"c{sfx}_{i + 1}"
    sql += f""",
asg{sfx} AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT w.vec_id, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY w.vec_id
             ORDER BY SUM((w.qv - c.qc) * (w.qv - c.qc)), c.cid) AS rn
    FROM qw{sfx} w JOIN {prev} c USING (dim)
    GROUP BY w.vec_id, c.cid) WHERE rn = 1)"""
    return sql, prev, f"asg{sfx}"
