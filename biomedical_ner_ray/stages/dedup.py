"""Near-duplicate detection operators over a document corpus.

Four detectors, each the Ray-Data shape a 100TB training-data pipeline
needs (SURVEY.md §2.7 extends the reference's exact-dedup shape;
MinHash/LSH per Broder '97 / SlimPajama-style two-stage dedup):

- MinHash + LSH  (``minhash_pairs``): shingle → 32-perm MinHash →
  8-band LSH bucket exchange → exact-Jaccard verify inside buckets →
  pair dedup. Only band rows shuffle; raw text never does.
- SimHash       (``simhash_pairs``): 64-bit SimHash → 4×16-bit chunk
  bucket exchange (pigeonhole: hamming ≤ 3 ⇒ some chunk equal) →
  hamming verify.
- Blocked exact n-gram Jaccard (``jaccard_pairs``): all pairs WITHIN a
  blocking key (here ``source``) — the exact-but-blocked baseline.
- Embedding cosine (``embedding_pairs``, in queries.py): blocked
  matmul against a broadcast normalized matrix.

Every hash is md5-derived (``stable_u64_md5`` == DuckDB
``md5_number_lower``) and every threshold compare is integer-exact
(J ≥ 4/5 tested as ``5*n_common >= 4*n_union``), so the DuckDB oracle
reproduces results value-for-value — the LSH itself is replicated in
SQL, not approximated.

All bucket exchanges use the keyed hash exchange from
``stages/exchange.py`` (bucket count is high-cardinality); pair
verification is vectorized pandas inside each partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..kernels.hashing import simhash64_md5, stable_u64_md5
from ..kernels.textstats import WORD_RE

SHINGLE_N = 3
NUM_PERM = 32
NUM_BANDS = 8
BAND_ROWS = NUM_PERM // NUM_BANDS
MINHASH_SEED = 777
# J >= JACCARD_NUM/JACCARD_DEN, integer-exact
JACCARD_NUM, JACCARD_DEN = 4, 5
SIMHASH_CHUNKS = 4
SIMHASH_MAX_HAMMING = 3
_MERSENNE = (1 << 61) - 1


def minhash_params(num_perm: int = NUM_PERM, seed: int = MINHASH_SEED):
    """32-bit (a, b) permutation constants: products stay < 2^64, so
    numpy uint64 arithmetic is exact and plain SQL HUGEINT math matches
    (no wrap-around emulation needed)."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 32, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, 1 << 32, size=num_perm, dtype=np.uint64)
    return a, b


_A, _B = minhash_params()


def shingle_hashes(
    text: str, n: int = SHINGLE_N, cache: dict | None = None
) -> np.ndarray:
    """Distinct word n-gram shingles → sorted md5-u64 hashes (sorted so
    the array is deterministic; jaccard/minhash are set ops anyway).

    ``cache`` (shingle → u64, typically held per batch) collapses the
    md5 cost of shingles repeated across a batch's documents."""
    ws = WORD_RE.findall(text.lower())
    if not ws:
        return np.empty(0, dtype=np.uint64)
    if len(ws) < n:
        sh = {" ".join(ws)}
    else:
        sh = {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}
    if cache is None:
        it = (stable_u64_md5(s.encode("utf-8")) for s in sh)
    else:
        def _h(s: str) -> int:
            v = cache.get(s)
            if v is None:
                v = stable_u64_md5(s.encode("utf-8"))
                cache[s] = v
            return v

        it = (_h(s) for s in sh)
    hv = np.fromiter(it, dtype=np.uint64, count=len(sh))
    hv.sort()
    return hv


def minhash_signature(hv: np.ndarray) -> np.ndarray:
    """32-perm signature over 32-bit-reduced shingle hashes."""
    if hv.size == 0:
        return np.full(NUM_PERM, _MERSENNE, dtype=np.uint64)
    h32 = hv % np.uint64(1 << 32)
    prods = (_A[:, None] * h32[None, :] + _B[:, None]) % np.uint64(_MERSENNE)
    return prods.min(axis=1)


def band_key(sig: np.ndarray, band: int) -> str:
    vals = sig[band * BAND_ROWS : (band + 1) * BAND_ROWS]
    return f"{band}:" + "-".join(str(int(v)) for v in vals)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _minhash_band_rows(batch: pa.Table) -> pd.DataFrame:
    doc_ids, keys, shs = [], [], []
    cache: dict = {}
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        hv = shingle_hashes(text, cache=cache)
        sig = minhash_signature(hv)
        # reinterpret u64 bits as int64 so the list column fits Arrow's
        # signed types; jaccard is a set op, representation-agnostic
        hv_list = hv.view(np.int64).tolist()
        for band in range(NUM_BANDS):
            doc_ids.append(doc_id)
            keys.append(band_key(sig, band))
            shs.append(hv_list)
    return pd.DataFrame({"doc_id": doc_ids, "band_key": keys, "shingles": shs})


def _verify_minhash_buckets(df: pd.DataFrame) -> pd.DataFrame:
    out = []
    for _, g in df.groupby("band_key", sort=False):
        if len(g) < 2:
            continue
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sets = [set(s) for s in g["shingles"]]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                inter = len(sets[i] & sets[j])
                union = len(sets[i]) + len(sets[j]) - inter
                if union and JACCARD_DEN * inter >= JACCARD_NUM * union:
                    out.append((ids[i], ids[j], inter, union))
    return pd.DataFrame(
        out, columns=["doc_id_a", "doc_id_b", "n_common", "n_union"]
    ).astype({"doc_id_a": "int64", "doc_id_b": "int64", "n_common": "int64", "n_union": "int64"})


def _dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
    return df.drop_duplicates(subset=["doc_id_a", "doc_id_b"])


def minhash_pairs(docs_ds_factory, num_partitions: int = 8):
    """documents(doc_id, text) → near-dup pairs
    (doc_id_a, doc_id_b, n_common, n_union), J ≥ 4/5, a < b.

    ``docs_ds_factory`` is a zero-arg callable building the documents
    Dataset (the factory convention predates the exchange-based verify,
    which needs no special DataContext; callers that still join under
    ``hash_shuffle`` rely on construction-inside-scope, so the factory
    stays)."""
    from .exchange import keyed_exchange

    bands = docs_ds_factory().map_batches(_minhash_band_rows, batch_format="pyarrow")
    cands = keyed_exchange(
        bands, ["band_key"], _verify_minhash_buckets, num_partitions
    )
    return keyed_exchange(cands, ["doc_id_a", "doc_id_b"], _dedup_pairs, 2)


def _minhash_band_rows_lite(batch: pa.Table) -> pd.DataFrame:
    """Band rows WITHOUT the shingle payload (scale path): only
    (doc_id, band_key) strings shuffle in the bucket exchange."""
    doc_ids, keys = [], []
    cache: dict = {}
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        sig = minhash_signature(shingle_hashes(text, cache=cache))
        for band in range(NUM_BANDS):
            doc_ids.append(doc_id)
            keys.append(band_key(sig, band))
    return pd.DataFrame({"doc_id": doc_ids, "band_key": keys})


def _band_rows_from_shingles(batch: pa.Table) -> pd.DataFrame:
    """Band rows recomputed from a persisted shingle blob table — lets
    an ingest pipeline scan the raw text ONCE (shingle handoff), then
    derive signatures from the blobs instead of re-tokenizing."""
    doc_ids, keys = [], []
    for doc_id, blob in zip(
        batch["doc_id"].to_pylist(), batch["shingles"].to_pylist()
    ):
        sig = minhash_signature(np.frombuffer(blob, dtype=np.uint64))
        for band in range(NUM_BANDS):
            doc_ids.append(doc_id)
            keys.append(band_key(sig, band))
    return pd.DataFrame({"doc_id": doc_ids, "band_key": keys})


def _shingle_table(batch: pa.Table) -> pa.Table:
    """(doc_id, shingles as one binary blob) — Arrow's hash join rejects
    list<> payload columns, and a packed u64 buffer is smaller anyway."""
    ids, shs = [], []
    cache: dict = {}
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        ids.append(doc_id)
        shs.append(shingle_hashes(text, cache=cache).tobytes())
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "shingles": pa.array(shs, pa.binary())}
    )


def _bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
    out = []
    for _, g in df.groupby("band_key", sort=False):
        if len(g) < 2:
            continue
        ids = sorted(set(g["doc_id"]))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out.append((ids[i], ids[j]))
    return pd.DataFrame(out, columns=["doc_id_a", "doc_id_b"]).astype("int64")


# broadcast the candidate id set only while 2·pairs stays under this;
# beyond it the semi-join fallback path runs (see minhash_pairs_join)
BROADCAST_ID_LIMIT = 50_000_000

# PPJoin demotion threshold: every REPEATED shingle (df ≥ 2) sorts
# after the df=1 tail, df-ascending among themselves — classic PPJoin
# global frequency order. df=1 shingles can never collide, so their
# relative order is irrelevant and they stay in cheap hash order.
# Measured at sf0.1: candidates 81,620 → 43,367 at J ≥ 4/5 and
# 290,947 → 193,033 at J ≥ 3/5 vs pure hash order, and the hottest
# shingles (the O(df²) posting-bucket scale-killer at 100TB) always
# fall out of prefixes first.
HOT_DF_MIN = 2
# global cap on the demoted hot set: bounds the per-partition partials,
# the driver merge, and the broadcast at ~1MB regardless of corpus
# size. Overflow only costs candidate-filter QUALITY (excess hot
# shingles keep hash order), never correctness — the prefix guarantee
# holds for any consistent total order.
PPJOIN_HOT_LIMIT = 65_536


def _list_parquet(path: str) -> list[str]:
    from ..state.manifest import list_parquet_files

    return list_parquet_files(path)


def minhash_pairs_join(
    docs_ds_factory,
    num_partitions: int = 8,
    broadcast_id_limit: int = BROADCAST_ID_LIMIT,
):
    """MinHash+LSH with JOIN-BASED verification — the 100TB shape.

    ``minhash_pairs`` carries each document's shingle array into all 8
    band rows (8× payload duplication through the bucket exchange);
    fine at moderate scale, wasteful at 100TB. Here the band exchange
    moves only (doc_id, band_key) strings, candidate pairs are deduped,
    and shingle sets are fetched for CANDIDATES ONLY via two
    ``Dataset.join`` hash joins against the shingle table — total
    shuffle volume is O(corpus signatures) + O(candidates × shingles)
    instead of O(corpus shingles × bands). Results are identical
    (tests + the same SQL oracle assert it)."""
    from .exchange import hash_shuffle

    import tempfile
    import uuid

    from .exchange import keyed_exchange

    # phase 1 (normal context): band exchange -> deduped candidate pairs.
    # Joins require a HASH_SHUFFLE-rooted dataset but groupbys deadlock
    # under that context, so the candidate stream crosses regimes through
    # a parquet handoff (what a cluster run would do anyway: candidates
    # are a checkpointable artifact).
    bands = docs_ds_factory().map_batches(
        _minhash_band_rows_lite, batch_format="pyarrow"
    )
    cands_out = keyed_exchange(
        keyed_exchange(bands, ["band_key"], _bucket_pairs, num_partitions),
        ["doc_id_a", "doc_id_b"],
        _dedup_pairs,
        2,
    )
    import os

    from ..state.manifest import sweep_stale_handoffs

    # The handoff must outlive this function (the returned dataset reads
    # it lazily), so it can't be deleted here. Bound the disk footprint
    # instead: TTL-sweep prior invocations' handoffs at entry — never the
    # whole base dir, which could hold a LIVE handoff of a pipeline built
    # but not yet consumed (a cluster run would keep these as resumable
    # checkpoints under the job's scratch dir and reap them with the job).
    base = os.path.join(tempfile.gettempdir(), "graft_minhash_cands")
    handoff = sweep_stale_handoffs(base)
    # strip pandas schema metadata before the write: the hash-shuffle
    # aggregators hash block schemas for dedup, and a schema whose
    # metadata carries the pandas dict logs "Failed to hash the schemas"
    # on every aggregator (benign but noisy)
    cands_out.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    ).write_parquet(handoff)

    return _fetch_verify(handoff, docs_ds_factory, num_partitions,
                         broadcast_id_limit)


def _fetch_verify(
    handoff: str,
    docs_ds_factory,
    num_partitions: int,
    broadcast_id_limit: int,
    num: int = JACCARD_NUM,
    den: int = JACCARD_DEN,
):
    """Phase 2 shared by every candidate-pair self-join (MinHash bands,
    PPJoin prefixes): fetch shingle blobs for candidate docs only, then
    exact integer Jaccard ≥ num/den. Two tiers on the handoff's footer
    pair count: broadcast routing + single-exchange verify while the
    pair list is driver-bounded (``_broadcast_verify``); distributed
    hash SEMI-join id filter + two-exchange verify (``_join_verify``)
    past ``broadcast_id_limit``."""
    from .exchange import hash_shuffle

    # Pair COUNT comes free from the handoff's parquet footers; it
    # drives both the join-partition sizing and the broadcast-vs-semi-
    # join decision (distinct candidate ids ≤ 2·pairs, so the count is
    # a safe proxy without reading any column).
    import pyarrow.parquet as _pq

    n_pairs = sum(
        _pq.ParquetFile(f).metadata.num_rows
        for f in _list_parquet(handoff)
    )
    # ~64k pair rows per partition keeps per-partition work meaningful;
    # never below 1, never above the configured ceiling.
    join_parts = max(1, min(num_partitions, (n_pairs + 65535) // 65536))

    import ray
    import ray.data as rd

    if 2 * n_pairs <= broadcast_id_limit:
        # BROADCAST path (the common case): the candidate id set —
        # bounded by pairs, orders of magnitude below corpus size — is
        # ray.put once and each shingle task filters its batch locally,
        # so only candidate docs are ever shingled or shuffled.
        cand_tbl = _pq.read_table(handoff, columns=["doc_id_a", "doc_id_b"])
        return _broadcast_verify(cand_tbl, docs_ds_factory, join_parts, num, den)

    # SEMI-JOIN fallback (the SCALE.md promise): when the id set would
    # blow the broadcast budget (~10^8 ids = 800MB per worker), the
    # candidate filter becomes a distributed hash SEMI-join instead of a
    # driver-held set — the ids never materialize in one process. The
    # distinct-id table is derived with a doc_id-keyed exchange (normal
    # context) into a handoff, then docs inner-join it (hash context)
    # BEFORE shingling, so still only candidate docs are shingled; the
    # price vs broadcast is one extra shuffle of the candidate docs'
    # raw text.
    from .exchange import keyed_exchange

    ids_dir = handoff + "_ids"

    def _stack_ids(t: pa.Table) -> pa.Table:
        ids = np.concatenate(
            [
                t["doc_id_a"].to_numpy(zero_copy_only=False),
                t["doc_id_b"].to_numpy(zero_copy_only=False),
            ]
        )
        return pa.table({"doc_id": pa.array(np.unique(ids), pa.int64())})

    keyed_exchange(
        rd.read_parquet(handoff).map_batches(_stack_ids, batch_format="pyarrow"),
        ["doc_id"],
        lambda df: df.drop_duplicates(),
        max(2, join_parts),
    ).map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    ).write_parquet(ids_dir)

    # the SEMI-join itself still rides Ray's hash-join backend; its
    # (candidate-bounded) shingle output crosses back to the normal
    # context through a parquet handoff — datasets rooted under
    # HASH_SHUFFLE must never feed the groupby-based exchange (the
    # documented deadlock), and the handoff doubles as a resumable
    # checkpoint exactly like the candidate-pair one.
    sh_dir = handoff + "_sh"
    with hash_shuffle():
        ids_ds = rd.read_parquet(ids_dir)
        docs = docs_ds_factory()
        cand_docs = docs.join(
            ids_ds, join_type="inner", num_partitions=max(2, join_parts),
            on=("doc_id",),
        )
        cand_docs.map_batches(_shingle_table, batch_format="pyarrow").map_batches(
            lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
        ).write_parquet(sh_dir)
    cands = rd.read_parquet(handoff)
    sh = rd.read_parquet(sh_dir)
    return _join_verify(cands, sh, join_parts, num, den)


def ppjoin_pairs(
    docs_ds_factory,
    num_partitions: int = 8,
    num: int = JACCARD_NUM,
    den: int = JACCARD_DEN,
    broadcast_id_limit: int = BROADCAST_ID_LIMIT,
):
    """EXACT set-similarity self-join at Jaccard ≥ num/den via PREFIX
    FILTERING (the SSJoin/PPJoin family, Chaudhuri et al. ICDE'06 /
    Xiao et al. WWW'08) — the deterministic complement to the
    probabilistic MinHash path, and the scale-correct replacement for
    the blocked all-pairs baseline (``jaccard_pairs``).

    Canonical token order = DOCUMENT-FREQUENCY ASCENDING (the PPJoin
    papers' candidate-minimizing order): df=1 shingles first in hash
    order (they can never collide, so their order is irrelevant), then
    every repeated shingle df-ascending — so the hottest shingles, the
    ones that would open O(df²) posting buckets at 100TB, fall out of
    every prefix first. Any fixed total order preserves the prefix
    guarantee — two sets with J ≥ t share a token among each one's
    first ``|d| - ceil(t·|d|) + 1`` tokens — so order only moves
    candidate volume (measured at sf0.1: 1.5-1.9× fewer candidates
    than hash order, see HOT_DF_MIN).
    The frequency pass stays bounded at any corpus size: one
    shingle-keyed exchange computes exact global df, each partition
    keeps only its df ≥ HOT_DF_MIN rows truncated to its share of
    ``PPJOIN_HOT_LIMIT``, and the driver merges those bounded partials
    into a global hot set broadcast as (sorted hashes, df-asc ranks) —
    never a vocab-scale driver stream; overflow beyond the limit
    degrades ORDER QUALITY (a few hot shingles keep hash order), never
    correctness. Shape: df pass → prefix rows (hash, doc, size) →
    hash-keyed exchange emits candidate pairs with the integer length
    filter (den·min ≥ num·max) → pair dedup → handoff → the SAME
    two-tier candidate fetch + exact-Jaccard verify as
    minhash_pairs_join (``_fetch_verify``). Output identical
    schema/semantics: (doc_id_a, doc_id_b, n_common, n_union), a < b."""
    import os
    import tempfile

    import ray

    from ..state.manifest import sweep_stale_handoffs
    from .exchange import keyed_exchange

    # -- pass 0: bounded global df table for the repeated shingles --
    def df_partial(batch: pa.Table) -> pd.DataFrame:
        c: dict = {}
        cache: dict = {}
        for text in batch["text"].to_pylist():
            for h in shingle_hashes(text, cache=cache).view(np.int64).tolist():
                c[h] = c.get(h, 0) + 1
        return pd.DataFrame(
            {"h": np.fromiter(c.keys(), np.int64, len(c)),
             "n": np.fromiter(c.values(), np.int64, len(c))}
        )

    # per-partition share of the hot budget: the driver merge then
    # receives ≤ PPJOIN_HOT_LIMIT rows TOTAL at any partition count
    # (the union of per-partition heads is a deterministic hot set —
    # not exactly the global top-F, which only affects order quality)
    per_part = max(1, PPJOIN_HOT_LIMIT // max(1, num_partitions))

    def hot_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("h", sort=False, as_index=False)["n"].sum()
        g = g[g["n"] >= HOT_DF_MIN]
        return g.sort_values(["n", "h"], ascending=[False, True]).head(per_part)

    hot = keyed_exchange(
        docs_ds_factory().map_batches(df_partial, batch_format="pyarrow"),
        ["h"], hot_partial, num_partitions,
    ).to_pandas()
    if len(hot):
        hot = hot.sort_values(["n", "h"], ascending=[False, True]).head(
            PPJOIN_HOT_LIMIT
        )
        # rank = df-ASC position (hottest shingle gets the largest
        # rank, i.e. sorts last); lookup arrays aligned on hash order
        hot = hot.sort_values(["n", "h"], ascending=[True, True]).reset_index(
            drop=True
        )
        hot["rank"] = np.arange(len(hot), dtype=np.int64)
        hot = hot.sort_values("h", ignore_index=True)
        hot_ref = ray.put(
            (hot["h"].to_numpy(np.int64), hot["rank"].to_numpy(np.int64))
        )
    else:
        hot_ref = ray.put((np.empty(0, np.int64), np.empty(0, np.int64)))

    def prefix_rows(batch: pa.Table) -> pd.DataFrame:
        from ..state.broadcast import resolve

        hot_sorted, hot_rank = resolve(hot_ref)
        hs, ids, sizes = [], [], []
        cache: dict = {}
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            hv = shingle_hashes(text, cache=cache).view(np.int64)
            n = len(hv)
            if n == 0:
                continue
            p = n - (num * n + den - 1) // den + 1  # n - ceil(t·n) + 1
            if len(hot_sorted):
                pos = np.searchsorted(hot_sorted, hv)
                pos_c = np.minimum(pos, len(hot_sorted) - 1)
                is_hot = hot_sorted[pos_c] == hv
                cold = hv[~is_hot]  # already hash-ascending
                hotv = hv[is_hot]
                ordered = np.concatenate(
                    [cold, hotv[np.argsort(hot_rank[pos_c[is_hot]],
                                           kind="stable")]]
                )
            else:
                ordered = hv
            hs.append(ordered[:p])
            ids.append(np.full(p, doc_id, dtype=np.int64))
            sizes.append(np.full(p, n, dtype=np.int64))
        if not hs:
            return pd.DataFrame(
                {"h": np.empty(0, np.int64), "doc_id": np.empty(0, np.int64),
                 "size": np.empty(0, np.int64)}
            )
        return pd.DataFrame(
            {"h": np.concatenate(hs), "doc_id": np.concatenate(ids),
             "size": np.concatenate(sizes)}
        )

    def posting_pairs(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="h")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        lo = np.minimum(m["size_x"], m["size_y"])
        hi = np.maximum(m["size_x"], m["size_y"])
        m = m[den * lo >= num * hi]  # length filter: J ≥ t ⇒ t·max ≤ min
        return pd.DataFrame(
            {"doc_id_a": m["doc_id_x"].astype("int64"),
             "doc_id_b": m["doc_id_y"].astype("int64")}
        ).drop_duplicates()

    prefixes = docs_ds_factory().map_batches(prefix_rows, batch_format="pyarrow")
    cands_out = keyed_exchange(
        keyed_exchange(prefixes, ["h"], posting_pairs, num_partitions),
        ["doc_id_a", "doc_id_b"],
        _dedup_pairs,
        2,
    )
    handoff = sweep_stale_handoffs(
        os.path.join(tempfile.gettempdir(), "graft_ppjoin_cands")
    )
    cands_out.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    ).write_parquet(handoff)
    return _fetch_verify(
        handoff, docs_ds_factory, num_partitions, broadcast_id_limit,
        num=num, den=den,
    )


def _broadcast_verify(cand_tbl, docs_ds_factory, num_partitions: int,
                      num: int = JACCARD_NUM, den: int = JACCARD_DEN):
    """Broadcast-tier verify in ONE doc-scan + ONE exchange: the pair
    list is already driver-resident (it supplied the candidate-id
    broadcast), so each pair is assigned a deterministic verify
    partition, the doc→partitions routing map rides the same ``ray.put``
    broadcast, and the shingle pass emits each candidate doc's blob
    directly to every partition holding one of its pairs. The pair-keyed
    second exchange of ``_join_verify`` disappears; volume is
    |candidate shingle blobs| × (pairs-per-doc partition fan-out,
    ~1 in practice)."""
    import ray
    import ray.data as rd

    a = cand_tbl["doc_id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = cand_tbl["doc_id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(a) == 0:
        return rd.from_pandas(_PAIR_EMPTY.copy())
    P = max(1, num_partitions)
    pid = ((a * np.int64(1_000_003) + b) % P).astype(np.int64)
    # doc -> sorted unique (doc, pid) routing arrays (binary-searchable)
    ids2 = np.concatenate([a, b])
    pid2 = np.concatenate([pid, pid])
    order = np.lexsort((pid2, ids2))
    ids_s, pid_s = ids2[order], pid2[order]
    keep = np.ones(len(ids_s), dtype=bool)
    keep[1:] = (ids_s[1:] != ids_s[:-1]) | (pid_s[1:] != pid_s[:-1])
    route_ref = ray.put((ids_s[keep], pid_s[keep], a, b, pid))

    def emit(batch: pa.Table) -> pd.DataFrame:
        from ..state.broadcast import resolve

        r_ids, r_pids, _a, _b, _pid = resolve(route_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = np.isin(ids, r_ids)
        sh = _shingle_table(batch.filter(pa.array(mask)))
        out_pid, out_doc, out_blob = [], [], []
        for doc_id, blob in zip(sh["doc_id"].to_pylist(), sh["shingles"].to_pylist()):
            lo = np.searchsorted(r_ids, doc_id, side="left")
            hi = np.searchsorted(r_ids, doc_id, side="right")
            for p in r_pids[lo:hi]:
                out_pid.append(int(p))
                out_doc.append(doc_id)
                out_blob.append(blob)
        return pd.DataFrame(
            {"pid": pd.array(out_pid, dtype="int64"),
             "doc_id": pd.array(out_doc, dtype="int64"),
             "blob": out_blob}
        )

    def verify_part(df: pd.DataFrame) -> pd.DataFrame:
        from ..state.broadcast import resolve

        _r_ids, _r_pids, a_, b_, pid_ = resolve(route_ref)
        # blobs decode once per (pid, doc) — a doc in many pairs reuses
        # its sorted-u64 array; intersections run as C-level merges on
        # the already-sorted shingle arrays, not Python set ops
        blobs = {
            (int(p), int(d)): np.frombuffer(bl, dtype=np.uint64)
            for p, d, bl in zip(df["pid"], df["doc_id"], df["blob"])
        }
        here = np.isin(pid_, df["pid"].unique())
        out = []
        for pa_, pb_, pp_ in zip(a_[here], b_[here], pid_[here]):
            xa = blobs.get((int(pp_), int(pa_)))
            xb = blobs.get((int(pp_), int(pb_)))
            if xa is None or xb is None:
                continue
            inter = np.intersect1d(xa, xb, assume_unique=True).size
            union = xa.size + xb.size - inter
            if union and den * inter >= num * union:
                out.append((pa_, pb_, inter, union))
        if not out:
            return _PAIR_EMPTY.copy()
        return pd.DataFrame(
            out, columns=["doc_id_a", "doc_id_b", "n_common", "n_union"]
        ).astype("int64")

    from .exchange import keyed_exchange

    rows = docs_ds_factory().map_batches(emit, batch_format="pyarrow")
    return keyed_exchange(rows, ["pid"], verify_part, P)


_PAIR_EMPTY = pd.DataFrame(
    {
        "doc_id_a": pd.Series(dtype="int64"),
        "doc_id_b": pd.Series(dtype="int64"),
        "n_common": pd.Series(dtype="int64"),
        "n_union": pd.Series(dtype="int64"),
    }
)


def _join_verify(cands, sh, num_partitions: int,
                 num: int = JACCARD_NUM, den: int = JACCARD_DEN):
    """Attach packed shingle blobs to candidate pairs and keep pairs
    passing the exact integer Jaccard ≥ num/den.

    Shape: two ``keyed_exchange`` passes instead of two Arrow hash
    joins (the exchange is this engine's proven fast path; it also
    frees the callers from the process-global ``hash_shuffle`` context
    and its serialized construction window). Each pair row is shipped
    to BOTH endpoints' doc-keyed partitions alongside the shingle rows
    (side 0 = a-endpoint copy, side 1 = b-endpoint copy), so the
    shingle stream is consumed exactly ONCE with no mid-pipeline
    materialize; the second, pair-keyed exchange zips the two
    half-pairs (each carrying one endpoint's blob) and verifies.
    Shuffle volume: 2·|pairs| skinny rows + |candidate shingles| once,
    then |pairs| rows carrying two blobs — same O() as the join
    formulation, lower constant."""
    parts = max(2, num_partitions)

    def tag_pairs(t: pa.Table) -> pd.DataFrame:
        a = t["doc_id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["doc_id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame(
            {
                "k": np.concatenate([a, b]),
                "doc_id_a": np.concatenate([a, a]),
                "doc_id_b": np.concatenate([b, b]),
                "side": np.concatenate(
                    [np.zeros(len(a), np.int64), np.ones(len(b), np.int64)]
                ),
                "blob": [None] * (2 * len(a)),
            }
        )

    def tag_shingles(t: pa.Table) -> pd.DataFrame:
        n = t.num_rows
        return pd.DataFrame(
            {
                "k": t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                "doc_id_a": np.full(n, -1, np.int64),
                "doc_id_b": np.full(n, -1, np.int64),
                "side": np.full(n, -1, np.int64),
                "blob": t["shingles"].to_pylist(),
            }
        )

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        is_sh = df["side"] == -1
        pr = df[~is_sh]
        if not len(pr):
            return pd.DataFrame(
                {
                    "doc_id_a": pd.Series(dtype="int64"),
                    "doc_id_b": pd.Series(dtype="int64"),
                    "side": pd.Series(dtype="int64"),
                    "blob": pd.Series(dtype="object"),
                }
            )
        m = pr.drop(columns=["blob"]).merge(
            df.loc[is_sh, ["k", "blob"]], on="k", how="inner"
        )
        return m[["doc_id_a", "doc_id_b", "side", "blob"]]

    def zip_verify(df: pd.DataFrame) -> pd.DataFrame:
        a_side = df[df["side"] == 0]
        b_side = df[df["side"] == 1]
        m = a_side.merge(
            b_side, on=["doc_id_a", "doc_id_b"], suffixes=("_a", "_b")
        )
        out = []
        dec: dict = {}

        def arr(bl):
            v = dec.get(id(bl))
            if v is None:
                v = np.frombuffer(bl, dtype=np.uint64)
                dec[id(bl)] = v
            return v

        for a, b, sa, sb in zip(
            m["doc_id_a"], m["doc_id_b"], m["blob_a"], m["blob_b"]
        ):
            xa = arr(sa)
            xb = arr(sb)
            inter = np.intersect1d(xa, xb, assume_unique=True).size
            union = xa.size + xb.size - inter
            if union and den * inter >= num * union:
                out.append((a, b, inter, union))
        if not out:
            return _PAIR_EMPTY.copy()
        return pd.DataFrame(
            out, columns=["doc_id_a", "doc_id_b", "n_common", "n_union"]
        ).astype("int64")

    from .exchange import keyed_exchange

    tagged = cands.map_batches(tag_pairs, batch_format="pyarrow").union(
        sh.map_batches(tag_shingles, batch_format="pyarrow")
    )
    halves = keyed_exchange(tagged, ["k"], attach, parts)
    return keyed_exchange(halves, ["doc_id_a", "doc_id_b"], zip_verify, parts)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash_rows(batch: pa.Table) -> pd.DataFrame:
    doc_ids, chunk_keys, hashes = [], [], []
    cache: dict = {}
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        ws = WORD_RE.findall(text.lower())
        if not ws:  # wordless docs carry no signal (SQL oracle drops them too)
            continue
        h = simhash64_md5(ws, cache=cache)
        for c in range(SIMHASH_CHUNKS):
            chunk = (h >> (16 * c)) & 0xFFFF
            doc_ids.append(doc_id)
            chunk_keys.append(f"{c}:{chunk}")
            hashes.append(np.uint64(h).astype(np.int64))  # int64 bit view for Arrow
    return pd.DataFrame(
        {"doc_id": doc_ids, "chunk_key": chunk_keys, "simhash": hashes}
    ).astype({"simhash": "int64"})


def _verify_simhash_buckets(df: pd.DataFrame) -> pd.DataFrame:
    out = []
    for _, g in df.groupby("chunk_key", sort=False):
        if len(g) < 2:
            continue
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy(dtype=np.int64).view(np.uint64)
        for i in range(len(ids)):
            x = hs[i] ^ hs[i + 1 :]
            # vectorized popcount (numpy<2 has no bitwise_count)
            ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
            for off in np.nonzero(ham <= SIMHASH_MAX_HAMMING)[0]:
                j = i + 1 + off
                if ids[i] != ids[j]:
                    out.append((ids[i], ids[j], int(ham[off])))
    return pd.DataFrame(out, columns=["doc_id_a", "doc_id_b", "hamming"]).astype(
        {"doc_id_a": "int64", "doc_id_b": "int64", "hamming": "int64"}
    )


def simhash_pairs(docs_ds_factory, num_partitions: int = 8):
    """documents → (doc_id_a, doc_id_b, hamming ≤ 3) near-dup pairs.
    Factory arg: see minhash_pairs."""
    from .exchange import keyed_exchange

    rows = docs_ds_factory().map_batches(_simhash_rows, batch_format="pyarrow")
    cands = keyed_exchange(
        rows, ["chunk_key"], _verify_simhash_buckets, num_partitions
    )
    return keyed_exchange(
        cands,
        ["doc_id_a", "doc_id_b"],
        lambda df: df.drop_duplicates(subset=["doc_id_a", "doc_id_b"]),
        2,
    )


# ---------------------------------------------------------------------------
# Blocked exact n-gram Jaccard
# ---------------------------------------------------------------------------

JACCARD_BLOCK_NUM, JACCARD_BLOCK_DEN = 3, 5  # J >= 0.6 within blocks


def _block_jaccard(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values("doc_id")
    ids = g["doc_id"].to_numpy()
    cache: dict = {}
    sets = [set(shingle_hashes(t, cache=cache)) for t in g["text"]]
    out = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = len(sets[i] & sets[j])
            if not inter:
                continue
            union = len(sets[i]) + len(sets[j]) - inter
            if JACCARD_BLOCK_DEN * inter >= JACCARD_BLOCK_NUM * union:
                out.append((ids[i], ids[j], inter, union))
    return pd.DataFrame(
        out, columns=["doc_id_a", "doc_id_b", "n_common", "n_union"]
    ).astype({"doc_id_a": "int64", "doc_id_b": "int64", "n_common": "int64", "n_union": "int64"})


def jaccard_pairs(docs_ds):
    """Exact all-pairs n-gram Jaccard within each ``source`` block —
    groupby(source).map_groups; block count is small, blocks are fat,
    so the per-group path is fine here (unlike the LSH bucket keys)."""
    return docs_ds.groupby("source").map_groups(
        _block_jaccard, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Near-dup cluster canonicalization (pairs -> connected components)
# ---------------------------------------------------------------------------

# Doc ids ride the string-typed bipartite components machinery as
# zero-padded fixed-width strings (string min == int min at fixed
# width); each near-dup pair contributes one bipartite "alias" node.
_CLUSTER_PAD = 12


def pairs_components(
    pairs_ds, col_a: str, col_b: str, rounds: int = 8, num_partitions: int = 8
):
    """Generic near-dup pair graph → (node_id, cluster_rep =
    component-min id) via ``connected_components_ds`` (keyed-exchange
    min-label propagation; adaptive driver path when the pair graph is
    broadcast-small). Shared by the MinHash and embedding-cosine
    cluster paths — any (int64 a, int64 b) pair Dataset works."""
    from .canonicalize import connected_components_ds

    def to_bipartite(df: pd.DataFrame) -> pd.DataFrame:
        a = df[col_a].astype("int64")
        b = df[col_b].astype("int64")
        key = "p" + a.astype(str) + ":" + b.astype(str)
        return pd.DataFrame(
            {
                "cui": pd.concat(
                    [a.astype(str).str.zfill(_CLUSTER_PAD),
                     b.astype(str).str.zfill(_CLUSTER_PAD)],
                    ignore_index=True,
                ),
                "alias_key": pd.concat([key, key], ignore_index=True),
            }
        )

    bip = pairs_ds.map_batches(to_bipartite, batch_format="pandas")
    comp = connected_components_ds(bip, rounds=rounds, num_partitions=num_partitions)

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node_id": df["cui"].astype("int64"),
                "cluster_rep": df["label"].astype("int64"),
            }
        )

    return comp.map_batches(decode, batch_format="pandas")


def minhash_clusters(docs_ds_factory, rounds: int = 8, num_partitions: int = 8):
    """documents → (doc_id, cluster_rep) for every doc in a near-dup
    cluster, cluster_rep = component-min doc_id."""
    pairs = minhash_pairs(docs_ds_factory, num_partitions)
    comp = pairs_components(
        pairs, "doc_id_a", "doc_id_b", rounds=rounds, num_partitions=num_partitions
    )
    return comp.map_batches(
        lambda df: df.rename(columns={"node_id": "doc_id"}), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Incremental dedup against a persisted LSH index (ingest-time shape)
# ---------------------------------------------------------------------------

# Band rows in the persisted index are hive-partitioned by a stable hash
# bucket of the band key, so an ingest batch only READS the buckets its
# own band keys touch — the corpus index is never re-shuffled per ingest.
INDEX_BAND_BUCKETS = 32
# stamp written at index build, checked at ingest: a layout change (like
# the v1→v2 bucket-hash switch below) must invalidate persisted indexes
# rather than silently read the wrong buckets
INDEX_LAYOUT_VERSION = "lsh-index-v2-md5buckets"


def _with_band_bucket(df: pd.DataFrame) -> pd.DataFrame:
    # band_bucket must be ENVIRONMENT-INDEPENDENT: the index is a
    # persisted artifact ingested by later runs, so the bucket hash has
    # to be the repo's stable_u64_md5 standard — pd.util.hash_pandas_object
    # (used for in-run exchange pids only) varies with pandas
    # version/hash key and would silently probe the wrong buckets.
    h = np.fromiter(
        (stable_u64_md5(k.encode("utf-8")) for k in df["band_key"]),
        dtype=np.uint64,
        count=len(df),
    )
    return df.assign(
        band_bucket=(h % np.uint64(INDEX_BAND_BUCKETS)).astype("int64")
    )


def build_minhash_index(docs_ds_factory, index_dir: str) -> dict:
    """Persist the corpus LSH index for incremental ingest-time dedup.

    Two artifacts, laid out for the INGEST-TIME read pattern:
    - ``bands/``    — (doc_id, band_key) hive-partitioned by
      ``band_bucket = stable_hash(band_key) % INDEX_BAND_BUCKETS``, with
      one band-bucket exchange before the write so each bucket is ONE
      contiguous file (a naive partitioned write of B blocks × K buckets
      sprays B·K tiny files — measured 2048 files at sf0.1, and every
      ingest paid the per-file open cost to read its touched buckets);
    - ``shingles/`` — (doc_id, packed u64 shingle blob) for exact
      candidate verification, SORTED by doc_id into a few files so the
      pushed-down ``doc_id`` row filter prunes whole files/row-groups
      at 100TB.

    Index build costs one corpus scan + one band exchange + one shingle
    sort — a one-off; every subsequent ingest reads only touched
    buckets and candidate row groups. Extends the batch dedup family
    (reference exact-dedup shape, SURVEY.md §2.7) with the corpus-
    maintenance story a training-data pipeline needs: new crawl slices
    are deduped against the standing corpus without re-processing it."""
    import os

    from .exchange import keyed_exchange

    bands_dir = os.path.join(index_dir, "bands")
    sh_dir = os.path.join(index_dir, "shingles")
    os.makedirs(bands_dir, exist_ok=True)
    os.makedirs(sh_dir, exist_ok=True)
    band_rows = (
        docs_ds_factory()
        .map_batches(_minhash_band_rows_lite, batch_format="pyarrow")
        .map_batches(_with_band_bucket, batch_format="pandas")
    )
    (
        # co-locate each band_bucket in one partition (pid is a pure
        # function of the bucket) -> exactly one file per bucket
        keyed_exchange(band_rows, ["band_bucket"], lambda df: df,
                       INDEX_BAND_BUCKETS)
        # strip pandas schema metadata: hash-shuffle aggregators can't
        # hash dict-bearing schemas and log noise on every block
        .map_batches(lambda t: t.replace_schema_metadata(None), batch_format="pyarrow")
        .write_parquet(bands_dir, partition_cols=["band_bucket"])
    )
    (
        docs_ds_factory()
        .map_batches(_shingle_table, batch_format="pyarrow")
        .sort("doc_id")
        .repartition(8)
        .write_parquet(sh_dir)
    )
    with open(os.path.join(index_dir, "_LAYOUT_VERSION"), "w") as f:
        f.write(INDEX_LAYOUT_VERSION)
    return {"bands": bands_dir, "shingles": sh_dir}


def check_index_layout(index: dict) -> None:
    """Refuse to ingest against an index written under a different
    bucket-layout version — a mismatched bucket hash would silently
    probe the wrong hive buckets and DROP duplicate pairs."""
    import os

    vpath = os.path.join(os.path.dirname(index["bands"]), "_LAYOUT_VERSION")
    try:
        with open(vpath) as f:
            ver = f.read().strip()
    except OSError:
        ver = "<missing>"
    if ver != INDEX_LAYOUT_VERSION:
        raise ValueError(
            f"LSH index layout {ver!r} != engine {INDEX_LAYOUT_VERSION!r}; "
            "rebuild the index (build_minhash_index)"
        )


def _flagged_bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs within each band bucket where at least one side
    is from the ingest batch (old–old pairs were settled when the index
    was built). Flags ride along so phase 2 knows which side's shingles
    live in the index store vs the ingest batch."""
    out = []
    for _, g in df.groupby("band_key", sort=False):
        if len(g) < 2:
            continue
        g = g.drop_duplicates(subset=["doc_id"]).sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        new = g["is_new"].to_numpy()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if new[i] or new[j]:
                    out.append((ids[i], ids[j], new[i], new[j]))
    return pd.DataFrame(
        out, columns=["doc_id_a", "doc_id_b", "new_a", "new_b"]
    ).astype("int64")


def incremental_minhash_pairs(
    new_docs_factory, index: dict, num_partitions: int = 8
):
    """Dedup an ingest batch against a persisted corpus index built by
    ``build_minhash_index`` — without re-shuffling the corpus.

    Emits the same (doc_id_a, doc_id_b, n_common, n_union) rows as the
    batch paths, restricted to pairs with ≥1 ingest-side doc (new–new
    and new–old; old–old already handled at index build time).

    Shape per ingest batch (N = batch docs, C = LSH candidates):
    - phase 1 streams the batch once, writing its band rows + shingle
      blobs as a handoff artifact (the resumable ingest checkpoint);
      the driver learns only the ≤``INDEX_BAND_BUCKETS`` touched bucket
      ids (a bounded aggregate, not O(N));
    - index band rows are read ONLY from touched hive buckets, flagged,
      unioned with the batch's band rows, and exchanged on band_key —
      shuffle volume is O(N·bands + touched index band rows), never the
      corpus text;
    - phase 2 fetches shingles for the C candidates: old sides via a
      pushed-down ``doc_id IN (...)`` parquet filter on the index store
      (the driver holds C int64 ids, never payloads), new sides from
      the batch handoff; verification reuses the hash-join + exact-
      Jaccard path of ``minhash_pairs_join``."""
    import os
    import tempfile

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..state.manifest import sweep_stale_handoffs
    from .exchange import keyed_exchange

    check_index_layout(index)
    base = os.path.join(tempfile.gettempdir(), "graft_minhash_incr")
    work = sweep_stale_handoffs(base)  # TTL sweep — never the live siblings
    nb_dir = os.path.join(work, "new_bands")
    ns_dir = os.path.join(work, "new_shingles")
    cands_dir = os.path.join(work, "cands")
    for d in (nb_dir, ns_dir, cands_dir):
        os.makedirs(d, exist_ok=True)

    # phase 1a: the raw ingest text is scanned ONCE, into the shingle
    # handoff (coalesced to a few files — it's re-read twice below);
    # band rows are then derived from the blobs, not a second text scan.
    (
        new_docs_factory()
        .map_batches(_shingle_table, batch_format="pyarrow")
        .repartition(4)
        .write_parquet(ns_dir)
    )
    (
        rd.read_parquet(ns_dir)
        .map_batches(_band_rows_from_shingles, batch_format="pyarrow")
        .map_batches(_with_band_bucket, batch_format="pandas")
        .map_batches(lambda t: t.replace_schema_metadata(None), batch_format="pyarrow")
        .write_parquet(nb_dir)
    )

    def _empty_pairs():
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id_a": pa.array([], pa.int64()),
                    "doc_id_b": pa.array([], pa.int64()),
                    "n_common": pa.array([], pa.int64()),
                    "n_union": pa.array([], pa.int64()),
                }
            )
        )

    def _has_files(d):
        return any(f.endswith(".parquet") for f in os.listdir(d))

    if not _has_files(nb_dir):  # empty ingest batch
        return _empty_pairs()

    # touched buckets: bounded by INDEX_BAND_BUCKETS regardless of batch
    # size — a column scan of the handoff, never the batch text.
    touched = sorted(
        pq.read_table(nb_dir, columns=["band_bucket"])
        .column("band_bucket")
        .unique()
        .to_pylist()
    )
    # read_parquet takes a LIST of files (dirs only as a single path) —
    # enumerate the touched buckets' files explicitly.
    idx_paths = []
    for b in touched:
        d = os.path.join(index["bands"], f"band_bucket={b}")
        if os.path.isdir(d):
            idx_paths.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )

    # phase 1b: flagged band-key exchange over (pruned index ∪ batch)
    # -> candidate pairs with >=1 new side -> pair dedup -> handoff.
    new_bands = rd.read_parquet(nb_dir, columns=["doc_id", "band_key"]).add_column(
        "is_new", lambda t: pa.array([1] * t.num_rows, pa.int64()), batch_format="pyarrow"
    )
    if idx_paths:
        idx_bands = rd.read_parquet(
            idx_paths, columns=["doc_id", "band_key"]
        ).add_column(
            "is_new", lambda t: pa.array([0] * t.num_rows, pa.int64()), batch_format="pyarrow"
        )
        bands = idx_bands.union(new_bands)
    else:
        bands = new_bands
    cands = keyed_exchange(
        keyed_exchange(bands, ["band_key"], _flagged_bucket_pairs, num_partitions),
        ["doc_id_a", "doc_id_b"],
        _dedup_pairs,
        2,
    )
    cands.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    ).write_parquet(cands_dir)

    # candidate old-side ids: bounded by the candidate count (ints only,
    # no payloads) — drives the pushed-down index-store read below.
    import pyarrow.compute as pc

    if not _has_files(cands_dir):  # no LSH candidates at all
        return _empty_pairs()
    ct = pq.read_table(cands_dir, columns=["doc_id_a", "doc_id_b", "new_a", "new_b"])
    if ct.num_rows == 0:
        return _empty_pairs()
    old_a = ct.filter(pc.equal(ct.column("new_a"), 0)).column("doc_id_a")
    old_b = ct.filter(pc.equal(ct.column("new_b"), 0)).column("doc_id_b")
    old_ids = sorted(set(old_a.to_pylist()) | set(old_b.to_pylist()))

    # phase 2: shingle fetch via the shared exchange-based verify.
    # NO hash_shuffle scope here — _join_verify is keyed_exchange
    # (groupby) based now, and a groupby built under a HASH-rooted
    # dataset deadlocks (the documented exchange.py constraint).
    cands_ds = rd.read_parquet(
        cands_dir, columns=["doc_id_a", "doc_id_b"]
    )
    sh_new = rd.read_parquet(ns_dir)
    if old_ids:
        sh_old = rd.read_parquet(
            index["shingles"],
            filter=pads.field("doc_id").isin(old_ids),
        )
        sh = sh_old.union(sh_new)
    else:
        sh = sh_new
    return _join_verify(cands_ds, sh, num_partitions)
