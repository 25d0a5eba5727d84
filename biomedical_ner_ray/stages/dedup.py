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


def shingle_hashes(text: str, n: int = SHINGLE_N) -> np.ndarray:
    """Distinct word n-gram shingles → sorted md5-u64 hashes (sorted so
    the array is deterministic; jaccard/minhash are set ops anyway)."""
    ws = WORD_RE.findall(text.lower())
    if not ws:
        return np.empty(0, dtype=np.uint64)
    if len(ws) < n:
        sh = {" ".join(ws)}
    else:
        sh = {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}
    hv = np.fromiter(
        (stable_u64_md5(s.encode("utf-8")) for s in sh), dtype=np.uint64, count=len(sh)
    )
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
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        hv = shingle_hashes(text)
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
    Dataset — the read must be constructed INSIDE the hash_shuffle scope
    because a Dataset captures its DataContext at root creation."""
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
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        sig = minhash_signature(shingle_hashes(text))
        for band in range(NUM_BANDS):
            doc_ids.append(doc_id)
            keys.append(band_key(sig, band))
    return pd.DataFrame({"doc_id": doc_ids, "band_key": keys})


def _shingle_table(batch: pa.Table) -> pa.Table:
    """(doc_id, shingles as one binary blob) — Arrow's hash join rejects
    list<> payload columns, and a packed u64 buffer is smaller anyway."""
    ids, shs = [], []
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        ids.append(doc_id)
        shs.append(shingle_hashes(text).tobytes())
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


def minhash_pairs_join(docs_ds_factory, num_partitions: int = 8):
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
    import shutil

    # The handoff must outlive this function (the returned dataset reads
    # it lazily), so it can't be deleted here. Bound the disk footprint
    # instead: sweep prior invocations' handoffs at entry (bench/driver
    # run queries serially; a cluster run would keep these as resumable
    # checkpoints under the job's scratch dir and reap them with the job).
    base = os.path.join(tempfile.gettempdir(), "graft_minhash_cands")
    shutil.rmtree(base, ignore_errors=True)
    handoff = os.path.join(base, uuid.uuid4().hex)
    # strip pandas schema metadata before the write: the hash-shuffle
    # aggregators hash block schemas for dedup, and a schema whose
    # metadata carries the pandas dict logs "Failed to hash the schemas"
    # on every aggregator (benign but noisy)
    cands_out.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    ).write_parquet(handoff)

    # phase 2 (hash context): shingle fetch for candidates via two joins
    import ray.data as rd

    with hash_shuffle():
        cands = rd.read_parquet(handoff)
        docs = docs_ds_factory()
        sh = docs.map_batches(_shingle_table, batch_format="pyarrow")
        j1 = cands.join(
            sh, join_type="inner", num_partitions=num_partitions,
            on=("doc_id_a",), right_on=("doc_id",),
        )
        j2 = j1.join(
            sh, join_type="inner", num_partitions=num_partitions,
            on=("doc_id_b",), right_on=("doc_id",),
            left_suffix="_a", right_suffix="_b",
        )

        def verify(df: pd.DataFrame) -> pd.DataFrame:
            out = []
            for a, b, sa, sb in zip(
                df["doc_id_a"], df["doc_id_b"], df["shingles_a"], df["shingles_b"]
            ):
                xa = set(np.frombuffer(sa, dtype=np.uint64).tolist())
                xb = set(np.frombuffer(sb, dtype=np.uint64).tolist())
                inter = len(xa & xb)
                union = len(xa) + len(xb) - inter
                if union and JACCARD_DEN * inter >= JACCARD_NUM * union:
                    out.append((a, b, inter, union))
            return pd.DataFrame(
                out, columns=["doc_id_a", "doc_id_b", "n_common", "n_union"]
            ).astype("int64")

        return j2.map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash_rows(batch: pa.Table) -> pd.DataFrame:
    doc_ids, chunk_keys, hashes = [], [], []
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        ws = WORD_RE.findall(text.lower())
        if not ws:  # wordless docs carry no signal (SQL oracle drops them too)
            continue
        h = simhash64_md5(ws)
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
    sets = [set(shingle_hashes(t)) for t in g["text"]]
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
