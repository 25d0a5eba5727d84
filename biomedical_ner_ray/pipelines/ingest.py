"""Micro-batch streaming-ingest loop — the composition of the engine's
three incremental primitives into one corpus-maintenance driver:

    delta transcripts
      → incremental near-dup against the PERSISTED LSH index
        (stages/dedup.incremental_minhash_pairs; within-delta pairs via
        minhash_pairs_join on the bootstrap delta)
      → annotate survivors (stages/annotate, broadcast alias dict)
      → weighted-edge delta → touched-bucket KG edge upsert
        (the kg_update_edges mechanics, writing back to the store)
      → deterministic turn vectors → touched-part vector-store upsert
        (the emb_ivf_upsert mechanics: only touched hive parts are
        read; untouched parts carry over without a data read)
      → LSH index append (survivor band rows + shingle blobs)

Store layout — CRASH-SAFE VERSIONED GENERATIONS: every delta builds
``gen<k+1>/`` next to the live ``gen<k>/``; untouched hive bucket/part
files are HARDLINKED (O(#files) metadata ops, zero data copy), touched
buckets are rewritten merged, and the store manifest (``store.json``)
flips to the new generation with one fsynced atomic rename. A crash
mid-build leaves ``gen<k>`` intact and the orphan ``gen<k+1>`` is
rebuilt from scratch on the next ingest; re-submitting an
already-applied delta is a fingerprint-matched no-op (path + size +
mtime_ns — idempotent at-least-once ingest), concurrent ingests on one
store serialize on a flock, and a turn id already in the registry is
dropped at dedup time (the store is APPEND-ONLY per (conv_id,
turn_idx) — re-submitting overlapping slices cannot double-register).
Honesty note on durability: the claim is kill-safe (SIGKILL at any
point) plus manifest-atomic; full power-fail durability of generation
DATA files is the filesystem's domain (no per-file fsync).

Scale posture: per delta the work is O(delta) + O(touched buckets) —
the standing corpus is never re-read or re-shuffled; driver traffic is
bounded aggregates (touched bucket ids, the delta's drop list). The
correctness contract is the kg_update_edges oracle discipline applied
end-to-end: tests/test_ingest.py feeds three successive deltas and
asserts the final edge table and vector-store summary EQUAL a
from-scratch recompute over the surviving turns.

Reference parity note: the reference app is a load-once serve loop
(app.py:121-208) with no corpus maintenance story; this module is part
of the beyond-reference LLM-data-pipeline surface (SURVEY.md §2.7+).
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..kernels.hashing import stable_u64_md5
from ..kernels.tagger import AliasDict
from ..state.manifest import fingerprint, list_parquet_files

VEC_DIM = 16
VEC_PARTS = 16
# SRP-style deterministic hyperplanes over the turn-vector space
_VPLANES = None

STORE_VERSION = "ingest-store-v1"


def _vplanes() -> np.ndarray:
    global _VPLANES
    if _VPLANES is None:
        _VPLANES = np.array(
            [
                [
                    (stable_u64_md5(f"ingest-srp:{p}:{d}".encode()) % 2001) - 1000
                    for d in range(VEC_DIM)
                ]
                for p in range(4)
            ],
            dtype=np.float64,
        )
    return _VPLANES


def turn_doc_id(conv_id: str, turn_idx: int) -> int:
    """Stable positive int64 doc id for a turn (md5, process-stable)."""
    return stable_u64_md5(f"{conv_id}:{turn_idx}".encode()) >> 1


def _turn_vector(text: str) -> np.ndarray:
    """Deterministic VEC_DIM turn embedding: mean of md5-seeded unit
    token vectors (the hash-OOV rule of kernels/combinatorial.py) —
    model-free so the ingest loop has no training dependency."""
    toks = text.split() if text else []
    if not toks:
        return np.zeros(VEC_DIM)
    acc = np.zeros(VEC_DIM)
    for t in toks:
        h = stable_u64_md5(t.lower().encode())
        acc += np.array(
            [((h >> (2 * d)) & 0xFF) / 255.0 - 0.5 for d in range(VEC_DIM)]
        )
    return acc / len(toks)


def _vpart(vec: np.ndarray) -> int:
    """SRP sign-bucket (Charikar'02 hyperplane hash) — the store's
    deterministic partition rule; at a trained-centroid deployment the
    emb_ivf_upsert nearest-centroid assignment drops into this slot."""
    bits = 0
    for i, p in enumerate(_vplanes()):
        if float(vec @ p) >= 0.0:
            bits |= 1 << i
    return bits % VEC_PARTS


def _store_state(store_dir: str) -> dict:
    p = os.path.join(store_dir, "store.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"version": STORE_VERSION, "generation": -1, "deltas": []}


def _flip_state(store_dir: str, state: dict) -> None:
    tmp = os.path.join(store_dir, "store.json.tmp")
    with open(tmp, "w") as f:
        json.dump(state, f, indent=2)
        # fsync before the rename: without it a power loss can journal
        # the rename ahead of the data blocks and leave a zero-length
        # store.json. (Generation DATA files are not fsynced — the
        # crash-safety claim is kill-safe + manifest-atomic; full
        # power-fail durability of the data files is the filesystem's
        # mount-option domain, stated honestly in the module docstring.)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(store_dir, "store.json"))
    # ...and fsync the DIRECTORY so the rename dirent itself is durable
    # before the caller acts on the returned report (acks upstream).
    dfd = os.open(store_dir, os.O_DIRECTORY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def _gen_dir(store_dir: str, gen: int) -> str:
    return os.path.join(store_dir, f"gen{gen}")


def _hardlink_tree(src: str, dst: str) -> None:
    """Link every parquet file of src into dst preserving layout —
    zero-copy carry-over of untouched store content. Falls back to a
    copy when the store spans filesystems (EXDEV) or the backing store
    has no hardlinks; on shared object storage the whole carry-over
    becomes a manifest pointer copy instead (see module docstring)."""
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        out = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(out, exist_ok=True)
        for f in files:
            if f.endswith(".parquet"):
                try:
                    os.link(os.path.join(root, f), os.path.join(out, f))
                except OSError:
                    shutil.copy2(os.path.join(root, f), os.path.join(out, f))


def _delta_fingerprint(transcripts: str) -> str:
    """Persisted exactly-once identity of a delta: path + size +
    mtime_ns per file. Deliberately STRONGER than the shared
    manifest.input_fingerprint (path+size only — a cache heuristic): a
    producer that overwrites the same path with same-sized new content
    must not be silently skipped as already-applied. Content hashing
    would be stronger still but costs a full delta read; mtime_ns
    catches every regular rewrite."""
    files = (
        list_parquet_files(transcripts)
        if os.path.isdir(transcripts)
        else [transcripts]
    )
    parts = []
    for f in sorted(files):
        st = os.stat(f)
        parts.append(f"{f}:{st.st_size}:{st.st_mtime_ns}")
    # mtime_ns catches regular rewrites on ns-resolution filesystems;
    # coarse-timestamp mounts or mtime-preserving copies can still
    # alias — content hashing is the strict option, at a full delta
    # read per submission. Byte-identical re-staged files with a fresh
    # mtime re-build a generation, which the re-ingest guard then
    # reduces to a pure carry.
    return fingerprint(STORE_VERSION, *parts)


def ingest_delta(
    store_dir: str,
    transcripts: str,
    alias_path: str,
    *,
    n_edge_buckets: int | None = None,
    scorer: str = "dict",
) -> dict:
    """Apply one transcript delta to the store; returns the report.
    Idempotent: a delta whose input fingerprint is already recorded in
    the store manifest is skipped. Serialized per store (flock)."""
    import fcntl

    from ..queries import KG_EDGE_BUCKETS

    t0 = time.perf_counter()
    n_edge_buckets = n_edge_buckets or KG_EDGE_BUCKETS
    os.makedirs(store_dir, exist_ok=True)
    # One ingest at a time per store: without this, two concurrent
    # ingests both build gen k+1 and the second's orphan-cleanup rmtree
    # deletes the first's in-progress generation (the manifest.run_stage
    # flock discipline, applied to the whole mutation).
    lock_f = open(os.path.join(store_dir, ".ingest.lock"), "w")
    fcntl.flock(lock_f, fcntl.LOCK_EX)
    try:
        return _ingest_delta_locked(
            store_dir, transcripts, alias_path,
            n_edge_buckets=n_edge_buckets, scorer=scorer, t0=t0,
        )
    finally:
        fcntl.flock(lock_f, fcntl.LOCK_UN)
        lock_f.close()


def _ingest_delta_locked(
    store_dir: str,
    transcripts: str,
    alias_path: str,
    *,
    n_edge_buckets: int,
    scorer: str,
    t0: float,
) -> dict:
    from ..oracle import canonical_components
    from ..queries import _with_edge_bucket
    from ..stages.annotate import annotate_stage
    from ..stages.dedup import (
        _band_rows_from_shingles,
        _shingle_table,
        _with_band_bucket,
        incremental_minhash_pairs,
        minhash_pairs_join,
    )
    from ..stages.exchange import keyed_exchange
    from ..stages.explode import triples_stage
    from ..stages.graph import edges_stage

    state = _store_state(store_dir)
    dfp = _delta_fingerprint(transcripts)
    for d in state["deltas"]:
        if d["fingerprint"] == dfp:
            return {**d, "skipped": True}

    gen = state["generation"]
    new_gen = gen + 1
    nd = _gen_dir(store_dir, new_gen)
    if os.path.exists(nd):  # orphan from a killed run — rebuild
        shutil.rmtree(nd)
    os.makedirs(nd)

    # ---- delta docs: one turn = one doc -----------------------------
    def with_ids(batch: pa.Table) -> pd.DataFrame:
        convs = batch["conv_id"].to_pylist()
        tixs = batch["turn_idx"].to_pylist()
        texts = batch["text"].to_pylist()
        return pd.DataFrame(
            {
                "doc_id": np.fromiter(
                    (turn_doc_id(c, t) for c, t in zip(convs, tixs)),
                    dtype=np.int64,
                    count=len(convs),
                ),
                "conv_id": convs,
                "turn_idx": np.asarray(tixs, dtype=np.int32),
                "text": texts,
            }
        )

    # ONE read+map of the delta, object-store resident; every later
    # consumer (pair phases, id collect, survivor filter, counts) reuses
    # the materialized blocks instead of re-scanning the parquet.
    delta_all = (
        rd.read_parquet(transcripts, columns=["conv_id", "turn_idx", "text"])
        .map_batches(with_ids, batch_format="pyarrow")
        .materialize()
    )

    def delta_docs():
        return delta_all

    # ---- incremental dedup ------------------------------------------
    old = _gen_dir(store_dir, gen)
    have_index = gen >= 0 and list_parquet_files(os.path.join(old, "bands"))
    if have_index:
        index = {
            "bands": os.path.join(old, "bands"),
            "shingles": os.path.join(old, "shingles"),
        }
        pairs = incremental_minhash_pairs(delta_docs, index)
    else:  # bootstrap delta: within-delta pairs only
        pairs = minhash_pairs_join(delta_docs)

    # Drop rule (keep-first): a new doc paired with a PERSISTED doc is
    # dropped; of a new–new pair the larger doc_id is dropped. The drop
    # list is O(dup-rate × delta) and is applied with a broadcast-side
    # membership filter (the delta is the bounded side by construction).
    new_id_list = (
        delta_all.map_batches(lambda df: df[["doc_id"]], batch_format="pandas")
        .to_pandas()["doc_id"]
        .tolist()
    )
    new_ids_ref = ray.put(set(new_id_list))

    def drop_list(df: pd.DataFrame) -> pd.DataFrame:
        from ..state.broadcast import resolve

        new_ids = resolve(new_ids_ref)
        drops = []
        for a, b in zip(df["doc_id_a"].to_numpy(), df["doc_id_b"].to_numpy()):
            an, bn = int(a) in new_ids, int(b) in new_ids
            if an and bn:
                drops.append(max(a, b))
            elif an:
                drops.append(a)
            elif bn:
                drops.append(b)
        return pd.DataFrame({"doc_id": np.asarray(sorted(drops), dtype=np.int64)})

    drops = set(
        pairs.map_batches(drop_list, batch_format="pandas")
        .to_pandas()["doc_id"]
        .tolist()
    )

    # Re-ingest guard: a delta turn whose (conv_id, turn_idx) already
    # lives in the registry is DROPPED — the store is append-only per
    # turn id, so re-submitting an overlapping slice (or the same turn
    # with edited text that is not a near-dup) cannot double-register a
    # doc_id or leave a stale vector beside a new one. Shape: NO
    # corpus shuffle — the (small) delta id set broadcasts once and a
    # streamed map over the registry's doc_id COLUMN emits only the
    # matches (output bounded by the delta). Honest cost note: this
    # scans 8 bytes/registered turn per delta (~1-2% of corpus payload
    # bytes); a hive-bucketed id index drops into this slot when even
    # the id column matters.
    if gen >= 0:
        reg_files = list_parquet_files(os.path.join(old, "turns"))
        if reg_files:
            def members(df: pd.DataFrame) -> pd.DataFrame:
                from ..state.broadcast import resolve

                ids = resolve(new_ids_ref)
                hit = df["doc_id"][df["doc_id"].isin(ids)]
                return pd.DataFrame(
                    {"doc_id": hit.to_numpy(dtype=np.int64)}
                )

            dup_df = (
                rd.read_parquet(reg_files, columns=["doc_id"])
                .map_batches(members, batch_format="pandas")
                .to_pandas()
            )
            if len(dup_df):  # empty result frames carry no columns
                drops |= set(dup_df["doc_id"].tolist())

    drops_ref = ray.put(drops)

    def keep_survivors(df: pd.DataFrame) -> pd.DataFrame:
        from ..state.broadcast import resolve

        dr = resolve(drops_ref)
        return df[~df["doc_id"].isin(dr)] if dr else df

    def dedupe_turn_ids(df: pd.DataFrame) -> pd.DataFrame:
        """WITHIN-delta duplicate (conv_id, turn_idx) rows (a producer
        bug the cross-delta guard can't see — both rows carry side
        'new') collapse to ONE deterministically: lexicographically
        smallest text wins. O(delta) doc_id-keyed exchange."""
        return (
            df.sort_values(["doc_id", "text"], kind="mergesort")
            .drop_duplicates("doc_id", keep="first")
        )

    survivors = (
        keyed_exchange(
            delta_all.map_batches(keep_survivors, batch_format="pandas"),
            ["doc_id"],
            dedupe_turn_ids,
            8,
        )
        .materialize()  # consumed by: registry, annotate, vectors, index
    )
    n_delta = delta_all.count()
    n_kept = survivors.count()

    if n_kept == 0 and gen >= 0:
        # Nothing survived dedup/the re-ingest guard: the new generation
        # is a pure hardlink carry of the old one (the delta is still
        # RECORDED so re-submission stays a fingerprint no-op).
        for sub in ("turns", "edges", "vectors", "bands", "shingles"):
            src = os.path.join(old, sub)
            dst = os.path.join(nd, sub)
            os.makedirs(dst, exist_ok=True)
            if os.path.isdir(src):
                _hardlink_tree(src, dst)
        from ..stages.dedup import INDEX_LAYOUT_VERSION

        with open(os.path.join(nd, "_LAYOUT_VERSION"), "w") as f:
            f.write(INDEX_LAYOUT_VERSION)
        report = {
            "delta": new_gen,
            "fingerprint": dfp,
            "n_delta_turns": int(n_delta),
            "n_kept": 0,
            "n_dropped": int(n_delta),
            "touched_edge_buckets": [],
            "touched_vparts": [],
            "wall_sec": round(time.perf_counter() - t0, 3),
        }
        state["generation"] = new_gen
        state["deltas"].append(report)
        _flip_state(store_dir, state)
        shutil.rmtree(old, ignore_errors=True)
        return report

    # ---- turn registry ----------------------------------------------
    turns_dir = os.path.join(nd, "turns")
    os.makedirs(turns_dir, exist_ok=True)
    if gen >= 0:
        _hardlink_tree(os.path.join(old, "turns"), turns_dir)
    survivors.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    ).write_parquet(os.path.join(turns_dir, f"delta_{new_gen:05d}"))

    # ---- annotate -> edges delta ------------------------------------
    alias_rows = pq.read_table(alias_path).to_pylist()
    alias_ref = ray.put(AliasDict(alias_rows))
    comp_ref = ray.put(canonical_components(alias_rows))
    ann = annotate_stage(
        survivors.select_columns(["conv_id", "turn_idx", "text"]),
        alias_ref,
        scorer=scorer,
    )
    delta_edges = (
        edges_stage(lambda: triples_stage(ann), comp_ref)
        .map_batches(_with_edge_bucket, batch_format="pandas")
        .materialize()
    )
    touched_e = set(
        delta_edges.map_batches(
            lambda df: pd.DataFrame({"edge_bucket": df["edge_bucket"].unique()}),
            batch_format="pandas",
        )
        .to_pandas()["edge_bucket"]
        .unique()
        .tolist()
    )

    edges_dir = os.path.join(nd, "edges")
    os.makedirs(edges_dir, exist_ok=True)
    cols = ["subj_cui", "pred", "obj_cui", "weight"]
    old_buckets: dict[int, list] = {}
    if gen >= 0:
        for f in list_parquet_files(os.path.join(old, "edges")):
            b = int(os.path.basename(os.path.dirname(f)).split("=")[1])
            old_buckets.setdefault(b, []).append(f)
    # carry untouched buckets by hardlink
    for b, fs in old_buckets.items():
        if b in touched_e:
            continue
        out = os.path.join(edges_dir, f"edge_bucket={b}")
        os.makedirs(out, exist_ok=True)
        for f in fs:
            os.link(f, os.path.join(out, os.path.basename(f)))
    # merge touched buckets (delta + old rows), one edge-keyed combine
    touched_files = [f for b in touched_e for f in old_buckets.get(b, [])]
    merged = delta_edges.map_batches(
        lambda df: df[cols + ["edge_bucket"]], batch_format="pandas"
    )
    if touched_files:
        merged = merged.union(
            rd.read_parquet(touched_files, columns=cols).map_batches(
                lambda df: _with_edge_bucket(df), batch_format="pandas"
            )
        )

    def combine_edges(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(["edge_bucket", "subj_cui", "pred", "obj_cui"], sort=False)[
                "weight"
            ]
            .sum()
            .reset_index()
        )
        out["weight"] = out["weight"].astype("int64")
        return out

    (
        keyed_exchange(merged, ["edge_bucket"], combine_edges, n_edge_buckets)
        .map_batches(
            lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
        )
        .write_parquet(edges_dir, partition_cols=["edge_bucket"])
    )

    # ---- vector-store upsert ----------------------------------------
    def vec_rows(df: pd.DataFrame) -> pd.DataFrame:
        vids, vparts = [], []
        for did, text in zip(df["doc_id"], df["text"]):
            vids.append(did)
            vparts.append(_vpart(_turn_vector(text)))
        return pd.DataFrame(
            {
                "vec_id": np.asarray(vids, dtype=np.int64),
                "vpart": np.asarray(vparts, dtype=np.int64),
            }
        )

    dvec = survivors.map_batches(vec_rows, batch_format="pandas").materialize()
    touched_v = set(
        dvec.map_batches(
            lambda df: pd.DataFrame({"vpart": df["vpart"].unique()}),
            batch_format="pandas",
        )
        .to_pandas()["vpart"]
        .unique()
        .tolist()
    )
    vec_dir = os.path.join(nd, "vectors")
    os.makedirs(vec_dir, exist_ok=True)
    old_vparts: dict[int, list] = {}
    if gen >= 0:
        for f in list_parquet_files(os.path.join(old, "vectors")):
            b = int(os.path.basename(os.path.dirname(f)).split("=")[1])
            old_vparts.setdefault(b, []).append(f)
    for b, fs in old_vparts.items():
        if b in touched_v:
            continue
        out = os.path.join(vec_dir, f"vpart={b}")
        os.makedirs(out, exist_ok=True)
        for f in fs:
            os.link(f, os.path.join(out, os.path.basename(f)))
    vmerged = dvec
    vtouched_files = [f for b in touched_v for f in old_vparts.get(b, [])]
    if vtouched_files:
        # hive reads surface the partition field as a string — cast back
        vmerged = vmerged.union(
            rd.read_parquet(vtouched_files, columns=["vec_id", "vpart"]).map_batches(
                lambda df: df.assign(vpart=df["vpart"].astype("int64")),
                batch_format="pandas",
            )
        )
    (
        keyed_exchange(vmerged, ["vpart"], lambda df: df, VEC_PARTS)
        .map_batches(
            lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
        )
        .write_parquet(vec_dir, partition_cols=["vpart"])
    )

    # ---- LSH index append -------------------------------------------
    bands_dir = os.path.join(nd, "bands")
    sh_dir = os.path.join(nd, "shingles")
    os.makedirs(bands_dir, exist_ok=True)
    os.makedirs(sh_dir, exist_ok=True)
    if gen >= 0:
        _hardlink_tree(os.path.join(old, "bands"), bands_dir)
        _hardlink_tree(os.path.join(old, "shingles"), sh_dir)
    surv_sh = survivors.map_batches(
        _shingle_table, batch_format="pyarrow"
    ).materialize()
    surv_sh.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    ).write_parquet(os.path.join(sh_dir, f"delta_{new_gen:05d}"))
    (
        surv_sh.map_batches(_band_rows_from_shingles, batch_format="pyarrow")
        .map_batches(_with_band_bucket, batch_format="pandas")
        .map_batches(
            lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
        )
        .write_parquet(bands_dir, partition_cols=["band_bucket"])
    )
    with open(os.path.join(nd, "_LAYOUT_VERSION"), "w") as f:
        from ..stages.dedup import INDEX_LAYOUT_VERSION

        f.write(INDEX_LAYOUT_VERSION)

    # ---- atomic generation flip -------------------------------------
    report = {
        "delta": new_gen,
        "fingerprint": dfp,
        "n_delta_turns": int(n_delta),
        "n_kept": int(n_kept),
        "n_dropped": int(n_delta - n_kept),
        "touched_edge_buckets": sorted(int(b) for b in touched_e),
        "touched_vparts": sorted(int(b) for b in touched_v),
        "wall_sec": round(time.perf_counter() - t0, 3),
    }
    state["generation"] = new_gen
    state["deltas"].append(report)
    _flip_state(store_dir, state)
    if gen >= 0:
        shutil.rmtree(old, ignore_errors=True)  # superseded generation
    return report


def store_edges(store_dir: str):
    """Live weighted edge table of the store as a Dataset."""
    state = _store_state(store_dir)
    files = list_parquet_files(
        os.path.join(_gen_dir(store_dir, state["generation"]), "edges")
    )
    return rd.read_parquet(files, columns=["subj_cui", "pred", "obj_cui", "weight"])


def store_turns(store_dir: str):
    state = _store_state(store_dir)
    return rd.read_parquet(
        list_parquet_files(
            os.path.join(_gen_dir(store_dir, state["generation"]), "turns")
        )
    )


def store_vector_summary(store_dir: str) -> pd.DataFrame:
    """(vpart, n_vecs, min/max vec_id) from parquet footer stats alone
    — the emb_ivf_upsert no-data-read summary."""
    state = _store_state(store_dir)
    vdir = os.path.join(_gen_dir(store_dir, state["generation"]), "vectors")
    rows = []
    parts: dict[int, list] = {}
    for f in list_parquet_files(vdir):
        b = int(os.path.basename(os.path.dirname(f)).split("=")[1])
        parts.setdefault(b, []).append(f)
    for b, fs in sorted(parts.items()):
        n, mn, mx = 0, None, None
        for f in fs:
            pf = pq.ParquetFile(f)
            ci = pf.schema_arrow.names.index("vec_id")
            md = pf.metadata
            n += md.num_rows
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
        rows.append((b, n, mn, mx))
    return pd.DataFrame(
        rows, columns=["vpart", "n_vecs", "min_vec_id", "max_vec_id"]
    ).astype({"vpart": "int64", "n_vecs": "int64"})
