"""CoNLL/TSV corpus source (S1) — the reference's JNLPBA reader as a Ray
Data source.

Reference semantics (utils/fonctions.py:17-59, dup
fonctionsFaxtText.py:27-71): iterate lines of each ``.tsv`` file;
``token<TAB>tag`` rows accumulate into the current sentence; a blank
(whitespace-only) line closes the sentence; lines starting with
``-DOCSTART-`` are skipped; malformed lines (< 2 tab fields) are
skipped; a final unterminated sentence is flushed at EOF.

Distribution shape: ``ray.data.read_binary_files`` makes the FILE the
unit of parallelism, so sentence boundaries never straddle task
boundaries (``read_text`` byte-splits large files mid-sentence). CoNLL
corpora ship as a handful of files (train/devel/test), which bounds the
benefit of sub-file splitting anyway; for a pathological single huge
file, pre-shard it with a line-aligned splitter before ingestion.

Output: one row per TOKEN — (path, sent_idx, tok_idx, token, tag) —
flat string/int columns; ``sent_idx`` is the file-local 0-based
sentence ordinal (reference keeps per-file list order), ``tok_idx``
the position within the sentence. Group on (path, sent_idx) to recover
the reference's list-of-(token, tag) sentences.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import ray.data as rd


def parse_conll_bytes(data: bytes, path: str) -> pd.DataFrame:
    """Pure per-file parser (shared by the Ray stage and tests)."""
    paths, sids, tids, toks, tags = [], [], [], [], []
    sent_idx = 0
    tok_idx = 0
    base = os.path.basename(path)
    for raw in data.decode("utf-8").split("\n"):
        line = raw.strip()
        if not line:
            if tok_idx:
                sent_idx += 1
                tok_idx = 0
            continue
        if line.startswith("-DOCSTART-"):
            continue
        parts = line.split("\t")
        if len(parts) >= 2:
            paths.append(base)
            sids.append(sent_idx)
            tids.append(tok_idx)
            toks.append(parts[0])
            tags.append(parts[1])
            tok_idx += 1
    return pd.DataFrame(
        {
            "path": paths,
            "sent_idx": pd.array(sids, dtype="int32"),
            "tok_idx": pd.array(tids, dtype="int32"),
            "token": toks,
            "tag": tags,
        }
    )


def read_conll(paths: list[str] | str):
    """Dataset of (path, sent_idx, tok_idx, token, tag) token rows."""
    ds = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pd.DataFrame:
        frames = [
            parse_conll_bytes(data, p)
            for p, data in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist())
        ]
        return (
            pd.concat(frames, ignore_index=True)
            if frames
            else parse_conll_bytes(b"", "")
        )

    return ds.map_batches(parse, batch_format="pyarrow")


def read_conll_sentences(paths: list[str] | str):
    """Dataset of sentence rows (sent_id, tokens list<string>,
    tags list<string>) — the reference's list-of-(token, tag) sentence
    unit, with ``sent_id = '<basename>:<sent_idx>'`` stable across runs."""
    ds = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pd.DataFrame:
        sids, toks, tags = [], [], []
        for p, data in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
            df = parse_conll_bytes(data, p)
            for (base, si), g in df.groupby(["path", "sent_idx"], sort=True):
                g = g.sort_values("tok_idx")
                sids.append(f"{base}:{si}")
                toks.append(g["token"].tolist())
                tags.append(g["tag"].tolist())
        return pd.DataFrame({"sent_id": sids, "tokens": toks, "tags": tags})

    return ds.map_batches(parse, batch_format="pyarrow")


def sentences_from_tokens(df: pd.DataFrame) -> list[list[tuple[str, str]]]:
    """Reassemble reference-shaped sentences (list of (token, tag) lists)
    from the flat token table — test/conformance helper."""
    out = []
    for (_, _), g in df.sort_values(["path", "sent_idx", "tok_idx"]).groupby(
        ["path", "sent_idx"], sort=True
    ):
        out.append(list(zip(g["token"], g["tag"])))
    return out
