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

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _empty_token_frame() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "path": pd.Series([], dtype="object"),
            "sent_idx": pd.array([], dtype="int32"),
            "tok_idx": pd.array([], dtype="int32"),
            "token": pd.Series([], dtype="object"),
            "tag": pd.Series([], dtype="object"),
        }
    )


def parse_conll_bytes(data: bytes, path: str) -> pd.DataFrame:
    """Pure per-file parser (shared by the Ray stage and tests).

    Vectorized over the file's lines (pandas str kernels + numpy
    boundary math) — a per-file task must chew GB-scale TSVs at memory
    bandwidth, not at a Python-loop 10 MB/s. Semantics are line-exact
    with the reference loop (utils/fonctions.py:17-59): ``strip`` each
    line, blank closes a non-empty sentence, ``-DOCSTART-`` and
    sub-2-field lines are skipped, EOF flushes.
    """
    base = os.path.basename(path)
    if not data:
        return _empty_token_frame()
    lines = pd.Series(data.decode("utf-8").split("\n"), dtype="object")
    stripped = lines.str.strip()
    blank = (stripped == "").to_numpy()
    # a token line = non-blank, not -DOCSTART-, and ≥2 tab fields after
    # strip (== contains a tab: strip removes edge tabs, so any
    # remaining tab separates two fields)
    valid = (
        ~blank
        & ~stripped.str.startswith("-DOCSTART-").to_numpy()
        & stripped.str.contains("\t", regex=False).to_numpy()
    )
    if not valid.any():
        return _empty_token_frame()
    # sentence id at each valid line = #blank lines before it; dense-
    # rank those group ids (consecutive/leading blanks with no tokens
    # in between never materialize a sentence — same as the reference's
    # "increment only if tok_idx" rule)
    grp = np.cumsum(blank)[valid]
    new = np.empty(len(grp), dtype=bool)
    new[0] = True
    np.not_equal(grp[1:], grp[:-1], out=new[1:])
    sent_idx = np.cumsum(new) - 1
    starts = np.flatnonzero(new)
    sizes = np.diff(np.append(starts, len(grp)))
    tok_idx = np.arange(len(grp)) - np.repeat(starts, sizes)
    fields = stripped[valid].str.extract(r"^([^\t]*)\t([^\t]*)")
    return pd.DataFrame(
        {
            "path": base,
            "sent_idx": pd.array(sent_idx, dtype="int32"),
            "tok_idx": pd.array(tok_idx, dtype="int32"),
            "token": fields[0].to_numpy(),
            "tag": fields[1].to_numpy(),
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
            if not len(df):
                continue
            # parse_conll_bytes emits rows already ordered by
            # (sent_idx, tok_idx) — assemble sentences with one numpy
            # boundary split instead of a per-sentence pandas groupby
            si = df["sent_idx"].to_numpy()
            starts = np.flatnonzero(np.diff(si, prepend=si[0] - 1))
            base = df["path"].iat[0]
            sids.extend(f"{base}:{s}" for s in si[starts])
            tok_arr = df["token"].to_numpy()
            tag_arr = df["tag"].to_numpy()
            toks.extend(a.tolist() for a in np.split(tok_arr, starts[1:]))
            tags.extend(a.tolist() for a in np.split(tag_arr, starts[1:]))
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
