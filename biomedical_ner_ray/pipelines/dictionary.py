"""Dictionary/vocabulary build pipeline — the reference's artifact-build
path (S4 ``save_vocabularies`` JNLPBA.ipynb cell 16; G1-G3
``create_vocab`` / ``create_char_vocab`` / ``create_tag_mapping``,
utils/creation_vocabulaire.py) as a resumable Ray job.

Produces three Parquet artifacts under ``out_root`` (each with a
lineage manifest):

- ``vocab/``      word → id; specials ``<PAD>``=0, ``<UNK>``=1,
  ``<NUM>``=2 (reference ids, creation_vocabulaire.py:45-49), then
  min_freq-filtered words. The reference assigns ids in Python-dict
  insertion order, which is not reproducible under parallelism; we make
  the deterministic choice the reference's tests actually rely on —
  count-desc, then word-asc — so any two runs at any parallelism agree.
- ``char_vocab/`` char → id; ``<PAD>``=0, ``<UNK>``=1, then chars
  sorted by count desc / char asc.
- ``tag_map/``    tag → id; ``<PAD>``=0, then sorted tags (the
  reference sorts, which is why its ids are alphabetical — G3).

These artifacts are what a learned scorer's actor ``__init__`` loads
(S5/A1 contract).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ..kernels.tokenize import TOKEN_RE
from ..state import manifest as mf

DICT_VERSION = "dict-v1"
SPECIALS = ("<PAD>", "<UNK>", "<NUM>")


def _word_counts(ds):
    """Vocab-scale wordcount through the keyed hash exchange — the
    built-in per-group aggregate runs ~5k groups/s and a corpus vocab is
    10⁶–10⁸ keys (stages/exchange.py policy)."""
    from ..stages.exchange import keyed_exchange

    def partial(batch: pa.Table) -> pd.DataFrame:
        c: dict[str, int] = {}
        for t in batch["text"].to_pylist():
            for tok in TOKEN_RE.findall(t):
                w = tok.lower()
                c[w] = c.get(w, 0) + 1
        return pd.DataFrame({"word": list(c.keys()), "n": list(c.values())})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("word", sort=False, as_index=False)["n"].sum()

    return keyed_exchange(
        ds.map_batches(partial, batch_format="pyarrow"), ["word"], combine
    )


def build_dictionary_artifacts(
    transcripts_path: str,
    out_root: str,
    *,
    min_freq: int = 2,
    tag_types: list[str] | None = None,
) -> dict:
    """Build (or resume) the vocab / char-vocab / tag-map artifacts."""
    os.makedirs(out_root, exist_ok=True)
    files = mf.list_parquet_files(transcripts_path)
    in_fp = mf.input_fingerprint(files)
    results: dict[str, dict] = {}

    def read():
        return rd.read_parquet(files, columns=["text"])

    # -- word vocab (G1) --
    def build_vocab(tmp):
        counts = _word_counts(read()).to_pandas()
        counts = counts[counts["n"] >= min_freq]
        counts = counts.sort_values(["n", "word"], ascending=[False, True])
        words = list(SPECIALS) + counts["word"].tolist()
        ns = [0, 0, 0] + counts["n"].tolist()
        pq.write_table(
            pa.table(
                {
                    "word": pa.array(words, pa.string()),
                    "word_id": pa.array(range(len(words)), pa.int32()),
                    "n_occurrences": pa.array(ns, pa.int64()),
                }
            ),
            os.path.join(tmp, "vocab.parquet"),
        )

    results["vocab"] = mf.run_stage(
        "vocab", os.path.join(out_root, "vocab"),
        mf.fingerprint(DICT_VERSION, "vocab", str(min_freq), in_fp), build_vocab,
    )

    # -- char vocab (G2) --
    def build_chars(tmp):
        from ..stages.exchange import keyed_exchange

        def partial(batch: pa.Table) -> pd.DataFrame:
            c: dict[str, int] = {}
            for t in batch["text"].to_pylist():
                for tok in TOKEN_RE.findall(t):
                    for ch in tok.lower():
                        c[ch] = c.get(ch, 0) + 1
            return pd.DataFrame({"ch": list(c.keys()), "n": list(c.values())})

        def combine(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("ch", sort=False, as_index=False)["n"].sum()

        counts = (
            keyed_exchange(
                read().map_batches(partial, batch_format="pyarrow"),
                ["ch"],
                combine,
            )
            .to_pandas()
            .sort_values(["n", "ch"], ascending=[False, True])
        )
        chars = ["<PAD>", "<UNK>"] + counts["ch"].tolist()
        pq.write_table(
            pa.table(
                {
                    "ch": pa.array(chars, pa.string()),
                    "char_id": pa.array(range(len(chars)), pa.int32()),
                }
            ),
            os.path.join(tmp, "char_vocab.parquet"),
        )

    results["char_vocab"] = mf.run_stage(
        "char_vocab", os.path.join(out_root, "char_vocab"),
        mf.fingerprint(DICT_VERSION, "chars", in_fp), build_chars,
    )

    # -- tag map (G3: sorted => alphabetical ids, <PAD>=0) --
    def build_tags(tmp):
        types = sorted(tag_types or [])
        tags = ["<PAD>", "O"]
        for t in types:
            tags.extend((f"B-{t}", f"I-{t}"))
        pq.write_table(
            pa.table(
                {
                    "tag": pa.array(tags, pa.string()),
                    "tag_id": pa.array(range(len(tags)), pa.int32()),
                }
            ),
            os.path.join(tmp, "tag_map.parquet"),
        )

    results["tag_map"] = mf.run_stage(
        "tag_map", os.path.join(out_root, "tag_map"),
        mf.fingerprint(DICT_VERSION, "tags", ",".join(sorted(tag_types or []))),
        build_tags,
    )
    results["paths"] = {
        k: os.path.join(out_root, k) for k in ("vocab", "char_vocab", "tag_map")
    }
    return results
