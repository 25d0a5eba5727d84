"""Distributed BPE merge-rule training (Sennrich et al. 2016) — the
tokenizer-training slot of the engine.

The insight that makes BPE distributable is the same one the original
algorithm uses: merges operate on the WORD-FREQUENCY table, not the raw
corpus. One corpus pass builds (word, count) — the engine's G1 wordcount
exchange — and every subsequent round touches only the vocab-sized
symbol table:

    per round:
      1. pair partials   — map_batches over the symbol table: each block
         counts its adjacent symbol pairs weighted by word count
         (vectorized-per-word Python over short symbol tuples);
      2. top-1 combine   — partial pair rows are vocab-scale but
         PRE-REDUCED per block; a driver combine of the ≤ P·|pairs|
         partials picks the global best pair with a deterministic
         tie-break (count desc, left asc, right asc);
      3. merge broadcast — the winning pair ships to a map_batches that
         rewrites symbol sequences greedily left-to-right; the table is
         re-materialized so round r+1 reads a LINEAR lineage (the
         2^rounds lazy re-execution trap, stages/canonicalize.py).

    Rounds are a fixed small constant (the artifact is the merge table,
    rank-ordered), so total cost is one corpus scan + rounds × (scan of
    the compact vocab table). At 100TB the vocab table is ~10⁸ rows —
    still a per-round map + tiny combine, no all-to-all anywhere.

The driver combine holds while distinct-pair cardinality per round stays
driver-small (bounded by vocab entries × max word length; partial rows
are pre-aggregated per block). Past that, step 2 rides
``exchange.grouped_aggregate`` + a distributed top-1 — same result, the
tie-break is total so the argmax is unique either way.

No SQL oracle: the greedy within-word remerge is not reasonably
expressible in SQL (the driver records a rows-only check); instead
``tests/test_bpe.py`` pins the distributed result against an
independent single-process reference implementation on the same input,
plus determinism across runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _pair_counts_of(symbols: tuple, n: int, acc: dict) -> None:
    for i in range(len(symbols) - 1):
        k = (symbols[i], symbols[i + 1])
        acc[k] = acc.get(k, 0) + n


def _merge_word(symbols: tuple, left: str, right: str, joined: str) -> tuple:
    """Greedy left-to-right non-overlapping merge of (left, right)."""
    out = []
    i = 0
    L = len(symbols)
    while i < L:
        if i + 1 < L and symbols[i] == left and symbols[i + 1] == right:
            out.append(joined)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def bpe_reference(word_counts: dict[str, int], merges: int) -> pd.DataFrame:
    """Single-process reference (the oracle for tests): classic BPE over
    a word-frequency dict. Returns (rank, left, right, pair_count)."""
    vocab = {tuple(w): int(n) for w, n in word_counts.items()}
    rows = []
    for rank in range(1, merges + 1):
        acc: dict = {}
        for syms, n in vocab.items():
            _pair_counts_of(syms, n, acc)
        if not acc:
            break
        best = min(acc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (left, right), cnt = best
        rows.append((rank, left, right, int(cnt)))
        joined = left + right
        vocab = {
            _merge_word(s, left, right, joined): n for s, n in vocab.items()
        }
    return pd.DataFrame(rows, columns=["rank", "left", "right", "pair_count"]).astype(
        {"rank": "int64", "pair_count": "int64"}
    )


def _to_symbol_table(df: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "syms": [tuple(w) for w in df["word"]],
            "n": df["n"].astype("int64"),
        }
    )


def _pair_partial(df: pd.DataFrame) -> pd.DataFrame:
    acc: dict = {}
    for syms, n in zip(df["syms"], df["n"]):
        _pair_counts_of(syms, int(n), acc)
    if not acc:
        # typed empty block: Ray's block-size accounting np.vectorize's
        # object columns and logs errors on size-0 object arrays
        return pd.DataFrame(
            {
                "left": np.array([], dtype=str),
                "right": np.array([], dtype=str),
                "c": np.array([], dtype=np.int64),
            }
        )
    ks = list(acc.keys())
    return pd.DataFrame(
        {
            "left": [k[0] for k in ks],
            "right": [k[1] for k in ks],
            "c": pd.array(list(acc.values()), dtype="int64"),
        }
    )


def bpe_train(wordcount_ds, merges: int = 8) -> pd.DataFrame:
    """wordcount_ds: Dataset with (word str, n int64) — the output of
    the G1 wordcount exchange. Returns the merge-rule table
    (rank, left, right, pair_count), deterministic at any partitioning."""
    import ray
    import ray.data as rd

    vocab = wordcount_ds.map_batches(
        _to_symbol_table, batch_format="pandas"
    ).materialize()

    rows = []
    for rank in range(1, merges + 1):
        parts = vocab.map_batches(_pair_partial, batch_format="pandas").to_pandas()
        if parts.empty or parts["c"].sum() == 0:
            break
        tot = parts.groupby(["left", "right"], sort=False, as_index=False)["c"].sum()
        tot = tot.sort_values(
            ["c", "left", "right"], ascending=[False, True, True], kind="mergesort"
        )
        left, right, cnt = (
            tot.iloc[0]["left"],
            tot.iloc[0]["right"],
            int(tot.iloc[0]["c"]),
        )
        rows.append((rank, left, right, cnt))
        joined = left + right
        rule = ray.put((left, right, joined))

        def apply_rule(df: pd.DataFrame, _r=rule) -> pd.DataFrame:
            lft, rgt, jnd = ray.get(_r)
            return pd.DataFrame(
                {
                    "syms": [
                        _merge_word(s, lft, rgt, jnd) for s in df["syms"]
                    ],
                    "n": df["n"],
                }
            )

        vocab = vocab.map_batches(apply_rule, batch_format="pandas").materialize()

    return pd.DataFrame(rows, columns=["rank", "left", "right", "pair_count"]).astype(
        {"rank": "int64", "pair_count": "int64"}
    )


def encode_word(word: str, ranked_merges) -> tuple:
    """Apply trained merges in RANK ORDER to one word (the classic BPE
    encode: each rule greedily rewrites left-to-right before the next
    rank applies)."""
    syms = tuple(word)
    for left, right in ranked_merges:
        if len(syms) < 2:
            break
        syms = _merge_word(syms, left, right, left + right)
    return syms


def bpe_encode_stage(docs_ds, merge_table: pd.DataFrame):
    """Distributed corpus encode under a trained merge table: emits
    (doc_id, n_words, n_bpe_tokens) per document.

    The merge table is broadcast once (it is rank×2 strings — artifact-
    sized); each block encodes its DISTINCT words only, then sums per
    doc — the per-batch word cache turns the Zipf head into O(1) work.
    Row-local map: no shuffle at any scale."""
    import ray

    from ..kernels.textstats import WORD_RE

    ranked = list(
        zip(
            merge_table.sort_values("rank")["left"],
            merge_table.sort_values("rank")["right"],
        )
    )
    rules = ray.put(ranked)

    def enc(batch: pa.Table) -> pa.Table:
        rl = ray.get(rules)
        cache: dict[str, int] = {}
        ids, nw, nt = [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            ws = WORD_RE.findall(text.lower())
            total = 0
            for w in ws:
                n = cache.get(w)
                if n is None:
                    n = len(encode_word(w, rl))
                    cache[w] = n
                total += n
            ids.append(doc_id)
            nw.append(len(ws))
            nt.append(total)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_words": pa.array(nw, pa.int64()),
                "n_bpe_tokens": pa.array(nt, pa.int64()),
            }
        )

    return docs_ds.map_batches(enc, batch_format="pyarrow")
