"""Tokenization stage (stateless map_batches).

Arrow in / Arrow out; adds ``tokens: list<string>`` and
``n_tokens: int32``. The regex kernel is the reference app tokenizer
(app.py:210-214) — a compiled-regex Python findall per row is the hot
inner call; everything around it stays columnar.
"""

from __future__ import annotations

import pyarrow as pa

from ..kernels.tokenize import TOKEN_RE


def tokenize_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    toks = [TOKEN_RE.findall(t) if t else [] for t in texts]
    tok_arr = pa.array(toks, type=pa.list_(pa.string()))
    n_arr = pa.array([len(t) for t in toks], type=pa.int32())
    return batch.append_column("tokens", tok_arr).append_column("n_tokens", n_arr)


def tokenize_stage(ds, batch_size: int = 4096):
    return ds.map_batches(tokenize_batch, batch_format="pyarrow", batch_size=batch_size)
