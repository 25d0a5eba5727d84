"""Scalar (int8-range) embedding quantization — the compression step a
100 TB embedding corpus needs before ANN: 64-dim float32 vectors become
64 single-byte codes (4× smaller, integer dot products).

All arithmetic is SQL-replicable by construction:

- floats enter integer space via ``floor(float64(v) * 1e6)`` — float32
  → float64 is exact, the float64 multiply and floor are the same IEEE
  ops DuckDB's ``floor(CAST(x AS DOUBLE) * 1000000.0)`` performs
  (``round`` is NOT used anywhere: numpy rounds half-to-even, DuckDB
  half-away-from-zero);
- per-dim global min/max are int64 aggregates (order-free);
- the code is pure integer floor division, identical in numpy and
  DuckDB's ``//``.
"""

from __future__ import annotations

import numpy as np

MICRO = 1_000_000
QUANT_LEVELS = 255  # codes 0..254
QUANT_ZERO = (QUANT_LEVELS - 1) // 2  # 127: centering offset for dots


def micro_matrix(embeddings) -> np.ndarray:
    """list<float> column (sequence of sequences) → int64 micro matrix."""
    mat = np.stack([np.asarray(e, dtype=np.float64) for e in embeddings])
    return np.floor(mat * MICRO).astype(np.int64)


def minmax_partial(vm: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return vm.min(axis=0), vm.max(axis=0)


def quantize_codes(vm: np.ndarray, gmin: np.ndarray, gmax: np.ndarray) -> np.ndarray:
    """int64 codes in [0, QUANT_LEVELS-1]; a constant dim (span 0) maps
    to code 0 — same CASE the SQL oracle applies."""
    span = gmax - gmin
    safe = np.maximum(span, 1)
    codes = ((vm - gmin) * (QUANT_LEVELS - 1)) // safe
    codes[:, span == 0] = 0
    return codes
