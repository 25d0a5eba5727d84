"""Distinct-count sketches (HyperLogLog).

The reference engine has no sketch family; this is one of the
large-scale additions (SURVEY.md §8.2): an exact distinct count is an
all-to-all exchange over every distinct key, while an HLL sketch is a
fixed 2^p-byte register array that merges with an elementwise max — the
canonical shape for 100TB "how many unique users/documents" questions
(partial sketch per block, one tiny combine, no key shuffle at all).

Plain numpy, deterministic: element hashing reuses the repo's
md5-derived u64 (``stable_u64_md5``) so partials are reproducible
across processes and runs. Standard bias-corrected estimator
(Flajolet et al. 2007) with linear counting for the small range.
"""

from __future__ import annotations

import numpy as np

from .hashing import stable_u64_md5

HLL_P = 12  # 4096 registers; relative standard error ~1.04/sqrt(2^p) = 1.6%


def hll_empty(p: int = HLL_P) -> np.ndarray:
    return np.zeros(1 << p, dtype=np.uint8)


def hll_add_u64(registers: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Fold an array of u64 hashes into ``registers`` (in place).

    Register index = low ``p`` bits; rank = 1 + leading-zero count of
    the remaining 64-p bits (vectorized via a float64 exponent trick:
    for w > 0, floor(log2(w)) read from the IEEE exponent field is
    exact for all w < 2^53, and the 52-bit top of a u64 >> p always
    is).
    """
    p = int(np.log2(len(registers)))
    idx = (hashes & ((1 << p) - 1)).astype(np.int64)
    w = hashes >> np.uint64(p)
    width = 64 - p
    # rank = width - floor(log2(w)) for w>0, else width+1
    rank = np.full(len(w), width + 1, dtype=np.uint8)
    nz = w > 0
    if nz.any():
        wf = w[nz].astype(np.float64)
        exp = ((wf.view(np.int64) >> 52) & 0x7FF) - 1023  # floor(log2(w))
        rank[nz] = (width - exp).astype(np.uint8)
    np.maximum.at(registers, idx, rank)
    return registers


def hll_add_values(registers: np.ndarray, values) -> np.ndarray:
    hashes = np.fromiter(
        (stable_u64_md5(str(v).encode("utf-8")) for v in values), dtype=np.uint64
    )
    if len(hashes) == 0:
        return registers
    return hll_add_u64(registers, hashes)


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(registers: np.ndarray) -> int:
    m = float(len(registers))
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    inv = np.ldexp(1.0, -registers.astype(np.int64))  # 2^-M[j]
    raw = alpha * m * m / inv.sum()
    zeros = int((registers == 0).sum())
    if raw <= 2.5 * m and zeros > 0:
        return int(round(m * np.log(m / zeros)))  # linear counting
    if raw > (1 << 64) / 30.0:
        return int(round(-(2.0**64) * np.log1p(-raw / 2.0**64)))
    return int(round(raw))


# ---------------------------------------------------------------------------
# DDSketch-style relative-error quantile sketch
# ---------------------------------------------------------------------------
#
# The mergeable companion to the exact value-count-histogram quantiles
# (queries.lineitem_price_quantiles): when the value domain is NOT
# bounded, exact histograms grow with distinct values, while this
# sketch stores log-spaced bucket counts — relative error ≤ alpha by
# construction, merge = sparse bucket-count addition, deterministic
# (no sampling). Positive values only (prices, latencies, sizes).

DD_ALPHA = 0.01  # 1% relative-error guarantee


def dd_gamma(alpha: float = DD_ALPHA) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


def dd_add(counts: dict, values, alpha: float = DD_ALPHA) -> dict:
    """Fold positive values into a sparse {bucket_index: count} map.
    Bucket i covers (gamma^(i-1), gamma^i]; zeros use bucket None."""
    import math

    g = math.log(dd_gamma(alpha))
    arr = np.asarray(values, dtype=np.float64)
    zeros = int((arr <= 0).sum())
    pos = arr[arr > 0]
    if len(pos):
        idx = np.ceil(np.log(pos) / g).astype(np.int64)
        uniq, n = np.unique(idx, return_counts=True)
        for i, c in zip(uniq.tolist(), n.tolist()):
            counts[i] = counts.get(i, 0) + int(c)
    if zeros:
        counts[None] = counts.get(None, 0) + zeros
    return counts


def dd_merge(a: dict, b: dict) -> dict:
    out = dict(a)
    for k, v in b.items():
        out[k] = out.get(k, 0) + v
    return out


def dd_quantile(counts: dict, q: float, alpha: float = DD_ALPHA) -> float:
    """quantile_disc-style rank pick (1-based rank ceil(n*q)) over the
    bucket midpoints 2*gamma^i/(gamma+1) — within alpha of the true
    order statistic."""
    import math

    n = sum(counts.values())
    if n == 0:
        return float("nan")
    rank = max(1, math.ceil(n * q))
    seen = counts.get(None, 0)
    if seen >= rank:
        return 0.0
    gamma = dd_gamma(alpha)
    for i in sorted(k for k in counts if k is not None):
        seen += counts[i]
        if seen >= rank:
            return 2.0 * gamma**i / (gamma + 1.0)
    return float("nan")


# ---------------------------------------------------------------------------
# Count-Min Sketch (heavy hitters / approximate frequencies)
# ---------------------------------------------------------------------------

# d independent rows × w counters: overestimate-only frequency sketch
# (Cormode & Muthukrishnan 2005). ε ≈ e/w of the total mass, failure
# probability ≈ e^-d. 4×4096 int64 = 128 KiB — fixed size at any corpus
# scale; merge is elementwise addition, so per-block partials combine
# associatively with no key shuffle.
CMS_D = 4
CMS_W = 4096


def cms_empty(d: int = CMS_D, w: int = CMS_W) -> np.ndarray:
    return np.zeros((d, w), dtype=np.int64)


def _cms_cols(keys, d: int, w: int) -> np.ndarray:
    """(d, n) column indices — md5-derived per row, process-stable."""
    return np.stack(
        [
            np.fromiter(
                (stable_u64_md5(f"cms{j}:{k}".encode("utf-8")) % w for k in keys),
                dtype=np.int64,
                count=len(keys),
            )
            for j in range(d)
        ]
    )


def cms_add(sketch: np.ndarray, keys, counts) -> np.ndarray:
    """Fold (key, count) pairs into the sketch in place."""
    if len(keys) == 0:
        return sketch
    d, w = sketch.shape
    cols = _cms_cols(keys, d, w)
    cnts = np.asarray(counts, dtype=np.int64)
    for j in range(d):
        np.add.at(sketch[j], cols[j], cnts)
    return sketch


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b


def cms_query(sketch: np.ndarray, keys) -> np.ndarray:
    """Estimated counts (min over rows) — never below the true count."""
    if len(keys) == 0:
        return np.zeros(0, dtype=np.int64)
    d, w = sketch.shape
    cols = _cms_cols(keys, d, w)
    return np.stack([sketch[j][cols[j]] for j in range(d)]).min(axis=0)
