"""Hashing kernels for dedup / fingerprinting: shingles, MinHash, SimHash,
rolling-hash winnowing.

All hashes are deterministic (no process-salted ``hash()``): we use
blake2b with fixed per-permutation keys so results are stable across
processes, runs, and cluster nodes — a hard requirement for distributed
dedup where the groupby key must agree across workers.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MERSENNE = (1 << 61) - 1
_MAX_U64 = (1 << 64) - 1


def _stable_u64(data: bytes) -> int:
    return struct.unpack("<Q", hashlib.blake2b(data, digest_size=8).digest())[0]


def stable_u64_md5(data: bytes) -> int:
    """u64 hash equal to DuckDB's ``md5_number_lower`` (bytes 8..16 of the
    md5 digest, little-endian) — used wherever the SQL oracle must
    reproduce the hash (MinHash/SimHash dedup)."""
    return int.from_bytes(hashlib.md5(data).digest()[8:16], "little")


def shingles(ws: list[str], n: int = 3) -> set[str]:
    """Word n-gram shingle set (space-joined)."""
    if len(ws) < n:
        return {" ".join(ws)} if ws else set()
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


def _permutation_params(num_perm: int, seed: int = 12345) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


class MinHasher:
    """num_perm-permutation MinHash over shingle sets (datasketch-style)."""

    def __init__(self, num_perm: int = 64, seed: int = 12345, hash_fn=None):
        self.num_perm = num_perm
        self.a, self.b = _permutation_params(num_perm, seed)
        self.hash_fn = hash_fn or _stable_u64

    def signature(self, shingle_set: set[str]) -> np.ndarray:
        if not shingle_set:
            return np.full(self.num_perm, _MAX_U64, dtype=np.uint64)
        hv = np.fromiter(
            (self.hash_fn(s.encode("utf-8")) for s in shingle_set),
            dtype=np.uint64,
            count=len(shingle_set),
        )
        # (a*h + b) mod p, vectorized over perms × shingles
        prods = (
            self.a[:, None] * (hv[None, :] % _MERSENNE) + self.b[:, None]
        ) % _MERSENNE
        return prods.min(axis=1).astype(np.uint64)

    def band_keys(self, sig: np.ndarray, num_bands: int) -> list[str]:
        """LSH band keys 'band_idx:hex(band_hash)' for bucketing."""
        rows = self.num_perm // num_bands
        keys = []
        for b in range(num_bands):
            band = sig[b * rows : (b + 1) * rows].tobytes()
            keys.append(f"{b}:{hashlib.blake2b(band, digest_size=8).hexdigest()}")
        return keys


def simhash64_md5(ws: list[str], cache: dict | None = None) -> int:
    """64-bit SimHash with md5 word hashes and plain LSB-first bit order
    so the DuckDB oracle can reproduce it bit-for-bit:
    bit p of the result is set iff sum over word occurrences of
    ±1[(md5_number_lower(w) >> p) & 1] is positive.

    ``cache`` (word → u64, typically per batch) collapses the md5 cost
    of the Zipf head — one hashlib call per DISTINCT word, not per
    occurrence."""
    if not ws:
        return 0
    if cache is None:
        it = (stable_u64_md5(w.encode("utf-8")) for w in ws)
    else:
        def _h(w: str) -> int:
            v = cache.get(w)
            if v is None:
                v = stable_u64_md5(w.encode("utf-8"))
                cache[w] = v
            return v

        it = (_h(w) for w in ws)
    hs = np.fromiter(it, dtype=np.uint64, count=len(ws))
    bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    acc = (bits.astype(np.int64) * 2 - 1).sum(axis=0)
    return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def simhash64(ws: list[str], hash_fn=None) -> int:
    """64-bit SimHash over word unigrams (per-occurrence weighting)."""
    if not ws:
        return 0
    hash_fn = hash_fn or _stable_u64
    acc = np.zeros(64, dtype=np.int64)
    for w in ws:
        h = hash_fn(w.encode("utf-8"))
        bits = np.unpackbits(
            np.frombuffer(struct.pack("<Q", h), dtype=np.uint8)
        ).astype(np.int64)
        acc += bits * 2 - 1
    out = 0
    for i, v in enumerate(acc):
        if v > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def winnowing_fingerprints_batch(
    texts: list[str], k: int = 8, window: int = 4
) -> tuple[np.ndarray, np.ndarray]:
    """Batch winnowing with ``stable_u64_md5`` gram hashes — the hot-path
    formulation of ``winnowing_fingerprint(hash_fn=stable_u64_md5)``.

    Per-POSITION work is pure numpy: each text becomes a uint32
    codepoint array, k-grams are a zero-copy sliding-window view recast
    to fixed-width void records, and one batch-wide ``np.unique`` +
    ``searchsorted`` maps every position to its gram id. hashlib.md5
    then runs once per DISTINCT gram per batch (the only Python loop
    over data), matching the old per-doc dict cache's call count while
    deleting its per-position interpreted overhead. Window-min
    selection and the run-dedupe rule are the proven-vectorized kernel
    from ``winnowing_fingerprint``.

    Texts shorter than ``k`` chars (after lower()) are skipped, like the
    query path. Returns (text_index:int64, fingerprint:uint64) arrays —
    per-text DISTINCT fingerprints, ascending within a text."""
    rec_dtype = np.dtype((np.void, 4 * k))
    docs: list[tuple[int, np.ndarray]] = []
    for i, text in enumerate(texts):
        s = text.lower()
        if len(s) < k:
            continue
        cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
        sw = np.lib.stride_tricks.sliding_window_view(cp, k)
        docs.append((i, np.ascontiguousarray(sw).view(rec_dtype).ravel()))
    if not docs:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    uniq = np.unique(np.concatenate([r for _, r in docs]))
    grams = uniq.view(np.uint32).reshape(-1, k)
    if grams.size and grams.max() < 128:
        # pure-ASCII batch: utf-8 == codepoint bytes, one contiguous
        # buffer sliced per gram (no chr/join per gram)
        buf = grams.astype(np.uint8).tobytes()
        it = (stable_u64_md5(buf[o : o + k]) for o in range(0, len(buf), k))
    else:
        it = (
            stable_u64_md5("".join(map(chr, row)).encode("utf-8"))
            for row in grams
        )
    hs_uniq = np.fromiter(it, dtype=np.uint64, count=len(uniq))
    out_idx: list[np.ndarray] = []
    out_fp: list[np.ndarray] = []
    for i, rec in docs:
        hs = hs_uniq[np.searchsorted(uniq, rec)]
        if len(hs) < window:
            continue  # shorter than one window: no picks (see above)
        sw2 = np.lib.stride_tricks.sliding_window_view(hs, window)
        idx = sw2.argmin(axis=1) + np.arange(len(sw2))
        keep = np.empty(len(idx), dtype=bool)
        keep[0] = True
        np.not_equal(idx[1:], idx[:-1], out=keep[1:])
        fps = np.unique(hs[idx[keep]])
        out_idx.append(np.full(len(fps), i, dtype=np.int64))
        out_fp.append(fps)
    if not out_idx:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    return np.concatenate(out_idx), np.concatenate(out_fp)


def winnowing_fingerprint(
    text: str, k: int = 8, window: int = 4, hash_fn=None
) -> list[int]:
    """Rolling-hash (winnowing) document fingerprint: the set of minimal
    k-gram char hashes per window, as in Schleimer et al. (SIGMOD'03).
    Pass ``hash_fn=stable_u64_md5`` for the DuckDB-reproducible variant."""
    hash_fn = hash_fn or _stable_u64
    s = text.lower()
    if len(s) < k:
        return [hash_fn(s.encode("utf-8"))] if s else []
    hs = np.fromiter(
        (hash_fn(s[i : i + k].encode("utf-8")) for i in range(len(s) - k + 1)),
        dtype=np.uint64,
        count=len(s) - k + 1,
    )
    if len(hs) < window:
        # shorter than one window: the loop below never runs; keep the
        # historical behavior (no picks)
        return []
    # vectorized window-min selection: first-min index per sliding
    # window is non-decreasing (a smaller-or-equal earlier value would
    # have been the previous window's first min), so dropping runs of
    # equal indices reproduces the sequential `idx != prev` rule exactly
    sw = np.lib.stride_tricks.sliding_window_view(hs, window)
    idx = sw.argmin(axis=1) + np.arange(len(sw))
    keep = np.empty(len(idx), dtype=bool)
    keep[0] = True
    np.not_equal(idx[1:], idx[:-1], out=keep[1:])
    return hs[idx[keep]].tolist()
