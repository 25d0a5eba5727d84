"""Bloom filter kernel (kernels/bloom.py): no false negatives ever,
bounded false-positive rate, partial-OR merge == whole-set build,
process-stable determinism."""

import numpy as np

from biomedical_ner_ray.kernels.bloom import (
    bloom_build,
    bloom_merge,
    bloom_probe,
)


def test_no_false_negatives_and_fp_bounded():
    keys = list(range(0, 200_000, 2))  # 100k even keys
    bits = bloom_build(keys)
    assert bloom_probe(bits, keys).all()  # every inserted key passes
    absent = list(range(1, 200_001, 2))  # 100k odd keys
    fp = bloom_probe(bits, absent).mean()
    # (1 - e^{-kn/m})^k with k=4, n/m = 100k/2^20 → ≈1.2% theoretical
    assert fp < 0.02


def test_merge_equals_whole():
    a, b = list(range(5_000)), list(range(5_000, 10_000))
    merged = bloom_merge([bloom_build(a), bloom_build(b)])
    whole = bloom_build(a + b)
    assert np.array_equal(merged, whole)


def test_deterministic():
    bits1 = bloom_build([7, 42, 99])
    bits2 = bloom_build([7, 42, 99])
    assert np.array_equal(bits1, bits2)
    assert bits1.sum() > 0


def test_empty():
    bits = bloom_build([])
    assert bits.sum() == 0
    assert bloom_probe(bits, [1, 2, 3]).sum() == 0
