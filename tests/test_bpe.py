"""BPE trainer: distributed result == independent single-process
reference, determinism, greedy-merge semantics, tie-breaks."""

import pandas as pd
import pytest
import ray.data as rd

from biomedical_ner_ray.stages.bpe import (
    _merge_word,
    bpe_reference,
    bpe_train,
)

WC = {
    "low": 5,
    "lower": 2,
    "newest": 6,
    "widest": 3,
    "west": 4,
    "a": 9,  # single-symbol word: contributes no pairs
}


def _wc_ds(wc: dict, blocks: int = 3):
    items = sorted(wc.items())
    dfs = [
        pd.DataFrame(
            {
                "word": [w for w, _ in items[i::blocks]],
                "n": [n for _, n in items[i::blocks]],
            }
        )
        for i in range(blocks)
    ]
    ds = rd.from_pandas(dfs[0])
    for d in dfs[1:]:
        ds = ds.union(rd.from_pandas(d))
    return ds


def test_matches_reference(ray_session):
    got = bpe_train(_wc_ds(WC), merges=6)
    want = bpe_reference(WC, merges=6)
    pd.testing.assert_frame_equal(got, want)


def test_partitioning_invariance(ray_session):
    a = bpe_train(_wc_ds(WC, blocks=1), merges=5)
    b = bpe_train(_wc_ds(WC, blocks=4), merges=5)
    pd.testing.assert_frame_equal(a, b)


def test_reference_classic_example():
    # Sennrich's canonical example: 'es' (newest 6 + widest 3 + west 4)
    # dominates the first merge.
    out = bpe_reference(WC, merges=1)
    assert list(out.iloc[0][["left", "right"]]) == ["e", "s"]
    assert out.iloc[0]["pair_count"] == 13


def test_merge_word_greedy_left_to_right():
    assert _merge_word(("a", "a", "a"), "a", "a", "aa") == ("aa", "a")
    assert _merge_word(("x", "a", "b", "a", "b"), "a", "b", "ab") == (
        "x",
        "ab",
        "ab",
    )


def test_early_stop_no_pairs(ray_session):
    wc = {"a": 3, "b": 2}
    got = bpe_train(_wc_ds(wc, blocks=2), merges=4)
    assert got.empty
    assert bpe_reference(wc, merges=4).empty
