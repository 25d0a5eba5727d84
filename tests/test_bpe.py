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


def test_encode_word_matches_reference_vocab_evolution():
    """encode_word under the trained rules reproduces the reference's
    final symbolization of every training word."""
    from biomedical_ner_ray.stages.bpe import _pair_counts_of, encode_word

    merges = bpe_reference(WC, merges=6)
    ranked = list(zip(merges["left"], merges["right"]))
    # replay the reference vocab evolution to get final symbol forms
    vocab = {tuple(w): n for w, n in WC.items()}
    for left, right in ranked:
        joined = left + right
        vocab = {_merge_word(s, left, right, joined): n for s, n in vocab.items()}
    final_forms = {("".join(s)): s for s in vocab}
    for w in WC:
        assert encode_word(w, ranked) == final_forms[w]


def test_encode_stage_counts(ray_session):
    from biomedical_ner_ray.stages.bpe import bpe_encode_stage, encode_word

    merges = bpe_reference(WC, merges=6)
    docs = rd.from_items(
        [
            {"doc_id": 0, "text": "low lower newest"},
            {"doc_id": 1, "text": "widest west a a"},
            {"doc_id": 2, "text": ""},
        ]
    )
    out = (
        bpe_encode_stage(docs, merges).to_pandas().sort_values("doc_id")
    )
    ranked = list(zip(merges["left"], merges["right"]))
    exp0 = sum(len(encode_word(w, ranked)) for w in ["low", "lower", "newest"])
    exp1 = sum(len(encode_word(w, ranked)) for w in ["widest", "west", "a", "a"])
    assert out["n_words"].tolist() == [3, 4, 0]
    assert out["n_bpe_tokens"].tolist() == [exp0, exp1, 0]
