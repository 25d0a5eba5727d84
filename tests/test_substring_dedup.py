"""Exact-substring dedup (Lee et al. ACL'22 duplicated-span detection,
queries.doc_substring_dedup / doc_substring_dup_stats): islands-merge
kernel known answers, planted cross-doc spans end-to-end, and parity
with a literal per-doc reference implementation."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from biomedical_ner_ray import queries as Q
from biomedical_ner_ray.kernels.textstats import WORD_RE

N = Q.SUBDUP_NGRAM


def test_spans_frame_known_answers():
    # doc 1: gram starts 0,5,8 — 5-0<=8 and 8-5<=8 merge all three into
    # [0, 8+N-1]; doc 2: starts 0 and 20 split (20-0 > 8)
    df = pd.DataFrame(
        {"doc_id": [1, 1, 1, 2, 2], "pos": [5, 0, 8, 20, 0]}
    )
    out = Q._subdup_spans_frame(df).sort_values(["doc_id", "start_tok"])
    assert out.values.tolist() == [
        [1, 0, 8 + N - 1, 3],
        [2, 0, N - 1, 1],
        [2, 20, 20 + N - 1, 1],
    ]


def test_spans_frame_empty_and_single():
    empty = pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                          "pos": pd.array([], dtype="int64")})
    assert len(Q._subdup_spans_frame(empty)) == 0
    one = pd.DataFrame({"doc_id": [7], "pos": [3]})
    assert Q._subdup_spans_frame(one).values.tolist() == [[7, 3, 3 + N - 1, 1]]


def _write_docs(tmp_path, texts):
    d = os.path.join(str(tmp_path), "sf")
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return d


def _reference_spans(texts):
    """Literal per-doc reference: flag positions whose n-gram occurs in
    >= 2 distinct docs, then merge by scanning sorted positions."""
    grams = {}
    toks = [WORD_RE.findall(t.lower()) for t in texts]
    for i, ws in enumerate(toks):
        for p in range(max(len(ws) - N + 1, 0)):
            grams.setdefault(" ".join(ws[p : p + N]), set()).add(i)
    rows = []
    for i, ws in enumerate(toks):
        flagged = [
            p
            for p in range(max(len(ws) - N + 1, 0))
            if len(grams[" ".join(ws[p : p + N])]) >= 2
        ]
        start = prev = None
        ngrams = 0
        for p in flagged:
            if start is None:
                start, prev, ngrams = p, p, 1
            elif p - prev <= N:
                prev, ngrams = p, ngrams + 1
            else:
                rows.append((i, start, prev + N - 1, ngrams))
                start, prev, ngrams = p, p, 1
        if start is not None:
            rows.append((i, start, prev + N - 1, ngrams))
    return sorted(rows)


WORDS = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima".split()


def _sentence(rng, n):
    return " ".join(rng.choice(WORDS) for _ in range(n))


def test_planted_cross_doc_span(tmp_path):
    shared = " ".join(WORDS[:10])  # 10 tokens → 3 grams when planted alone
    import random

    rng = random.Random(7)
    texts = [
        f"{_sentence(rng, 15)} {shared} {_sentence(rng, 15)}",
        f"{shared} {_sentence(rng, 20)}",
        _sentence(rng, 30),
    ]
    d = _write_docs(tmp_path, texts)
    got = (
        Q.doc_substring_dedup(d)
        .to_pandas()
        .sort_values(["doc_id", "start_tok"])
        .reset_index(drop=True)
    )
    ref = pd.DataFrame(
        _reference_spans(texts),
        columns=["doc_id", "start_tok", "end_tok", "n_grams"],
    )
    assert got.values.tolist() == ref.values.tolist()
    # the planted copy is detected in both carriers, absent in doc 2
    assert set(got["doc_id"]) >= {0, 1}
    assert 2 not in set(got["doc_id"])
    # doc 1's span starts at its planted offset 0 and covers >= 10 tokens
    r1 = got[got["doc_id"] == 1].iloc[0]
    assert r1["start_tok"] == 0 and r1["end_tok"] - r1["start_tok"] + 1 >= 10


def test_within_doc_repeat_not_flagged(tmp_path):
    # the same 10-gram twice in ONE doc is self-repetition, not
    # cross-doc duplication — must produce no spans
    block = " ".join(WORDS[:10])
    import random

    rng = random.Random(11)
    texts = [f"{block} {_sentence(rng, 5)} {block}", _sentence(rng, 40)]
    d = _write_docs(tmp_path, texts)
    assert Q.doc_substring_dedup(d).to_pandas().empty


def test_dup_stats_matches_spans(tmp_path):
    import random

    rng = random.Random(13)
    shared_a = " ".join(rng.choice(WORDS) for _ in range(12))
    shared_b = " ".join(rng.choice(WORDS) for _ in range(9))
    texts = [
        f"{shared_a} {_sentence(rng, 25)} {shared_b}",
        f"{_sentence(rng, 10)} {shared_a}",
        f"{shared_b} {_sentence(rng, 18)}",
        _sentence(rng, 22),
    ]
    d = _write_docs(tmp_path, texts)
    spans = Q.doc_substring_dedup(d).to_pandas()
    stats = (
        Q.doc_substring_dup_stats(d)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    spans["dup_tokens"] = spans["end_tok"] - spans["start_tok"] + 1
    expect = (
        spans.groupby("doc_id", as_index=False)
        .agg(n_spans=("dup_tokens", "size"), dup_tokens=("dup_tokens", "sum"))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert stats.values.tolist() == expect.values.tolist()


@pytest.mark.parametrize("seed", [3, 29])
def test_random_corpus_matches_reference(tmp_path, seed):
    import random

    rng = random.Random(seed)
    # small vocabulary + doc-to-doc copying → organic shared substrings
    texts = []
    for i in range(12):
        t = _sentence(rng, rng.randint(0, 35))
        if i >= 4 and rng.random() < 0.6 and texts:
            src = WORD_RE.findall(rng.choice(texts).lower())
            if len(src) > N:
                a = rng.randrange(0, len(src) - N)
                b = rng.randrange(a + N, min(a + 25, len(src)) + 1)
                t = f"{t} {' '.join(src[a:b])}"
        texts.append(t.strip())
    d = _write_docs(tmp_path, texts)
    got = (
        Q.doc_substring_dedup(d)
        .to_pandas()
        .sort_values(["doc_id", "start_tok"])
        .reset_index(drop=True)
    )
    ref = pd.DataFrame(
        _reference_spans(texts),
        columns=["doc_id", "start_tok", "end_tok", "n_grams"],
    )
    assert got.values.tolist() == ref.values.tolist()
    assert len(got) > 0  # the copier must have produced real overlap
