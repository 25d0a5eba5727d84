"""Fixture invariants that the SQL-oracle equivalence relies on.

The DuckDB oracle detects mentions as *maximal* dictionary n-gram matches
(no strict containment), while the kernels use greedy left-to-right
longest-match. These coincide only when matches never partially overlap —
the generator guarantees it; this test proves it on the generated data."""

import pyarrow.parquet as pq

from biomedical_ner_ray.fixtures import alias_rows, ensure_fixture
from biomedical_ner_ray.kernels.tagger import AliasDict, tag_tokens
from biomedical_ner_ray.kernels.tokenize import MAX_SEQ_LEN, tokenize_text


def _maximal_matches(tokens, ad: AliasDict):
    limit = min(len(tokens), MAX_SEQ_LEN)
    low = [t.lower() for t in tokens[:limit]]
    cands = []
    for i in range(limit):
        for n in range(1, min(ad.max_ngram, limit - i) + 1):
            key = " ".join(low[i : i + n])
            if ad.lookup(key) is not None:
                cands.append((i, i + n - 1, key))
    out = []
    for c in cands:
        contained = any(
            d != c and d[0] <= c[0] and d[1] >= c[1] for d in cands
        )
        if not contained:
            out.append(c)
    return out


def _greedy_matches(tokens, ad: AliasDict):
    tags = tag_tokens(tokens, ad)
    out = []
    i = 0
    while i < len(tags):
        if tags[i].startswith("B-"):
            j = i
            while j + 1 < len(tags) and tags[j + 1].startswith("I-"):
                j += 1
            out.append((i, j))
            i = j + 1
        else:
            i += 1
    return out


def test_greedy_equals_maximal_on_fixture(tiny_fixture):
    ad = AliasDict(alias_rows())
    texts = pq.read_table(tiny_fixture["transcripts"])["text"].to_pylist()
    for text in texts:
        toks = tokenize_text(text)
        greedy = _greedy_matches(toks, ad)
        maximal = [(a, b) for a, b, _k in _maximal_matches(toks, ad)]
        assert greedy == sorted(maximal), text
        # maximal matches must also be non-overlapping (pairwise disjoint)
        for x in range(1, len(maximal)):
            assert maximal[x - 1][1] < maximal[x][0], text


def test_fixture_deterministic():
    from biomedical_ner_ray.fixtures import generate_transcripts

    a = generate_transcripts(30)
    b = generate_transcripts(30)
    assert a.equals(b)


def test_fixture_has_edge_cases(tiny_fixture):
    tbl = pq.read_table(tiny_fixture["transcripts"])
    texts = tbl["text"].to_pylist()
    assert any(len(tokenize_text(t)) > MAX_SEQ_LEN for t in texts)  # truncation
    assert any("V-(D)-J" in t for t in texts)  # tokenizer edge
    assert any(t != t.lower() and t.lower() in " ".join(texts).lower() for t in texts)
    # out-of-order rows: file order is not (conv_id, turn_idx) order
    pairs = list(zip(tbl["conv_id"].to_pylist(), tbl["turn_idx"].to_pylist()))
    assert pairs != sorted(pairs)
    # heavy tail: at least one hot conversation
    from collections import Counter

    c = Counter(tbl["conv_id"].to_pylist())
    assert max(c.values()) >= 100


def test_ensure_fixture_idempotent(tiny_fixture):
    again = ensure_fixture("sf0.001")
    assert again["dir"] == tiny_fixture["dir"]
