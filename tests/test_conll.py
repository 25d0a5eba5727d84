"""S1 CoNLL/TSV source: parser semantics (fonctions.py:17-59 parity) and
distributed-read equivalence."""

import pandas as pd

from biomedical_ner_ray.fixtures import ensure_conll_fixture, generate_conll_text
from biomedical_ner_ray.sources.conll import (
    parse_conll_bytes,
    read_conll,
    sentences_from_tokens,
)

SAMPLE = (
    "-DOCSTART-\t-X-\n"
    "\n"
    "IL-2\tB-protein\n"
    "gene\tI-protein\n"
    "expression\tO\n"
    "\n"
    "\n"  # double blank: no empty sentence emitted
    "malformed line without tab\n"
    "\n"
    "HeLa\tB-cell_line\n"
    "cells\tO"  # unterminated final sentence must flush
)


def reference_parse(text: str):
    """Literal reimplementation of the reference loop (fonctions.py:31-48)
    as the conformance oracle for the kernel."""
    sentences, sentence = [], []
    for line in text.split("\n"):
        line = line.strip()
        if not line:
            if sentence:
                sentences.append(sentence)
                sentence = []
            continue
        if line.startswith("-DOCSTART-"):
            continue
        parts = line.split("\t")
        if len(parts) >= 2:
            sentence.append((parts[0], parts[1]))
    if sentence:
        sentences.append(sentence)
    return sentences


def test_parse_matches_reference_semantics():
    df = parse_conll_bytes(SAMPLE.encode(), "train.tsv")
    got = sentences_from_tokens(df)
    assert got == reference_parse(SAMPLE)
    assert got == [
        [("IL-2", "B-protein"), ("gene", "I-protein"), ("expression", "O")],
        [("HeLa", "B-cell_line"), ("cells", "O")],
    ]
    # sentence ordinals are dense (skipped-only segments consume none)
    assert sorted(df["sent_idx"].unique().tolist()) == [0, 1]


def test_generated_fixture_matches_reference_parse():
    text = generate_conll_text(60)
    df = parse_conll_bytes(text.encode(), "train.tsv")
    assert sentences_from_tokens(df) == reference_parse(text)
    assert len(sentences_from_tokens(df)) == 60


def test_distributed_read_equals_local_parse(ray_session):
    path = ensure_conll_fixture("sf0.001")
    ds = read_conll(path)
    got = (
        ds.to_pandas()
        .sort_values(["path", "sent_idx", "tok_idx"])
        .reset_index(drop=True)
    )
    local = parse_conll_bytes(open(path, "rb").read(), path).sort_values(
        ["path", "sent_idx", "tok_idx"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, local)
