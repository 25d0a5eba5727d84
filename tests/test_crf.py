"""CRF scorer tests: Viterbi correctness on hand cases, BIO transition
constraints, and the decode-equivalence guarantee vs the dictionary
tagger on the fixture corpus (kernels/crf.py docstring contract)."""

import glob

import numpy as np
import pyarrow.parquet as pq

from biomedical_ner_ray.fixtures import alias_rows, ensure_fixture
from biomedical_ner_ray.kernels.crf import (
    CRFScorer,
    bio_tagset,
    bio_transitions,
    viterbi_decode,
)
from biomedical_ner_ray.kernels.tagger import AliasDict, tag_tokens
from biomedical_ner_ray.kernels.tokenize import TOKEN_RE


def test_bio_tagset_deterministic():
    tags = bio_tagset(["protein", "DNA"])
    assert tags == ["O", "B-DNA", "I-DNA", "B-protein", "I-protein"]


def test_transitions_block_orphan_inside():
    tags = bio_tagset(["x", "y"])
    trans = bio_transitions(tags)
    ti = {t: i for i, t in enumerate(tags)}
    assert trans[ti["O"], ti["I-x"]] < -1e8  # O -> I-x invalid
    assert trans[ti["B-y"], ti["I-x"]] < -1e8  # B-y -> I-x invalid
    assert trans[ti["B-x"], ti["I-x"]] == 0.0
    assert trans[ti["I-x"], ti["I-x"]] == 0.0
    assert trans[ti["I-x"], ti["B-y"]] == 0.0


def test_viterbi_hand_case():
    # 2 tags, 3 steps; emissions force path 0,1,1 unless transition blocks it
    em = np.array([[5.0, 0.0], [0.0, 5.0], [0.0, 5.0]])
    trans = np.zeros((2, 2))
    assert viterbi_decode(em, trans) == [0, 1, 1]
    # blocking 0->1 forces the path through tag 1 from the start or stay at 0
    trans[0, 1] = -1e9
    path = viterbi_decode(em, trans)
    assert path in ([1, 1, 1], [0, 0, 0])


def test_viterbi_empty():
    assert viterbi_decode(np.zeros((0, 3)), np.zeros((3, 3))) == []


def test_decode_equals_dict_tags_on_fixture(tiny_fixture):
    ad = AliasDict(alias_rows())
    types = sorted({e.type for e in ad.by_key.values()})
    crf = CRFScorer(types)
    n = 0
    for f in sorted(glob.glob(tiny_fixture["transcripts"] + "/*.parquet"))[:2]:
        for text in pq.read_table(f, columns=["text"])["text"].to_pylist():
            toks = TOKEN_RE.findall(text)
            if not toks:
                continue
            dict_tags = tag_tokens(toks, ad)
            assert crf.decode(toks, dict_tags) == dict_tags
            n += 1
    assert n > 100  # meaningful corpus coverage
