"""Unit tests for the row-local kernels vs reference semantics.

Golden expectations are derived from the reference's own behaviors
(tokenizer app.py:210-214; extract_entities app.py:335-416 incl. the
orphan-I- repair; char-span projection fonctions.py:120-160; markup
parser fonctions.py:61-117)."""

from biomedical_ner_ray.kernels.bio import extract_entities, project_spans_to_bio
from biomedical_ner_ray.kernels.markup import parse_annotated_line, parse_annotated_text
from biomedical_ner_ray.kernels.tagger import AliasDict, tag_tokens
from biomedical_ner_ray.kernels.tokenize import (
    MAX_SEQ_LEN,
    tokenize_text,
    tokenize_with_offsets,
)


class TestTokenizer:
    def test_hyphenated_tokens_kept(self):
        assert tokenize_text("Octamer-binding proteins") == [
            "Octamer-binding",
            "proteins",
        ]

    def test_punctuation_split(self):
        assert tokenize_text("p53, and BRCA1.") == ["p53", ",", "and", "BRCA1", "."]

    def test_reference_example(self):
        # mirrors the app tokenizer on a golden-sentence-style input
        got = tokenize_text("V-(D)-J segments (controls).")
        assert got == ["V", "-", "(", "D", ")", "-", "J", "segments", "(", "controls", ")", "."]

    def test_empty(self):
        assert tokenize_text("") == []

    def test_offsets_tokenizer(self):
        toks, spans = tokenize_with_offsets("IL-2 gene")
        # offset variant has no hyphen grouping (fonctions.py:127)
        assert toks == ["IL", "-", "2", "gene"]
        assert spans[0] == (0, 2)
        assert spans[-1] == (5, 9)


class TestBioDecode:
    def test_simple_entity(self):
        ents = extract_entities(
            [("the", "O"), ("BRCA1", "B-DNA"), ("gene", "I-DNA"), (".", "O")]
        )
        assert len(ents) == 1
        e = ents[0]
        assert e["text"] == "BRCA1 gene"
        assert e["type"] == "DNA"
        assert (e["start_position"], e["end_position"]) == (1, 2)

    def test_adjacent_b_b(self):
        ents = extract_entities([("p53", "B-protein"), ("BRCA1", "B-DNA")])
        assert [(e["text"], e["type"]) for e in ents] == [
            ("p53", "protein"),
            ("BRCA1", "DNA"),
        ]

    def test_orphan_i_repaired_to_b(self):
        # reference app.py:370-386: I- without open entity becomes B-
        ents = extract_entities([("gene", "I-DNA"), ("x", "O")])
        assert len(ents) == 1
        assert ents[0]["tag"] == "B-DNA"
        assert ents[0]["individual_tags"] == ["I-DNA"]

    def test_type_switch_mid_entity(self):
        # I- of a different type closes previous and starts new (as B-)
        ents = extract_entities([("a", "B-DNA"), ("b", "I-protein")])
        assert [(e["type"], e["start_position"], e["end_position"]) for e in ents] == [
            ("DNA", 0, 0),
            ("protein", 1, 1),
        ]

    def test_final_open_entity_closes_at_end(self):
        ents = extract_entities([("x", "O"), ("HeLa", "B-cell_line"), ("cells", "I-cell_line")])
        assert ents[0]["end_position"] == 2

    def test_empty(self):
        assert extract_entities([]) == []


class TestSpanProjection:
    def test_overlap_projection(self):
        text = "adenomatous polyposis coli tumour"
        toks, spans = tokenize_with_offsets(text)
        ents = [{"start": 0, "end": 26, "type": "Disease"}]
        labels = project_spans_to_bio(toks, spans, ents)
        assert labels == ["B-Disease", "I-Disease", "I-Disease", "O"]

    def test_partial_token_overlap_counts(self):
        toks, spans = tokenize_with_offsets("abcdef gh")
        # entity covering chars 3..8 overlaps both tokens
        labels = project_spans_to_bio(toks, spans, [{"start": 3, "end": 8, "type": "X"}])
        assert labels == ["B-X", "I-X"]


class TestMarkupParser:
    def test_offsets_recomputed(self):
        text = 'Cases of <category="Modifier">breast cancer</category> were studied.'
        clean, ents = parse_annotated_text(text)
        assert clean == "Cases of breast cancer were studied."
        assert ents[0]["start"] == 9 and ents[0]["end"] == 22
        assert clean[ents[0]["start"] : ents[0]["end"]] == "breast cancer"
        assert ents[0]["type"] == "Modifier"

    def test_line_parser(self):
        doc = parse_annotated_line(
            '10192393\tA title\tThe <category="SpecificDisease">BRCA1 syndrome</category> is rare.'
        )
        assert doc["id"] == "10192393"
        assert doc["text"] == "The BRCA1 syndrome is rare."
        assert len(doc["entities"]) == 1

    def test_skips_malformed(self):
        assert parse_annotated_line("") is None
        assert parse_annotated_line("only\ttwo") is None


class TestDictTagger:
    def _ad(self):
        from biomedical_ner_ray.fixtures import alias_rows

        return AliasDict(alias_rows())

    def test_longest_match_wins(self):
        ad = self._ad()
        toks = ["HeLa", "cells", "grow"]
        tags = tag_tokens(toks, ad)
        assert tags == ["B-cell_line", "I-cell_line", "O"]

    def test_ambiguous_alias_longest_first(self):
        ad = self._ad()
        # "IL-2 gene" (DNA) beats "IL-2" (protein) at the same start
        assert tag_tokens(["IL-2", "gene"], ad) == ["B-DNA", "I-DNA"]
        assert tag_tokens(["IL-2", "levels"], ad) == ["B-protein", "O"]

    def test_case_insensitive(self):
        ad = self._ad()
        assert tag_tokens(["brca1"], ad) == ["B-DNA"]

    def test_truncation_at_max_seq_len(self):
        ad = self._ad()
        toks = ["filler"] * MAX_SEQ_LEN + ["BRCA1"]
        tags = tag_tokens(toks, ad)
        assert len(tags) == MAX_SEQ_LEN + 1
        assert tags[-1] == "O"  # past-100 token never tagged (app.py:218-219)

    def test_multi_cui_alias_resolves_min_cui(self):
        ad = self._ad()
        # "tumor necrosis factor" is an alias of C0000025 and C0000026
        e = ad.lookup("tumor necrosis factor")
        assert e.cui == "C0000025"
