"""End-to-end conformance: Ray KG pipeline vs the single-process oracle.

SURVEY.md §5: set-wise comparison of entity spans, linked CUIs and triple
sets, asserting P/R ≥ 0.95 (they are in fact exactly 1.0 because pipeline
and oracle share the same kernels), plus per-turn text equality of the
sorted turns table vs the input under (conv_id, turn_idx) ordering."""

import glob

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from biomedical_ner_ray.oracle import run_oracle
from biomedical_ner_ray.pipelines.kg import run_kg_pipeline


def _read_dir(d: str) -> pa.Table:
    files = sorted(glob.glob(d + "/**/*.parquet", recursive=True))
    return pa.concat_tables([pq.read_table(f) for f in files])


def _pr(pred: set, gold: set) -> tuple[float, float]:
    if not pred or not gold:
        return 0.0, 0.0
    tp = len(pred & gold)
    return tp / len(pred), tp / len(gold)


@pytest.fixture(scope="module")
def run(tmp_path_factory, tiny_fixture, alias_rows_fx):
    out = str(tmp_path_factory.mktemp("kg_out"))
    res = run_kg_pipeline(
        tiny_fixture["transcripts"], tiny_fixture["alias_dict"], out
    )
    gold = run_oracle(
        pq.read_table(tiny_fixture["transcripts"]).to_pylist(), alias_rows_fx
    )
    return res, gold


def test_mention_spans_match(run):
    res, gold = run
    m = _read_dir(res["paths"]["mentions"])
    pred = set(
        zip(
            m["conv_id"].to_pylist(),
            m["turn_idx"].to_pylist(),
            m["start_tok"].to_pylist(),
            m["end_tok"].to_pylist(),
            m["type"].to_pylist(),
            m["text"].to_pylist(),
        )
    )
    g = {
        (x["conv_id"], x["turn_idx"], x["start_tok"], x["end_tok"], x["type"], x["text"])
        for x in gold["mentions"]
    }
    p, r = _pr(pred, g)
    assert p >= 0.95 and r >= 0.95
    assert pred == g  # shared kernels → exact


def test_linked_cuis_match(run):
    res, gold = run
    m = _read_dir(res["paths"]["mentions"])
    pred = set(zip(m["mention_id"].to_pylist(), m["cui"].to_pylist()))
    g = {(x["mention_id"], x["cui"]) for x in gold["linked_mentions"]}
    assert pred == g


def test_triple_set_pr(run):
    res, gold = run
    t = _read_dir(res["paths"]["triples"])
    pred = set(
        zip(
            t["subj_cui"].to_pylist(),
            t["pred"].to_pylist(),
            t["obj_cui"].to_pylist(),
            t["conv_id"].to_pylist(),
            t["turn_idx"].to_pylist(),
        )
    )
    g = {
        (x["subj_cui"], x["pred"], x["obj_cui"], x["conv_id"], x["turn_idx"])
        for x in gold["triples"]
    }
    p, r = _pr(pred, g)
    assert p >= 0.95 and r >= 0.95
    assert pred == g


def test_nodes_and_edges_exact(run):
    res, gold = run
    n = _read_dir(res["paths"]["nodes"])
    e = _read_dir(res["paths"]["edges"])
    pred_nodes = sorted(
        zip(
            n["cui"].to_pylist(),
            n["canonical_name"].to_pylist(),
            n["type"].to_pylist(),
            n["mention_count"].to_pylist(),
        )
    )
    gold_nodes = sorted(
        (x["cui"], x["canonical_name"], x["type"], x["mention_count"])
        for x in gold["nodes"]
    )
    assert pred_nodes == gold_nodes
    pred_edges = sorted(
        zip(
            e["subj_cui"].to_pylist(),
            e["pred"].to_pylist(),
            e["obj_cui"].to_pylist(),
            e["weight"].to_pylist(),
        )
    )
    gold_edges = sorted(
        (x["subj_cui"], x["pred"], x["obj_cui"], x["weight"]) for x in gold["edges"]
    )
    assert pred_edges == gold_edges


def test_per_turn_text_equality_under_ordering(run, tiny_fixture):
    """north_rule: per-turn text equality under stable (conv_id, turn_idx)
    ordering — the sorted turns table is a permutation-free copy of input."""
    res, _ = run
    sorted_tbl = _read_dir(res["paths"]["turns_sorted"])
    inp = pq.read_table(tiny_fixture["transcripts"])
    key = lambda t: sorted(
        zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist(), t["text"].to_pylist())
    )
    assert key(sorted_tbl) == key(inp)
    # and the written table is actually sorted
    pairs = list(zip(sorted_tbl["conv_id"].to_pylist(), sorted_tbl["turn_idx"].to_pylist()))
    assert pairs == sorted(pairs)


def test_annotation_counts(run):
    res, gold = run
    assert res["annotations"]["rows"] == res["turns_sorted"]["rows"]
    assert res["mentions"]["rows"] == len(gold["mentions"])
    assert res["triples"]["rows"] == len(gold["triples"])
