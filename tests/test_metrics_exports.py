"""Tests for the conformance-metrics module (G7) and the export surface
(S8/S9): explicit P/R/F1 numbers and app-shaped artifacts."""

import glob
import json
import os

import pyarrow.parquet as pq
import ray.data as rd

from biomedical_ner_ray.exports import export_mentions_csv, export_run_summary_json
from biomedical_ner_ray.metrics import (
    conformance_report,
    set_prf,
    token_tag_metrics,
)


def test_set_prf_basic():
    assert set_prf({1, 2, 3}, {2, 3, 4}) == {
        "tp": 2, "pred": 3, "gold": 3,
        "precision": 2 / 3, "recall": 2 / 3, "f1": 2 / 3,
    }
    assert set_prf(set(), set())["f1"] == 1.0


def test_token_tag_metrics_reference_semantics():
    gold = ["O", "B-DNA", "I-DNA", "O", "B-protein", "O"]
    pred = ["O", "B-DNA", "O", "O", "B-protein", "B-DNA"]
    m = token_tag_metrics(gold, pred)
    assert m["token_accuracy"] == 4 / 6
    # O/O pairs excluded from the confusion space (reference cell 9)
    assert ("O", "O") not in m["confusion"]
    assert m["confusion"][("I-DNA", "O")] == 1
    assert m["confusion"][("O", "B-DNA")] == 1
    assert m["per_class"]["B-protein"]["f1"] == 1.0
    # B-DNA: tp=1, fp=1 (O->B-DNA), fn=0
    assert m["per_class"]["B-DNA"]["precision"] == 0.5
    assert m["per_class"]["B-DNA"]["recall"] == 1.0


def test_conformance_report_and_exports(ray_session, tiny_fixture, alias_rows_fx, tmp_path):
    """Pipeline vs oracle through the G7 report: P/R must be exactly 1.0
    (shared kernels), and the report certifies the north-rule gate."""
    from biomedical_ner_ray.oracle import run_oracle
    from biomedical_ner_ray.pipelines.kg import run_kg_pipeline

    out = str(tmp_path / "kg")
    res = run_kg_pipeline(tiny_fixture["transcripts"], tiny_fixture["alias_dict"], out)
    gold = run_oracle(
        pq.read_table(tiny_fixture["transcripts"]).to_pylist(), alias_rows_fx
    )
    mfiles = sorted(glob.glob(res["paths"]["mentions"] + "/**/*.parquet", recursive=True))
    m = pq.read_table(mfiles[0]) if len(mfiles) == 1 else None
    import pyarrow as pa

    m = pa.concat_tables([pq.read_table(f) for f in mfiles])
    tfiles = sorted(glob.glob(res["paths"]["triples"] + "/**/*.parquet", recursive=True))
    t = pa.concat_tables([pq.read_table(f) for f in tfiles])

    pred_m = set(zip(m["conv_id"].to_pylist(), m["turn_idx"].to_pylist(),
                     m["start_tok"].to_pylist(), m["end_tok"].to_pylist()))
    gold_m = {(x["conv_id"], x["turn_idx"], x["start_tok"], x["end_tok"])
              for x in gold["mentions"]}
    pred_t = set(zip(t["subj_cui"].to_pylist(), t["pred"].to_pylist(),
                     t["obj_cui"].to_pylist(), t["conv_id"].to_pylist(),
                     t["turn_idx"].to_pylist()))
    gold_t = {(x["subj_cui"], x["pred"], x["obj_cui"], x["conv_id"], x["turn_idx"])
              for x in gold["triples"]}
    rep = conformance_report(pred_m, gold_m, pred_t, gold_t)
    assert rep["passes_north_rule"]
    assert rep["mentions"]["precision"] == rep["mentions"]["recall"] == 1.0
    assert rep["triples"]["precision"] == rep["triples"]["recall"] == 1.0

    # exports (S8/S9)
    mds = rd.read_parquet(mfiles)
    csv_dir = export_mentions_csv(mds, str(tmp_path / "csv"))
    csv_files = glob.glob(csv_dir + "/*")
    assert csv_files
    header = [c.strip('"') for c in open(csv_files[0]).readline().strip().split(",")]
    assert header == ["conv_id", "turn_idx", "start_tok", "end_tok", "text", "type", "cui"]
    bundle = export_run_summary_json(mds, str(tmp_path / "summary.json"))
    assert bundle["n_mentions"] == m.num_rows
    on_disk = json.load(open(tmp_path / "summary.json"))
    assert on_disk["type_counts"] == bundle["type_counts"]
    assert len(on_disk["sample"]) <= 20
