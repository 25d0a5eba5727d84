"""Resumability: killed-run semantics via per-partition lineage manifests.

north_rule: resume produces byte-identical outputs with manifests showing
zero recomputation of completed partitions."""

import glob
import hashlib
import os
import shutil

import pyarrow.parquet as pq

from biomedical_ner_ray.pipelines.kg import run_kg_pipeline


def _content_hash(d: str) -> str:
    h = hashlib.sha256()
    for f in sorted(glob.glob(d + "/**/*.parquet", recursive=True)):
        tbl = pq.read_table(f)
        rows = sorted(map(str, tbl.to_pylist()))
        for r in rows:
            h.update(r.encode())
    return h.hexdigest()


def test_resume_skips_completed_partitions(tmp_path, tiny_fixture):
    out = str(tmp_path / "kg")
    res1 = run_kg_pipeline(tiny_fixture["transcripts"], tiny_fixture["alias_dict"], out)
    assert res1["annotations"]["built_buckets"] > 0
    hashes1 = {k: _content_hash(v) for k, v in res1["paths"].items() if v}

    # simulate a kill: delete two annotation buckets and everything downstream
    ann = res1["paths"]["annotations"]
    buckets = sorted(glob.glob(ann + "/bucket=*"))
    for b in buckets[:2]:
        shutil.rmtree(b)
    for stage in ("mentions", "triples", "nodes", "edges"):
        shutil.rmtree(res1["paths"][stage])

    res2 = run_kg_pipeline(tiny_fixture["transcripts"], tiny_fixture["alias_dict"], out)
    # completed partitions were NOT recomputed
    assert res2["turns_sorted"]["skipped"] is True
    assert res2["annotations"]["skipped_buckets"] == len(buckets) - 2
    assert res2["annotations"]["built_buckets"] == 2
    # byte-identical final content
    hashes2 = {k: _content_hash(v) for k, v in res2["paths"].items() if v}
    assert hashes1 == hashes2


def test_noop_resume_everything_skipped(tmp_path, tiny_fixture):
    out = str(tmp_path / "kg2")
    run_kg_pipeline(tiny_fixture["transcripts"], tiny_fixture["alias_dict"], out)
    res = run_kg_pipeline(tiny_fixture["transcripts"], tiny_fixture["alias_dict"], out)
    assert res["annotations"]["built_buckets"] == 0
    for stage in ("turns_sorted", "mentions", "triples", "nodes", "edges"):
        assert res[stage]["skipped"] is True


def test_manifest_records_lineage(tmp_path, tiny_fixture):
    out = str(tmp_path / "kg3")
    res = run_kg_pipeline(tiny_fixture["transcripts"], tiny_fixture["alias_dict"], out)
    for m in res["annotations"]["buckets"]:
        assert m["fingerprint"]
        assert m["rows"] > 0
    # manifest file exists inside each completed partition dir
    ann = res["paths"]["annotations"]
    for b in sorted(glob.glob(ann + "/bucket=*")):
        assert os.path.exists(os.path.join(b, "_MANIFEST.json"))
