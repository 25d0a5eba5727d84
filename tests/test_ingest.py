"""Streaming-ingest composition (pipelines/ingest.py): three successive
deltas through incremental-dedup → annotate → edge upsert → vector
upsert must leave the store EQUAL to a from-scratch recompute over the
surviving turns (the kg_update_edges oracle discipline end-to-end),
with idempotent re-submission and crash-safe generation flips."""

import json
import os
import shutil

import pandas as pd
import pytest

from biomedical_ner_ray.fixtures import ensure_fixture


@pytest.fixture(scope="module")
def deltas(tmp_path_factory):
    """sf0.001 transcripts split into 3 delta dirs by conv md5 % 3."""
    import pyarrow.parquet as pq

    from biomedical_ner_ray.kernels.hashing import stable_u64_md5

    p = ensure_fixture("sf0.001")
    root = tmp_path_factory.mktemp("ingest_deltas")
    import pyarrow as pa

    from biomedical_ner_ray.state.manifest import list_parquet_files

    tables = [pq.read_table(f) for f in list_parquet_files(p["transcripts"])]
    t = pa.concat_tables(tables)
    convs = t["conv_id"].to_pylist()
    shard = [stable_u64_md5(f"delta:{c}".encode()) % 3 for c in convs]
    paths = []
    for s in range(3):
        mask = pa.array([x == s for x in shard])
        d = os.path.join(str(root), f"delta{s}")
        os.makedirs(d)
        pq.write_table(t.filter(mask), os.path.join(d, "part.parquet"))
        paths.append(d)
    return p, paths


def _frames_equal(a: pd.DataFrame, b: pd.DataFrame, keys):
    a = a.sort_values(keys, ignore_index=True)
    b = b.sort_values(keys, ignore_index=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_three_delta_ingest_equals_full_recompute(ray_session, deltas, tmp_path):
    import ray

    from biomedical_ner_ray.kernels.tagger import AliasDict
    from biomedical_ner_ray.oracle import canonical_components
    from biomedical_ner_ray.pipelines.ingest import (
        _turn_vector,
        _vpart,
        ingest_delta,
        store_edges,
        store_turns,
        store_vector_summary,
    )
    from biomedical_ner_ray.stages.annotate import annotate_stage
    from biomedical_ner_ray.stages.explode import triples_stage
    from biomedical_ner_ray.stages.graph import edges_stage

    p, delta_paths = deltas
    store = str(tmp_path / "store")
    reports = [ingest_delta(store, d, p["alias_dict"]) for d in delta_paths]

    assert [r["delta"] for r in reports] == [0, 1, 2]
    assert all(r["n_kept"] <= r["n_delta_turns"] for r in reports)
    # dedup actually fired: the fixture's turn texts are heavily
    # duplicated, so later deltas must drop against the standing index
    assert sum(r["n_dropped"] for r in reports[1:]) > 0
    # every delta touched only a bounded bucket set
    for r in reports:
        assert len(r["touched_edge_buckets"]) <= 16

    # idempotence: re-submitting an applied delta is a no-op
    again = ingest_delta(store, delta_paths[1], p["alias_dict"])
    assert again.get("skipped") is True
    state = json.load(open(os.path.join(store, "store.json")))
    assert state["generation"] == 2

    # ---- final edge table == from-scratch recompute over survivors --
    import pyarrow.parquet as pq

    alias_rows = pq.read_table(p["alias_dict"]).to_pylist()
    alias_ref = ray.put(AliasDict(alias_rows))
    comp_ref = ray.put(canonical_components(alias_rows))
    surv = store_turns(store).materialize()
    ann = annotate_stage(
        surv.select_columns(["conv_id", "turn_idx", "text"]), alias_ref
    )
    full = edges_stage(lambda: triples_stage(ann), comp_ref).to_pandas()
    got = store_edges(store).to_pandas()
    assert len(got) > 0
    _frames_equal(got, full, ["subj_cui", "pred", "obj_cui"])

    # ---- vector-store summary == per-turn recompute ------------------
    sdf = surv.to_pandas()
    sdf["vpart"] = [ _vpart(_turn_vector(t)) for t in sdf["text"] ]
    exp = (
        sdf.groupby("vpart")["doc_id"]
        .agg(n_vecs="size", min_vec_id="min", max_vec_id="max")
        .reset_index()
        .astype({"vpart": "int64", "n_vecs": "int64"})
    )
    got_v = store_vector_summary(store)
    _frames_equal(
        got_v.astype({"min_vec_id": "int64", "max_vec_id": "int64"}),
        exp.astype({"min_vec_id": "int64", "max_vec_id": "int64"}),
        ["vpart"],
    )

    # ---- crash-safety: an orphan next-generation dir is rebuilt -----
    orphan = os.path.join(store, "gen3")
    os.makedirs(orphan, exist_ok=True)
    open(os.path.join(orphan, "junk.parquet"), "w").close()
    # new delta content (re-use delta0 with a marker row removed → new
    # fingerprint): simplest is re-ingesting an edited copy
    import pyarrow as pa

    t = pq.read_table(os.path.join(delta_paths[0], "part.parquet"))
    d4 = str(tmp_path / "delta_edit")
    os.makedirs(d4)
    pq.write_table(t.slice(0, max(1, t.num_rows // 2)), os.path.join(d4, "p.parquet"))
    r4 = ingest_delta(store, d4, p["alias_dict"])
    assert r4["delta"] == 3 and not r4.get("skipped")
    # every turn of the re-submitted slice is either already registered
    # or a near-dup of the standing index — the APPEND-ONLY-per-turn-id
    # guard drops all of them and the generation is a pure carry
    assert r4["n_kept"] == 0
    assert not os.path.exists(os.path.join(store, "gen3", "junk.parquet"))
    # superseded generation is swept
    assert not os.path.exists(os.path.join(store, "gen2"))
    # the carried store still serves the same edge table
    assert store_edges(store).count() == len(got)
