"""M11+G8 balance/augmentation: target arithmetic, plausibility parity,
seeded augmentation, and class-count convergence."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from biomedical_ner_ray.pipelines.balance import (
    AugmentActor,
    compute_targets,
    downsample_overrepresented,
    is_plausible,
    run_balance_pipeline,
    tag_counts,
)
from biomedical_ner_ray.pipelines.embeddings import train_sgns


def test_compute_targets_reference_semantics():
    counts = {"B-RNA": 50, "I-RNA": 80, "B-protein": 900, "I-protein": 1000,
              "B-DNA": 300, "I-DNA": 200}
    t = compute_targets(counts)
    row = dict(zip(t["tag"], zip(t["target"], t["deficit"])))
    vals = sorted(counts.values())
    med = (vals[2] + vals[3]) // 2  # 250
    mx = 1000
    # RNA boost: min(med*2, max)  (fonctionsFaxtText.py:700)
    assert row["B-RNA"] == (min(med * 2, mx), min(med * 2, mx) - 50)
    # under-median boost: min(med*1.2, max*0.8) in integer form (:702)
    assert row["I-DNA"] == (min(med * 12 // 10, mx * 8 // 10), 100)
    # at/above median: unchanged (:704)
    assert row["B-protein"] == (900, 0)
    assert row["B-DNA"] == (300, 0)


def test_compute_targets_empty():
    assert compute_targets({}).empty


def test_is_plausible_reference_parity():
    # fonctionsFaxtText.py:553-562
    assert is_plausible("NF-kappa")
    assert is_plausible("gene_name")
    assert not is_plausible("x")  # len < 2
    assert not is_plausible("p53!")  # non-alpha after -/_ removal
    assert not is_plausible("the")  # blacklist
    assert not is_plausible("  ")


def _kv_fixture(tmp_path):
    sents = [["alpha", "beta", "gamma", "delta", "epsilon"],
             ["beta", "gamma", "delta"],
             ["alpha", "gamma", "epsilon", "beta"]] * 20
    m = train_sgns(sents, epochs=2, min_count=2)
    path = str(tmp_path / "kv.parquet")
    pq.write_table(
        pa.table({
            "word": pa.array(m.words, pa.string()),
            "vector": pa.array([v.tolist() for v in m.vectors],
                               pa.list_(pa.float64())),
        }),
        path,
    )
    return path, m


def test_augment_actor_semantics(tmp_path):
    kv_path, m = _kv_fixture(tmp_path)
    actor = AugmentActor(kv_path)
    tokens = ["alpha", "beta", "ENTITY", "gamma"]
    tags = ["O", "O", "B-protein", "O"]
    out1 = actor.augment("s1", 0, tokens, tags, replace_prob=1.0, top_k=5)
    out2 = actor.augment("s1", 0, tokens, tags, replace_prob=1.0, top_k=5)
    assert out1 == out2  # seeded per (sent, copy, position)
    assert out1[2] == "ENTITY"  # non-O tokens never touched
    for orig, new in zip(tokens, out1):
        if new != orig:
            assert is_plausible(new)
            assert new in m.words  # replacements come from the KV vocab
    # different copy index → independent RNG stream
    out3 = actor.augment("s1", 1, tokens, tags, replace_prob=1.0, top_k=5)
    assert out3[2] == "ENTITY"
    # prob 0 → identity
    assert actor.augment("s1", 0, tokens, tags, 0.0, 5) == tokens


def _sentence_ds():
    rows = []
    # 30 protein sentences (majority), 4 RNA sentences (rare)
    for i in range(30):
        rows.append({"sent_id": f"p{i}", "tokens": ["alpha", "PROT", "beta"],
                     "tags": ["O", "B-protein", "O"]})
    for i in range(4):
        rows.append({"sent_id": f"r{i}", "tokens": ["gamma", "RNA1", "delta"],
                     "tags": ["O", "B-RNA", "O"]})
    return rows


def test_balance_pipeline_converges(ray_session, tmp_path):
    kv_path, _ = _kv_fixture(tmp_path)
    rows = _sentence_ds()
    final, report = run_balance_pipeline(
        lambda: rd.from_items(rows), kv_path, concurrency=1
    )
    df = final.to_pandas()
    before = report["counts_before"]
    assert before == {"B-protein": 30, "B-RNA": 4}

    def count_tag(frame, tag):
        return int(sum(t.count(tag) if isinstance(t, list) else list(t).count(tag)
                       for t in frame["tags"]))

    after_rna = count_tag(df, "B-RNA")
    # rare class grows toward its target; originals all kept (not overrep)
    assert after_rna > 4
    tgt = dict(zip(report["targets"]["tag"], report["targets"]["target"]))
    assert after_rna <= max(tgt["B-RNA"], 4) + 20  # bounded by cap
    # determinism across runs
    final2, _ = run_balance_pipeline(
        lambda: rd.from_items(rows), kv_path, concurrency=1
    )
    df2 = final2.to_pandas()
    key = ["sent_id", "copy_idx"]
    a = df.sort_values(key).reset_index(drop=True)
    b = df2.sort_values(key).reset_index(drop=True)
    assert a["sent_id"].tolist() == b["sent_id"].tolist()
    assert [list(x) for x in a["tokens"]] == [list(x) for x in b["tokens"]]


def test_downsample_only_drops_all_overrepresented(ray_session):
    rows = [
        {"sent_id": "a", "copy_idx": -1, "tokens": ["x"], "tags": ["B-big"]},
        {"sent_id": "b", "copy_idx": -1, "tokens": ["x"], "tags": ["B-small"]},
        {"sent_id": "c", "copy_idx": -1, "tokens": ["x", "y"],
         "tags": ["B-big", "B-small"]},  # mixed → never dropped
        {"sent_id": "d", "copy_idx": -1, "tokens": ["x"], "tags": ["O"]},
    ]
    targets = pd.DataFrame(
        {"tag": ["B-big", "B-small"], "n": [100, 1], "target": [10, 5],
         "deficit": [0, 4]}
    )
    out = downsample_overrepresented(
        rd.from_items(rows), {"B-big": 100, "B-small": 1}, targets
    ).to_pandas()
    kept = set(out["sent_id"])
    assert {"b", "c", "d"} <= kept  # only all-overrep sentences are at risk


def test_tag_counts_distributed(ray_session):
    ds = rd.from_items(_sentence_ds())
    out = tag_counts(ds)
    got = dict(zip(out["tag"], out["n"]))
    assert got == {"B-protein": 30, "B-RNA": 4}
