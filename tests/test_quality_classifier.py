"""Trained quality classifier (pipelines/quality_classifier.py):
bit-exact distributed-vs-sequential training, the planted-noise /
learned-imperfection contract, and serving consistency."""

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from biomedical_ner_ray.pipelines.quality_classifier import (
    MICRO,
    QC_NOISE_PERMILLE,
    extract_feature_frame,
    hashed_features,
    load_weights,
    score_frame,
    train_distributed,
    train_sequential,
    weights_table,
)

SF_SMALL = "/root/testdata/sf0.001"
SF_MID = "/root/testdata/sf0.01"


def _docs(sf_dir):
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pandas()
    return t.sort_values("doc_id", ignore_index=True)


@pytest.fixture(scope="module")
def trained_small():
    t = _docs(SF_SMALL)
    fdf = extract_feature_frame(t["doc_id"].tolist(), t["text"].tolist())
    w, b = train_sequential(fdf)
    return t, fdf, w, b


def test_distributed_training_bit_exact(ray_session, trained_small):
    """The distributed gradient-partial loop must reproduce the
    sequential trainer exactly, even when the feature table is shuffled
    and split across files — integer gradient sums are order-free."""
    t, fdf, w_seq, b_seq = trained_small
    d = tempfile.mkdtemp(prefix="qc_feats_")
    sh = fdf.sample(frac=1.0, random_state=7).reset_index(drop=True)
    half = len(sh) // 2
    pq.write_table(
        pa.Table.from_pandas(sh.iloc[:half], preserve_index=False),
        os.path.join(d, "a.parquet"),
    )
    pq.write_table(
        pa.Table.from_pandas(sh.iloc[half:], preserve_index=False),
        os.path.join(d, "b.parquet"),
    )
    import ray.data as rd

    w_dist, b_dist = train_distributed(rd.read_parquet(d))
    assert b_dist == b_seq
    assert (w_dist == w_seq).all()


def test_noise_planted_and_not_memorized(trained_small):
    """Label noise must exist (y != y_clean on ~QC_NOISE_PERMILLE/1000
    of docs) and the trained model must track the CLEAN heuristic
    better than the noisy labels it saw — learned, not memorized."""
    t, fdf, w, b = trained_small
    n_flipped = int((fdf["y"] != fdf["y_clean"]).sum())
    assert 0 < n_flipped < len(fdf) * 2 * QC_NOISE_PERMILLE / 1000
    s = score_frame(w, b, t["doc_id"].tolist(), t["text"].tolist())
    acc_clean = (s["pred_keep"].to_numpy() == fdf["y_clean"].to_numpy()).mean()
    acc_noisy = (s["pred_keep"].to_numpy() == fdf["y"].to_numpy()).mean()
    assert acc_clean > acc_noisy


def test_accuracy_band_mid_corpus():
    """0.9 <= clean-label accuracy < 1.0 at sf0.01: good enough to be a
    real quality gate, imperfect enough that the WEIGHTS (not the
    heuristic) decide the output."""
    t = _docs(SF_MID)
    fdf = extract_feature_frame(t["doc_id"].tolist(), t["text"].tolist())
    w, b = train_sequential(fdf)
    s = score_frame(w, b, t["doc_id"].tolist(), t["text"].tolist())
    acc = (s["pred_keep"].to_numpy() == fdf["y_clean"].to_numpy()).mean()
    assert 0.9 <= acc < 1.0


def test_pred_gate_matches_prob(trained_small):
    t, _, w, b = trained_small
    s = score_frame(w, b, t["doc_id"].tolist(), t["text"].tolist())
    assert (
        s["pred_keep"].to_numpy() == (s["prob_micro"].to_numpy() >= MICRO // 2)
    ).all()
    assert s["prob_micro"].between(0, MICRO).all()


def test_weights_roundtrip(trained_small, tmp_path):
    _, _, w, b = trained_small
    p = str(tmp_path / "w.parquet")
    pq.write_table(weights_table(w, b), p)
    w2, b2 = load_weights(p)
    assert b2 == b and (w2 == w).all()


def test_degenerate_texts():
    """Empty/None/sub-ngram texts score without error; empty text has
    no features so its score is the bias alone."""
    out = score_frame(
        np.zeros(1 << 14, dtype=np.int64), 0, [1, 2, 3], ["", None, "one"]
    )
    assert len(out) == 3
    assert (out["prob_micro"] == MICRO // 2).all()  # z == b == 0
    feats = hashed_features([""])
    assert feats[0][0].size == 0 and feats[0][2] == 1


def test_batching_invariance(trained_small):
    """Scoring in two half-batches equals one full batch — the serving
    stage may split docs arbitrarily."""
    t, _, w, b = trained_small
    full = score_frame(w, b, t["doc_id"].tolist(), t["text"].tolist())
    half = len(t) // 2
    a = score_frame(w, b, t["doc_id"][:half].tolist(), t["text"][:half].tolist())
    c = score_frame(w, b, t["doc_id"][half:].tolist(), t["text"][half:].tolist())
    again = pd.concat([a, c], ignore_index=True)
    pd.testing.assert_frame_equal(full, again)
