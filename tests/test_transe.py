"""TransE KG embeddings (pipelines/kg_embeddings.py): distributed ==
sequential bit-exactness, gradient batching invariance, and a genuine
learning signal (trained ranks beat the deterministic init)."""

import numpy as np
import pandas as pd
import pytest

from biomedical_ner_ray import queries as Q
from biomedical_ner_ray.pipelines import kg_embeddings as te


@pytest.fixture(scope="module")
def edges(ray_session, tiny_fixture):
    return Q._kg_edges_frame("/root/testdata/sf0.001")


def test_distributed_bit_exact(ray_session, edges):
    import ray.data as rd

    nodes, preds = te.vocab_from_edges(edges)
    enc = te.encode_edges(edges, nodes, preds)
    E_seq, R_seq = te.train_sequential(enc, nodes, preds)
    # 5 blocks of uneven size — partitioning must not matter
    ds = rd.from_pandas([enc.iloc[i::5].reset_index(drop=True) for i in range(5)])
    E_dist, R_dist = te.train_distributed(ds, nodes, preds)
    np.testing.assert_array_equal(E_seq, E_dist)
    np.testing.assert_array_equal(R_seq, R_dist)


def test_epoch_gradient_batching_invariance(edges):
    nodes, preds = te.vocab_from_edges(edges)
    enc = te.encode_edges(edges, nodes, preds)
    E = te.init_vectors(nodes, "n")
    R = te.init_vectors(preds, "p")
    GE, GR, sw, n = te._epoch_gradient(enc, E, R, epoch=3)
    GE2 = np.zeros_like(GE)
    GR2 = np.zeros_like(GR)
    sw2 = n2 = 0
    for i in range(7):
        ge, gr, s_, n_ = te._epoch_gradient(
            enc.iloc[i::7].reset_index(drop=True), E, R, epoch=3
        )
        GE2 += ge
        GR2 += gr
        sw2 += s_
        n2 += n_
    np.testing.assert_array_equal(GE, GE2)
    np.testing.assert_array_equal(GR, GR2)
    assert (sw, n) == (sw2, n2)


def test_negatives_deterministic_and_epoch_varying(edges):
    nodes, preds = te.vocab_from_edges(edges)
    enc = te.encode_edges(edges, nodes, preds)
    a = te._negatives(enc, 0, len(nodes))
    b = te._negatives(enc, 0, len(nodes))
    c = te._negatives(enc, 1, len(nodes))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()
    assert a.min() >= 0 and a.max() < len(nodes)


def test_training_learns_ranks(edges):
    """The trained checkpoint must rank true objects strictly better
    than the md5 init on average — weights genuinely decide output."""
    nodes, preds = te.vocab_from_edges(edges)
    enc = te.encode_edges(edges, nodes, preds)
    E0 = te.init_vectors(nodes, "n")
    R0 = te.init_vectors(preds, "p")
    E, R = te.train_sequential(enc, nodes, preds)
    r_init = te.rank_frame(edges, E0, R0, nodes, preds)["rank"].mean()
    r_trained = te.rank_frame(edges, E, R, nodes, preds)["rank"].mean()
    assert r_trained < r_init * 0.9
    # and the margin loss itself fell: fewer weighted violations at the
    # final epoch than at epoch 0
    _, _, _, _ = te._epoch_gradient(enc, E0, R0, 0)

    def viol_weight(Ex, Rx, epoch):
        s = enc["s"].to_numpy()
        p = enc["p"].to_numpy()
        o = enc["o"].to_numpy()
        w = enc["w"].to_numpy()
        neg = te._negatives(enc, epoch, len(nodes))
        lp = np.abs(Ex[s] + Rx[p] - Ex[o]).sum(axis=1)
        ln = np.abs(Ex[s] + Rx[p] - Ex[neg]).sum(axis=1)
        return int(w[(te.TE_MARGIN + lp - ln) > 0].sum())

    assert viol_weight(E, R, te.TE_EPOCHS) < viol_weight(E0, R0, te.TE_EPOCHS)


def test_weights_roundtrip(tmp_path, edges):
    import pyarrow.parquet as pq

    nodes, preds = te.vocab_from_edges(edges)
    enc = te.encode_edges(edges, nodes, preds)
    E, R = te.train_sequential(enc, nodes, preds)
    path = str(tmp_path / "w.parquet")
    pq.write_table(te.weights_table(E, R, nodes, preds), path)
    E2, R2, n2, p2 = te.load_weights(path)
    assert (n2, p2) == (nodes, preds)
    np.testing.assert_array_equal(E, E2)
    np.testing.assert_array_equal(R, R2)
