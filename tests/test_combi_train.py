"""Gradient checks for the full-CombinatorialNER training kernels
(kernels/combi_train.py): every backward is validated against central
finite differences in float64 on tiny shapes. Training correctness
rests on these — a silent gradient bug would show up as mysteriously
bad F1, not an exception."""

import numpy as np
import pytest

from biomedical_ner_ray.kernels import combi_train as ct
from biomedical_ner_ray.kernels.crf import bio_tagset, bio_transitions

RNG = np.random.RandomState(7)


def _num_grad(f, x, eps=1e-6):
    g = np.zeros_like(x, dtype=np.float64)
    it = np.nditer(x, flags=["multi_index"])
    while not it.finished:
        i = it.multi_index
        old = x[i]
        x[i] = old + eps
        fp = f()
        x[i] = old - eps
        fm = f()
        x[i] = old
        g[i] = (fp - fm) / (2 * eps)
        it.iternext()
    return g


def _close(a, b, tol=2e-4):
    denom = np.maximum(np.abs(a) + np.abs(b), 1e-6)
    return np.max(np.abs(a - b) / denom) < tol


def test_lstm_backward_matches_fd():
    B, S, D, H = 2, 5, 3, 4
    x = RNG.randn(B, S, D)
    Wx = RNG.randn(D, 4 * H) * 0.3
    Wh = RNG.randn(H, 4 * H) * 0.3
    b = RNG.randn(4 * H) * 0.3
    R = RNG.randn(B, S, H)
    for reverse in (False, True):
        def loss():
            out, _ = ct.lstm_fwd_cache(x, Wx, Wh, b, reverse)
            return float((out * R).sum())

        out, cache = ct.lstm_fwd_cache(x, Wx, Wh, b, reverse)
        dx, dWx, dWh, db = ct.lstm_bwd(R, Wx, Wh, cache)
        assert _close(dx, _num_grad(loss, x))
        assert _close(dWx, _num_grad(loss, Wx))
        assert _close(dWh, _num_grad(loss, Wh))
        assert _close(db, _num_grad(loss, b))


@pytest.fixture(scope="module")
def char_params():
    from biomedical_ner_ray.kernels.combinatorial import (
        CHAR_BUCKETS,
        CHAR_EMBED_DIM,
        CHAR_LSTM_HIDDEN,
        CNN_FILTERS,
    )

    p = {}
    p["char_embedding"] = RNG.randn(CHAR_BUCKETS, CHAR_EMBED_DIM) * 0.2
    p["char_embedding"][0] = 0.0
    for k in (3, 5):
        p[f"cnn_W{k}"] = RNG.randn(k * CHAR_EMBED_DIM, CNN_FILTERS) * 0.2
        p[f"cnn_b{k}"] = RNG.randn(CNN_FILTERS) * 0.2
    for d in ("f", "b"):
        p[f"charlstm_Wx_{d}"] = RNG.randn(CHAR_EMBED_DIM, 4 * CHAR_LSTM_HIDDEN) * 0.2
        p[f"charlstm_Wh_{d}"] = RNG.randn(CHAR_LSTM_HIDDEN, 4 * CHAR_LSTM_HIDDEN) * 0.2
        p[f"charlstm_b_{d}"] = RNG.randn(4 * CHAR_LSTM_HIDDEN) * 0.2
    return p


def test_char_stack_backward_matches_fd(char_params):
    from biomedical_ner_ray.kernels.combinatorial import MAX_CHAR_LEN

    p = char_params
    kernels = (3, 5)
    M = 3
    cids = RNG.randint(0, 32, size=(M, MAX_CHAR_LEN)).astype(np.int64)
    cids[:, 6:] = 0  # realistic zero padding tail
    feat0, _ = ct.char_stack_fwd(p, cids, kernels)
    R = RNG.randn(*feat0.shape)

    def loss():
        f, _ = ct.char_stack_fwd(p, cids, kernels)
        return float((f * R).sum())

    feat, cache = ct.char_stack_fwd(p, cids, kernels)
    grads = {k: np.zeros_like(v) for k, v in p.items()}
    ct.char_stack_bwd(p, R, cache, kernels, grads)
    for name in ("cnn_W3", "cnn_b3", "cnn_W5", "charlstm_Wx_f",
                 "charlstm_Wh_b", "charlstm_b_f"):
        assert _close(grads[name], _num_grad(loss, p[name])), name
    # embedding rows actually touched (padding row 0 must stay zero)
    gnum = _num_grad(loss, p["char_embedding"])
    gnum[0] = 0.0
    assert _close(grads["char_embedding"], gnum)
    assert np.all(grads["char_embedding"][0] == 0.0)


def test_attention_backward_matches_fd():
    B, L, H = 2, 4, 6
    h = RNG.randn(B, L, H)
    p = {"attn_w": RNG.randn(H) * 0.3, "attn_proj": RNG.randn(2 * H, H) * 0.3}
    out0, _ = ct.attention_fwd(p, h)
    R = RNG.randn(*out0.shape)

    def loss():
        o, _ = ct.attention_fwd(p, h)
        return float((o * R).sum())

    out, cache = ct.attention_fwd(p, h)
    grads = {k: np.zeros_like(v) for k, v in p.items()}
    dh = ct.attention_bwd(p, R, cache, grads)
    assert _close(dh, _num_grad(loss, h))
    assert _close(grads["attn_w"], _num_grad(loss, p["attn_w"]))
    assert _close(grads["attn_proj"], _num_grad(loss, p["attn_proj"]))


def test_crf_nll_grads_match_fd():
    tags = bio_tagset(["drug", "disease"])
    K = len(tags)
    trans_base = bio_transitions(tags)
    trans_w = RNG.randn(K, K) * 0.2
    B, L = 2, 4
    em = RNG.randn(B, L, K)
    y = np.array([[0, 1, 2, 0], [3, 4, 0, 1]], dtype=np.int64)
    w = np.array([1.0, 2.0])

    def loss():
        l, _, _ = ct.crf_nll(em, trans_base + trans_w, y, w)
        return l

    _, dem, dtrans = ct.crf_nll(em, trans_base + trans_w, y, w)
    assert _close(dem, _num_grad(loss, em))
    fin = np.isfinite(trans_base)
    gnum = _num_grad(loss, trans_w)
    assert _close(dtrans[fin], gnum[fin])
    assert np.all(dtrans[~fin] == 0.0)


def test_crf_nll_len1_sequence():
    tags = bio_tagset(["x"])
    K = len(tags)
    trans = bio_transitions(tags)
    em = RNG.randn(2, 1, K)
    y = np.array([[0], [1]], dtype=np.int64)
    w = np.ones(2)
    loss, dem, dtrans = ct.crf_nll(em, trans, y, w)
    assert loss > 0
    assert dem.shape == em.shape
    assert np.all(dtrans == 0.0)
