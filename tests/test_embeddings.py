"""A8/A9/A10 embedding trainer + matrix: determinism, stability, and the
reference's matrix-build semantics (fonctions.py:239-273,
fonctionsFaxtText.py:206-230)."""

import numpy as np

from biomedical_ner_ray.pipelines.embeddings import (
    SCALE_NUM,
    SCALE_UNK,
    _char_ngrams,
    embedding_matrix_rows,
    rand_vector,
    train_sgns,
)

SENTS = [
    ["il-2", "binds", "the", "il-2", "receptor"],
    ["the", "receptor", "activates", "stat5"],
    ["stat5", "binds", "dna", "near", "the", "il-2", "gene"],
    ["the", "gene", "expresses", "il-2"],
] * 25


def test_sgns_deterministic_and_bounded():
    m1 = train_sgns(SENTS, epochs=2)
    m2 = train_sgns(SENTS, epochs=2)
    assert m1.words == m2.words
    assert np.array_equal(m1.vectors, m2.vectors)
    norms = np.linalg.norm(m1.vectors, axis=1)
    assert np.isfinite(m1.vectors).all()
    assert norms.max() <= 5.0 + 1e-9
    # min_count=2 filter: every kept word occurs >= 2 times
    assert "near" in m1.words  # appears 25 times
    assert all(w in m1 for w in ("il-2", "receptor", "stat5"))


def test_sgns_learns_cooccurrence_structure():
    m = train_sgns(SENTS, epochs=5)
    vn = m.vectors / np.linalg.norm(m.vectors, axis=1, keepdims=True)
    cos = vn @ vn.T
    i, j = m.index["il-2"], m.index["receptor"]
    k = m.index["dna"]
    # co-occurring pair should be at least as close as a rarely-co-occurring one
    assert cos[i, j] > cos[i, k] - 0.5  # loose structural sanity, not quality


def test_fasttext_mode_composes_oov_from_subwords():
    m = train_sgns(SENTS, epochs=1, mode="fasttext", n_buckets=1024)
    assert "il-2" in m
    # OOV word sharing subwords still gets a vector (fonctionsFaxtText:220)
    v = m["il-3"]
    assert v.shape == m.vectors.shape[1:]
    assert np.isfinite(v).all()
    # unrelated gibberish also composes (never KeyError in fasttext mode)
    assert np.isfinite(m["zzzqqq"]).all()


def test_char_ngrams_shape():
    gs = _char_ngrams("il2", 3, 6)
    assert "<il" in gs and "l2>" in gs and "<il2>" in gs


def test_matrix_build_semantics():
    m = train_sgns(SENTS, epochs=1)
    vocab = ["<PAD>", "<UNK>", "<NUM>", "il-2", "receptor", "notinkv"]
    srcs, mat = embedding_matrix_rows(vocab, m, m.vectors.shape[1])
    assert srcs == ["pad", "special", "special", "trained", "trained", "oov"]
    assert not mat[0].any()  # <PAD> zeros (fonctions.py:250)
    assert np.array_equal(mat[3], m["il-2"])
    assert np.array_equal(mat[1], rand_vector("<UNK>", mat.shape[1], SCALE_UNK))
    assert np.array_equal(mat[2], rand_vector("<NUM>", mat.shape[1], SCALE_NUM))
    assert np.abs(mat[1]).max() <= SCALE_UNK
    assert np.abs(mat[2]).max() <= SCALE_NUM


def test_rand_vector_deterministic():
    assert np.array_equal(rand_vector("x", 8, 0.1), rand_vector("x", 8, 0.1))
    assert not np.array_equal(rand_vector("x", 8, 0.1), rand_vector("y", 8, 0.1))
