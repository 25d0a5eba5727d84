"""Embedding training pipeline — SGNS trainer + embedding-matrix artifact
(A8/A9/A10/S6/J4).

Reference semantics being re-expressed:

- ``utils/fonctions.py:165-195`` ``train_word2vec_embeddings`` — gensim
  skip-gram (sg=1) over lowercased token sentences, min_count 2.
- ``utils/fonctionsFaxtText.py:131-173`` ``train_fasttext_embeddings`` —
  same, plus char n-gram subwords (min_n 3, max_n 6).
- ``utils/fonctions.py:239-273`` ``create_embedding_matrix_from_word2vec``
  — vocab-aligned matrix: ``<PAD>``=zeros, ``<UNK>`` random scale 0.1,
  ``<NUM>`` random scale 0.05, in-KV words take the trained vector, OOV
  words random scale 0.1.
- ``utils/fonctionsFaxtText.py:206-230``
  ``create_embedding_matrix_from_fasttext`` — FastText mode composes OOV
  vectors from subwords instead of random init.

Ray-Data-first split of labor (SURVEY §2.3 A8 note): the CORPUS pass
(tokenize, deterministic downsample) is a Dataset job; the SGNS fit runs
driver-side over the bounded sample — a global dense-model fit is not a
Dataset op, and the reference makes the same split (gensim on the
driver). The trained keyed vectors become a Parquet artifact that
downstream stages broadcast or join (J4/A10); at 100TB the sample stays
bounded (SGNS_MAX_TURNS) so driver memory is constant in corpus size.

Determinism: every "random" init is an md5-derived pseudo-random value
(``_rand_component``) so the SQL oracle can replicate the OOV/special
rows exactly via ``md5_number_lower``; training order is sorted
(conv_id, turn_idx); the SGD loop is seeded, single-threaded numpy.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..kernels.hashing import stable_u64_md5
from ..kernels.tokenize import TOKEN_RE
from ..state import manifest as mf

EMB_VERSION = "sgns-v2"
SGNS_DIM = 32
SGNS_WINDOW = 2
SGNS_NEGATIVES = 4
SGNS_EPOCHS = 3
SGNS_MIN_COUNT = 2
SGNS_MAX_TURNS = 20_000
SGNS_SEED = 42
SPECIALS = ("<PAD>", "<UNK>", "<NUM>")
# special-token init scales (fonctions.py:251-256: UNK scale 0.1, NUM 0.05)
SCALE_UNK = 0.1
SCALE_NUM = 0.05
SCALE_OOV = 0.1


def _rand_component(word: str, j: int, scale: float) -> float:
    """Deterministic stand-in for the reference's np.random init —
    md5-derived uniform in (-scale, scale], bit-replicable in DuckDB as
    ``(CAST(md5_number_lower(word || ':' || j) % 2001 AS BIGINT) - 1000)
    * CAST(scale AS DOUBLE) / 1000.0``."""
    h = stable_u64_md5(f"{word}:{j}".encode("utf-8"))
    return (h % 2001 - 1000) * scale / 1000.0


def rand_vector(word: str, dim: int, scale: float) -> np.ndarray:
    return np.array(
        [_rand_component(word, j, scale) for j in range(dim)], dtype=np.float64
    )


# ---------------------------------------------------------------------------
# corpus sampling (Ray pass)
# ---------------------------------------------------------------------------


def sample_token_sentences(
    transcripts_files: list[str], max_turns: int = SGNS_MAX_TURNS
) -> list[list[str]]:
    """Deterministic bounded sample of lowercased token sentences.

    One Dataset pass tokenizes and hash-filters; only the ≤max_turns
    sampled sentences are collected to the driver (bounded regardless of
    corpus size — the driver heap does NOT scale with the input)."""
    import ray.data as rd

    ds = rd.read_parquet(transcripts_files, columns=["conv_id", "turn_idx", "text"])
    total = ds.count()
    frac = min(1.0, max_turns / max(total, 1))
    threshold = int(frac * (1 << 32))

    def sample_tokens(batch: pa.Table) -> pd.DataFrame:
        convs = batch["conv_id"].to_pylist()
        idxs = batch["turn_idx"].to_pylist()
        texts = batch["text"].to_pylist()
        out_c, out_i, out_t = [], [], []
        for c, i, t in zip(convs, idxs, texts):
            if stable_u64_md5(f"{c}:{i}".encode("utf-8")) % (1 << 32) < threshold:
                out_c.append(c)
                out_i.append(i)
                out_t.append(" ".join(w.lower() for w in TOKEN_RE.findall(t)))
        return pd.DataFrame({"conv_id": out_c, "turn_idx": out_i, "toks": out_t})

    rows = ds.map_batches(sample_tokens, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (r["conv_id"], r["turn_idx"]))
    return [r["toks"].split(" ") for r in rows if r["toks"]]


# ---------------------------------------------------------------------------
# SGNS trainer (driver-side, pure numpy, deterministic)
# ---------------------------------------------------------------------------


def _char_ngrams(word: str, min_n: int = 3, max_n: int = 6) -> list[str]:
    """FastText-style char n-grams of ``<word>`` (with boundary markers,
    fonctionsFaxtText.py min_n=3 max_n=6)."""
    w = f"<{word}>"
    out = []
    for n in range(min_n, max_n + 1):
        for i in range(len(w) - n + 1):
            out.append(w[i : i + n])
    return out


class SGNSModel:
    """Trained skip-gram-negative-sampling model.

    ``mode='w2v'``: plain word vectors (A8).
    ``mode='fasttext'``: each word vector is the mean of its char-n-gram
    bucket vectors plus its own row, trained jointly (A9); OOV words get
    a subword-composed vector (fonctionsFaxtText.py:220 semantics).
    """

    def __init__(self, words, vectors, mode, ngram_mat=None, n_buckets=0):
        self.words = list(words)
        self.index = {w: i for i, w in enumerate(self.words)}
        self.vectors = vectors
        self.mode = mode
        self.ngram_mat = ngram_mat
        self.n_buckets = n_buckets

    def __contains__(self, word: str) -> bool:
        return word in self.index

    def __getitem__(self, word: str) -> np.ndarray:
        i = self.index.get(word)
        if i is not None:
            return self.vectors[i]
        if self.mode == "fasttext" and self.ngram_mat is not None:
            ids = [
                stable_u64_md5(g.encode("utf-8")) % self.n_buckets
                for g in _char_ngrams(word)
            ]
            if ids:
                return self.ngram_mat[ids].mean(axis=0)
        raise KeyError(word)


def train_sgns(
    sentences: list[list[str]],
    *,
    dim: int = SGNS_DIM,
    window: int = SGNS_WINDOW,
    min_count: int = SGNS_MIN_COUNT,
    negatives: int = SGNS_NEGATIVES,
    epochs: int = SGNS_EPOCHS,
    seed: int = SGNS_SEED,
    mode: str = "w2v",
    n_buckets: int = 20_000,
    lr: float = 0.01,
) -> SGNSModel:
    """Vectorized numpy SGNS fit (no per-pair Python in the hot loop:
    pair extraction, negative sampling, sigmoid updates are all batch
    numpy; scatter-adds via np.add.at)."""
    # -- vocab: count, filter, deterministic ids (count desc, word asc) --
    counts: dict[str, int] = {}
    for s in sentences:
        for w in s:
            counts[w] = counts.get(w, 0) + 1
    vocab = sorted(
        (w for w, n in counts.items() if n >= min_count),
        key=lambda w: (-counts[w], w),
    )
    index = {w: i for i, w in enumerate(vocab)}
    V = len(vocab)
    if V == 0:
        return SGNSModel([], np.zeros((0, dim)), mode)

    # -- (center, context) pairs via numpy window shifts --
    ids = [np.array([index[w] for w in s if w in index], dtype=np.int64)
           for s in sentences]
    centers_l, contexts_l = [], []
    for a in ids:
        for off in range(1, window + 1):
            if len(a) <= off:
                continue
            centers_l.append(a[:-off])
            contexts_l.append(a[off:])
            centers_l.append(a[off:])
            contexts_l.append(a[:-off])
    if not centers_l:
        return SGNSModel(vocab, np.zeros((V, dim)), mode)
    centers = np.concatenate(centers_l)
    contexts = np.concatenate(contexts_l)

    # -- unigram^0.75 negative-sampling table --
    freq = np.array([counts[w] for w in vocab], dtype=np.float64) ** 0.75
    neg_cdf = np.cumsum(freq / freq.sum())

    rng = np.random.default_rng(seed)
    # deterministic md5-based init keeps retraining reproducible
    w_in = np.stack([rand_vector(w, dim, 0.5 / dim) for w in vocab])
    w_out = np.zeros((V, dim), dtype=np.float64)

    ng_lists = None
    ngram_mat = None
    if mode == "fasttext":
        ng_lists = [
            np.array(
                [stable_u64_md5(g.encode("utf-8")) % n_buckets
                 for g in _char_ngrams(w)],
                dtype=np.int64,
            )
            for w in vocab
        ]
        ngram_mat = np.zeros((n_buckets, dim), dtype=np.float64)

    B = 8192
    n_pairs = len(centers)
    for ep in range(epochs):
        order = rng.permutation(n_pairs)
        step_lr = lr * (1.0 - ep / max(epochs, 1))
        for s0 in range(0, n_pairs, B):
            sel = order[s0 : s0 + B]
            c, o = centers[sel], contexts[sel]
            nb = len(c)
            # input vector: word row (+ mean of ngram rows in fasttext)
            if mode == "fasttext":
                flat_ng = np.concatenate([ng_lists[i] for i in c])
                reps = np.array([len(ng_lists[i]) for i in c])
                pos = np.repeat(np.arange(nb), reps)
                vin = w_in[c].copy()
                np.add.at(vin, pos, ngram_mat[flat_ng])
                vin /= (reps + 1)[:, None]
            else:
                vin = w_in[c]
            # one positive + `negatives` sampled contexts per pair
            negs = np.searchsorted(neg_cdf, rng.random((nb, negatives)))
            tgt = np.concatenate([o[:, None], negs], axis=1)  # [nb, 1+K]
            lab = np.zeros((nb, 1 + negatives))
            lab[:, 0] = 1.0
            vout = w_out[tgt]  # [nb, 1+K, D]
            logits = np.clip(np.einsum("nd,nkd->nk", vin, vout), -8.0, 8.0)
            score = 1.0 / (1.0 + np.exp(-logits))
            g = (lab - score) * step_lr  # [nb, 1+K]
            gin = np.einsum("nk,nkd->nd", g, vout)
            gout = g[..., None] * vin[:, None, :]
            # a hot word appears thousands of times per 8192-pair batch;
            # SUMMED scatter-add gradients diverge (effective lr × count),
            # so scale every contribution to the per-word MEAN gradient
            t_flat = tgt.ravel()
            t_cnt = np.bincount(t_flat, minlength=V).astype(np.float64)
            np.add.at(
                w_out, t_flat, gout.reshape(-1, dim) / t_cnt[t_flat][:, None]
            )
            c_cnt = np.bincount(c, minlength=V).astype(np.float64)
            gin = gin / c_cnt[c][:, None]
            if mode == "fasttext":
                scaled = gin / (reps + 1)[:, None]
                np.add.at(w_in, c, scaled)
                np.add.at(ngram_mat, flat_ng, scaled[pos])
            else:
                np.add.at(w_in, c, gin)
        # row-norm guard: bounded embeddings regardless of corpus shape
        for m_ in (w_in, w_out) + ((ngram_mat,) if mode == "fasttext" else ()):
            norms = np.linalg.norm(m_, axis=1, keepdims=True)
            np.divide(m_, norms / 5.0, out=m_, where=norms > 5.0)

    if mode == "fasttext":
        reps = np.array([len(g) for g in ng_lists])
        comp = w_in.copy()
        for i, gl in enumerate(ng_lists):
            if len(gl):
                comp[i] += ngram_mat[gl].sum(axis=0)
        comp /= (reps + 1)[:, None]
        return SGNSModel(vocab, comp, mode, ngram_mat=ngram_mat, n_buckets=n_buckets)
    return SGNSModel(vocab, w_in, mode)


# ---------------------------------------------------------------------------
# A10 matrix build + artifacts
# ---------------------------------------------------------------------------


def embedding_matrix_rows(vocab_words: list[str], model: SGNSModel, dim: int):
    """A10 semantics (fonctions.py:239-273): per vocab word, the aligned
    vector + its provenance tag. Returns (src_list, matrix)."""
    mat = np.zeros((len(vocab_words), dim), dtype=np.float64)
    srcs = []
    for i, w in enumerate(vocab_words):
        if w == "<PAD>":
            srcs.append("pad")  # zeros
        elif w == "<UNK>":
            mat[i] = rand_vector(w, dim, SCALE_UNK)
            srcs.append("special")
        elif w == "<NUM>":
            mat[i] = rand_vector(w, dim, SCALE_NUM)
            srcs.append("special")
        elif w in model:
            mat[i] = model[w]
            srcs.append("trained")
        else:
            try:
                mat[i] = model[w]  # fasttext subword composition
                srcs.append("subword")
            except KeyError:
                mat[i] = rand_vector(w, dim, SCALE_OOV)
                srcs.append("oov")
    return srcs, mat


def ensure_embedding_artifacts(fixture_paths: dict, out_root: str) -> dict[str, str]:
    """Build (or resume) the trained-KV and vocab-matrix artifacts.

    - ``kv/kv.parquet``: (word, vector list<double>) — the S6 "trained
      model save" analog; what BioWordVec-style readers (S7) load.
    - ``matrix/matrix.parquet``: (word, word_id, src, vector) — the A10
      vocab-aligned matrix artifact scorer actors load in __init__.
    """
    files = mf.list_parquet_files(fixture_paths["transcripts"])
    in_fp = mf.input_fingerprint(files)
    os.makedirs(out_root, exist_ok=True)

    kv_dir = os.path.join(out_root, "kv")

    def build_kv(tmp):
        sentences = sample_token_sentences(files)
        model = train_sgns(sentences)
        vecs = pa.array(
            [model.vectors[i].tolist() for i in range(len(model.words))],
            pa.list_(pa.float64()),
        )
        pq.write_table(
            pa.table({"word": pa.array(model.words, pa.string()), "vector": vecs}),
            os.path.join(tmp, "kv.parquet"),
        )

    mf.run_stage("kv", kv_dir, mf.fingerprint(EMB_VERSION, "kv", in_fp), build_kv)
    kv_path = os.path.join(kv_dir, "kv.parquet")

    matrix_dir = os.path.join(out_root, "matrix")

    def build_matrix(tmp):
        from .dictionary import build_dictionary_artifacts

        dict_out = build_dictionary_artifacts(
            fixture_paths["transcripts"], os.path.join(out_root, "dict")
        )
        vocab = pq.read_table(
            os.path.join(dict_out["paths"]["vocab"], "vocab.parquet")
        ).to_pandas()
        kvt = pq.read_table(kv_path)
        model = SGNSModel(
            kvt["word"].to_pylist(),
            np.array(kvt["vector"].to_pylist(), dtype=np.float64),
            "w2v",
        )
        words = vocab["word"].tolist()
        srcs, mat = embedding_matrix_rows(words, model, SGNS_DIM)
        pq.write_table(
            pa.table(
                {
                    "word": pa.array(words, pa.string()),
                    "word_id": pa.array(vocab["word_id"].to_numpy(), pa.int32()),
                    "src": pa.array(srcs, pa.string()),
                    "vector": pa.array(
                        [r.tolist() for r in mat], pa.list_(pa.float64())
                    ),
                }
            ),
            os.path.join(tmp, "matrix.parquet"),
        )

    mf.run_stage(
        "matrix", matrix_dir, mf.fingerprint(EMB_VERSION, "matrix", in_fp), build_matrix
    )
    return {
        "kv": kv_path,
        "matrix": os.path.join(matrix_dir, "matrix.parquet"),
    }
