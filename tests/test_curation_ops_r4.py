"""Round-4 curation operators: DSIR-style importance resampling,
cluster-balanced diversity sampling, audio window chunking."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _frame(x):
    return x if isinstance(x, pd.DataFrame) else x.to_pandas()


def test_mm_chunk_windows_matches_bruteforce(ray_session):
    from biomedical_ner_ray import queries as Q
    from biomedical_ner_ray.kernels.hashing import stable_u64_md5

    got = _frame(Q.mm_chunk_windows(SF)).sort_values(
        ["doc_id", "chunk_idx"], ignore_index=True
    )
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    exp = []
    for doc_id, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        payload = text.encode("utf-8")
        if doc_id % 3 != 1 or not payload:
            continue
        off = i = 0
        while off < len(payload):
            chunk = payload[off : off + Q.AUDIO_WIN_BYTES]
            exp.append(
                (doc_id, i, off, len(chunk), stable_u64_md5(chunk) - (1 << 63))
            )
            off += Q.AUDIO_HOP_BYTES
            i += 1
    expdf = pd.DataFrame(
        exp, columns=["doc_id", "chunk_idx", "byte_offset", "chunk_len", "chunk_h"]
    ).astype("int64").sort_values(["doc_id", "chunk_idx"], ignore_index=True)
    assert len(expdf) > 0
    pd.testing.assert_frame_equal(got[expdf.columns].astype("int64"), expdf)
    # overlap invariant: consecutive windows overlap by WIN - HOP bytes
    assert Q.AUDIO_WIN_BYTES > Q.AUDIO_HOP_BYTES


def test_importance_resample_signal_and_replay(ray_session):
    """Target-source docs must score higher on average (the operator's
    point), the keep gate must match the exact integer replay, and
    every doc must surface exactly once."""
    from biomedical_ner_ray import queries as Q
    from biomedical_ner_ray.kernels.hashing import stable_u64_md5
    from biomedical_ner_ray.kernels.textstats import WORD_RE

    got = _frame(Q.doc_importance_resample(SF)).sort_values(
        "doc_id", ignore_index=True
    )
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "source", "text"]
    ).to_pandas()
    assert len(got) == len(docs)

    tgt = docs["source"].min()
    B = Q.DSIR_BUCKETS
    c = np.zeros(B, np.int64)
    t = np.zeros(B, np.int64)
    bk_cache: dict = {}

    def bk(w):
        v = bk_cache.get(w)
        if v is None:
            v = stable_u64_md5(w.encode()) % B
            bk_cache[w] = v
        return v

    toks = {
        int(r.doc_id): [bk(w) for w in WORD_RE.findall(r.text.lower())]
        for r in docs.itertuples()
    }
    for r in docs.itertuples():
        for b in toks[int(r.doc_id)]:
            c[b] += 1
            if r.source == tgt:
                t[b] += 1
    C, T = int(c.sum()), int(t.sum())
    ratio = [
        (Q.DSIR_SCALE * (int(t[b]) + 1) * (C + B)) // ((int(c[b]) + 1) * (T + B))
        for b in range(B)
    ]
    m = got.set_index("doc_id")
    imp_by_src = {True: [], False: []}
    for r in docs.itertuples():
        bs = toks[int(r.doc_id)]
        imp = sum(ratio[b] for b in bs) // len(bs) if bs else 0
        row = m.loc[int(r.doc_id)]
        assert row["importance_micro"] == imp
        keep_p = min(Q.DSIR_KEEP_MOD, imp // Q.DSIR_KEEP_DIV)
        coin = stable_u64_md5(f"dsir:{int(r.doc_id)}".encode()) % Q.DSIR_KEEP_MOD
        assert row["keep"] == (1 if coin < keep_p else 0)
        imp_by_src[r.source == tgt].append(imp)
    assert np.mean(imp_by_src[True]) > np.mean(imp_by_src[False])
    assert 0 < got["keep"].sum() < len(got)


def test_diverse_sample_quota_and_determinism(ray_session):
    from biomedical_ner_ray import queries as Q

    a = _frame(Q.emb_diverse_sample(SF))
    b = _frame(Q.emb_diverse_sample(SF))
    pd.testing.assert_frame_equal(
        a.sort_values(["cluster_id", "rank"], ignore_index=True),
        b.sort_values(["cluster_id", "rank"], ignore_index=True),
    )
    per = a.groupby("cluster_id")["rank"].agg(["size", "min", "max"])
    assert (per["size"] <= Q.DIVERSE_PER_CLUSTER).all()
    assert (per["min"] == 1).all()
    assert (per["max"] == per["size"]).all()  # contiguous ranks
    assert a["vec_id"].is_unique
    assert a["cluster_id"].nunique() > 1


# ---------------------------------------------------------------------------
# label-aware kNN: hard negatives + kNN auto-labeling
# ---------------------------------------------------------------------------


def test_hard_negatives_exclude_anchor_label(ray_session):
    from biomedical_ner_ray import queries as Q

    got = _frame(Q.emb_hard_negatives(SF)).sort_values(
        ["query_id", "rank"], ignore_index=True
    )
    emb = pq.read_table(
        f"{SF}/embeddings.parquet", columns=["vec_id", "label"]
    ).to_pandas()
    lab = dict(zip(emb["vec_id"].astype(int), emb["label"].astype(int)))
    assert set(got["query_id"]) == set(range(Q.ANN_N_QUERIES))
    for qid, g in got.groupby("query_id"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert len(g) == Q.HARDNEG_K
        for nid, nlab in zip(g["neighbor_id"], g["neighbor_label"]):
            assert nlab == lab[int(nid)]
            assert nlab != lab[int(qid)]  # every mined negative crosses labels


def test_hard_negatives_are_nearest_cross_label(ray_session):
    """Rank-1 hard negative == the brute-force nearest cross-label vector."""
    from biomedical_ner_ray import queries as Q

    got = _frame(Q.emb_hard_negatives(SF))
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    ids = t["vec_id"].to_numpy()
    labs = t["label"].to_numpy()
    M = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    for qid in range(Q.ANN_N_QUERIES):
        qi = int(np.nonzero(ids == qid)[0][0])
        cos = M @ M[qi]
        mask = labs != labs[qi]
        order = sorted(
            zip(-cos[mask], ids[mask]),
        )
        best = int(order[0][1])
        r1 = got[(got["query_id"] == qid) & (got["rank"] == 1)]
        assert int(r1["neighbor_id"].iloc[0]) == best


def test_knn_classify_vote_consistency(ray_session):
    from biomedical_ner_ray import queries as Q

    got = _frame(Q.emb_knn_classify(SF)).sort_values("query_id", ignore_index=True)
    assert len(got) == Q.ANN_N_QUERIES
    emb = pq.read_table(
        f"{SF}/embeddings.parquet", columns=["vec_id", "label"]
    ).to_pandas()
    lab = dict(zip(emb["vec_id"].astype(int), emb["label"].astype(int)))
    labels = set(emb["label"].astype(int))
    for _, r in got.iterrows():
        assert r["true_label"] == lab[int(r["query_id"])]
        assert r["pred_label"] in labels
        assert 1 <= r["n_votes"] <= Q.KNN_K
        assert r["correct"] == int(r["pred_label"] == r["true_label"])


# ---------------------------------------------------------------------------
# CCNet buckets + n-gram novelty
# ---------------------------------------------------------------------------


def test_ccnet_buckets_tercile_structure(ray_session):
    from biomedical_ner_ray import queries as Q

    got = _frame(Q.doc_ccnet_buckets(SF))
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "lang"]
    ).to_pandas()
    assert len(got) == len(docs)
    assert set(got["bucket"]) <= {"head", "middle", "tail"}
    m = got.merge(docs, on="doc_id", suffixes=("", "_decl"))
    assert (m["lang"] == m["lang_decl"]).all()
    for lang, g in got.groupby("lang"):
        n = len(g)
        # threshold rule: tail is never empty and holds >= ceil(n/3)
        # (ties only ever grow the lower bucket), head <= floor(n/3)
        counts = g["bucket"].value_counts()
        assert counts.get("tail", 0) >= (n + 2) // 3
        assert counts.get("head", 0) <= n // 3
        # ordering: every head score > every tail score
        if counts.get("head", 0) and counts.get("tail", 0):
            assert (
                g[g["bucket"] == "head"]["lm_score_micro"].min()
                > g[g["bucket"] == "tail"]["lm_score_micro"].max()
            )


def test_ngram_novelty_conserves_distinct_bigrams(ray_session):
    """Sum of per-doc novel counts == corpus-wide distinct bigrams
    (every bigram is novel exactly once), and novelty <= distinct."""
    import re

    from biomedical_ner_ray import queries as Q

    got = _frame(Q.doc_ngram_novelty(SF)).sort_values("doc_id", ignore_index=True)
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    assert len(got) == len(docs)
    corpus = set()
    per_doc = {}
    for i, t in zip(docs["doc_id"], docs["text"]):
        ws = re.findall(r"\w+", (t or "").lower())
        bgs = {ws[j] + " " + ws[j + 1] for j in range(len(ws) - 1)}
        per_doc[int(i)] = len(bgs)
        corpus |= bgs
    assert int(got["n_novel"].sum()) == len(corpus)
    assert (got["n_novel"] <= got["n_distinct_bigrams"]).all()
    for _, r in got.iterrows():
        assert r["n_distinct_bigrams"] == per_doc[int(r["doc_id"])]
