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
