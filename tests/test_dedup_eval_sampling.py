"""doc_dedup_eval's executable eval-scale contract: the DEFAULT tier
confusion over the md5 doc shard must EQUAL a brute-force replay on
exactly that shard (strict subset rule made exact), and the uncapped
tier remains the full-corpus measurement behind an explicit kwarg."""

import itertools

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _brute_confusion(docs: pd.DataFrame) -> dict:
    from biomedical_ner_ray.stages.dedup import (
        JACCARD_DEN,
        JACCARD_NUM,
        NUM_BANDS,
        band_key,
        minhash_signature,
        shingle_hashes,
    )

    sh = {
        int(d): set(shingle_hashes(t).tolist())
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    sigs = {
        d: minhash_signature(np.array(sorted(s), dtype=np.uint64))
        for d, s in sh.items()
    }
    cands = set()
    buckets: dict = {}
    for d, sig in sigs.items():
        for b in range(NUM_BANDS):
            buckets.setdefault(band_key(sig, b), []).append(d)
    for ids in buckets.values():
        for a, b in itertools.combinations(sorted(set(ids)), 2):
            cands.add((a, b))
    truth = set()
    for a, b in itertools.combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        if union and JACCARD_DEN * inter >= JACCARD_NUM * union:
            truth.add((a, b))
    tp = len(cands & truth)
    return {
        "n_candidates": len(cands),
        "n_true": len(truth),
        "tp": tp,
        "fp": len(cands) - tp,
        "fn": len(truth) - tp,
    }


def test_sampled_tier_equals_bruteforce_on_shard(ray_session):
    import pyarrow.parquet as pq

    from biomedical_ner_ray import queries as Q
    from biomedical_ner_ray.kernels.hashing import stable_u64_md5

    got = Q.doc_dedup_eval(SF)
    got = got if isinstance(got, pd.DataFrame) else got.to_pandas()

    docs = pq.read_table(SF + "/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    shard = docs[
        [
            stable_u64_md5(f"ddeval:{d}".encode()) % Q.DEDUP_EVAL_SAMPLE_MOD == 0
            for d in docs["doc_id"]
        ]
    ]
    assert 0 < len(shard) < len(docs)
    exp = _brute_confusion(shard)
    for k, v in exp.items():
        assert int(got[k].iloc[0]) == v, (k, int(got[k].iloc[0]), v)

    # uncapped opt-in: full-corpus measurement, a superset of the shard
    unc = Q.doc_dedup_eval(SF, uncapped=True)
    unc = unc if isinstance(unc, pd.DataFrame) else unc.to_pandas()
    full = _brute_confusion(docs)
    assert int(unc["n_true"].iloc[0]) == full["n_true"]
    assert int(unc["n_true"].iloc[0]) >= int(got["n_true"].iloc[0])
    assert int(unc["n_candidates"].iloc[0]) >= int(got["n_candidates"].iloc[0])
