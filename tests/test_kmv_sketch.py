"""KMV bottom-k source-overlap sketch: the estimate must replay the
sequential bottom-k construction exactly, and as an ESTIMATOR it must
land within the k=128 error envelope of the exact vocabulary Jaccard
(~1/sqrt(k) std error, banded generously). The DuckDB oracle runs
separately via scripts/contract_check.py."""

import pandas as pd
import pyarrow.parquet as pq

from biomedical_ner_ray import queries as Q
from biomedical_ner_ray.kernels.hashing import stable_u64_md5
from biomedical_ner_ray.kernels.textstats import WORD_RE

SF = "/root/testdata/sf0.001"


def _frame(x):
    return x if isinstance(x, pd.DataFrame) else x.to_pandas()


def _vocab_and_sig():
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    vocab: dict[str, set[str]] = {}
    for s, t in zip(docs["source"], docs["text"]):
        vocab.setdefault(s, set()).update(WORD_RE.findall(t.lower()))
    sig = {
        s: sorted(stable_u64_md5(w.encode()) for w in ws)[: Q.KMV_K]
        for s, ws in vocab.items()
    }
    return vocab, {s: set(v) for s, v in sig.items()}


def test_kmv_matches_sequential_bottom_k_replay(ray_session):
    got = _frame(Q.doc_source_kmv(SF)).sort_values(
        ["source_a", "source_b"], ignore_index=True
    )
    vocab, sig = _vocab_and_sig()
    rows = []
    srcs = sorted(sig)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            uk = sorted(sig[a] | sig[b])[: Q.KMV_K]
            kk = len(uk)
            nc = sum(1 for h in uk if h in sig[a] and h in sig[b])
            rows.append((a, b, kk, nc, 1_000_000 * nc // kk))
    exp = pd.DataFrame(
        rows, columns=["source_a", "source_b", "k_used", "n_common", "j_est_micro"]
    )
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))


def test_kmv_estimates_within_error_envelope(ray_session):
    got = _frame(Q.doc_source_kmv(SF))
    vocab, _ = _vocab_and_sig()
    for _, r in got.iterrows():
        va, vb = vocab[r["source_a"]], vocab[r["source_b"]]
        exact = len(va & vb) / len(va | vb)
        est = r["j_est_micro"] / 1_000_000
        assert abs(est - exact) < 0.25, (r["source_a"], r["source_b"], est, exact)
