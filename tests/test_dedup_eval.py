"""LSH evaluation (doc_dedup_eval): structural identities against the
production near-dup stack — tp must equal the verified-pair count
(verify applies the same exact gate to the same candidate set), counts
must telescope, and recall can only be lost to banding (fn pairs never
shared a bucket). The DuckDB oracle runs separately via
scripts/contract_check.py."""

import pandas as pd

from biomedical_ner_ray import queries as Q

SF = "/root/testdata/sf0.001"


def _frame(x):
    return x if isinstance(x, pd.DataFrame) else x.to_pandas()


def test_eval_consistent_with_verified_pairs(ray_session):
    # uncapped: the comparison side (doc_dedup_minhash) is full-corpus,
    # so this invariant needs the explicit full-corpus eval tier (the
    # DEFAULT tier is the md5 doc shard — tests/test_dedup_eval_sampling)
    ev = _frame(Q.doc_dedup_eval(SF, uncapped=True)).iloc[0]
    verified = _frame(Q.doc_dedup_minhash(SF))
    # verify = exact gate over the same candidate set => tp == |verified|
    assert ev["tp"] == len(verified)
    assert ev["n_candidates"] == ev["tp"] + ev["fp"]
    assert ev["n_true"] == ev["tp"] + ev["fn"]
    assert ev["n_candidates"] > 0 and ev["n_true"] > 0
    if ev["n_candidates"]:
        assert ev["precision_micro"] == 1_000_000 * ev["tp"] // ev["n_candidates"]
    if ev["n_true"]:
        assert ev["recall_micro"] == 1_000_000 * ev["tp"] // ev["n_true"]


def test_eval_truth_superset_of_verified(ray_session):
    """Every verified pair is a true pair (the gate is the truth
    predicate restricted to candidates), so fn counts only pairs the
    banding never surfaced."""
    ev = _frame(Q.doc_dedup_eval(SF)).iloc[0]
    assert ev["fn"] >= 0
    assert ev["n_true"] >= ev["tp"]
