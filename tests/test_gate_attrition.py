"""Quality-funnel attrition (doc_gate_attrition): counts must match a
per-doc first-failing-gate replay built on the same textstats
primitives, and the funnel must telescope (reached[i+1] = reached[i] −
failed_first[i]). The DuckDB oracle runs separately via
scripts/contract_check.py."""

import pandas as pd
import pyarrow.parquet as pq

from biomedical_ner_ray import queries as Q
from biomedical_ner_ray.kernels.textstats import EN_STOPWORDS, PUNCT_TOKEN_RE, words
from biomedical_ner_ray.kernels.tokenize import TOKEN_RE

SF = "/root/testdata/sf0.001"


def _first_fail(t: str) -> int:
    toks = TOKEN_RE.findall(t)
    ws = words(t)
    n_punct = sum(1 for x in toks if PUNCT_TOKEN_RE.match(x))
    n_stop = sum(1 for w in ws if w in EN_STOPWORDS)
    n_digit = sum(1 for w in ws if w.isdigit())
    if not (20 <= len(t) <= 100000):
        return 0
    if not (len(ws) > 0 and 20 * n_stop >= len(ws)):
        return 1
    if not (2 * n_punct <= len(toks)):
        return 2
    if not (2 * n_digit <= len(ws)):
        return 3
    return 4


def test_attrition_matches_per_doc_replay(ray_session):
    got = Q.doc_gate_attrition(SF).sort_values("gate_idx", ignore_index=True)
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])["text"].to_pylist()
    ff = pd.Series([_first_fail(t) for t in texts])
    counts = ff.value_counts().reindex(range(5), fill_value=0)
    total = len(texts)
    reached = total
    for i in range(5):
        row = got.iloc[i]
        assert row["gate"] == Q.GATE_NAMES[i]
        assert row["n_reached"] == reached
        expect_failed = 0 if i == 4 else int(counts[i])
        assert row["n_failed_first"] == expect_failed
        reached -= expect_failed


def test_attrition_telescopes_and_covers(ray_session):
    got = Q.doc_gate_attrition(SF).sort_values("gate_idx", ignore_index=True)
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert got.iloc[0]["n_reached"] == n_docs
    for i in range(4):
        assert (
            got.iloc[i + 1]["n_reached"]
            == got.iloc[i]["n_reached"] - got.iloc[i]["n_failed_first"]
        )
    assert got["n_failed_first"].sum() + got.iloc[4]["n_reached"] == n_docs
