"""Round-4 KG-structure + eval operators: relation composition,
predicate-signature audit, blocked entity resolution, tokenizer
fertility, integer NDCG."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _frame(x):
    return x if isinstance(x, pd.DataFrame) else x.to_pandas()


def test_two_hop_paths_matches_bruteforce(ray_session):
    """Exact replay: self-join the edge frame on the mid node in pandas
    and compare counts and weight sums value-for-value."""
    from biomedical_ner_ray import queries as Q

    edges = _frame(Q.kg_edges(SF))
    got = (
        _frame(Q.kg_two_hop_paths(SF))
        .sort_values(["pred1", "pred2"], ignore_index=True)
    )
    pairs = edges.merge(
        edges, left_on="obj_cui", right_on="subj_cui", suffixes=("_1", "_2")
    )
    pairs["w"] = pairs["weight_1"] * pairs["weight_2"]
    exp = (
        pairs.groupby(["pred_1", "pred_2"], as_index=False)
        .agg(n_paths=("w", "size"), weight_sum=("w", "sum"))
        .rename(columns={"pred_1": "pred1", "pred_2": "pred2"})
        .sort_values(["pred1", "pred2"], ignore_index=True)
    )
    assert len(exp) > 0
    pd.testing.assert_frame_equal(
        got[exp.columns].astype({"n_paths": "int64", "weight_sum": "int64"}),
        exp.astype({"n_paths": "int64", "weight_sum": "int64"}),
    )


def test_predicate_domain_check_majority_semantics(ray_session):
    """Every pred has exactly one majority signature; non-violating
    edges carry it; the majority really is the (count desc, pair asc)
    argmax over the edge table itself."""
    from biomedical_ner_ray import queries as Q

    got = _frame(Q.kg_predicate_domain_check(SF))
    assert (got["violates"].isin([0, 1])).all()
    for pred, g in got.groupby("pred"):
        ok = g[g["violates"] == 0][["subj_type", "obj_type"]].drop_duplicates()
        assert len(ok) <= 1  # one signature passes per predicate
        counts = (
            g.groupby(["subj_type", "obj_type"])
            .size()
            .reset_index(name="n")
            .sort_values(
                ["n", "subj_type", "obj_type"],
                ascending=[False, True, True],
                kind="mergesort",
            )
        )
        maj = counts.iloc[0]
        if len(ok):
            assert (ok.iloc[0]["subj_type"], ok.iloc[0]["obj_type"]) == (
                maj["subj_type"],
                maj["obj_type"],
            )


def test_er_blocked_lev_matches_exact_components(ray_session):
    """Brute-force replay: distinct surfaces -> blocked Levenshtein
    pairs -> exact union-find closure; the bounded-round propagation
    must agree (and the fixture must exercise a real multi-member
    cluster, or the op is vacuous)."""
    from biomedical_ner_ray import queries as Q
    from biomedical_ner_ray.kernels.textstats import levenshtein

    got = (
        _frame(Q.kg_er_blocked_lev(SF))
        .sort_values("surface", ignore_index=True)
    )
    ments = _frame(Q.kg_mentions(SF))
    sur = ments[["text", "type"]].drop_duplicates(ignore_index=True)
    assert len(got) == len(sur)

    blocks = {}
    for t, s in zip(sur["type"], sur["text"]):
        blocks.setdefault((t, s[:1].lower(), len(s) // 4), []).append(s)
    parent = {s: s for s in sur["text"]}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for members in blocks.values():
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                if levenshtein(members[i], members[j], Q.ER_LEV_MAX) <= Q.ER_LEV_MAX:
                    ra, rb = find(members[i]), find(members[j])
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    exp_rep = {s: find(s) for s in parent}
    assert dict(zip(got["surface"], got["rep"])) == exp_rep
    assert any(s != r for s, r in exp_rep.items())  # non-vacuous fixture


def test_bpe_fertility_conservation(ray_session):
    """Per-lang word totals must sum to the corpus word count, every
    fertility is >= 1e6 (a word is at least one BPE token), and the
    micro ratio replays exactly."""
    from biomedical_ner_ray import queries as Q
    from biomedical_ner_ray.kernels.textstats import WORD_RE

    got = _frame(Q.doc_bpe_fertility(SF)).sort_values("lang", ignore_index=True)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text", "lang"])
    exp_words = {}
    exp_docs = {}
    for t, lg in zip(docs["text"].to_pylist(), docs["lang"].to_pylist()):
        exp_words[lg] = exp_words.get(lg, 0) + len(WORD_RE.findall((t or "").lower()))
        exp_docs[lg] = exp_docs.get(lg, 0) + 1
    assert dict(zip(got["lang"], got["n_words"])) == exp_words
    assert dict(zip(got["lang"], got["n_docs"])) == exp_docs
    assert (got["n_bpe_tokens"] >= got["n_words"]).all()
    assert (got["fertility_micro"] >= 1_000_000).all()
    assert (
        got["fertility_micro"]
        == (1_000_000 * got["n_bpe_tokens"]) // np.maximum(got["n_words"], 1)
    ).all()


def test_ndcg_replays_from_own_rankings(ray_session):
    """NDCG must be the exact integer fold of the engine's own ann_topk
    (relevance) and ann_topk_pq (ranking) outputs, bounded by [0, 1e6],
    and monotone in the hit count for equal-rank patterns."""
    from biomedical_ner_ray import queries as Q

    exact = _frame(Q.ann_topk(SF))
    pqr = _frame(Q.ann_topk_pq(SF))
    got = _frame(Q.emb_eval_ndcg(SF)).sort_values("query_id", ignore_index=True)
    assert len(got) == exact["query_id"].nunique()
    disc = {r: 1_000_000 // (r + 1) for r in range(1, Q.ANN_K + 1)}
    idcg = sum(disc.values())
    rel = {q: set(g["neighbor_id"]) for q, g in exact.groupby("query_id")}
    for row in got.itertuples():
        g = pqr[pqr["query_id"] == row.query_id]
        hits = g["neighbor_id"].isin(rel[row.query_id])
        dcg = sum(disc[int(r)] for r, h in zip(g["rank"], hits) if h)
        assert row.n_hits == int(hits.sum())
        assert row.dcg == dcg
        assert row.ndcg_micro == 1_000_000 * dcg // idcg
        assert 0 <= row.ndcg_micro <= 1_000_000
