"""Graph materialization: deduplicated node / edge tables.

Scale pattern (ray_guide "Aggregation at scale"): pre-aggregate partial
counts inside ``map_batches`` (one row per key per batch) so the final
``groupby`` shuffles only the tiny partials, never the raw mention /
triple streams. The CUI→component map and per-CUI metadata are broadcast
dicts resolved once per task closure (SURVEY.md J7).
"""

from __future__ import annotations

import pandas as pd

from ray.data.aggregate import Sum

from ..state.broadcast import resolve


def nodes_stage(linked_mentions_ds, comp_ref, meta_ref):
    """linked_mentions → nodes(cui, canonical_name, type, mention_count).

    comp_ref: dict cui → canonical component id (min CUI).
    meta_ref: dict cui → (canonical_name, type) for component reps.
    """

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        comp = resolve(comp_ref)
        canon = df["cui"].map(comp)
        out = canon.value_counts().rename_axis("cui").reset_index(name="n")
        return out

    partials = linked_mentions_ds.map_batches(partial_counts, batch_format="pandas")
    # coalesce the tiny partial stream before the shuffle — sort-based
    # aggregate overhead is O(blocks²), not O(rows) (see queries._COMBINE_BLOCKS)
    counts = (
        partials.repartition(8)
        .groupby("cui")
        .aggregate(Sum("n", alias_name="mention_count"))
    )

    def add_meta(df: pd.DataFrame) -> pd.DataFrame:
        meta = resolve(meta_ref)
        df["canonical_name"] = df["cui"].map(lambda c: meta[c][0])
        df["type"] = df["cui"].map(lambda c: meta[c][1])
        return df[["cui", "canonical_name", "type", "mention_count"]]

    return counts.map_batches(add_meta, batch_format="pandas")


def edges_stage(triples_ds, comp_ref):
    """triples → edges(subj_cui, pred, obj_cui, weight); canonical-remapped,
    self-loops dropped, exact-deduped with weights = occurrence counts."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        comp = resolve(comp_ref)
        s = df["subj_cui"].map(comp)
        o = df["obj_cui"].map(comp)
        keep = s != o
        g = (
            pd.DataFrame({"subj_cui": s[keep], "pred": df["pred"][keep], "obj_cui": o[keep]})
            .groupby(["subj_cui", "pred", "obj_cui"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return g

    partials = triples_ds.map_batches(partial, batch_format="pandas")
    return (
        partials.repartition(8)
        .groupby(["subj_cui", "pred", "obj_cui"])
        .aggregate(Sum("n", alias_name="weight"))
    )


def node_meta(alias_rows: list[dict]) -> dict[str, tuple[str, str]]:
    """Deterministic per-CUI (canonical_name, type): lexicographic min over
    that CUI's alias rows — identical to oracle.materialize_graph."""
    meta: dict[str, tuple[str, str]] = {}
    for r in alias_rows:
        cand = (r["canonical_name"], r["type"])
        cur = meta.get(r["cui"])
        if cur is None or cand < cur:
            meta[r["cui"]] = cand
    return meta
