"""Entity canonicalization — connected components over the CUI↔alias graph.

North-star G9: "canonicalize entities with a groupby-aggregate
connected-components pass". Two implementations with identical results:

- ``canonical_components`` (in ``oracle.py``): driver-side min-label
  propagation. The alias dictionary is by definition broadcast-small
  (it ships to every annotator actor), so computing components where the
  dict already lives is the right call at any scale — this is what the
  flagship pipeline uses.
- ``connected_components_ds`` (here): the fully distributed version for
  when the merge graph is mention-derived and huge — bounded-round
  min-label propagation expressed as union + groupby + map_groups, no
  driver-side collection and no joins (the "join" is the union-then-group
  pattern from the Ray guide). Used by the dedicated query + tests.

Both run exactly ``rounds`` rounds (default 3, matching the SQL oracle's
three nested propagation CTEs); component ids are the component-min CUI.
"""

from __future__ import annotations

import pandas as pd


def _propagate_round(edges_ds, labels_ds):
    """One min-label round: cui labels → alias mins → back to cui labels.

    edges_ds: (cui, alias_key) rows. labels_ds: (cui, label) rows.
    Returns a new labels_ds.
    """
    import ray.data  # noqa: F401  (ensure Dataset API loaded)

    # -- phase 1: attach labels to edges via union + groupby(cui) --
    def tag_edges(g: pd.DataFrame) -> pd.DataFrame:
        lab = g.loc[g["alias_key"].isna(), "label"].min()
        e = g.loc[g["alias_key"].notna(), ["cui", "alias_key"]].copy()
        e["label"] = lab
        return e

    e1 = edges_ds.map_batches(
        lambda df: df.assign(label=pd.NA), batch_format="pandas"
    )
    l1 = labels_ds.map_batches(
        lambda df: df.assign(alias_key=pd.NA)[["cui", "alias_key", "label"]],
        batch_format="pandas",
    )
    edge_lab = e1.union(l1).groupby("cui").map_groups(tag_edges, batch_format="pandas")

    # -- phase 2: min label per alias_key, pushed back onto cuis --
    def alias_min(g: pd.DataFrame) -> pd.DataFrame:
        lab = g["label"].min()
        out = g[["cui"]].drop_duplicates().copy()
        out["label"] = lab
        return out

    cui_lab = (
        edge_lab.groupby("alias_key").map_groups(alias_min, batch_format="pandas")
    )

    # -- phase 3: new label per cui = min(old, propagated) --
    def cui_min(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"cui": [g["cui"].iloc[0]], "label": [g["label"].min()]})

    return (
        cui_lab.union(labels_ds)
        .groupby("cui")
        .map_groups(cui_min, batch_format="pandas")
    )


def connected_components_ds(alias_ds, rounds: int = 3):
    """alias_ds: Dataset with (cui, alias_key) columns →
    Dataset of (cui, label) where label = component-min CUI."""
    edges = alias_ds.select_columns(["cui", "alias_key"])

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["cui"]].drop_duplicates().copy()
        out["label"] = out["cui"]
        return out

    labels = (
        edges.map_batches(init_labels, batch_format="pandas")
        .groupby("cui")
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )
    for _ in range(rounds):
        labels = _propagate_round(edges, labels)
    return labels
