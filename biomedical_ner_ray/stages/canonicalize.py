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
  min-label propagation where every round is three ``keyed_exchange``
  passes (``stages/exchange.py``) whose per-partition work is a
  VECTORIZED pandas hash-merge. No per-key ``map_groups`` anywhere:
  the built-in per-group-Python path runs ~5k groups/s and would take
  hours on a 10⁷-key mention-derived merge graph, while a pandas
  ``groupby(...).min()`` per partition is a C hash aggregate.

Partitioning assumption: one partition holds ~#keys/num_partitions rows
of the (pre-deduplicated) edge+label stream — raise ``num_partitions``
with graph size so each partition fits a worker's pandas heap.

Both run exactly ``rounds`` rounds (default 3, matching the SQL oracle's
three nested propagation CTEs); component ids are the component-min CUI.
"""

from __future__ import annotations

import pandas as pd

from .exchange import keyed_exchange


def _propagate_round(edges_ds, labels_ds, num_partitions: int):
    """One min-label round: cui labels → alias mins → back to cui labels.

    edges_ds: (cui, alias_key) rows. labels_ds: (cui, label) rows.
    Returns a new labels_ds.
    """

    # -- phase 1: attach each cui's current label to its edges.
    # Union the two streams (label rows carry alias_key=NA), co-locate by
    # cui, then ONE pandas merge per partition tags every edge.
    def tag_edges(df: pd.DataFrame) -> pd.DataFrame:
        is_lab = df["alias_key"].isna()
        labs = df.loc[is_lab].groupby("cui", sort=False)["label"].min()
        e = df.loc[~is_lab, ["cui", "alias_key"]]
        out = e.merge(labs.rename("lab"), left_on="cui", right_index=True, how="left")
        return pd.DataFrame(
            {"cui": out["cui"], "alias_key": out["alias_key"], "label": out["lab"]}
        )

    e1 = edges_ds.map_batches(
        lambda df: df.assign(label=pd.NA), batch_format="pandas"
    )
    l1 = labels_ds.map_batches(
        lambda df: df.assign(alias_key=pd.NA)[["cui", "alias_key", "label"]],
        batch_format="pandas",
    )
    edge_lab = keyed_exchange(e1.union(l1), ["cui"], tag_edges, num_partitions)

    # -- phase 2: min label per alias_key, pushed back onto member cuis --
    def alias_min(df: pd.DataFrame) -> pd.DataFrame:
        lab = df.groupby("alias_key", sort=False)["label"].transform("min")
        return pd.DataFrame({"cui": df["cui"], "label": lab}).drop_duplicates()

    cui_lab = keyed_exchange(edge_lab, ["alias_key"], alias_min, num_partitions)

    # -- phase 3: new label per cui = min(old, propagated) --
    def cui_min(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("cui", sort=False, as_index=False)["label"].min()

    return keyed_exchange(
        cui_lab.select_columns(["cui", "label"]).union(labels_ds),
        ["cui"],
        cui_min,
        num_partitions,
    )


def connected_components_ds(alias_ds, rounds: int = 3, num_partitions: int = 8):
    """alias_ds: Dataset with (cui, alias_key) columns →
    Dataset of (cui, label) where label = component-min CUI.

    Iterative-algorithm note: ``edges`` is consumed once per round and
    ``labels`` twice per round; Ray Datasets are lazy, so WITHOUT
    materialization every reference re-executes its whole upstream
    lineage — 2^rounds blowup. Each round's label frontier (bounded by
    #distinct cuis, far smaller than the edge set) is therefore
    materialized into the object store, the standard checkpoint shape
    for distributed label propagation; the object store spills to disk
    if the frontier outgrows memory."""
    edges = alias_ds.select_columns(["cui", "alias_key"]).materialize()

    def init_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["cui"]].drop_duplicates().copy()
        out["label"] = out["cui"]
        return out

    def init_combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["cui"])

    labels = keyed_exchange(
        edges.map_batches(init_partial, batch_format="pandas"),
        ["cui"],
        init_combine,
        num_partitions,
    ).materialize()
    for _ in range(rounds):
        labels = _propagate_round(edges, labels, num_partitions).materialize()
    return labels
