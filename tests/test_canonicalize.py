"""Distributed connected components == driver-side oracle components (G9)."""

import ray.data as rd

from biomedical_ner_ray.fixtures import alias_rows
from biomedical_ner_ray.oracle import canonical_components
from biomedical_ner_ray.stages.canonicalize import connected_components_ds


def test_components_merge_shared_aliases():
    comp = canonical_components(alias_rows())
    # chain C0000050 -- breast carcinoma -- C0000055 -- mammary carcinoma -- C0000056
    assert comp["C0000055"] == comp["C0000050"] == "C0000050"
    assert comp["C0000056"] == "C0000050"
    # TNF pair
    assert comp["C0000026"] == comp["C0000025"] == "C0000025"
    # unrelated CUIs untouched
    assert comp["C0000001"] == "C0000001"


def test_distributed_components_match_oracle(ray_session):
    rows = alias_rows()
    gold = canonical_components(rows)
    ds = rd.from_items([{"cui": r["cui"], "alias_key": r["alias_key"]} for r in rows])
    # adaptive driver fast path (graph is broadcast-small) ...
    out = connected_components_ds(ds, rounds=3).to_pandas()
    assert dict(zip(out["cui"], out["label"])) == gold
    # ... and the forced distributed keyed-exchange path agree with gold
    out2 = connected_components_ds(
        ds, rounds=3, small_graph_threshold=0
    ).to_pandas()
    assert dict(zip(out2["cui"], out2["label"])) == gold


def test_components_idempotent_extra_rounds():
    rows = alias_rows()
    assert canonical_components(rows, rounds=3) == canonical_components(rows, rounds=6)


def test_distributed_components_large_graph(ray_session):
    """10⁵-edge synthetic merge graph must finish in seconds, not hours —
    the keyed-exchange rebuild does vectorized pandas merges per
    partition; the old per-key map_groups path ran ~5k groups/s and
    would have needed ~minutes on this input alone."""
    import time

    import pandas as pd

    n_chains, chain_len = 25_000, 4  # 100k cuis, ~150k alias rows
    # chain c is a PATH: node i shares alias a{c}_{i} with node i+1, so
    # node i carries alias rows {a_{i-1}, a_i} (ends carry one)
    cui, alias = [], []
    for c in range(n_chains):
        for i in range(chain_len):
            for a in {max(i - 1, 0), min(i, chain_len - 2)}:
                cui.append(f"C{c:06d}_{i}")
                alias.append(f"a{c}_{a}")
    df = pd.DataFrame({"cui": cui, "alias_key": alias})
    ds = rd.from_pandas(df).repartition(8)
    t0 = time.perf_counter()
    out = connected_components_ds(
        ds, rounds=3, num_partitions=8, small_graph_threshold=0
    ).to_pandas()
    elapsed = time.perf_counter() - t0
    assert len(out) == n_chains * chain_len
    # after 3 rounds every path of length 4 has converged to its min label
    got = dict(zip(out["cui"], out["label"]))
    for c in (0, 123, n_chains - 1):
        root = f"C{c:06d}_0"
        for i in range(chain_len):
            assert got[f"C{c:06d}_{i}"] == root
    # ~60s at 8 CPUs, dominated by the 4 chained shuffle executions'
    # fixed overhead (not per-key Python — the old map_groups path
    # needed minutes of pure per-group calls on this input)
    assert elapsed < 240, f"large-graph components took {elapsed:.1f}s"
