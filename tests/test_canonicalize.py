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
    out = connected_components_ds(ds, rounds=3).to_pandas()
    got = dict(zip(out["cui"], out["label"]))
    assert got == gold


def test_components_idempotent_extra_rounds():
    rows = alias_rows()
    assert canonical_components(rows, rounds=3) == canonical_components(rows, rounds=6)
