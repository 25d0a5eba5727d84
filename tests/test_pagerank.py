"""Integer PageRank (stages/pagerank.py): distributed keyed-exchange
path is bit-identical to the driver path, and the fixed-point update
matches a straightforward reference implementation."""

import numpy as np
import pandas as pd
import ray.data as rd

from biomedical_ner_ray.stages.pagerank import (
    BASE,
    DAMP_DEN,
    DAMP_NUM,
    SCALE,
    pagerank_int,
)


def _ring_with_chords(n=500, seed=7):
    rng = np.random.RandomState(seed)
    src = np.arange(n)
    edges = {(int(i), int((i + 1) % n)) for i in src}
    edges |= {(int((i + 1) % n), int(i)) for i in src}
    for _ in range(3 * n):
        a, b = int(rng.randint(n)), int(rng.randint(n))
        if a != b:
            edges.add((a, b))
            edges.add((b, a))
    df = pd.DataFrame(sorted(edges), columns=["src", "dst"]).astype("int64")
    return df


def _reference_pr(df, iterations=3):
    deg = df.groupby("src").size()
    r = {int(n): SCALE for n in deg.index}
    for _ in range(iterations):
        s: dict[int, int] = {}
        for a, b in zip(df["src"], df["dst"]):
            s[b] = s.get(b, 0) + r[a] // int(deg.loc[a])
        r = {n: BASE + (DAMP_NUM * v) // DAMP_DEN for n, v in s.items()}
    return r


def test_distributed_matches_driver_and_reference(ray_session):
    df = _ring_with_chords()
    dist = (
        pagerank_int(rd.from_pandas(df), iterations=3, small_graph_threshold=0)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    drv = (
        pagerank_int(rd.from_pandas(df), iterations=3)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        dist.astype("int64"), drv.astype("int64")
    )
    ref = _reference_pr(df)
    got = dict(zip(dist["node"], dist["pr_score"]))
    assert got == ref


def test_rank_mass_reasonable(ray_session):
    df = _ring_with_chords(n=100, seed=3)
    out = pagerank_int(rd.from_pandas(df), iterations=3).to_pandas()
    # floor divisions only LOSE mass: total ≤ N·SCALE, and every rank
    # keeps at least the damping floor
    assert out["pr_score"].min() >= BASE
    assert out["pr_score"].sum() <= len(out) * SCALE
