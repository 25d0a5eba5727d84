"""HyperLogLog sketch: kernel accuracy, merge = union, and the
events_hll_users query staying within the p=12 error envelope of the
exact distinct count (events_user_activity's oracle)."""

import duckdb
import numpy as np

from biomedical_ner_ray.kernels.sketch import (
    hll_add_values,
    hll_empty,
    hll_estimate,
    hll_merge,
)

SF_DIR = "/root/testdata/sf0.01"


def test_hll_estimate_accuracy():
    for n in (10, 100, 1_000, 20_000):
        reg = hll_empty()
        hll_add_values(reg, [f"user-{i}" for i in range(n)])
        est = hll_estimate(reg)
        assert abs(est - n) / n < 0.05, (n, est)


def test_hll_merge_is_union():
    a, b = hll_empty(), hll_empty()
    hll_add_values(a, range(0, 700))
    hll_add_values(b, range(300, 1000))
    whole = hll_empty()
    hll_add_values(whole, range(1000))
    assert np.array_equal(hll_merge(a, b), whole)
    # idempotent + commutative
    assert np.array_equal(hll_merge(a, a), a)
    assert np.array_equal(hll_merge(a, b), hll_merge(b, a))


def test_hll_determinism():
    a, b = hll_empty(), hll_empty()
    hll_add_values(a, [f"u{i}" for i in range(5000)])
    hll_add_values(b, reversed([f"u{i}" for i in range(5000)]))
    assert np.array_equal(a, b)  # order-insensitive, hash-deterministic


def test_events_hll_users_query(ray_session):
    from biomedical_ner_ray import queries as Q

    got = Q.events_hll_users(SF_DIR).to_pandas().set_index("event_type")
    exact = (
        duckdb.connect()
        .execute(
            "SELECT event_type, count(DISTINCT user_id) AS n FROM "
            f"read_parquet('{SF_DIR}/events.parquet') GROUP BY event_type"
        )
        .df()
        .set_index("event_type")
    )
    assert set(got.index) == set(exact.index)
    for etype, row in exact.iterrows():
        n, est = int(row["n"]), int(got.loc[etype, "n_users_hll"])
        assert abs(est - n) / max(n, 1) < 0.05, (etype, n, est)
