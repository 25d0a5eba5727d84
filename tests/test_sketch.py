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


def test_ddsketch_kernel_relative_error():
    import numpy as np

    from biomedical_ner_ray.kernels.sketch import dd_add, dd_merge, dd_quantile

    rng = np.random.default_rng(7)
    vals = rng.lognormal(2, 1.0, 50_000)
    whole = dd_add({}, vals)
    # merge of halves == whole (bucket-count addition, order-free)
    assert dd_merge(dd_add({}, vals[:25_000]), dd_add({}, vals[25_000:])) == whole
    for q in (0.1, 0.5, 0.9, 0.99):
        est = dd_quantile(whole, q)
        true = float(np.quantile(vals, q, method="inverted_cdf"))
        assert abs(est - true) / true <= 0.0101, (q, est, true)


def test_price_quantiles_sketch_vs_exact(ray_session):
    from biomedical_ner_ray import queries as Q

    approx = (
        Q.lineitem_price_quantiles_sketch(SF_DIR).to_pandas().set_index("l_returnflag")
    )
    exact = Q.lineitem_price_quantiles(SF_DIR).to_pandas().set_index("l_returnflag")
    assert set(approx.index) == set(exact.index)
    for flag in exact.index:
        assert int(approx.loc[flag, "n_items"]) == int(exact.loc[flag, "n_items"])
        for qa, qe in (("p25", "p25_cents"), ("p50", "p50_cents"), ("p75", "p75_cents")):
            est = float(approx.loc[flag, qa])
            true = float(exact.loc[flag, qe]) / 100.0  # cents -> currency
            assert abs(est - true) / true <= 0.0101, (flag, qa, est, true)
