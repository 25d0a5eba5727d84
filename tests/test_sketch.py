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


# ---------------------------------------------------------------------------
# Count-Min Sketch
# ---------------------------------------------------------------------------


def test_cms_never_undercounts_and_merge_associative():
    import numpy as np

    from biomedical_ner_ray.kernels.sketch import (
        cms_add,
        cms_empty,
        cms_merge,
        cms_query,
    )

    rng = np.random.RandomState(11)
    # zipf-ish stream over 30k distinct keys
    keys = [f"k{int(v)}" for v in rng.zipf(1.3, 120_000) % 30_000]
    from collections import Counter

    true = Counter(keys)
    # three "blocks" folded separately then merged
    thirds = [keys[i::3] for i in range(3)]
    parts = []
    for t in thirds:
        c = Counter(t)
        sk = cms_empty()
        cms_add(sk, list(c.keys()), list(c.values()))
        parts.append(sk)
    merged = cms_merge(cms_merge(parts[0], parts[1]), parts[2])
    probe = [k for k, _ in true.most_common(50)]
    est = cms_query(merged, probe)
    exact = np.array([true[k] for k in probe])
    assert (est >= exact).all()  # CMS only overcounts
    # ε ≈ e/w of total mass per the CM guarantee; generous 3× slack
    assert (est - exact).max() <= 3 * 2.7182818 / 4096 * len(keys)


def test_cms_heavy_hitters_query_envelope(ray_session):
    import duckdb

    from biomedical_ner_ray.queries import CMS_TOP_K, doc_heavy_hitters_cms

    sf = "/root/testdata/sf0.01"
    got = doc_heavy_hitters_cms(sf)
    assert len(got) == CMS_TOP_K
    con = duckdb.connect()
    exact = dict(
        con.execute(
            rf"""
            SELECT w, count(*) FROM (
              SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS w
              FROM read_parquet('{sf}/documents.parquet')
            ) GROUP BY w
            """
        ).fetchall()
    )
    top_true = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:CMS_TOP_K]
    # overcount-only, and the sketch's top set == the exact top set at
    # this vocabulary size (no collisions expected in 4×4096 counters)
    for w, est in zip(got["word"], got["est_count"]):
        assert est >= exact.get(w, 0)
    assert set(got["word"]) == {w for w, _ in top_true}
