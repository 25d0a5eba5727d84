"""Round-4 warehouse-shape operators: SCD-Type-2 state intervals,
Q5-shape cross-branch join, event-type pivot, JSON props extraction.
Each is checked against an independent pandas brute-force replay (the
DuckDB value oracle runs separately via scripts/contract_check.py)."""

import json

import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _frame(x):
    return x if isinstance(x, pd.DataFrame) else x.to_pandas()


def _events():
    return pq.read_table(f"{SF}/events.parquet").to_pandas()


def test_state_intervals_tile_and_match(ray_session):
    from biomedical_ner_ray import queries as Q

    got = _frame(Q.events_state_intervals(SF)).sort_values(
        ["user_id", "run_idx"], ignore_index=True
    )
    ev = _events().sort_values(["user_id", "ts", "event_id"])
    exp = []
    for uid, g in ev.groupby("user_id", sort=True):
        run, prev = 0, None
        runs = []
        for _, row in g.iterrows():
            if row["event_type"] != prev:
                run += 1
                runs.append([uid, run, row["event_type"], row["ts"], 1])
                prev = row["event_type"]
            else:
                runs[-1][4] += 1
        for i, r in enumerate(runs):
            valid_to = runs[i + 1][3] if i + 1 < len(runs) else pd.NaT
            exp.append(r[:4] + [valid_to, r[4]])
    expdf = pd.DataFrame(
        exp,
        columns=["user_id", "run_idx", "event_type", "valid_from", "valid_to", "n_events"],
    )
    expdf["run_idx"] = expdf["run_idx"].astype("int64")
    expdf["n_events"] = expdf["n_events"].astype("int64")
    for c in ("valid_from", "valid_to"):
        expdf[c] = expdf[c].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got[expdf.columns], expdf)
    # SCD2 invariants: intervals tile (valid_to == next valid_from),
    # exactly one open interval per user, counts cover every event
    for _uid, g in got.groupby("user_id"):
        g = g.sort_values("run_idx")
        assert g["valid_to"].isna().sum() == 1 and pd.isna(g["valid_to"].iloc[-1])
        assert (g["valid_to"].iloc[:-1].values == g["valid_from"].iloc[1:].values).all()
    assert got["n_events"].sum() == len(ev)


def test_region_local_volume_matches_pandas_join(ray_session):
    from biomedical_ner_ray import queries as Q

    got = _frame(Q.region_local_volume(SF)).sort_values(
        ["r_name", "n_name"], ignore_index=True
    )
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    c = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    s = pq.read_table(f"{SF}/supplier.parquet").to_pandas()
    n = pq.read_table(f"{SF}/nation.parquet").to_pandas()
    r = pq.read_table(f"{SF}/region.parquet").to_pandas()
    m = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(s, left_on="l_suppkey", right_on="s_suppkey")
    )
    m = m[m["c_nationkey"] == m["s_nationkey"]]
    m = m.merge(n, left_on="s_nationkey", right_on="n_nationkey").merge(
        r, left_on="n_regionkey", right_on="r_regionkey"
    )
    m["rev"] = (m["l_extendedprice"] * 100).round().astype("int64") * (
        100 - (m["l_discount"] * 100).round().astype("int64")
    )
    exp = (
        m.groupby(["r_name", "n_name"])
        .agg(revenue_c100=("rev", "sum"), n_rows=("rev", "size"))
        .reset_index()
        .sort_values(["r_name", "n_name"], ignore_index=True)
    )
    exp["n_rows"] = exp["n_rows"].astype("int64")
    assert len(exp) > 0 and exp["n_rows"].sum() < len(li)  # constraint filters
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_type_pivot_counts_cover_stream(ray_session):
    from biomedical_ner_ray import queries as Q

    got = _frame(Q.events_type_pivot(SF)).sort_values("user_id", ignore_index=True)
    ev = _events()
    count_cols = [f"n_{t}" for t in Q.EVENT_TYPES]
    assert int(got[count_cols].to_numpy().sum()) == len(ev)
    xt = pd.crosstab(ev["user_id"], ev["event_type"])
    for t in Q.EVENT_TYPES:
        exp = xt[t] if t in xt else pd.Series(0, index=xt.index)
        lhs = got.set_index("user_id")[f"n_{t}"]
        pd.testing.assert_series_equal(
            lhs, exp.astype("int64").rename(f"n_{t}"), check_names=False
        )
    pc = ev[ev["event_type"] == "purchase"]
    exp_cents = (pc["value"] * 100).round().astype("int64").groupby(pc["user_id"]).sum()
    merged = got.set_index("user_id")["purchase_cents"]
    assert (merged.loc[exp_cents.index] == exp_cents).all()
    assert (merged.drop(exp_cents.index) == 0).all()


def test_props_extract_matches_json_loads(ray_session):
    from biomedical_ner_ray import queries as Q

    got = _frame(Q.events_props_extract(SF)).sort_values("event_type", ignore_index=True)
    ev = _events()
    ev["k"] = [json.loads(p)["k"] for p in ev["props"]]
    exp = (
        ev.groupby("event_type")
        .agg(n=("k", "size"), sum_k=("k", "sum"), min_k=("k", "min"), max_k=("k", "max"))
        .reset_index()
        .sort_values("event_type", ignore_index=True)
    )
    for col in ("n", "sum_k", "min_k", "max_k"):
        exp[col] = exp[col].astype("int64")
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_rolling_features_match_bruteforce(ray_session):
    from biomedical_ner_ray import queries as Q

    got = _frame(Q.events_rolling_features(SF)).sort_values(
        ["user_id", "event_id"], ignore_index=True
    )
    ev = _events()
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    exp_rows = []
    for _uid, g in ev.groupby("user_id", sort=True):
        g = g.sort_values(["ts", "event_id"])
        for _, row in g.iterrows():
            win = g[(g["ts"] >= row["ts"] - pd.Timedelta(hours=1)) & (g["ts"] <= row["ts"])]
            exp_rows.append(
                (row["user_id"], row["event_id"], row["ts"], len(win), win["cents"].sum())
            )
    exp = pd.DataFrame(
        exp_rows, columns=["user_id", "event_id", "ts", "n_1h", "sum_cents_1h"]
    ).sort_values(["user_id", "event_id"], ignore_index=True)
    exp["n_1h"] = exp["n_1h"].astype("int64")
    exp["sum_cents_1h"] = exp["sum_cents_1h"].astype("int64")
    exp["ts"] = exp["ts"].astype("datetime64[us]")
    assert (got["n_1h"] >= 1).all()  # frame includes the row itself
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_small_qty_revenue_matches_bruteforce(ray_session):
    from biomedical_ner_ray import queries as Q

    got = _frame(Q.part_small_qty_revenue(SF)).sort_values(
        "l_returnflag", ignore_index=True
    )
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    li["qty_c"] = (li["l_quantity"] * 100).round().astype("int64")
    li["price_c"] = (li["l_extendedprice"] * 100).round().astype("int64")
    g = li.groupby("l_partkey")["qty_c"].agg(["sum", "size"])
    keep = li[5 * li["qty_c"] * li["l_partkey"].map(g["size"]) < li["l_partkey"].map(g["sum"])]
    assert 0 < len(keep) < len(li)  # the predicate genuinely filters
    exp = (
        keep.groupby("l_returnflag")
        .agg(revenue_cents=("price_c", "sum"), n_rows=("price_c", "size"))
        .reset_index()
        .sort_values("l_returnflag", ignore_index=True)
    )
    exp["n_rows"] = exp["n_rows"].astype("int64")
    pd.testing.assert_frame_equal(got[exp.columns], exp)
