"""Edge-case conformance for the custom join / order-statistics
operators: the driver contract already checks them on the fixed
testdata; here adversarial synthetic tables (heavy timestamp ties,
users with clicks but no purchases and vice versa, duplicate prices,
singleton groups) go through BOTH the Ray operator and its DuckDB
oracle and must match value-for-value."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod
from tests.test_driver_contract import _normalize, _to_pandas


def _make_events(seed: int, n: int = 800) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    # tiny user pool + quantized timestamps -> many exact ts ties,
    # including purchase/click pairs at the SAME microsecond
    users = rng.integers(1, 8, size=n)
    base = np.datetime64("2024-03-01T00:00:00", "us")
    ts = base + rng.integers(0, 400, size=n) * np.timedelta64(9 * 60, "s")
    types = rng.choice(
        ["purchase", "click", "view", "error", "signup"],
        size=n,
        p=[0.3, 0.3, 0.2, 0.1, 0.1],
    )
    # user 1 never clicks; user 2 never purchases (outer-join paths)
    types = np.where((users == 1) & (types == "click"), "view", types)
    types = np.where((users == 2) & (types == "purchase"), "view", types)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": ts,
            "user_id": users.astype("int64"),
            "event_type": types,
            "value": np.round(rng.uniform(0, 50, size=n), 2),
            "props": "{}",
        }
    )


def _make_lineitem(seed: int, n: int = 500) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "l_orderkey": np.arange(n, dtype="int64"),
            "l_returnflag": rng.choice(["A", "N", "R"], size=n, p=[0.48, 0.48, 0.04]),
            # few distinct prices -> duplicate-heavy histograms
            "l_extendedprice": rng.choice([9.99, 10.0, 10.01, 250.5, 1999.99], size=n),
        }
    )


def _run_case(name: str, tables: dict[str, pd.DataFrame], tmp_path):
    sf_dir = str(tmp_path)
    con = duckdb.connect()
    for tname, df in tables.items():
        df.to_parquet(os.path.join(sf_dir, f"{tname}.parquet"), index=False)
        con.register(f"_{tname}", df)
        con.execute(f"CREATE VIEW {tname} AS SELECT * FROM _{tname}")
    ray_df = _normalize(_to_pandas(entrymod.queries()[name](sf_dir)))
    sql_df = _normalize(con.execute(entrymod.oracle_sql()[name]).df())
    assert len(ray_df) == len(sql_df), f"{name}: {len(ray_df)} vs {len(sql_df)} rows"
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize(
    "name",
    ["events_asof", "events_range_join", "user_day_purchase_click_outer",
     "events_user_activity", "events_running_total"],
)
def test_event_join_ops_on_adversarial_tables(name, seed, ray_session, tmp_path):
    _run_case(name, {"events": _make_events(seed)}, tmp_path)


def test_running_total_hot_key(ray_session, tmp_path):
    """One user owning 70% of a tie-heavy stream: the prefix-sum op's
    whole point is that the hot key spreads over day buckets instead of
    melting one partition — totals must still match the window oracle."""
    ev = _make_events(5, n=1200)
    hot = np.random.default_rng(5).random(len(ev)) < 0.7
    ev.loc[hot, "user_id"] = 3
    _run_case("events_running_total", {"events": ev}, tmp_path)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_quantiles_on_duplicate_heavy_prices(seed, ray_session, tmp_path):
    _run_case(
        "lineitem_price_quantiles", {"lineitem": _make_lineitem(seed)}, tmp_path
    )
