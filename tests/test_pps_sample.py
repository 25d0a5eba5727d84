"""Systematic PPS weighted sampling (queries.orders_pps_sample):
integer exactness vs a sequential reference, the Σ picks == K
invariant, and multi-pick heavy items."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from biomedical_ner_ray import queries as Q

SF = "/root/testdata/sf0.01"


def _reference(df: pd.DataFrame, k: int) -> pd.DataFrame:
    df = df.sort_values("o_orderkey", ignore_index=True)
    cents = np.floor(df["o_totalprice"].to_numpy(dtype=np.float64) * 100.0).astype(
        np.int64
    )
    cum = np.cumsum(cents)
    tot = int(cum[-1])
    hi = (cum * k) // tot
    lo = ((cum - cents) * k) // tot
    picks = hi - lo
    out = pd.DataFrame(
        {
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "weight_cents": cents,
            "n_picks": picks,
        }
    )
    return out[out["n_picks"] > 0].reset_index(drop=True)


def test_matches_sequential_reference(ray_session):
    got = (
        Q.orders_pps_sample(SF)
        .to_pandas()
        .sort_values("o_orderkey", ignore_index=True)
    )
    orders = pq.read_table(
        os.path.join(SF, "orders.parquet"), columns=["o_orderkey", "o_totalprice"]
    ).to_pandas()
    exp = _reference(orders, Q.PPS_K)
    pd.testing.assert_frame_equal(got, exp)


def test_total_picks_is_k(ray_session):
    got = Q.orders_pps_sample(SF).to_pandas()
    # systematic sampling invariant: floor(T·K/T) - floor(0) == K
    assert int(got["n_picks"].sum()) == Q.PPS_K


def test_heavy_item_multi_pick(ray_session, tmp_path):
    """An item holding more than 2/K of the total weight line must be
    picked at least twice."""
    n = 40
    price = np.full(n, 10.0)
    price[7] = 10.0 * n  # ~50% of total mass
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(1, n + 1), pa.int64()),
                "o_totalprice": pa.array(price, pa.float64()),
            }
        ),
        os.path.join(tmp_path, "orders.parquet"),
    )
    got = Q.orders_pps_sample(str(tmp_path)).to_pandas()
    heavy = got[got["o_orderkey"] == 8]
    assert len(heavy) == 1 and int(heavy["n_picks"].iloc[0]) >= 2
    exp = _reference(
        pd.DataFrame({"o_orderkey": np.arange(1, n + 1), "o_totalprice": price}),
        Q.PPS_K,
    )
    pd.testing.assert_frame_equal(
        got.sort_values("o_orderkey", ignore_index=True), exp
    )
