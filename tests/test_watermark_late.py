"""Watermark late-event detection (events_watermark_late): the late
set must match a sequential replay of the arrival stream — walk events
in md5-arrival order carrying a running max event-time; an event is
late iff its event-time falls more than the allowed lateness below
that max. The DuckDB window oracle runs separately via
scripts/contract_check.py."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from biomedical_ner_ray import queries as Q
from biomedical_ner_ray.kernels.hashing import stable_u64_md5

SF = "/root/testdata/sf0.001"


def _frame(x):
    return x if isinstance(x, pd.DataFrame) else x.to_pandas()


def _replay():
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["ak"] = [stable_u64_md5(str(int(e)).encode()) for e in ev["event_id"]]
    ev["t"] = ev["ts"].astype("datetime64[us]").astype("int64")
    ev = ev.sort_values(["ak", "event_id"], kind="mergesort")
    hi = None
    out = []
    for _, row in ev.iterrows():
        if hi is not None and row["t"] < hi - Q.WATERMARK_DELAY_US:
            out.append(
                (
                    row["event_id"],
                    row["event_type"],
                    row["t"],
                    hi - Q.WATERMARK_DELAY_US,
                )
            )
        hi = row["t"] if hi is None else max(hi, row["t"])
    return pd.DataFrame(
        out, columns=["event_id", "event_type", "t", "watermark_us"]
    )


def test_watermark_matches_sequential_replay(ray_session):
    got = _frame(Q.events_watermark_late(SF)).copy()
    got["t"] = got["ts"].astype("datetime64[us]").astype("int64")
    got = got[["event_id", "event_type", "t", "watermark_us"]].sort_values(
        "event_id", ignore_index=True
    )
    exp = _replay().sort_values("event_id", ignore_index=True)
    assert len(exp) > 0, "fixture must produce a non-vacuous late set"
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))


def test_watermark_late_by_is_positive_and_consistent(ray_session):
    got = _frame(Q.events_watermark_late(SF))
    t = got["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    assert (got["late_by_us"].to_numpy() > 0).all()
    assert (got["watermark_us"].to_numpy() - t == got["late_by_us"].to_numpy()).all()
    # the watermark can never exceed the global max event-time minus delay
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    gmax = ev["ts"].astype("datetime64[us]").astype("int64").max()
    assert (got["watermark_us"].to_numpy() <= gmax - Q.WATERMARK_DELAY_US).all()
