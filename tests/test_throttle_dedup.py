"""Greedy window suppression (events_throttle_dedup): the kept set per
(user, event_type) must replay the data-dependent greedy chain — every
kept event is the first strictly past the previous kept ts + W, and no
two kept events sit within W of each other. Checked against an
independent pandas walk (the DuckDB recursive-CTE oracle runs
separately via scripts/contract_check.py)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from biomedical_ner_ray import queries as Q

SF = "/root/testdata/sf0.001"


def _frame(x):
    return x if isinstance(x, pd.DataFrame) else x.to_pandas()


def _greedy(ev):
    out = []
    for (uid, et), g in ev.groupby(["user_id", "event_type"], sort=False):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        ids = g["event_id"].to_numpy("int64")
        i, n = 0, len(ts)
        while i < n:
            out.append((uid, et, ids[i], ts[i]))
            i = int(np.searchsorted(ts, ts[i] + Q.THROTTLE_W_US, side="right"))
    return pd.DataFrame(out, columns=["user_id", "event_type", "event_id", "ts_us"])


def test_throttle_matches_greedy_walk(ray_session):
    got = _frame(Q.events_throttle_dedup(SF)).copy()
    got["ts_us"] = got["ts"].astype("datetime64[us]").astype("int64")
    got = got[["user_id", "event_type", "event_id", "ts_us"]].sort_values(
        ["user_id", "event_type", "ts_us"], ignore_index=True
    )
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    exp = _greedy(ev).sort_values(
        ["user_id", "event_type", "ts_us"], ignore_index=True
    )
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))


def test_throttle_kept_set_is_w_separated_and_maximal(ray_session):
    got = _frame(Q.events_throttle_dedup(SF)).copy()
    got["ts_us"] = got["ts"].astype("datetime64[us]").astype("int64")
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    for (uid, et), g in got.groupby(["user_id", "event_type"]):
        kept = np.sort(g["ts_us"].to_numpy())
        # consecutive kept events are strictly more than W apart
        assert (np.diff(kept) > Q.THROTTLE_W_US).all()
        # maximality: the stream's first event is always kept
        stream = ev[(ev["user_id"] == uid) & (ev["event_type"] == et)]
        assert stream["ts_us"].min() == kept[0]
        # every suppressed event lies within W of some kept event before it
        sup = np.setdiff1d(stream["ts_us"].to_numpy(), kept)
        if len(sup):
            idx = np.searchsorted(kept, sup, side="right") - 1
            assert (sup - kept[idx] <= Q.THROTTLE_W_US).all()
