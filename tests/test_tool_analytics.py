"""Tool-usage analytics over the input_hint ``tool`` column
(queries.kg_tool_usage / kg_tool_chains / kg_conv_tool_profile) —
pandas replays over the fixture transcripts, plus the fixture-v4
diversity invariant that makes these operators testable at all."""

import glob
import os

import pandas as pd
import pyarrow.parquet as pq

from biomedical_ner_ray import queries as Q

SF = "/root/testdata/sf0.001"


def _turns(tiny_fixture, columns):
    files = sorted(glob.glob(os.path.join(tiny_fixture["transcripts"], "*.parquet")))
    return pd.concat(
        [pq.read_table(f, columns=columns).to_pandas() for f in files],
        ignore_index=True,
    )


def test_fixture_tool_diversity(tiny_fixture):
    """Fixture v4: role='tool' turns carry a diverse md5-deterministic
    tool bank; every other role carries the empty string."""
    t = _turns(tiny_fixture, ["role", "tool"])
    tools = t.loc[t["role"] == "tool", "tool"]
    assert tools.nunique() >= 3, "tool bank collapsed — analytics untestable"
    assert (t.loc[t["role"] != "tool", "tool"] == "").all()
    from biomedical_ner_ray.fixtures import TOOL_BANK

    assert set(tools.unique()) <= set(TOOL_BANK)


def test_tool_usage_sf001(ray_session, tiny_fixture):
    """Exchange-reduced per-tool profile == a pandas groupby replay
    (calls, distinct convs, first/last epoch-µs)."""
    t = _turns(tiny_fixture, ["conv_id", "role", "tool", "ts"])
    t = t[t["role"] == "tool"].copy()
    t["ts_us"] = t["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
    exp = (
        t.groupby("tool", as_index=False)
        .agg(
            n_calls=("ts_us", "size"),
            n_convs=("conv_id", "nunique"),
            first_ts_us=("ts_us", "min"),
            last_ts_us=("ts_us", "max"),
        )
        .astype({"n_calls": "int64", "n_convs": "int64"})
        .sort_values("tool")
        .reset_index(drop=True)
    )
    out = (
        Q.kg_tool_usage(SF).to_pandas().sort_values("tool").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp)


def test_tool_chains_sf001(ray_session, tiny_fixture):
    """Conversation-keyed lag pairs == a pandas shift replay over the
    tool-turn subsequence (gaps between tool turns spanned, conversation
    boundaries respected)."""
    t = _turns(tiny_fixture, ["conv_id", "turn_idx", "role", "tool"])
    t = (
        t[t["role"] == "tool"]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    t["prev_tool"] = t.groupby("conv_id")["tool"].shift(1)
    exp = (
        t.dropna(subset=["prev_tool"])
        .groupby(["prev_tool", "tool"], as_index=False)
        .size()
        .rename(columns={"size": "n_transitions"})
        .astype({"n_transitions": "int64"})
        .sort_values(["prev_tool", "tool"])
        .reset_index(drop=True)
    )
    out = (
        Q.kg_tool_chains(SF)
        .to_pandas()
        .sort_values(["prev_tool", "tool"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp)
    # every conversation's first tool turn is excluded by construction
    assert out["n_transitions"].sum() == len(t) - t["conv_id"].nunique()


def test_conv_tool_profile_sf001(ray_session, tiny_fixture):
    """Per-conversation profile == pandas replay; the dominant tool
    obeys the (count desc, tool asc) tie-break everywhere."""
    t = _turns(tiny_fixture, ["conv_id", "role", "tool"])
    t = t[t["role"] == "tool"]
    tc = t.groupby(["conv_id", "tool"], as_index=False).size()
    tc = tc.sort_values(
        ["conv_id", "size", "tool"], ascending=[True, False, True], kind="mergesort"
    )
    exp = tc.groupby("conv_id", as_index=False).agg(
        n_tool_calls=("size", "sum"), n_distinct_tools=("tool", "size")
    )
    exp["dominant_tool"] = tc.groupby("conv_id")["tool"].first().to_numpy()
    exp = exp.astype({"n_tool_calls": "int64", "n_distinct_tools": "int64"})
    out = (
        Q.kg_conv_tool_profile(SF)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out, exp.sort_values("conv_id").reset_index(drop=True)
    )
    # only conversations with >= 1 tool turn appear
    assert set(out["conv_id"]) == set(t["conv_id"].unique())
