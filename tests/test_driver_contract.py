"""Emulates the driver's correctness gate: for every ``queries()`` entry
with an ``oracle_sql()`` entry, run the Ray pipeline AND the DuckDB SQL
over the same sf tables and require identical row counts, column names,
and values (order-insensitive)."""

import os

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(SF_DIR, t)}.parquet')"
        )
    return c


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


QUERY_NAMES = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(name, con, ray_session):
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    assert name in qs, f"oracle_sql has {name} but queries() does not"
    ray_df = _normalize(_to_pandas(qs[name](SF_DIR)))
    sql_df = _normalize(con.execute(sqls[name]).df())
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: columns differ: {list(ray_df.columns)} vs {list(sql_df.columns)}"
    )
    assert len(ray_df) == len(sql_df), f"{name}: row count {len(ray_df)} vs {len(sql_df)}"
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False, check_exact=True)


def test_all_queries_have_callables():
    qs = entrymod.queries()
    for name in qs:
        assert callable(qs[name])


def test_entry_smoke(ray_session):
    ds = entrymod.entry()
    assert ds.count() > 0
    cols = set(ds.schema().names)
    assert {"subj_cui", "pred", "obj_cui", "conv_id", "turn_idx"} <= cols
