"""Size-derived exchange partitioning (stages/exchange.partitions_for).

The former constant-8 default meant a keyed stream at corpus scale
would cram 1/8 of itself into one worker's pandas heap; the derived
default must (a) stay at the measured-optimal floor for test-scale
inputs so plans don't regress, (b) grow ~linearly with input bytes,
(c) respect the O(P²) sort-shuffle ceiling, and (d) sum files inside
directory inputs (the transcript fixture is a directory of shards).
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from biomedical_ner_ray.stages.exchange import (
    BYTES_PER_PARTITION,
    DEFAULT_PARTITIONS,
    MAX_PARTITIONS,
    keyed_exchange,
    partitions_for,
)


@pytest.fixture(scope="module")
def small_parquet(tmp_path_factory):
    d = tmp_path_factory.mktemp("pfor")
    p = os.path.join(d, "t.parquet")
    pq.write_table(pa.table({"x": list(range(1000))}), p)
    return p


def test_floor_at_test_scale(small_parquet):
    # a ~KB table must land exactly on the measured-optimal floor
    assert partitions_for(small_parquet) == DEFAULT_PARTITIONS


def test_missing_path_is_floor(tmp_path):
    assert partitions_for(os.path.join(tmp_path, "nope.parquet")) == DEFAULT_PARTITIONS


def test_scales_linearly_with_bytes(small_parquet):
    nbytes = os.path.getsize(small_parquet)
    # make the budget one file's bytes and amplify expansion so the
    # small file plays "big": ceil(16·n/n) = 16 partitions exactly
    got = partitions_for(small_parquet, expansion=16.0, bytes_per_partition=nbytes)
    assert got == 16
    # doubling the input (same file twice) doubles the count
    assert partitions_for(
        small_parquet, small_parquet, expansion=16.0, bytes_per_partition=nbytes
    ) == 32


def test_ceiling(small_parquet):
    got = partitions_for(small_parquet, bytes_per_partition=1)
    assert got == MAX_PARTITIONS


def test_directory_input_sums_shards(tmp_path, small_parquet):
    sub = tmp_path / "shards"
    sub.mkdir()
    for i in range(3):
        pq.write_table(pa.table({"x": list(range(1000))}), sub / f"p{i}.parquet")
    (sub / "notes.txt").write_text("ignored")
    shard_bytes = os.path.getsize(sub / "p0.parquet")
    one = partitions_for(
        str(sub / "p0.parquet"), expansion=16.0, bytes_per_partition=shard_bytes
    )
    three = partitions_for(str(sub), expansion=16.0, bytes_per_partition=shard_bytes)
    assert three == 3 * one


def test_default_budget_is_sane():
    # ~6.4GB of parquet at default expansion → ceil(4.0·6.4e9/64MB) = 400
    import math

    need = math.ceil(6.4e9 * 4.0 / BYTES_PER_PARTITION)
    assert 256 <= need <= 512


def test_keyed_exchange_none_default(ray_session):
    # num_partitions=None must behave exactly like the old constant-8
    import pandas as pd
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"k": [1, 2, 1, 3], "v": [1, 1, 2, 5]}))
    out = (
        keyed_exchange(
            ds, ["k"], lambda df: df.groupby("k", as_index=False)["v"].sum(), None
        )
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    assert out["v"].tolist() == [3, 1, 5]
