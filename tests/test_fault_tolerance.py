"""Fault tolerance: Ray's task retries must transparently absorb a
transient UDF failure because every stage is a pure function over its
batch (idempotence contract, SURVEY.md §4 'Retries')."""

import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet  # noqa: F401  (pa.parquet used below)
import ray.data as rd

from biomedical_ner_ray.stages.exchange import grouped_aggregate


def test_transient_udf_failure_is_retried(ray_session):
    marker = os.path.join(
        tempfile.gettempdir(), "graft_fault_marker_transient_test"
    )
    if os.path.exists(marker):
        os.remove(marker)

    def flaky(batch: pa.Table) -> pa.Table:
        # fail exactly once across the whole run (marker file is shared
        # state on this single-node test host)
        if not os.path.exists(marker):
            with open(marker, "w") as f:
                f.write("failed once")
            raise RuntimeError("injected transient failure")
        return batch

    # user-code exceptions are NOT retried by default — stages that may
    # hit transient infra errors opt in, relying on UDF purity
    ds = rd.range(1000).map_batches(
        flaky,
        batch_format="pyarrow",
        batch_size=100,
        retry_exceptions=[RuntimeError],
    )
    total = sum(b.num_rows for b in ds.iter_batches(batch_format="pyarrow"))
    assert total == 1000  # retry recovered every row exactly once
    os.remove(marker)


def test_grouped_aggregate_matches_pandas(ray_session):
    """The keyed hash exchange must equal a plain pandas groupby on the
    same data — the core-operator correctness property."""
    rng = pd.DataFrame(
        {
            "k": [f"key-{i % 137}" for i in range(10_000)],
            "v": [(i * 31) % 997 for i in range(10_000)],
        }
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("k", sort=False)["v"].sum().reset_index(name="s")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("k", sort=False)["s"].sum().reset_index()

    ds = rd.from_pandas(rng).repartition(13)
    out = grouped_aggregate(ds, ["k"], partial, combine).to_pandas()

    expected = rng.groupby("k")["v"].sum().reset_index(name="s")
    pd.testing.assert_frame_equal(
        out.sort_values("k").reset_index(drop=True),
        expected.sort_values("k").reset_index(drop=True),
    )


def test_clear_errors_on_malformed_input(ray_session, tiny_fixture, tmp_path):
    import pytest

    from biomedical_ner_ray.pipelines.kg import run_kg_pipeline

    bad = tmp_path / "bad"
    bad.mkdir()
    pa.parquet.write_table(
        pa.table({"conv_id": ["a"], "turn_idx": pa.array([0], pa.int32())}),
        str(bad / "x.parquet"),
    )
    with pytest.raises(ValueError, match="missing required column"):
        run_kg_pipeline(str(bad), tiny_fixture["alias_dict"], str(tmp_path / "o1"))
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError, match="no parquet files"):
        run_kg_pipeline(str(empty), tiny_fixture["alias_dict"], str(tmp_path / "o2"))
