"""Annotate-stage execution modes: tasks vs explicit actor pool, and
dict vs crf scorer, must all produce identical annotations."""

import pandas as pd
import pyarrow.parquet as pq
import ray
import ray.data as rd

from biomedical_ner_ray.fixtures import alias_rows
from biomedical_ner_ray.kernels.tagger import AliasDict
from biomedical_ner_ray.stages.annotate import annotate_stage


def _norm(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    df["mentions"] = df["mentions"].map(
        lambda ms: tuple(tuple(sorted(m.items())) for m in ms)
    )
    df["triples"] = df["triples"].map(
        lambda ts: tuple(tuple(sorted(t.items())) for t in ts)
    )
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_modes_and_scorers_agree(ray_session, tiny_fixture):
    import glob

    files = sorted(glob.glob(tiny_fixture["transcripts"] + "/*.parquet"))[:2]
    ref = ray.put(AliasDict(alias_rows()))

    def run(**kw):
        ds = rd.read_parquet(files, columns=["conv_id", "turn_idx", "text"])
        return _norm(annotate_stage(ds, ref, batch_size=256, **kw))

    base = run(mode="tasks", scorer="dict")
    actor = run(mode="actors", concurrency=2, scorer="dict")
    crf = run(mode="tasks", scorer="crf")
    pd.testing.assert_frame_equal(base, actor)
    pd.testing.assert_frame_equal(base, crf)
    assert len(base) == sum(pq.ParquetFile(f).metadata.num_rows for f in files)
