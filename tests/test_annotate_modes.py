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
    comb = run(mode="tasks", scorer="combinatorial")
    pd.testing.assert_frame_equal(base, actor)
    pd.testing.assert_frame_equal(base, crf)
    pd.testing.assert_frame_equal(base, comb)
    assert len(base) == sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def test_crf_with_trained_artifacts_agrees(ray_session, tiny_fixture, tmp_path):
    """The J4/S5 slot in the flagship: a crf scorer loading a trained
    embedding matrix AND a parameter checkpoint still decodes exactly
    the dictionary tags (decode-equivalence is artifact-independent)."""
    import glob

    import numpy as np

    from biomedical_ner_ray.kernels.crf import CharFeaturizer
    from biomedical_ner_ray.pipelines.embeddings import train_sgns
    from biomedical_ner_ray.sources.word2vec_bin import kv_to_parquet
    from biomedical_ner_ray.state.checkpoint import save_checkpoint

    m = train_sgns(
        [["the", "patient", "received", "il-2", "therapy"]] * 30, epochs=1
    )
    mat_path = str(tmp_path / "matrix.parquet")
    kv_to_parquet(m.words, m.vectors.astype(np.float32), mat_path)
    dim = m.vectors.shape[1]
    probe = CharFeaturizer(5, emb_dim=dim)
    ck = str(tmp_path / "ck")
    save_checkpoint(ck, {k: v * 0.5 for k, v in probe.parameters().items()})

    files = sorted(glob.glob(tiny_fixture["transcripts"] + "/*.parquet"))[:2]
    ref = ray.put(AliasDict(alias_rows()))

    def run(**kw):
        ds = rd.read_parquet(files, columns=["conv_id", "turn_idx", "text"])
        return _norm(annotate_stage(ds, ref, batch_size=256, **kw))

    base = run(mode="tasks", scorer="dict")
    loaded = run(
        mode="tasks",
        scorer="crf",
        scorer_kwargs={
            "embedding_matrix_path": mat_path,
            "checkpoint_path": ck,
        },
    )
    pd.testing.assert_frame_equal(base, loaded)
