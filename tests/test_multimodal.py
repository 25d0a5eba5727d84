"""Multimodal plumbing tests: binary column schema, actor-pool decode,
frame sampling, and the real-codec NotImplementedError gate."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from biomedical_ner_ray.stages.multimodal import (
    FRAME_STRIDE_BYTES,
    MEDIA_SCHEMA,
    MediaDecoder,
    decode_stage,
    frame_sample_batch,
    media_from_documents,
)


def _docs():
    return rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3, 4, 5],
                "text": ["a" * 10, "b" * 300, "c" * 600, "", "e" * 50, "f" * 257],
            }
        )
    )


def test_media_schema_and_types(ray_session):
    media = _docs().map_batches(media_from_documents, batch_format="pyarrow")
    t = pa.concat_tables(media.iter_batches(batch_format="pyarrow"))
    assert t.schema.equals(MEDIA_SCHEMA)
    by_id = dict(zip(t["doc_id"].to_pylist(), t["media_type"].to_pylist()))
    assert by_id[0] == "image" and by_id[1] == "audio" and by_id[2] == "video"
    assert t["payload"][1].as_py() == b"b" * 300


def test_decode_stage_actor_pool(ray_session):
    media = _docs().map_batches(media_from_documents, batch_format="pyarrow")
    out = decode_stage(media, concurrency=(1, 2)).to_pandas()
    assert len(out) == 6
    assert set(out.columns) == {
        "doc_id", "media_type", "n_bytes", "payload_md5", "width", "height"
    }
    assert (out["width"].between(1, 1920)).all()
    assert (out["height"].between(1, 1080)).all()
    assert out.set_index("doc_id")["n_bytes"][1] == 300
    # deterministic: same payload -> same metadata on a rerun
    out2 = decode_stage(media, concurrency=(1, 2)).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        out2.sort_values("doc_id").reset_index(drop=True),
    )


def test_frame_sampling(ray_session):
    media = _docs().map_batches(media_from_documents, batch_format="pyarrow")
    frames = media.map_batches(frame_sample_batch, batch_format="pyarrow").to_pandas()
    # only video docs (2, 5); doc 2 has 600 bytes -> 3 frames, doc 5 has 257 -> 2
    assert set(frames["doc_id"]) == {2, 5}
    assert len(frames[frames["doc_id"] == 2]) == 3
    assert len(frames[frames["doc_id"] == 5]) == 2
    assert (frames["byte_offset"] == frames["frame_idx"] * FRAME_STRIDE_BYTES).all()


def test_real_codec_gate():
    with pytest.raises(NotImplementedError):
        MediaDecoder(codec="pil")
    MediaDecoder(codec="fake")  # default path constructs fine


def test_frame_dedup_planted(ray_session, tmp_path):
    """Planted cross-video duplicate frames: two videos sharing their
    first 256-codepoint frame must surface as one dup group; a frame
    repeated WITHIN one video only must not (distinct-video gate)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from biomedical_ner_ray import queries as Q

    shared = "x" * Q.MM_FRAME_CHARS
    inner_dup = "y" * Q.MM_FRAME_CHARS
    rows = {
        # doc_id % 3 == 2 -> video
        2: shared + "tail-a",
        5: shared + "tail-b",
        8: inner_dup + inner_dup,  # same frame twice, ONE video
        11: "unique frame content",
        0: shared,  # image: must be ignored even with the shared frame
    }
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(rows), pa.int64()),
                "text": pa.array(list(rows.values()), pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = Q.mm_frame_dedup(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["frame_md5"] == hashlib.md5(shared.encode()).hexdigest()
    assert r["n_docs"] == 2 and r["n_frames"] == 2 and r["first_doc"] == 2
