"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a
``media_type`` tag; decode / feature-extract / frame-sample run as
actor-pool ``map_batches`` stages (the stateful-stage contract of
SURVEY.md A1/A2 — codec "loaded" once per actor). Real codecs (PIL,
torchaudio, pyav) are NOT in this container, so decode is gated: the
default ``codec="fake"`` produces deterministic md5-derived metadata
(so the DuckDB oracle can verify the Ray-side plumbing value-for-value),
while any real codec name raises ``NotImplementedError`` at actor
construction — the schema, batch flow, actor signature and output
layout are real and tested either way.

Batch-size note for real payloads: binary columns are large — at
cluster scale pass ``batch_size`` sized by byte budget (e.g. 64MB /
mean payload), not row count, and give decode actors ``num_cpus``
matching codec threading.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..kernels.hashing import stable_u64_md5

MEDIA_TYPES = ("image", "audio", "video")
FRAME_STRIDE_BYTES = 256

MEDIA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("media_type", pa.string()),
        ("payload", pa.binary()),
    ]
)


def stable_u64_md5_upper(data: bytes) -> int:
    """DuckDB ``md5_number_upper`` twin (digest bytes 0..8, little-endian)."""
    return int.from_bytes(hashlib.md5(data).digest()[:8], "little")


def media_from_documents(batch: pa.Table) -> pa.Table:
    """Deterministic media table derived from documents: payload =
    utf-8 text bytes (binary stand-in), media_type = doc_id mod 3.
    Real deployments read payloads from object storage instead."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "media_type": pa.array(
                [MEDIA_TYPES[d % 3] for d in doc_ids], pa.string()
            ),
            "payload": pa.array([t.encode("utf-8") for t in texts], pa.binary()),
        },
        schema=MEDIA_SCHEMA,
    )


class MediaDecoder:
    """Actor-pool decode stage. ``codec="fake"`` → deterministic
    metadata; any real codec raises until the dependency exists."""

    def __init__(self, codec: str = "fake"):
        if codec != "fake":
            raise NotImplementedError(
                f"codec {codec!r}: real decoders (PIL/torchaudio/pyav) are "
                "not available in this environment; wire them here — the "
                "actor/batch plumbing is already in place"
            )
        self.codec = codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        md5s, widths, heights, nbytes = [], [], [], []
        for p in payloads:
            md5s.append(hashlib.md5(p).hexdigest())
            widths.append(1 + stable_u64_md5(p) % 1920)
            heights.append(1 + stable_u64_md5_upper(p) % 1080)
            nbytes.append(len(p))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_type": batch["media_type"],
                "n_bytes": pa.array(nbytes, pa.int64()),
                "payload_md5": pa.array(md5s, pa.string()),
                "width": pa.array(widths, pa.int64()),
                "height": pa.array(heights, pa.int64()),
            }
        )


def decode_stage(media_ds, concurrency=(1, 4), batch_size: int = 256):
    """media → decoded metadata via the MediaDecoder actor pool."""
    return media_ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"codec": "fake"},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def frame_sample_batch(batch: pa.Table) -> pa.Table:
    """Video payloads → one row per sampled frame (every
    FRAME_STRIDE_BYTES-th byte offset) — the flat_map frame-sampler
    shape; a real sampler would emit decoded frame tensors instead."""
    doc_ids, frame_idxs, offsets = [], [], []
    for doc_id, mtype, payload in zip(
        batch["doc_id"].to_pylist(),
        batch["media_type"].to_pylist(),
        batch["payload"].to_pylist(),
    ):
        if mtype != "video" or not payload:
            continue
        n_frames = (len(payload) - 1) // FRAME_STRIDE_BYTES + 1
        for i in range(n_frames):
            doc_ids.append(doc_id)
            frame_idxs.append(i)
            offsets.append(i * FRAME_STRIDE_BYTES)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "frame_idx": pa.array(frame_idxs, pa.int64()),
            "byte_offset": pa.array(offsets, pa.int64()),
        }
    )
