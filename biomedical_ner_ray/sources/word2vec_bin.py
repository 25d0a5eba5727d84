"""Binary word2vec-format keyed-vector reader (S7 — the BioWordVec path).

Reference: BioWordVec.ipynb cell 2 loads a ~1.5 GB
``KeyedVectors.load_word2vec_format(binary=True,
unicode_errors='ignore')`` file (README.md:517-520). Format: an ASCII
header line ``"<vocab> <dim>\\n"``, then per word the name bytes
terminated by a space followed by ``dim`` little-endian float32s.

Scale pattern (SURVEY §2.1 S7): do NOT ship the raw 1.5 GB KV to every
task. Either
- pre-join on the driver: ``restrict_vocab`` keeps only the corpus
  vocabulary while streaming the file once, then ``kv_to_parquet``
  writes the small aligned matrix artifact that actors broadcast; or
- load once per actor: pass the parquet artifact path to the actor
  ``__init__`` (A1 contract) — never reread per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def write_word2vec_binary(path: str, words: list[str], mat: np.ndarray) -> None:
    """Writer (tests + artifact conversion); float32, gensim-compatible."""
    mat = np.asarray(mat, dtype=np.float32)
    with open(path, "wb") as f:
        f.write(f"{len(words)} {mat.shape[1]}\n".encode("utf-8"))
        for w, row in zip(words, mat):
            f.write(w.encode("utf-8") + b" ")
            f.write(row.tobytes())


def read_word2vec_binary(
    path: str, restrict_vocab: set[str] | None = None
) -> tuple[list[str], np.ndarray]:
    """Stream the file once; keep only ``restrict_vocab`` words if given
    (constant memory in the KV size when the corpus vocab is small).
    Undecodable word bytes are decoded with errors='ignore', matching
    the reference's ``unicode_errors='ignore'``."""
    words: list[str] = []
    rows: list[np.ndarray] = []
    with open(path, "rb") as f:
        header = f.readline().decode("utf-8").strip().split()
        vocab_size, dim = int(header[0]), int(header[1])
        row_bytes = 4 * dim
        for _ in range(vocab_size):
            name = bytearray()
            while True:
                ch = f.read(1)
                if not ch or ch == b" ":
                    break
                if ch != b"\n":  # leading newlines between records
                    name.extend(ch)
            vec_buf = f.read(row_bytes)
            if len(vec_buf) < row_bytes:
                break  # truncated file: keep what we parsed
            word = name.decode("utf-8", errors="ignore")
            if restrict_vocab is not None and word not in restrict_vocab:
                continue
            words.append(word)
            rows.append(np.frombuffer(vec_buf, dtype="<f4").copy())
    mat = np.stack(rows) if rows else np.zeros((0, dim), dtype=np.float32)
    return words, mat


def kv_to_parquet(words: list[str], mat: np.ndarray, out_path: str) -> None:
    """Write the (restricted) KV as the engine's standard keyed-vector
    parquet artifact (same schema as pipelines/embeddings kv.parquet)."""
    pq.write_table(
        pa.table(
            {
                "word": pa.array(words, pa.string()),
                "vector": pa.array(
                    [r.astype(np.float64).tolist() for r in mat],
                    pa.list_(pa.float64()),
                ),
            }
        ),
        out_path,
    )
