"""Dictionary-build pipeline tests: reference vocab semantics (specials,
min_freq, deterministic ids), resume, and parallelism determinism."""

import glob

import pyarrow.parquet as pq

from biomedical_ner_ray.pipelines.dictionary import build_dictionary_artifacts


def _load(res, name):
    f = glob.glob(res["paths"][name] + "/*.parquet")[0]
    return pq.read_table(f)


def test_vocab_artifacts(ray_session, tiny_fixture, tmp_path):
    out = str(tmp_path / "dict")
    res = build_dictionary_artifacts(
        tiny_fixture["transcripts"], out,
        tag_types=["DNA", "RNA", "protein", "cell_line", "cell_type", "Disease"],
    )
    vocab = _load(res, "vocab")
    words = vocab["word"].to_pylist()
    ids = vocab["word_id"].to_pylist()
    ns = vocab["n_occurrences"].to_pylist()
    assert words[:3] == ["<PAD>", "<UNK>", "<NUM>"] and ids[:3] == [0, 1, 2]
    assert ids == list(range(len(ids)))  # dense
    # count-desc then word-asc ordering after specials
    body = list(zip(ns[3:], words[3:]))
    assert body == sorted(body, key=lambda x: (-x[0], x[1]))
    assert min(ns[3:]) >= 2  # min_freq
    assert len(set(words)) == len(words)

    chars = _load(res, "char_vocab")
    cw = chars["ch"].to_pylist()
    assert cw[:2] == ["<PAD>", "<UNK>"]
    assert len(set(cw)) == len(cw)

    tags = _load(res, "tag_map")
    tt = tags["tag"].to_pylist()
    assert tt[0] == "<PAD>" and tt[1] == "O"
    assert tt[2:4] == ["B-DNA", "I-DNA"]  # sorted types -> alphabetical ids

    # resume: second run skips all three stages
    res2 = build_dictionary_artifacts(
        tiny_fixture["transcripts"], out,
        tag_types=["DNA", "RNA", "protein", "cell_line", "cell_type", "Disease"],
    )
    assert all(res2[k]["skipped"] for k in ("vocab", "char_vocab", "tag_map"))
    assert _load(res2, "vocab").equals(vocab)
