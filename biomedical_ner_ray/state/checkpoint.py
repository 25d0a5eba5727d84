"""Model checkpoint save/load with the reference's partial-load fallback
(S5).

Reference: ``app.py:181-205`` — try a strict ``load_state_dict`` (from
the ``model_state_dict`` key or the raw dict); on ANY failure fall back
to a partial load keeping only entries whose name exists in the target
model AND whose shape matches, leaving everything else at its
initialization (``app.py:199-205``); report loaded/total. The torch
checkpoint also carries ``epoch`` / ``best_f1`` metadata
(JNLPBA.ipynb cell 11 save block).

This is the numpy analog: arrays in an ``.npz`` (one entry per named
parameter), metadata in a JSON sidecar. Scorer actors call
``load_into`` from ``__init__`` — once per actor, never per batch.
"""

from __future__ import annotations

import json
import os

import numpy as np


def save_checkpoint(path: str, arrays: dict[str, np.ndarray],
                    meta: dict | None = None) -> None:
    """Write arrays to ``path`` (.npz) + metadata sidecar ``path.json``."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)
    with open(_meta_path(path), "w") as f:
        json.dump(meta or {}, f)


def _npz_path(path: str) -> str:
    return path if path.endswith(".npz") else path + ".npz"


def _meta_path(path: str) -> str:
    return _npz_path(path)[: -len(".npz")] + ".json"


def load_meta(path: str) -> dict:
    try:
        with open(_meta_path(path)) as f:
            return json.load(f)
    except OSError:
        return {}


def load_into(path: str, target: dict[str, np.ndarray]) -> dict:
    """Load a checkpoint into ``target`` (mutated in place).

    Strict first: if every checkpoint entry matches a target name+shape
    AND covers the whole target, copy all. Otherwise the partial
    fallback (app.py:199-205): copy only name-present shape-matching
    entries, keep the rest initialized. Returns
    ``{"mode": "strict"|"partial", "loaded": n, "total": m, "skipped": [...]}."""
    with np.load(_npz_path(path)) as z:
        ckpt = {k: z[k] for k in z.files}

    matching = {
        k: v
        for k, v in ckpt.items()
        if k in target and target[k].shape == v.shape
    }
    strict = len(matching) == len(ckpt) == len(target)
    for k, v in matching.items():
        np.copyto(target[k], v)
    return {
        "mode": "strict" if strict else "partial",
        "loaded": len(matching),
        "total": len(ckpt),
        "skipped": sorted(set(ckpt) - set(matching)),
    }
