"""Integer power iteration (queries.emb_power_iteration): distributed
iterates == sequential reference, and the documented partial-convergence
pin on the near-degenerate corpus spectrum."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from biomedical_ner_ray import queries as Q
from biomedical_ner_ray.kernels.quantize import micro_matrix
from biomedical_ner_ray.stages.kmeans import _trunc_div

SF = "/root/testdata/sf0.01"
M = np.int64(1_000_000)


def _sequential(A: np.ndarray, iters: int) -> np.ndarray:
    v = np.full(A.shape[1], 1_000_000, dtype=np.int64)
    for _ in range(iters):
        u = _trunc_div(A @ v, M)
        w = _trunc_div(A.T @ u, M)  # == engine: global undivided sum, then //1e6
        m = max(int(np.abs(w).max()), 1)
        v = _trunc_div(w * M, np.int64(m))
    return v


def test_matches_sequential_reference(ray_session):
    t = (
        pq.read_table(SF + "/embeddings.parquet", columns=["vec_id", "embedding"])
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    A = micro_matrix(t["embedding"].to_numpy())
    v = _sequential(A, Q.POWER_ITERS)
    exp = pd.DataFrame(
        {
            "vec_id": t["vec_id"].astype("int64"),
            "proj_micro": _trunc_div(A @ v, M),
        }
    )
    got = (
        Q.emb_power_iteration(SF)
        .to_pandas()
        .sort_values("vec_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_partial_convergence_documented(ray_session):
    """The docstring's claim: 25 rounds reach |cos| >= 0.8 to the true
    top eigenvector on this corpus (tight eigengap, ratio ~0.984)."""
    t = (
        pq.read_table(SF + "/embeddings.parquet", columns=["embedding"])
        .to_pandas()
    )
    A = micro_matrix(t["embedding"].to_numpy())
    v = _sequential(A, Q.POWER_ITERS).astype(float)
    v /= np.linalg.norm(v)
    Af = A.astype(float) / 1e6
    evals, evecs = np.linalg.eigh(Af.T @ Af)
    assert abs(float(v @ evecs[:, -1])) >= 0.8
