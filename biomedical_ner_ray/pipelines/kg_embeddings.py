"""TransE-family knowledge-graph embeddings trained on the engine's OWN
canonical edge table — the graph-representation-learning lifecycle
(Bordes et al. NeurIPS'13 "Translating Embeddings for Modeling
Multi-relational Data") that downstream link-prediction / entity-typing
pipelines run over a constructed KG.

Model: entity vectors E[n_nodes, D] and relation vectors R[n_preds, D]
in INTEGER micro fixed point; score(s, p, o) = L1(E[s] + R[p] − E[o]).
Training is full-batch margin SGD with the L1 subgradient (sign vectors,
ints in {−1, 0, 1}) and md5-deterministic negative sampling (the object
is corrupted to ``nodes[md5('teneg:'||epoch||':'||s||':'||p||':'||o) %
n_nodes]`` — a pure function of the triple and epoch, so both trainers
draw identical negatives). Every per-triple contribution is an int64
scaled by the edge weight, and the epoch gradient is a pure integer SUM
over triples — associative and order-independent — so the distributed
trainer (dense gradient partials per pinned block, merged on the
driver) is BIT-EXACT equal to the sequential replay regardless of
partitioning. The classic float renorm-to-unit-ball step is deliberately
dropped (it would break integer exactness); bounded epochs × decayed
integer lr keep the embeddings bounded instead.

Init is md5-deterministic per (kind, label, dim) — no RNG state.

Scale shape (100 TB corpus → billions of edges, millions of nodes): the
edge table is pinned once (object-store blocks); each epoch ships one
dense int64[n_nodes·D + n_preds·D] partial per block — fine while the
NODE dimension × D fits a worker (the quality-classifier argument);
past that the gradient combine becomes a node-keyed exchange over
(node, dim, grad) rows, same integer math. Mirrors
pipelines/quality_classifier.py's trainer contract.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..kernels.hashing import stable_u64_md5
from ..state import manifest as mf

TE_VERSION = "transe-v2"
TE_DIM = 8
TE_EPOCHS = 20
TE_MARGIN = 1_000_000  # margin = 1.0 in micro units
TE_LR0 = 40_000  # integer lr numerator (micro step per unit avg gradient)
TE_LR_DECAY_MILLI = 900  # lr_{e+1} = lr_e * 900 // 1000
TE_INIT = 500_000  # init values uniform in [-TE_INIT, +TE_INIT] micro


def _lrn(epoch: int) -> int:
    lr = TE_LR0
    for _ in range(epoch):
        lr = lr * TE_LR_DECAY_MILLI // 1000
    return max(lr, 1)


def init_vectors(labels: list[str], kind: str) -> np.ndarray:
    """md5-deterministic init: one int64 per (kind, label, dim), uniform
    over [-TE_INIT, TE_INIT] micro units."""
    out = np.empty((len(labels), TE_DIM), dtype=np.int64)
    span = 2 * TE_INIT + 1
    for i, lab in enumerate(labels):
        for d in range(TE_DIM):
            h = stable_u64_md5(f"teinit:{kind}:{lab}:{d}".encode("utf-8"))
            out[i, d] = int(h % span) - TE_INIT
    return out


def vocab_from_edges(edges: pd.DataFrame) -> tuple[list[str], list[str]]:
    """Sorted node-label and predicate vocabularies — the id mapping both
    trainers share (node dimension bounded, broadcastable)."""
    nodes = sorted(set(edges["subj_cui"]) | set(edges["obj_cui"]))
    preds = sorted(set(edges["pred"]))
    return nodes, preds


def encode_edges(
    edges: pd.DataFrame, nodes: list[str], preds: list[str]
) -> pd.DataFrame:
    nid = {n: i for i, n in enumerate(nodes)}
    pid = {p: i for i, p in enumerate(preds)}
    return pd.DataFrame(
        {
            "s": np.fromiter((nid[x] for x in edges["subj_cui"]), np.int64, len(edges)),
            "p": np.fromiter((pid[x] for x in edges["pred"]), np.int64, len(edges)),
            "o": np.fromiter((nid[x] for x in edges["obj_cui"]), np.int64, len(edges)),
            "w": edges["weight"].to_numpy(dtype=np.int64),
        }
    )


def _negatives(df: pd.DataFrame, epoch: int, n_nodes: int) -> np.ndarray:
    return np.fromiter(
        (
            stable_u64_md5(f"teneg:{epoch}:{s}:{p}:{o}".encode("utf-8")) % n_nodes
            for s, p, o in zip(df["s"], df["p"], df["o"])
        ),
        dtype=np.int64,
        count=len(df),
    )


def _epoch_gradient(
    df: pd.DataFrame, E: np.ndarray, R: np.ndarray, epoch: int
) -> tuple[np.ndarray, np.ndarray, int, int]:
    """(G_E, G_R, sum_weights, n_triples) for one set of triples — THE
    shared kernel of both trainers; integer sums, so any batching of the
    same triples yields identical totals."""
    n_nodes = E.shape[0]
    if not len(df):
        return (
            np.zeros_like(E),
            np.zeros_like(R),
            0,
            0,
        )
    s = df["s"].to_numpy(dtype=np.int64)
    p = df["p"].to_numpy(dtype=np.int64)
    o = df["o"].to_numpy(dtype=np.int64)
    w = df["w"].to_numpy(dtype=np.int64)
    neg = _negatives(df, epoch, n_nodes)
    pos_diff = E[s] + R[p] - E[o]
    neg_diff = E[s] + R[p] - E[neg]
    l1_pos = np.abs(pos_diff).sum(axis=1)
    l1_neg = np.abs(neg_diff).sum(axis=1)
    viol = (TE_MARGIN + l1_pos - l1_neg) > 0
    G_E = np.zeros_like(E)
    G_R = np.zeros_like(R)
    if viol.any():
        sp = np.sign(pos_diff[viol]) * w[viol, None]
        sn = np.sign(neg_diff[viol]) * w[viol, None]
        np.add.at(G_E, s[viol], sp - sn)
        np.add.at(G_E, o[viol], -sp)
        np.add.at(G_E, neg[viol], sn)
        np.add.at(G_R, p[viol], sp - sn)
    return G_E, G_R, int(w.sum()), len(df)


def _apply_update(
    E: np.ndarray, R: np.ndarray, G_E: np.ndarray, G_R: np.ndarray,
    sum_w: int, n: int, epoch: int
) -> tuple[np.ndarray, np.ndarray]:
    """Integer step normalized by the AVERAGE edge weight (not the weight
    total): per-triple update magnitude stays O(lrn) at any corpus size,
    so the schedule is scale-free — normalizing by the weight SUM was
    measured to freeze learning (steps ~1e2 micro vs the 1e6 margin;
    mean link-prediction rank stuck at init)."""
    lrn = _lrn(epoch)
    den = max(sum_w // max(n, 1), 1)
    return E - (lrn * G_E) // den, R - (lrn * G_R) // den


def train_sequential(
    enc: pd.DataFrame, nodes: list[str], preds: list[str]
) -> tuple[np.ndarray, np.ndarray]:
    """Reference trainer: whole edge table in one frame — the oracle side
    of the bit-exactness contract."""
    E = init_vectors(nodes, "n")
    R = init_vectors(preds, "p")
    for epoch in range(TE_EPOCHS):
        G_E, G_R, sw, n = _epoch_gradient(enc, E, R, epoch)
        E, R = _apply_update(E, R, G_E, G_R, sw, n, epoch)
    return E, R


def train_distributed(enc_ds, nodes: list[str], preds: list[str]):
    """Distributed full-batch margin SGD over a pinned encoded-edge
    Dataset: per epoch, raw gradient tasks over the pinned Arrow block
    refs (the quality-classifier escape hatch — 20 sequential rounds of
    streaming-executor startup would dominate the math), one dense
    int64 partial per block, exact integer merge on the driver.
    Bit-exact equal to ``train_sequential`` on the same edges."""
    import ray

    pinned = enc_ds.materialize()
    block_refs = pinned.to_arrow_refs()

    @ray.remote
    def _grad_block(tbl: pa.Table, state, epoch: int):
        E_, R_ = state
        return _epoch_gradient(tbl.to_pandas(), E_, R_, epoch)

    E = init_vectors(nodes, "n")
    R = init_vectors(preds, "p")
    for epoch in range(TE_EPOCHS):
        sref = ray.put((E, R))
        parts = ray.get([_grad_block.remote(r, sref, epoch) for r in block_refs])
        G_E = np.zeros_like(E)
        G_R = np.zeros_like(R)
        sw = 0
        n = 0
        for ge, gr, s_, n_ in parts:
            G_E += ge
            G_R += gr
            sw += s_
            n += n_
        E, R = _apply_update(E, R, G_E, G_R, sw, n, epoch)
    return E, R


def weights_table(
    E: np.ndarray, R: np.ndarray, nodes: list[str], preds: list[str]
) -> pa.Table:
    """kv rows (kind, label, dim, val_micro) — node rows kind='n',
    relation rows kind='p'."""
    kinds, labels, dims, vals = [], [], [], []
    for mat, labs, kind in ((E, nodes, "n"), (R, preds, "p")):
        for i, lab in enumerate(labs):
            for d in range(TE_DIM):
                kinds.append(kind)
                labels.append(lab)
                dims.append(d)
                vals.append(int(mat[i, d]))
    return pa.table(
        {
            "kind": pa.array(kinds, pa.string()),
            "label": pa.array(labels, pa.string()),
            "dim": pa.array(dims, pa.int64()),
            "val_micro": pa.array(vals, pa.int64()),
        }
    )


def rank_frame(
    edges: pd.DataFrame,
    E: np.ndarray,
    R: np.ndarray,
    nodes: list[str],
    preds: list[str],
) -> pd.DataFrame:
    """Link-prediction object ranks: for each edge (s, p, o), the
    position of o among ALL candidate nodes ordered by (L1 distance
    asc, node id asc) — vectorized over candidates per edge; integer
    distances, so ranks are engine-independent."""
    enc = encode_edges(edges, nodes, preds)
    s = enc["s"].to_numpy()
    p = enc["p"].to_numpy()
    o = enc["o"].to_numpy()
    ranks = np.empty(len(enc), dtype=np.int64)
    trans = E[s] + R[p]  # (n, D)
    for i in range(len(enc)):
        d1 = np.abs(trans[i][None, :] - E).sum(axis=1)  # (n_nodes,)
        do = d1[o[i]]
        ranks[i] = 1 + int((d1 < do).sum()) + int(
            ((d1 == do) & (np.arange(len(nodes)) < o[i])).sum()
        )
    return pd.DataFrame(
        {
            "subj_cui": edges["subj_cui"].astype(str),
            "pred": edges["pred"].astype(str),
            "obj_cui": edges["obj_cui"].astype(str),
            "rank": ranks,
        }
    )


def load_weights(
    weights_path: str,
) -> tuple[np.ndarray, np.ndarray, list[str], list[str]]:
    t = pq.read_table(weights_path).to_pandas()
    nodes = sorted(t.loc[t["kind"] == "n", "label"].unique())
    preds = sorted(t.loc[t["kind"] == "p", "label"].unique())
    E = np.zeros((len(nodes), TE_DIM), dtype=np.int64)
    R = np.zeros((len(preds), TE_DIM), dtype=np.int64)
    nid = {n: i for i, n in enumerate(nodes)}
    pid = {p: i for i, p in enumerate(preds)}
    for kind, lab, d, v in zip(t["kind"], t["label"], t["dim"], t["val_micro"]):
        if kind == "n":
            E[nid[lab], d] = v
        else:
            R[pid[lab], d] = v
    return E, R, nodes, preds


def ensure_transe_artifacts(sf_dir: str, edges_loader) -> dict:
    """Build (once, cached by transcript-fixture fingerprint, atomic) the
    SEQUENTIAL trainer's weights parquet — the oracle side of the
    bit-exactness driver query (the quality-classifier artifact
    pattern). ``edges_loader() -> pd.DataFrame`` supplies the canonical
    edge table (injected to avoid a circular import with queries.py)."""
    from ..fixtures import ensure_fixture, sf_name_from_dir

    fx = ensure_fixture(sf_name_from_dir(sf_dir))
    files = mf.list_parquet_files(fx["transcripts"])
    in_fp = mf.input_fingerprint(files)
    root = os.path.join(
        tempfile.gettempdir(), "graft_transe", os.path.basename(os.path.normpath(sf_dir))
    )
    out_dir = os.path.join(root, "artifacts")

    def build(tmp: str) -> None:
        edges = edges_loader().sort_values(
            ["subj_cui", "pred", "obj_cui"], ignore_index=True
        )
        nodes, preds = vocab_from_edges(edges)
        E, R = train_sequential(encode_edges(edges, nodes, preds), nodes, preds)
        pq.write_table(
            weights_table(E, R, nodes, preds), os.path.join(tmp, "weights.parquet")
        )

    mf.run_stage("transe", out_dir, mf.fingerprint(TE_VERSION, in_fp), build)
    return {"weights": os.path.join(out_dir, "weights.parquet")}
