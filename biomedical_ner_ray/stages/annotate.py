"""TurnAnnotator — the flagship stateful actor-pool stage.

One pass over transcript turns does everything row-local: tokenize →
greedy dictionary BIO tagging → span decode (reference extract_entities
semantics, app.py:335-416) → entity linking (broadcast alias dict,
SURVEY.md J6) → per-turn triple extraction (kernels.relations). The
output is ONE nested row per turn::

    conv_id, turn_idx, n_tokens,
    mentions: list<struct<mention_id,text,type,start_tok,end_tok,
                          cui,canonical_name,link_score>>,
    triples:  list<struct<subj_cui,pred,obj_cui,evidence_text>>

so that the downstream ``mentions`` / ``triples`` tables are pure
vectorized explodes with zero recomputation and no shuffle — triple
extraction never needs a (conv_id, turn_idx) groupby because a turn's
mentions never leave the row.

Actor-pool contract mirrors the reference's load-once pattern
(``StreamlitNERPredictor.__init__`` app.py:121-208 + ``@st.cache_resource``
app.py:422-467): the alias dictionary ObjectRef is resolved ONCE per actor
in ``__init__``; ``__call__`` handles a whole Arrow batch.
"""

from __future__ import annotations

import pyarrow as pa

from ..kernels.bio import extract_entities
from ..kernels.relations import predicate_for
from ..kernels.tagger import AliasDict, tag_tokens
from ..kernels.tokenize import TOKEN_RE
from ..state.broadcast import resolve

MENTION_STRUCT = pa.struct(
    [
        ("mention_id", pa.string()),
        ("text", pa.string()),
        ("type", pa.string()),
        ("start_tok", pa.int32()),
        ("end_tok", pa.int32()),
        ("cui", pa.string()),
        ("canonical_name", pa.string()),
        ("link_score", pa.float64()),
    ]
)
TRIPLE_STRUCT = pa.struct(
    [
        ("subj_cui", pa.string()),
        ("pred", pa.string()),
        ("obj_cui", pa.string()),
        ("evidence_text", pa.string()),
    ]
)

ANNOTATION_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("n_tokens", pa.int32()),
        ("n_mentions", pa.int32()),
        ("n_triples", pa.int32()),
        ("mentions", pa.list_(MENTION_STRUCT)),
        ("triples", pa.list_(TRIPLE_STRUCT)),
    ]
)


class TurnAnnotator:
    """Callable class for ``map_batches(TurnAnnotator, concurrency=N,
    fn_constructor_kwargs={"alias_ref": ref})``.

    ``scorer="dict"`` tags by greedy dictionary match alone (fast path);
    ``scorer="crf"`` runs the reference-shaped numpy scorer on top —
    char-feature emissions + BIO-constrained Viterbi (kernels/crf.py,
    A4/A7/M14) — with provably identical decoded tags, giving the
    pipeline a realistic model-scoring cost profile. A torch BiLSTM-CRF
    drops into the same slot by replacing CRFScorer.

    ``scorer_kwargs`` forwards artifact paths to the scorer — e.g.
    ``{"embedding_matrix_path": ..., "checkpoint_path": ...}`` loads the
    trained A10 matrix (J4) and a partial-restorable parameter
    checkpoint (S5) ONCE per actor, exactly the reference's
    load-everything-in-__init__ contract."""

    def __init__(self, alias_ref, scorer: str = "dict", scorer_kwargs=None):
        self._turn_cache: dict[str, tuple] = {}
        rows = resolve(alias_ref)
        self.alias_dict = rows if isinstance(rows, AliasDict) else AliasDict(rows)
        self.scorer = scorer
        if scorer == "crf":
            from ..kernels.crf import CRFScorer

            types = sorted({e.type for e in self.alias_dict.by_key.values()})
            self.crf = CRFScorer(types, **(scorer_kwargs or {}))
        elif scorer == "combinatorial":
            # full CombinatorialNER forward (A3/A4/A5/A6/A7): real conv /
            # recurrence / attention kernels, decode-equivalent output
            from ..kernels.combinatorial import CombinatorialScorer

            types = sorted({e.type for e in self.alias_dict.by_key.values()})
            self.crf = CombinatorialScorer(types, **(scorer_kwargs or {}))
        elif scorer == "learned":
            # TRAINED tagger (pipelines/train_tagger.py checkpoint):
            # weights determine output — tags may DISAGREE with the
            # dictionary, mentions may be unlinked (cui None)
            from ..kernels.learned import LearnedScorer

            types = sorted({e.type for e in self.alias_dict.by_key.values()})
            self.crf = LearnedScorer(types, **(scorer_kwargs or {}))
        elif scorer == "combinatorial_torch":
            # torch-backed serving of the SAME trained checkpoint —
            # pairs with actor_pool_kwargs={"num_gpus": ...}; raises a
            # clear ImportError where torch is absent (the numpy
            # trained scorer serves the checkpoint identically)
            from ..kernels.torch_scorer import TorchCombinatorialScorer

            types = sorted({e.type for e in self.alias_dict.by_key.values()})
            self.crf = TorchCombinatorialScorer(types, **(scorer_kwargs or {}))
        elif scorer != "dict":
            raise ValueError(f"unknown scorer {scorer!r}")

    # Turn TEXTS are Zipf-duplicated (short acks, templated tool chatter
    # — 75% duplicate rate on the fixture, and real transcripts repeat
    # "Thanks"-class turns massively), and everything this stage
    # computes from a text except ``mention_id`` is turn-independent.
    # Memoize the pure text→(n_tokens, mention protos, triples) function
    # PER BATCH and stamp mention_id per turn — identical output to
    # recomputation (same pure function, same shapes ⇒ same floats),
    # ~50% fewer scorer forwards at batch 4096 (measured). The memo is
    # deliberately batch-scoped, not actor-persistent: a per-actor cache
    # makes total cold-miss work GROW with worker count (each worker
    # re-decodes its own distinct subset), which measurably degraded
    # 4→16-CPU scaling efficiency 0.84 → 0.76; per-batch scope keeps
    # total work identical at every cluster width.
    _TURN_CACHE_MAX = 100_000

    def _annotate_text(self, text: str):
        tokens = TOKEN_RE.findall(text) if text else []
        if not tokens:
            return 0, [], []
        tags = tag_tokens(tokens, self.alias_dict)
        if self.scorer != "dict":
            tags = self.crf.decode(tokens, tags)
        return self._finish_text(tokens, tags)

    def _finish_text(self, tokens: list[str], tags: list[str]):
        """Tags → mention protos + triples (pure assembly, shared by the
        per-text and batched-decode paths)."""
        protos: list[dict] = []
        triples: list[dict] = []
        if tokens:
            for e in extract_entities(list(zip(tokens, tags))):
                m = {
                    "text": e["text"],
                    "type": e["type"],
                    "start_tok": e["start_position"],
                    "end_tok": e["end_position"],
                }
                key = " ".join(t.lower() for t in e["tokens"])
                entry = self.alias_dict.lookup(key)
                if entry is not None:
                    m["cui"] = entry.cui
                    m["canonical_name"] = entry.canonical_name
                    m["link_score"] = 1.0 if e["text"] == entry.surface else 0.9
                else:  # unlinked mention (dictionary tagger never produces these,
                    # but a learned tagger slotting in here would)
                    m["cui"] = None
                    m["canonical_name"] = None
                    m["link_score"] = None
                protos.append(m)
            linked = [m for m in protos if m["cui"] is not None]
            for i in range(len(linked)):
                for j in range(i + 1, len(linked)):
                    s, o = linked[i], linked[j]
                    if s["cui"] == o["cui"]:
                        continue
                    triples.append(
                        {
                            "subj_cui": s["cui"],
                            "pred": predicate_for(s["type"], o["type"]),
                            "obj_cui": o["cui"],
                            "evidence_text": f"{s['text']} | {o['text']}",
                        }
                    )
        return len(tokens), protos, triples

    def annotate_turn(self, conv_id: str, turn_idx: int, text: str):
        cached = self._turn_cache.get(text)
        if cached is None:
            cached = self._annotate_text(text)
            if len(self._turn_cache) < self._TURN_CACHE_MAX:
                self._turn_cache[text] = cached
        n_tokens, protos, triples = cached
        # mention_id is the only turn-dependent field; triples carry no
        # ids and are emitted as the shared (read-only) cached list
        mentions = [
            {"mention_id": f"{conv_id}:{turn_idx}:{p['start_tok']}", **p}
            for p in protos
        ]
        return n_tokens, mentions, triples

    def _decode_batched(self, texts: list[str]) -> None:
        """Model-scorer fast path: decode ALL distinct texts of the
        batch through the scorer's batched forward (length-sorted
        same-bucket batches — the trainer's batching, now at serving
        time), then assemble mentions/triples per distinct text into
        the batch memo. Output is bit-identical to the per-turn path:
        the batched kernels are composition-independent by construction
        (kernels/combinatorial.py::gemm_fixed)."""
        distinct: list[str] = []
        seen = set()
        for text in texts:
            if text not in seen:
                seen.add(text)
                distinct.append(text)
        toks_list = [TOKEN_RE.findall(t) if t else [] for t in distinct]
        trained = getattr(self.crf, "trained", False)
        if trained:
            dict_tags = None
            tags_list = self.crf.decode_tokens_batch(toks_list)
        else:
            dict_tags = [
                tag_tokens(toks, self.alias_dict) if toks else []
                for toks in toks_list
            ]
            tags_list = self.crf.decode_batch(toks_list, dict_tags)
        for text, toks, tags in zip(distinct, toks_list, tags_list):
            nt, protos, triples = self._finish_text(toks, tags)
            self._turn_cache[text] = (nt, protos, triples)

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._turn_cache = {}  # batch-scoped memo (see note above)
        conv_ids = batch["conv_id"].to_pylist()
        turn_idxs = batch["turn_idx"].to_pylist()
        texts = batch["text"].to_pylist()
        if self.scorer != "dict" and hasattr(self.crf, "decode_batch"):
            self._decode_batched(texts)
        n_tokens: list[int] = []
        mentions_col: list[list[dict]] = []
        triples_col: list[list[dict]] = []
        for cid, tix, text in zip(conv_ids, turn_idxs, texts):
            nt, ms, ts = self.annotate_turn(cid, tix, text)
            n_tokens.append(nt)
            mentions_col.append(ms)
            triples_col.append(ts)
        return pa.table(
            {
                "conv_id": pa.array(conv_ids, pa.string()),
                "turn_idx": pa.array(turn_idxs, pa.int32()),
                "n_tokens": pa.array(n_tokens, pa.int32()),
                # per-turn counts as plain columns so lineage counters are
                # a column-pruned metadata-cheap aggregate, not a nested read
                "n_mentions": pa.array([len(m) for m in mentions_col], pa.int32()),
                "n_triples": pa.array([len(t) for t in triples_col], pa.int32()),
                "mentions": pa.array(mentions_col, pa.list_(MENTION_STRUCT)),
                "triples": pa.array(triples_col, pa.list_(TRIPLE_STRUCT)),
            },
            schema=ANNOTATION_SCHEMA,
        )


# Per-worker-process cache for the tasks fast path: resolving the broadcast
# ObjectRef is one shared-memory get per worker process (not per batch, not
# per task) — same amortization as an actor's __init__, but without paying
# actor-pool spin-up for every short execution (worker processes persist
# across Dataset executions in a Ray session).
_ANNOTATOR_CACHE: dict[tuple, TurnAnnotator] = {}


def _cached_annotator(alias_ref, scorer: str = "dict", scorer_kwargs=None) -> TurnAnnotator:
    ref = alias_ref.hex() if hasattr(alias_ref, "hex") else str(id(alias_ref))
    key = (ref, scorer, tuple(sorted((scorer_kwargs or {}).items())))
    ann = _ANNOTATOR_CACHE.get(key)
    if ann is None:
        ann = TurnAnnotator(alias_ref, scorer=scorer, scorer_kwargs=scorer_kwargs)
        _ANNOTATOR_CACHE.clear()
        _ANNOTATOR_CACHE[key] = ann
    return ann


def actor_pool_kwargs(
    alias_ref,
    concurrency=None,
    batch_size: int = 1024,
    scorer: str = "dict",
    scorer_kwargs: dict | None = None,
    num_gpus: float = 0.0,
    max_tokens_per_batch: int | None = None,
) -> dict:
    """``map_batches`` kwargs for the actors mode — split out so tests
    can assert the GPU slot / token-budget plumbing without spinning a
    pool.

    ``num_gpus`` > 0 reserves a GPU fraction per actor (the reference's
    CUDA slot, app.py:266-271 / streamlit_utils.py:13) and drops the
    CPU pin (a GPU scorer blocks on the device, not a core).
    ``max_tokens_per_batch`` sizes the Arrow batch to a device token
    budget: every turn decodes ≤ MAX_SEQ_LEN tokens (reference
    truncation), so ``budget // MAX_SEQ_LEN`` turns per batch is the
    worst-case-safe batch size (the reference's fixed batch 32 at 100
    tokens ≡ a 3200-token budget)."""
    from ..kernels.tokenize import MAX_SEQ_LEN

    if max_tokens_per_batch is not None:
        batch_size = max(1, max_tokens_per_batch // MAX_SEQ_LEN)
    kwargs = dict(
        fn_constructor_kwargs={
            "alias_ref": alias_ref,
            "scorer": scorer,
            "scorer_kwargs": scorer_kwargs,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or (2, 8),
    )
    if num_gpus:
        kwargs["num_gpus"] = num_gpus
    else:
        kwargs["num_cpus"] = 1
    return kwargs


def annotate_stage(
    ds,
    alias_ref,
    concurrency=None,
    batch_size: int = 1024,
    mode: str = "tasks",
    scorer: str = "dict",
    scorer_kwargs: dict | None = None,
    num_gpus: float = 0.0,
    max_tokens_per_batch: int | None = None,
):
    """Annotate a turns Dataset.

    mode="tasks": stateless map_batches tasks with per-worker cached state —
    elastic, no pool spin-up; the default for CPU-only dictionary tagging.
    mode="actors": explicit actor pool (``concurrency`` required) — the slot
    a learned GPU scorer uses (reference A1 load-once contract);
    ``num_gpus`` / ``max_tokens_per_batch`` configure the device slot and
    the token-budget batch size (see ``actor_pool_kwargs``).
    scorer: "dict" (greedy match), "crf" (numpy char-feature + Viterbi,
    identical output, model-like cost), "combinatorial" (full A3 forward,
    identical output), or "learned" (trained checkpoint — output depends
    on the weights; see kernels/learned.py).
    """
    if mode == "actors":
        return ds.map_batches(
            TurnAnnotator,
            **actor_pool_kwargs(
                alias_ref,
                concurrency=concurrency,
                batch_size=batch_size,
                scorer=scorer,
                scorer_kwargs=scorer_kwargs,
                num_gpus=num_gpus,
                max_tokens_per_batch=max_tokens_per_batch,
            ),
        )

    def annotate(batch: pa.Table) -> pa.Table:
        return _cached_annotator(alias_ref, scorer, scorer_kwargs)(batch)

    return ds.map_batches(annotate, batch_format="pyarrow", batch_size=batch_size)
