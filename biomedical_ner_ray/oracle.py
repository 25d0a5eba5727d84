"""Single-process oracle: the reference-semantics pipeline, no Ray.

Implements tokenize → BIO tag → span decode → link → triples →
canonicalize → nodes/edges over plain Python rows, reusing the *same*
kernels as the Ray stages (SURVEY.md §5: "a single-process oracle module
... against which the Ray pipeline's outputs are compared set-wise").

Per-stage semantics map to the reference:
- tokenize: app.py:210-214 (M1)
- tagging slot: app.py:254-303 predict(); here the deterministic
  dictionary tagger (kernels.tagger)
- span decode: app.py:335-416 extract_entities (M9), via kernels.bio
- linking: broadcast alias-dict lookup (SURVEY.md §2.4 J6)
- triples/canonicalization: north_star extensions (kernels.relations; G9)
"""

from __future__ import annotations

from collections import defaultdict

from .kernels.bio import extract_entities
from .kernels.relations import triples_for_turn
from .kernels.tagger import AliasDict, tag_tokens
from .kernels.tokenize import tokenize_text


def mentions_for_turn(conv_id: str, turn_idx: int, text: str, ad: AliasDict) -> list[dict]:
    tokens = tokenize_text(text)
    if not tokens:
        return []
    tags = tag_tokens(tokens, ad)
    ents = extract_entities(list(zip(tokens, tags)))
    out = []
    for e in ents:
        out.append(
            {
                "conv_id": conv_id,
                "turn_idx": turn_idx,
                "mention_id": f"{conv_id}:{turn_idx}:{e['start_position']}",
                "text": e["text"],
                "type": e["type"],
                "start_tok": e["start_position"],
                "end_tok": e["end_position"],
            }
        )
    return out


def link_mention(m: dict, ad: AliasDict) -> dict | None:
    key = " ".join(t.lower() for t in m["text"].split(" "))
    entry = ad.lookup(key)
    if entry is None:
        return None
    lm = dict(m)
    lm["cui"] = entry.cui
    lm["canonical_name"] = entry.canonical_name
    lm["link_score"] = 1.0 if m["text"] == entry.surface else 0.9
    return lm


def run_oracle(rows: list[dict], alias_rows: list[dict]) -> dict[str, list[dict]]:
    """Full pipeline over transcript rows (dicts with conv_id/turn_idx/text).

    Returns dict with mentions, linked_mentions, triples, nodes, edges.
    """
    ad = AliasDict(alias_rows)
    ordered = sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"]))

    mentions: list[dict] = []
    linked: list[dict] = []
    triples: list[dict] = []
    for r in ordered:
        ms = mentions_for_turn(r["conv_id"], r["turn_idx"], r["text"], ad)
        mentions.extend(ms)
        lms = [lm for lm in (link_mention(m, ad) for m in ms) if lm is not None]
        linked.extend(lms)
        triples.extend(triples_for_turn(lms))

    comp = canonical_components(alias_rows)
    nodes, edges = materialize_graph(linked, triples, alias_rows, comp)
    return {
        "mentions": mentions,
        "linked_mentions": linked,
        "triples": triples,
        "nodes": nodes,
        "edges": edges,
    }


def canonical_components(
    alias_rows: list[dict], rounds: int = 3
) -> dict[str, str]:
    """CUI → canonical component id (min CUI) via min-label propagation
    over the cui—alias_key bipartite graph (G9; north_star
    "groupby-aggregate connected-components pass").

    ``rounds`` fixed at 3 in oracle, Ray stage, and SQL alike; the fixture
    alias bank keeps component diameter ≤ 3 so this converges exactly.
    """
    cui_aliases: dict[str, set[str]] = defaultdict(set)
    alias_cuis: dict[str, set[str]] = defaultdict(set)
    for r in alias_rows:
        cui_aliases[r["cui"]].add(r["alias_key"])
        alias_cuis[r["alias_key"]].add(r["cui"])
    label = {c: c for c in cui_aliases}
    for _ in range(rounds):
        alias_min: dict[str, str] = {
            a: min(label[c] for c in cs) for a, cs in alias_cuis.items()
        }
        new_label = {
            c: min(min(alias_min[a] for a in als), label[c])
            for c, als in cui_aliases.items()
        }
        if new_label == label:
            break
        label = new_label
    return label


def materialize_graph(
    linked: list[dict],
    triples: list[dict],
    alias_rows: list[dict],
    comp: dict[str, str],
) -> tuple[list[dict], list[dict]]:
    """nodes(cui, canonical_name, type, mention_count) on canonical CUIs;
    edges(subj_cui, pred, obj_cui, weight) deduped, self-loops dropped."""
    # canonical metadata: min(canonical_name)/min(type) over the component
    # representative cui's alias rows (deterministic)
    meta: dict[str, tuple[str, str]] = {}
    for r in alias_rows:
        c = r["cui"]
        cur = meta.get(c)
        cand = (r["canonical_name"], r["type"])
        if cur is None or cand < cur:
            meta[c] = cand

    counts: dict[str, int] = defaultdict(int)
    for lm in linked:
        counts[comp[lm["cui"]]] += 1
    nodes = [
        {
            "cui": c,
            "canonical_name": meta[c][0],
            "type": meta[c][1],
            "mention_count": n,
        }
        for c, n in sorted(counts.items())
    ]

    edge_w: dict[tuple[str, str, str], int] = defaultdict(int)
    for t in triples:
        s = comp[t["subj_cui"]]
        o = comp[t["obj_cui"]]
        if s == o:
            continue
        edge_w[(s, t["pred"], o)] += 1
    edges = [
        {"subj_cui": s, "pred": p, "obj_cui": o, "weight": w}
        for (s, p, o), w in sorted(edge_w.items())
    ]
    return nodes, edges
