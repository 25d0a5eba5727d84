"""Relation (triple-extraction) heuristics.

The reference stops at entity extraction; the ``north_star`` extends it to
(subj, pred, obj) triples "per turn with dependency/co-occurrence relation
heuristics". Semantics (mirrored exactly in oracle, Ray stage, and SQL):

- within a single turn, order linked mentions by ``start_tok``;
- every ordered pair (earlier, later) with distinct CUIs yields a triple,
  subject = earlier mention;
- the predicate is a deterministic function of the (subj_type, obj_type)
  pair — precedence below must match the SQL CASE expression in
  ``__ray_entry__.oracle_sql`` clause-for-clause.
"""

from __future__ import annotations

CO_OCCURS = "co_occurs_with"


def predicate_for(subj_type: str, obj_type: str) -> str:
    """Deterministic predicate from the entity-type pair."""
    if subj_type == "protein" and obj_type in ("DNA", "RNA"):
        return "binds"
    if subj_type == "protein" and obj_type == "protein":
        return "interacts_with"
    if subj_type in ("DNA", "RNA", "protein") and obj_type == "Disease":
        return "associated_with"
    if obj_type in ("cell_line", "cell_type"):
        return "expressed_in"
    return CO_OCCURS


def triples_for_turn(linked_mentions: list[dict]) -> list[dict]:
    """All ordered distinct-CUI pairs within one turn.

    ``linked_mentions``: dicts with at least
    conv_id, turn_idx, text, type, start_tok, cui.
    """
    ms = sorted(linked_mentions, key=lambda m: m["start_tok"])
    out: list[dict] = []
    for i in range(len(ms)):
        for j in range(i + 1, len(ms)):
            s, o = ms[i], ms[j]
            if s["cui"] == o["cui"]:
                continue
            out.append(
                {
                    "subj_cui": s["cui"],
                    "pred": predicate_for(s["type"], o["type"]),
                    "obj_cui": o["cui"],
                    "conv_id": s["conv_id"],
                    "turn_idx": s["turn_idx"],
                    "evidence_text": f"{s['text']} | {o['text']}",
                }
            )
    return out


def predicate_for_vec(subj_types, obj_types):
    """Vectorized ``predicate_for`` (numpy): clause-for-clause the same
    precedence — must stay in lockstep with the scalar version AND the
    SQL CASE expressions in ``__ray_entry__.oracle_sql``."""
    import numpy as np

    st = np.asarray(subj_types, dtype=object)
    ot = np.asarray(obj_types, dtype=object)
    conds = [
        (st == "protein") & np.isin(ot, ("DNA", "RNA")),
        (st == "protein") & (ot == "protein"),
        np.isin(st, ("DNA", "RNA", "protein")) & (ot == "Disease"),
        np.isin(ot, ("cell_line", "cell_type")),
    ]
    return np.select(
        conds,
        ["binds", "interacts_with", "associated_with", "expressed_in"],
        default=CO_OCCURS,
    )
