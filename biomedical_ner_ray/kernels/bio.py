"""BIO tag-sequence kernels.

``extract_entities`` reproduces the reference's span decoder exactly,
including its quirks (reference ``app.py:335-416``):

- ``B-X`` starts a new entity (closing any open one).
- ``I-X`` continues an open entity of the same type; an ``I-X`` with no
  open entity, or with an open entity of a *different* type, is repaired
  into a ``B-X`` (reference app.py:370-386 "I- sans B- précédent").
- Anything else (``O``) closes the open entity.
- ``end_position`` is inclusive; the final open entity closes at
  ``len(predictions) - 1``.
- mention ``text`` is the space-join of its tokens (app.py:349).

``project_spans_to_bio`` reproduces the char-span → token BIO projection
(reference ``utils/fonctions.py:120-160`` ``prepare_ncbi_for_ner``): a
token overlaps an entity iff ``not (tok_end <= ent_start or
tok_start >= ent_end)``; the first overlapping token gets ``B-``, the rest
``I-``. Later entities overwrite earlier labels, exactly as the reference's
in-place ``labels[i] = ...`` does.
"""

from __future__ import annotations


def extract_entities(predictions: list[tuple[str, str]]) -> list[dict]:
    """Decode [(token, tag)] into entity spans (reference app.py:335-416)."""
    entities: list[dict] = []
    current_entity: str | None = None
    entity_tokens: list[str] = []
    entity_tags: list[str] = []
    entity_type: str | None = None
    entity_start_idx = 0

    def _emit(end_idx: int) -> None:
        entities.append(
            {
                "text": " ".join(entity_tokens),
                "type": entity_type[2:],
                "tag": entity_type,
                "individual_tags": entity_tags.copy(),
                "tokens": entity_tokens.copy(),
                "start_position": entity_start_idx,
                "end_position": end_idx,
            }
        )

    for idx, (token, tag) in enumerate(predictions):
        if tag.startswith("B-"):
            if current_entity:
                _emit(idx - 1)
            current_entity = tag[2:]
            entity_type = tag
            entity_tokens = [token]
            entity_tags = [tag]
            entity_start_idx = idx
        elif tag.startswith("I-"):
            if current_entity == tag[2:]:
                entity_tokens.append(token)
                entity_tags.append(tag)
            else:
                # orphan I- (or type switch): close previous, treat as B-
                if current_entity:
                    _emit(idx - 1)
                current_entity = tag[2:]
                entity_type = "B-" + tag[2:]
                entity_tokens = [token]
                entity_tags = [tag]
                entity_start_idx = idx
        else:  # 'O' or anything else
            if current_entity:
                _emit(idx - 1)
                current_entity = None
                entity_tokens = []
                entity_tags = []
                entity_start_idx = 0

    if current_entity:
        _emit(len(predictions) - 1)

    return entities


def project_spans_to_bio(
    tokens: list[str],
    spans: list[tuple[int, int]],
    entities: list[dict],
    entity_type_key: str = "type",
) -> list[str]:
    """Char-span → token BIO projection (reference utils/fonctions.py:141-158)."""
    labels = ["O"] * len(tokens)
    for ent in entities:
        ent_start, ent_end = ent["start"], ent["end"]
        etype = ent.get(entity_type_key, "Disease")
        first_token = True
        for i, (tok_start, tok_end) in enumerate(spans):
            overlaps = not (tok_end <= ent_start or tok_start >= ent_end)
            if overlaps:
                if first_token:
                    labels[i] = f"B-{etype}"
                    first_token = False
                else:
                    labels[i] = f"I-{etype}"
    return labels
