"""Inline-markup annotation parser.

Reproduces the reference NCBI corpus reader (``utils/fonctions.py:61-117``
``load_ncbi_dataset``): lines are ``doc_id \\t title \\t text`` where
``text`` contains ``<category="X">mention</category>`` markup; the parser
strips the tags, rebuilds the clean text, and recomputes char offsets for
every mention span.

The reference hard-codes ``type = "Disease"`` for every entity
(fonctions.py:96); we keep the matched category too (the reference's
second variant, ``utils/fonctionsFaxtText.py:77-125``, does use it).
"""

from __future__ import annotations

import re

TAG_RE = re.compile(r'<category="([^"]+)">([^<]+)</category>')


def parse_annotated_text(text: str) -> tuple[str, list[dict]]:
    """Strip markup, return (clean_text, entities with recomputed offsets)."""
    entities: list[dict] = []
    clean_text = ""
    last_end = 0
    for match in TAG_RE.finditer(text):
        start, end = match.span()
        mention = match.group(2)
        clean_text += text[last_end:start]
        ent_start = len(clean_text)
        clean_text += mention
        ent_end = len(clean_text)
        entities.append(
            {
                "start": ent_start,
                "end": ent_end,
                "type": match.group(1),
                "text": mention,
            }
        )
        last_end = end
    clean_text += text[last_end:]
    return clean_text, entities


def parse_annotated_line(line: str) -> dict | None:
    """One ``doc_id\\ttitle\\ttext`` line → document dict, or None."""
    line = line.strip()
    if not line:
        return None
    parts = line.split("\t")
    if len(parts) < 3:
        return None
    doc_id, title, text = parts[0], parts[1], parts[2]
    clean_text, entities = parse_annotated_text(text)
    return {"id": doc_id, "title": title, "text": clean_text, "entities": entities}
