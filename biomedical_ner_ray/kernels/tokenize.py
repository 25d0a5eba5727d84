"""Tokenization kernels.

Reproduces the reference's two tokenizers exactly:

- ``tokenize_text``: the Streamlit app tokenizer, reference
  ``app.py:210-214`` — ``re.findall(r'\\b\\w+(?:-\\w+)*\\b|[^\\w\\s]', text)``.
  Keeps hyphenated biomedical tokens ("Octamer-binding", "IL-2") as single
  tokens; punctuation becomes its own token.
- ``tokenize_with_offsets``: the NCBI offset-stable tokenizer, reference
  ``utils/fonctions.py:127-139`` — ``\\w+|[^\\w\\s]`` via ``finditer`` with
  (start, end) char spans.

``MAX_SEQ_LEN = 100`` mirrors the app's silent truncation of inference
inputs (reference ``app.py:216-219``): tokens past position 100 are never
tagged. This is part of the conformance contract.
"""

from __future__ import annotations

import re

# reference app.py:213 — must match byte-for-byte (DuckDB RE2 agrees with
# Python re on this pattern for ASCII text; verified in tests).
TOKEN_PATTERN = r"\b\w+(?:-\w+)*\b|[^\w\s]"
TOKEN_RE = re.compile(TOKEN_PATTERN)

# reference utils/fonctions.py:127 — offset-preserving variant (no hyphen
# grouping; used for char-span → token projection).
OFFSET_TOKEN_PATTERN = r"\w+|[^\w\s]"
OFFSET_TOKEN_RE = re.compile(OFFSET_TOKEN_PATTERN)

# reference app.py:217 (max_seq_len=100 default in preprocess_tokens)
MAX_SEQ_LEN = 100
# reference app.py:216 (max_char_len=20)
MAX_CHAR_LEN = 20


def tokenize_text(text: str) -> list[str]:
    """App tokenizer (reference app.py:210-214)."""
    return TOKEN_RE.findall(text)


def tokenize_with_offsets(text: str) -> tuple[list[str], list[tuple[int, int]]]:
    """Offset-stable tokenizer (reference utils/fonctions.py:127-139)."""
    tokens: list[str] = []
    spans: list[tuple[int, int]] = []
    for m in OFFSET_TOKEN_RE.finditer(text):
        tokens.append(m.group())
        spans.append((m.start(), m.end()))
    return tokens, spans
