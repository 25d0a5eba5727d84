"""Text-analysis kernels: language-ID, quality scoring, token counting,
document fingerprinting.

These generalize the reference's corpus-statistics utilities
(``utils/fonctions.py:275-538`` corpus stats; ``utils/fonctionsFaxtText.py:
553-562`` ``is_biologically_plausible`` predicate) into the text-analysis
operators a large-scale training-data pipeline needs. Every formula here
is deliberately SQL-expressible so the DuckDB oracle can verify the Ray
stage value-for-value (see ``__ray_entry__.oracle_sql``).

Normalization contract (shared with the SQL):
- words  = regex ``\\w+`` matches on the lowercased text;
- tokens = the app tokenizer regex (kernels.tokenize.TOKEN_PATTERN);
- normalized text = lowercase, whitespace collapsed to single spaces,
  stripped; fingerprint = md5 hex of that.
"""

from __future__ import annotations

import hashlib
import re

# ASCII word contract: every SQL oracle tokenizes with DuckDB/RE2
# ``\w+``, which is ASCII-only — Python's ``\w`` is Unicode-aware, so a
# bare ``\w+`` here would diverge from the oracles on any non-ASCII
# corpus (e.g. accented words split differently). The explicit ASCII
# class keeps engine and oracle tokenization identical by construction
# (same contract kernels/tokenize.py documents for the app tokenizer).
WORD_RE = re.compile(r"[0-9A-Za-z_]+")
WS_RE = re.compile(r"\s+")
PUNCT_TOKEN_RE = re.compile(r"^[^0-9A-Za-z_ \t\n\r\f\v]$")

# tiny per-language stopword banks (heuristic language-ID; inlined in the
# SQL oracle too — keep in sync with __ray_entry__).
STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "was", "that", "with", "for"),
    "fr": ("le", "la", "les", "de", "des", "et", "est", "dans", "pour", "que"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "von", "zu"),
    "es": ("el", "la", "los", "de", "y", "es", "en", "que", "por", "con"),
}
LANG_ORDER = ("en", "fr", "de", "es")  # deterministic tie-break order
EN_STOPWORDS = frozenset(STOPWORDS["en"])


def words(text: str) -> list[str]:
    return WORD_RE.findall(text.lower())


def normalize_text(text: str) -> str:
    return WS_RE.sub(" ", text.lower()).strip()


def fingerprint_md5(text: str) -> str:
    """Exact-dedup fingerprint: md5 of the normalized text."""
    return hashlib.md5(normalize_text(text).encode("utf-8")).hexdigest()


def token_count(text: str) -> int:
    """Count of app-tokenizer tokens (BPE-ish regex stand-in)."""
    from .tokenize import TOKEN_RE

    return len(TOKEN_RE.findall(text))


def word_count(text: str) -> int:
    return len(WORD_RE.findall(text))


def quality_features(text: str) -> dict:
    """Length / punctuation / stopword / digit features for quality scoring.

    Mirrors the shape of heuristic quality filters (C4/Gopher-style) while
    staying exactly SQL-reproducible.
    """
    from .tokenize import TOKEN_RE

    toks = TOKEN_RE.findall(text)
    ws = words(text)
    n_tokens = len(toks)
    n_words = len(ws)
    n_punct = sum(1 for t in toks if PUNCT_TOKEN_RE.match(t))
    n_stop = sum(1 for w in ws if w in EN_STOPWORDS)
    n_digit_words = sum(1 for w in ws if w.isdigit())
    total_word_chars = sum(len(w) for w in ws)
    return {
        "n_chars": len(text),
        "n_tokens": n_tokens,
        "n_words": n_words,
        "punct_ratio": (n_punct / n_tokens) if n_tokens else 0.0,
        "stopword_ratio": (n_stop / n_words) if n_words else 0.0,
        "digit_ratio": (n_digit_words / n_words) if n_words else 0.0,
        "mean_word_len": (total_word_chars / n_words) if n_words else 0.0,
    }


def quality_gate_count(feat: dict) -> int:
    """Integer 0–4 count of passing quality gates — the primitive both
    ``quality_score`` (count/4) and the curriculum tiers build on."""
    length_ok = 20 <= feat["n_chars"] <= 100000
    stop_ok = feat["stopword_ratio"] >= 0.05
    punct_ok = feat["punct_ratio"] <= 0.5
    digit_ok = feat["digit_ratio"] <= 0.5
    return int(length_ok) + int(stop_ok) + int(punct_ok) + int(digit_ok)


def quality_score(feat: dict) -> float:
    """Scalar quality score in [0, 1]; same arithmetic as the SQL oracle."""
    return quality_gate_count(feat) / 4.0


def lang_scores(text: str) -> dict[str, int]:
    ws = words(text)
    return {
        lang: sum(1 for w in ws if w in STOPWORDS[lang]) for lang in LANG_ORDER
    }


def detect_lang(text: str) -> str:
    """Stopword-vote language ID; 'und' when no stopword hits at all."""
    scores = lang_scores(text)
    best_lang = "und"
    best = 0
    for lang in LANG_ORDER:  # earlier language wins ties
        if scores[lang] > best:
            best = scores[lang]
            best_lang = lang
    return best_lang


def levenshtein(a: str, b: str, cap: int | None = None) -> int:
    """Exact unit-cost edit distance (insert/delete/substitute) —
    semantics identical to DuckDB's ``levenshtein`` on the same
    strings, which the ER oracle relies on. ``cap`` enables the
    standard banded early exit: once every cell in a row exceeds it,
    the true distance is > cap and cap+1 is returned (callers only
    ever threshold at <= cap, so the exact value past the band is
    irrelevant)."""
    if a == b:
        return 0
    if len(a) > len(b):
        a, b = b, a
    if cap is not None and len(b) - len(a) > cap:
        return cap + 1
    prev = list(range(len(a) + 1))
    for j, cb in enumerate(b, 1):
        cur = [j]
        for i, ca in enumerate(a, 1):
            cur.append(
                min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + (ca != cb))
            )
        if cap is not None and min(cur) > cap:
            return cap + 1
        prev = cur
    return prev[-1]
