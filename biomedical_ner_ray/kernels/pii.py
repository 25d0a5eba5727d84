"""PII detection + redaction kernel (training-data scrub op).

Patterns are deliberately limited to constructs whose semantics are
IDENTICAL in Python ``re`` and DuckDB's RE2 (character classes,
bounded repetition, ``\\b``) so the SQL oracle reproduces the scrub
byte-for-byte: counts are taken stage-by-stage and redaction is
sequential (emails → IPv4s → phones), exactly as the oracle's nested
``regexp_replace(..., 'g')`` chain applies them.

Row-local: no shuffle at any scale; regexes compile once per process.
"""

from __future__ import annotations

import hashlib
import re

EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
IPV4_RE = re.compile(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b")
PHONE_RE = re.compile(r"\b\d{3}-\d{3}-\d{4}\b")

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"

# SQL-side pattern strings (same source text as the compiled forms)
EMAIL_PAT = EMAIL_RE.pattern
IPV4_PAT = IPV4_RE.pattern
PHONE_PAT = PHONE_RE.pattern


def scrub_text(text: str) -> tuple[str, int, int, int]:
    """Sequentially redact emails, IPv4s, phones. Returns
    (scrubbed, n_emails, n_ips, n_phones) with each count taken on the
    text as it stood BEFORE that stage's redaction (matching the
    oracle's stage-by-stage CTE chain)."""
    n_emails = len(EMAIL_RE.findall(text))
    t1 = EMAIL_RE.sub(EMAIL_TOKEN, text)
    n_ips = len(IPV4_RE.findall(t1))
    t2 = IPV4_RE.sub(IP_TOKEN, t1)
    n_phones = len(PHONE_RE.findall(t2))
    t3 = PHONE_RE.sub(PHONE_TOKEN, t2)
    return t3, n_emails, n_ips, n_phones


def md5_hex(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()
