"""PII scrub kernel (kernels/pii.py): staged counts, sequential
redaction, and DuckDB RE2 parity on adversarial strings."""

import duckdb

from biomedical_ner_ray.kernels.pii import (
    EMAIL_PAT,
    IPV4_PAT,
    PHONE_PAT,
    md5_hex,
    scrub_text,
)

CASES = [
    "plain text with no pii at all",
    "mail a.b+c_d%e@sub.domain.org and x@y.io twice",
    "ips 1.2.3.4 and 255.255.255.255 and not 1.2.3 alone",
    "phone 555-123-4567 but not 55-123-4567 or 5551234567",
    "combo u7@ex2.com from 10.0.7.7 call 555-107-0007 tail",
    "email-with-ip-ish 1.2.3.4@host.com stays one email",
    "dotted.end. 1.2.3.4. boundary",
]


def test_scrub_counts_and_sequencing():
    s, ne, ni, np_ = scrub_text("combo u7@ex2.com from 10.0.7.7 call 555-107-0007 tail")
    assert (ne, ni, np_) == (1, 1, 1)
    assert s == "combo <EMAIL> from <IP> call <PHONE> tail"
    # the email's own dotted host must not leak an IP count
    s, ne, ni, np_ = scrub_text("1.2.3.4@host.com stays one email")
    assert (ne, ni, np_) == (1, 0, 0)


def test_parity_with_duckdb_re2():
    con = duckdb.connect()
    for text in CASES:
        row = con.execute(
            f"""
            WITH s1 AS (
              SELECT len(regexp_extract_all(?, '{EMAIL_PAT}')) AS ne,
                     regexp_replace(?, '{EMAIL_PAT}', '<EMAIL>', 'g') AS t1
            ),
            s2 AS (
              SELECT ne, len(regexp_extract_all(t1, '{IPV4_PAT}')) AS ni,
                     regexp_replace(t1, '{IPV4_PAT}', '<IP>', 'g') AS t2 FROM s1
            )
            SELECT ne, ni, len(regexp_extract_all(t2, '{PHONE_PAT}')) AS np,
                   md5(regexp_replace(t2, '{PHONE_PAT}', '<PHONE>', 'g'))
            FROM s2
            """,
            [text, text],
        ).fetchone()
        s, ne, ni, np_ = scrub_text(text)
        assert (ne, ni, np_) == (row[0], row[1], row[2]), text
        assert md5_hex(s) == row[3], text
