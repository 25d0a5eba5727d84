"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship transcript→KG pipeline at sf0.001.
``queries()`` exposes one callable per implemented operator
(SURVEY.md §2); ``oracle_sql()`` gives the value-equivalent DuckDB SQL.
KG queries run over the deterministic transcript fixture
(``biomedical_ner_ray.fixtures``) — the fixture parquet is referenced
directly from the SQL via ``read_parquet('<abs path>')``, so both sides
see identical input. Analytics queries run over the pre-registered
testdata views.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from biomedical_ner_ray import queries as Q
from biomedical_ner_ray.fixtures import ensure_fixture
from biomedical_ner_ray.kernels.textstats import STOPWORDS
from biomedical_ner_ray.kernels.tokenize import TOKEN_PATTERN

WORD_PATTERN = r"\w+"


def entry() -> Any:
    """Flagship pipeline at sf0.001: transcripts → sort → annotate →
    mentions/triples → nodes/edges (resumable); returns the triples
    Dataset. Driver checks rows >= 0 and a stable schema."""
    import ray.data as rd

    from biomedical_ner_ray.pipelines.kg import run_kg_pipeline
    from biomedical_ner_ray.state.manifest import list_parquet_files

    paths = ensure_fixture("sf0.001")
    res = run_kg_pipeline(
        paths["transcripts"], paths["alias_dict"], "/tmp/graft_entry_out/sf0.001"
    )
    return rd.read_parquet(list_parquet_files(res["paths"]["triples"]))


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # flagship KG path
        "kg_turns_sorted": Q.kg_turns_sorted,
        "kg_mentions": Q.kg_mentions,
        "kg_linked_mentions": Q.kg_linked_mentions,
        "kg_triples": Q.kg_triples,
        "kg_nodes": Q.kg_nodes,
        "kg_edges": Q.kg_edges,
        "kg_components": Q.kg_components,
        # reference aggregate semantics (G1/G3/G5/G6)
        "kg_vocab": Q.kg_vocab,
        "kg_tag_mapping": Q.kg_tag_mapping,
        "kg_mention_type_counts": Q.kg_mention_type_counts,
        "kg_turn_stats": Q.kg_turn_stats,
        # text analysis / dedup over documents
        "doc_wordcount": Q.doc_wordcount,
        "doc_top_words": Q.doc_top_words,
        "doc_token_counts": Q.doc_token_counts,
        "doc_fingerprints": Q.doc_fingerprints,
        "doc_dedup_exact": Q.doc_dedup_exact,
        "doc_quality": Q.doc_quality,
        "doc_langid": Q.doc_langid,
        "doc_lang_distribution": Q.doc_lang_distribution,
        # events: windowed + sessionized
        "events_hourly": Q.events_hourly,
        "events_sessions": Q.events_sessions,
        # relational: aggregate + broadcast join
        "lineitem_pricing_summary": Q.lineitem_pricing_summary,
        "revenue_by_segment": Q.revenue_by_segment,
        # similarity search
        "ann_topk": Q.ann_topk,
    }


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------


def _sql_list(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def _kg_prefix() -> str:
    """Shared CTE bank for the KG queries: tokenize (same regex as the
    Python kernel — RE2 and `re` agree on ASCII), candidate n-grams,
    maximal dictionary matches (== greedy longest-match on this fixture,
    proven by tests/test_fixture_properties.py), linking, triples, and
    3-round min-label propagation for components."""
    p = ensure_fixture("sf0.01")
    return f"""
WITH transcripts_fx AS (
  SELECT * FROM read_parquet('{p["transcripts_glob"]}')
),
aliases AS (
  SELECT * FROM read_parquet('{p["alias_dict"]}')
),
toksq AS (
  SELECT conv_id, turn_idx, regexp_extract_all(text, '{TOKEN_PATTERN}') AS tk
  FROM transcripts_fx
),
cand AS (
  SELECT t.conv_id, t.turn_idx, g.i AS i, nn.n AS n,
         array_to_string(t.tk[g.i:g.i+nn.n-1], ' ') AS surface,
         lower(array_to_string(t.tk[g.i:g.i+nn.n-1], ' ')) AS key
  FROM toksq t,
       unnest(generate_series(1, least(len(t.tk), 100))) AS g(i),
       unnest([1,2,3,4]) AS nn(n)
  WHERE g.i + nn.n - 1 <= least(len(t.tk), 100)
),
matched AS (
  SELECT c.conv_id, c.turn_idx, c.i, c.n, c.surface,
         min(a.cui) AS cui,
         arg_min(a.type, a.cui) AS type,
         arg_min(a.canonical_name, a.cui) AS canonical_name,
         arg_min(a.alias, a.cui) AS alias_surface
  FROM cand c JOIN aliases a ON a.alias_key = c.key
  GROUP BY c.conv_id, c.turn_idx, c.i, c.n, c.surface
),
maximal AS (
  SELECT m.* FROM matched m
  WHERE NOT EXISTS (
    SELECT 1 FROM matched m2
    WHERE m2.conv_id = m.conv_id AND m2.turn_idx = m.turn_idx
      AND m2.i <= m.i AND m2.i + m2.n >= m.i + m.n AND m2.n > m.n
  )
),
mentionsq AS (
  SELECT conv_id, turn_idx,
         conv_id || ':' || CAST(turn_idx AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR) AS mention_id,
         surface AS text, type,
         CAST(i - 1 AS INTEGER) AS start_tok,
         CAST(i + n - 2 AS INTEGER) AS end_tok,
         cui, canonical_name,
         CAST(CASE WHEN surface = alias_surface THEN 1.0 ELSE 0.9 END AS DOUBLE) AS link_score
  FROM maximal
),
triplesq AS (
  SELECT m1.cui AS subj_cui,
         CASE
           WHEN m1.type = 'protein' AND m2.type IN ('DNA', 'RNA') THEN 'binds'
           WHEN m1.type = 'protein' AND m2.type = 'protein' THEN 'interacts_with'
           WHEN m1.type IN ('DNA', 'RNA', 'protein') AND m2.type = 'Disease' THEN 'associated_with'
           WHEN m2.type IN ('cell_line', 'cell_type') THEN 'expressed_in'
           ELSE 'co_occurs_with'
         END AS pred,
         m2.cui AS obj_cui,
         m1.conv_id, m1.turn_idx,
         m1.text || ' | ' || m2.text AS evidence_text
  FROM mentionsq m1
  JOIN mentionsq m2
    ON m1.conv_id = m2.conv_id AND m1.turn_idx = m2.turn_idx
   AND m1.start_tok < m2.start_tok AND m1.cui <> m2.cui
),
lab0 AS (SELECT DISTINCT cui, cui AS label FROM aliases),
am1 AS (SELECT a.alias_key, min(l.label) AS lab
        FROM aliases a JOIN lab0 l ON l.cui = a.cui GROUP BY a.alias_key),
lab1 AS (SELECT l.cui, least(l.label, min(m.lab)) AS label
         FROM lab0 l JOIN aliases a ON a.cui = l.cui
         JOIN am1 m ON m.alias_key = a.alias_key
         GROUP BY l.cui, l.label),
am2 AS (SELECT a.alias_key, min(l.label) AS lab
        FROM aliases a JOIN lab1 l ON l.cui = a.cui GROUP BY a.alias_key),
lab2 AS (SELECT l.cui, least(l.label, min(m.lab)) AS label
         FROM lab1 l JOIN aliases a ON a.cui = l.cui
         JOIN am2 m ON m.alias_key = a.alias_key
         GROUP BY l.cui, l.label),
am3 AS (SELECT a.alias_key, min(l.label) AS lab
        FROM aliases a JOIN lab2 l ON l.cui = a.cui GROUP BY a.alias_key),
lab3 AS (SELECT l.cui, least(l.label, min(m.lab)) AS label
         FROM lab2 l JOIN aliases a ON a.cui = l.cui
         JOIN am3 m ON m.alias_key = a.alias_key
         GROUP BY l.cui, l.label),
metaq AS (SELECT cui, min(canonical_name) AS canonical_name, min(type) AS type
          FROM aliases GROUP BY cui)
"""


def oracle_sql() -> dict[str, str]:
    pre = _kg_prefix()
    en = _sql_list(STOPWORDS["en"])
    fr = _sql_list(STOPWORDS["fr"])
    de = _sql_list(STOPWORDS["de"])
    es = _sql_list(STOPWORDS["es"])
    norm = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
    return {
        "kg_turns_sorted": pre
        + "SELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts_fx",
        "kg_mentions": pre
        + "SELECT conv_id, turn_idx, mention_id, text, type, start_tok, end_tok FROM mentionsq",
        "kg_linked_mentions": pre
        + "SELECT conv_id, turn_idx, mention_id, text, type, start_tok, end_tok, cui, canonical_name, link_score FROM mentionsq",
        "kg_triples": pre
        + "SELECT subj_cui, pred, obj_cui, conv_id, turn_idx, evidence_text FROM triplesq",
        "kg_nodes": pre
        + """
SELECT n.cui, mt.canonical_name, mt.type, n.mention_count
FROM (
  SELECT c.label AS cui, CAST(count(*) AS BIGINT) AS mention_count
  FROM mentionsq m JOIN lab3 c ON c.cui = m.cui
  GROUP BY c.label
) n JOIN metaq mt ON mt.cui = n.cui""",
        "kg_edges": pre
        + """
SELECT cs.label AS subj_cui, t.pred, co.label AS obj_cui,
       CAST(count(*) AS BIGINT) AS weight
FROM triplesq t
JOIN lab3 cs ON cs.cui = t.subj_cui
JOIN lab3 co ON co.cui = t.obj_cui
WHERE cs.label <> co.label
GROUP BY cs.label, t.pred, co.label""",
        "kg_components": pre + "SELECT cui, label FROM lab3",
        "kg_vocab": pre
        + f"""
SELECT lower(w) AS word, CAST(count(*) AS BIGINT) AS n_occurrences
FROM (SELECT unnest(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS w FROM transcripts_fx)
GROUP BY lower(w) HAVING count(*) >= 2""",
        "kg_tag_mapping": pre
        + """
SELECT type AS tag, CAST(row_number() OVER (ORDER BY type) AS BIGINT) AS tag_idx
FROM (SELECT DISTINCT type FROM mentionsq)""",
        "kg_mention_type_counts": pre
        + "SELECT type, CAST(count(*) AS BIGINT) AS n_mentions FROM mentionsq GROUP BY type",
        "kg_turn_stats": pre
        + f"""
SELECT role, CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(len(regexp_extract_all(text, '{TOKEN_PATTERN}'))) AS BIGINT) AS sum_tokens
FROM transcripts_fx GROUP BY role""",
        "doc_wordcount": f"""
SELECT w AS word, CAST(count(*) AS BIGINT) AS n_occurrences
FROM (SELECT unnest(regexp_extract_all(lower(text), '{WORD_PATTERN}')) AS w FROM documents)
GROUP BY w HAVING count(*) >= 2""",
        "doc_top_words": f"""
SELECT w AS word, CAST(count(*) AS BIGINT) AS n_occurrences
FROM (SELECT unnest(regexp_extract_all(lower(text), '{WORD_PATTERN}')) AS w FROM documents)
GROUP BY w HAVING count(*) >= 2
ORDER BY n_occurrences DESC, word ASC LIMIT 20""",
        "doc_token_counts": f"""
SELECT doc_id, CAST(len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS BIGINT) AS n_tokens
FROM documents""",
        "doc_fingerprints": f"SELECT doc_id, md5({norm}) AS fingerprint FROM documents",
        "doc_dedup_exact": f"""
SELECT md5({norm}) AS fingerprint, min(doc_id) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM documents GROUP BY md5({norm})""",
        "doc_quality": f"""
WITH f AS (
  SELECT doc_id, text,
         regexp_extract_all(text, '{TOKEN_PATTERN}') AS toks,
         regexp_extract_all(lower(text), '{WORD_PATTERN}') AS ws
  FROM documents
), g AS (
  SELECT doc_id,
    CAST(length(text) AS BIGINT) AS n_chars,
    CAST(len(toks) AS BIGINT) AS n_tokens,
    CAST(len(ws) AS BIGINT) AS n_words,
    CASE WHEN len(toks) = 0 THEN 0.0
         ELSE CAST(len(list_filter(toks, t -> regexp_matches(t, '^[^\\w\\s]$'))) AS DOUBLE) / len(toks) END AS punct_ratio,
    CASE WHEN len(ws) = 0 THEN 0.0
         ELSE CAST(len(list_filter(ws, w -> list_contains({en}, w))) AS DOUBLE) / len(ws) END AS stopword_ratio,
    CASE WHEN len(ws) = 0 THEN 0.0
         ELSE CAST(len(list_filter(ws, w -> regexp_matches(w, '^[0-9]+$'))) AS DOUBLE) / len(ws) END AS digit_ratio,
    CASE WHEN len(ws) = 0 THEN 0.0
         ELSE CAST(length(array_to_string(ws, '')) AS DOUBLE) / len(ws) END AS mean_word_len
  FROM f
)
SELECT doc_id, n_chars, n_tokens, n_words, punct_ratio, stopword_ratio,
       digit_ratio, mean_word_len,
       CAST((CASE WHEN n_chars BETWEEN 20 AND 100000 THEN 1.0 ELSE 0.0 END
           + CASE WHEN stopword_ratio >= 0.05 THEN 1.0 ELSE 0.0 END
           + CASE WHEN punct_ratio <= 0.5 THEN 1.0 ELSE 0.0 END
           + CASE WHEN digit_ratio <= 0.5 THEN 1.0 ELSE 0.0 END) / 4.0 AS DOUBLE) AS quality_score
FROM g""",
        "doc_langid": f"""
WITH f AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{WORD_PATTERN}') AS ws FROM documents
), s AS (
  SELECT doc_id,
    len(list_filter(ws, w -> list_contains({en}, w))) AS s_en,
    len(list_filter(ws, w -> list_contains({fr}, w))) AS s_fr,
    len(list_filter(ws, w -> list_contains({de}, w))) AS s_de,
    len(list_filter(ws, w -> list_contains({es}, w))) AS s_es
  FROM f
)
SELECT doc_id,
  CASE WHEN greatest(s_en, s_fr, s_de, s_es) = 0 THEN 'und'
       WHEN s_en = greatest(s_en, s_fr, s_de, s_es) THEN 'en'
       WHEN s_fr = greatest(s_en, s_fr, s_de, s_es) THEN 'fr'
       WHEN s_de = greatest(s_en, s_fr, s_de, s_es) THEN 'de'
       ELSE 'es' END AS lang_pred
FROM s""",
        "doc_lang_distribution": "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang",
        "events_hourly": """
SELECT user_id, date_trunc('hour', ts) AS hour,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY user_id, date_trunc('hour', ts)""",
        "events_sessions": """
WITH e AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, event_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM e
)
SELECT user_id, session_idx, min(ts) AS session_start,
       CAST(count(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, session_idx""",
        "lineitem_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus""",
        "revenue_by_segment": """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment""",
        "ann_topk": f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < {Q.ANN_N_QUERIES}
), sc AS (
  SELECT q.qid, e.vec_id AS vid,
         list_cosine_similarity(q.qe, e.embedding) AS cos
  FROM q, embeddings e WHERE e.vec_id <> q.qid
), r AS (
  SELECT qid, vid,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid ASC) AS rnk
  FROM sc
)
SELECT qid AS query_id, vid AS neighbor_id, CAST(rnk AS BIGINT) AS rank
FROM r WHERE rnk <= {Q.ANN_K}""",
    }
