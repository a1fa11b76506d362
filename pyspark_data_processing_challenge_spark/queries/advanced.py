"""Round-5 catalog additions: repeated-substring span dedup, weighted
sampling without replacement, gaps-and-islands streaks, char-entropy
quality signal, and Arrow-iterator API surface.

Same contract as every other catalog module: each query has a DuckDB
oracle with identical column names and engine-portable arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textfns import HASH_MOD
from ..operators import dedup, selection
from ._util import round_to, sql_char_hash, sql_round, sql_tokens, t

# ---------------------------------------------------------------------------
# repeated-substring (duplicated span) dedup — Lee et al. 2022 family
# ---------------------------------------------------------------------------

SPAN_K = 4


def docs_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc verbatim duplicated-span statistics over word 4-grams.

    The distributed formulation of suffix-array substring dedup: a
    position is duplicated when its k-gram occurs >= 2 times corpus-wide;
    overlapping duplicated positions merge into maximal spans
    (operators/dedup.duplicated_span_stats). Reference repo has no such
    operator (SURVEY.md §2.5 — no text ops at all); this is north-star
    LLM-curation surface.
    """
    d = t(spark, sf_dir, "documents")
    return dedup.duplicated_span_stats(d, "text", "doc_id", k=SPAN_K)


_DUP_SPANS_SQL = f"""
WITH toks AS (
  SELECT doc_id, {sql_tokens("text")} AS tk FROM documents
),
grams AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(tk[i:i+{SPAN_K - 1}], ' ') AS gram
  FROM toks, unnest(range(1, greatest(length(tk) - {SPAN_K - 1}, 0) + 1)) AS u(i)
),
dupg AS (
  SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2
),
duppos AS (
  SELECT g.doc_id, g.pos FROM grams g JOIN dupg USING (gram)
),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   <= {SPAN_K} THEN 0 ELSE 1 END AS new_span
  FROM duppos
),
numbered AS (
  SELECT doc_id, pos,
         sum(new_span) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS UNBOUNDED PRECEDING) AS span
  FROM flagged
),
spans AS (
  SELECT doc_id, span, count(*) AS n_pos,
         max(pos) - min(pos) + {SPAN_K} AS cov
  FROM numbered GROUP BY doc_id, span
),
per_doc AS (
  SELECT doc_id, sum(n_pos)::BIGINT AS dup_positions,
         count(*)::BIGINT AS dup_spans,
         sum(cov)::BIGINT AS dup_token_cov
  FROM spans GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(p.dup_positions, 0)::BIGINT AS dup_positions,
       coalesce(p.dup_spans, 0)::BIGINT AS dup_spans,
       coalesce(p.dup_token_cov, 0)::BIGINT AS dup_token_cov
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


# ---------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis–Spirakis A-ES)
# ---------------------------------------------------------------------------

WSWR_K = 10
WSWR_SALT = "wswr"


def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample without replacement: k=10 docs per
    source stratum, probability proportional to length (n_chars).
    Output is integer/string-only — the float A-ES score orders rows but
    never reaches the hashed result."""
    d = t(spark, sf_dir, "documents")
    out = selection.weighted_sample_without_replacement(
        d.select("source", "doc_id", "n_chars"),
        key_col="doc_id",
        weight_col="n_chars",
        k=WSWR_K,
        strata_cols=["source"],
        salt=WSWR_SALT,
    )
    return out.select(
        "source",
        "doc_id",
        F.col("n_chars").alias("weight"),
        F.col("rk").cast("long").alias("rk"),
    )


_WSWR_SQL = f"""
WITH scored AS (
  SELECT source, doc_id, n_chars,
         ln(({sql_char_hash(f"(doc_id::VARCHAR || '{WSWR_SALT}')")} + 1)
            / {float(HASH_MOD + 1)}) / n_chars AS s
  FROM documents WHERE n_chars > 0
),
ranked AS (
  SELECT source, doc_id, n_chars AS weight,
         row_number() OVER (PARTITION BY source ORDER BY s DESC, doc_id) AS rk
  FROM scored
)
SELECT source, doc_id, weight, rk FROM ranked WHERE rk <= {WSWR_K}
"""


QUERIES = {
    "docs_dup_spans": docs_dup_spans,
    "docs_weighted_sample": docs_weighted_sample,
}

ORACLES = {
    "docs_dup_spans": _DUP_SPANS_SQL,
    "docs_weighted_sample": _WSWR_SQL,
}
