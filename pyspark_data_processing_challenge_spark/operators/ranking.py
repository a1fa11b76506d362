"""Text retrieval ranking: BM25 (Robertson et al.) — the default
lexical relevance function of every search engine, over the DataFrame
API. The reference has no ranking surface at all (SURVEY.md §2.5).

Scale shape: document frequencies for the query's terms are one
filtered aggregate (map-side combined), the corpus statistics
(N, avgdl) one tiny aggregate cross-joined back as a broadcast row;
scoring is then a single JVM-side projection over the corpus — no
shuffle beyond the two aggregates, no UDF.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import textfns


def _tf(tokens_col, term: str):
    """Occurrences of ``term`` in the staged token array."""
    return F.size(F.filter(tokens_col, lambda x: x == F.lit(term)))


def bm25_scores(
    df: DataFrame,
    terms: Sequence[str],
    *,
    text_col: str,
    id_col: str,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 score of every document for a bag-of-terms query.

    idf_t = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))   (Lucene form —
    always positive), tf saturation k1, length normalization b against
    the corpus mean document length. The per-term sum folds in the
    given term order, so the float result is reproducible cross-engine.

    Returns (id, dl, score_raw) — callers round/rank; dl is the token
    count (useful for inspection and the oracle).
    """
    toks = textfns.tokens(F.col(text_col))
    staged = df.select(F.col(id_col).alias("id"), toks.alias("__t"))
    # stage dl and every per-term tf as projected columns ONCE — the
    # scoring formula references tf twice per term (HOF staging rule)
    staged = staged.withColumns(
        {
            "dl": F.size("__t").cast("long"),
            **{
                f"tf_{i}": _tf(F.col("__t"), t).cast("double")
                for i, t in enumerate(terms)
            },
        }
    )

    # corpus stats: N, avgdl, and each term's document frequency, all
    # in ONE aggregate row (broadcast back via crossJoin)
    stats = staged.agg(
        F.count(F.lit(1)).alias("N"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = staged.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("N").cast("double")
    norm = F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl").cast("double") / avgdl
    )
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("N").cast("double") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
        )
        score = score + idf * (tf * F.lit(k1 + 1.0)) / (tf + norm)
    return scored.select("id", "dl", score.alias("score_raw"))


def postings(
    df: DataFrame, *, id_col: str, text_col: str
) -> DataFrame:
    """Positional inverted-index postings: one (doc, pos, tok) row per
    token occurrence, positions 1-based in token order — the physical
    layout behind every full-text index (term-sorted, doc/position
    payload). Built with a single posexplode over the staged token
    array; at 100 TB this is one scan fanning out map-side with no
    shuffle — the shuffle happens only when a consumer groups or joins
    by term/doc.
    """
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(textfns.tokens(F.col(text_col))).alias("pos0", "tok"),
    ).select(
        "doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "tok"
    )


def phrase_search(posting_df: DataFrame, phrase: Sequence[str]) -> DataFrame:
    """Exact-phrase search over positional postings: doc matches at
    position p iff phrase[i] occurs at p+i for every i. Classic
    positional-intersection plan: each term's postings are FILTERED
    first (term predicate pushes to the scan — the inverted index's
    seek), normalized to the anchor position (pos − i), then chained
    through equi-joins on (doc, anchor). Join inputs are
    term-selectivity-sized, never the full index; k−1 hash joins for a
    k-term phrase, each shuffling only that term's postings.

    Returns one row per matching document: match count + first match
    position.
    """
    if len(phrase) < 1:
        raise ValueError("phrase must have at least one term")
    cur = posting_df.filter(F.col("tok") == phrase[0]).select(
        "doc_id", F.col("pos").alias("p0")
    )
    for i, term in enumerate(phrase[1:], start=1):
        nxt = posting_df.filter(F.col("tok") == term).select(
            "doc_id", (F.col("pos") - i).alias("p0")
        )
        cur = cur.join(nxt, ["doc_id", "p0"])
    return cur.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("p0").alias("first_pos"),
    )
