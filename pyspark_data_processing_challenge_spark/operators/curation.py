"""Corpus-curation operators a pretraining pipeline runs between dedup
and sharding: benchmark decontamination, deterministic dataset splits,
and sequence packing.

North-star extensions (SURVEY.md §7.4 family) — the reference engine
has none of these; they are the operations that make a 100 TB corpus
releasable:

- **Decontamination**: training documents sharing verbatim n-grams with
  an evaluation benchmark must be flagged/dropped before training, or
  eval scores are memorization. The standard recipe (GPT-2/3 reports,
  The Pile) is exact n-gram overlap.
- **Split assignment**: train/val/test membership must be a PURE
  FUNCTION of the example, not of job parallelism — a content/id hash
  against fixed weight cut points, so reruns, backfills, and other
  engines agree row-for-row.
- **Sequence packing**: pretraining consumes fixed-length token
  sequences; documents are concatenated per shard and cut every
  ``capacity`` tokens (GPT-style packing). Each doc's (shard, seq,
  offset) must be deterministic so shards can be re-materialized.

All three are pure DataFrame algebra — no UDFs anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import textfns


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    *,
    ngram_n: int = 5,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Flag every doc sharing at least one word ``ngram_n``-gram with
    the benchmark corpus.

    Returns (id, n_hit_ngrams, contaminated): the count of DISTINCT
    benchmark n-grams the doc contains, and the drop flag.

    Scale shape: the benchmark's distinct n-gram set is tiny relative
    to the corpus (eval sets are thousands of items, the corpus is
    billions), so it broadcasts and the corpus side never shuffles for
    the probe — one explode + broadcast semi-ish join + one aggregate
    on the doc id. With ``broadcast_benchmark=False`` the join shuffles
    both sides on the n-gram (the fallback when the benchmark itself is
    huge). The n-gram explode is the same fan-out wordcount already
    pays; no quadratic anything.
    """
    bench_grams = (
        benchmark.select(
            F.explode(textfns.shingles(F.col(text_col), ngram_n)).alias("g")
        )
        .distinct()
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(textfns.shingles(F.col(text_col), ngram_n)).alias("g"),
    )
    hits = (
        doc_grams.join(bench_grams, "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit_ngrams"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_hit_ngrams"), F.lit(0)).alias("n_hit_ngrams"),
            (F.coalesce(F.col("n_hit_ngrams"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def split_assign(
    df: DataFrame,
    key,
    splits: Sequence[tuple[str, int]],
    *,
    buckets: int = 100,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic split assignment: bucket = portable char_hash of
    the key (as string) mod ``buckets``; each (name, width) in
    ``splits`` claims the next ``width`` buckets. Widths must sum to
    ``buckets``. A narrow projection — no shuffle, engine-portable
    (the oracle reproduces the 31-ary fold bit-for-bit), stable across
    reruns and partitionings.
    """
    if sum(w for _, w in splits) != buckets:
        raise ValueError(f"split widths {splits} must sum to {buckets}")
    bucket = textfns.char_hash(key.cast("string")) % F.lit(buckets)
    expr = None
    edge = 0
    for name, width in splits:
        edge += width
        cond = bucket < F.lit(edge)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(out_col, expr)


def sample_by_rates(
    df: DataFrame,
    domain_col: str,
    key,
    rates: dict[str, float],
    *,
    default_rate: float = 1.0,
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic per-domain downsampling — the dataset-mixing step
    (keep 100% of high-quality domains, x% of web crawl): a row
    survives iff portable_hash(key ':' domain) mod ``buckets`` falls
    under its domain's rate. A pure row-local filter — no shuffle, no
    RNG, stable under reruns/backfills, reproducible in any engine
    (unlike ``DataFrame.sample``, whose output depends on partitioning
    and the Spark RNG). Salting the hash with the domain decorrelates a
    key's fate across domains."""
    gate = textfns.char_hash(
        F.concat(key.cast("string"), F.lit(":"), F.col(domain_col))
    ) % F.lit(buckets)
    threshold = F.lit(int(default_rate * buckets))
    for domain, rate in rates.items():
        threshold = (
            F.when(F.col(domain_col) == domain, int(rate * buckets))
            .otherwise(threshold)
        )
    return df.filter(gate < threshold)


def pack_sequences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    capacity: int,
    n_shards: int,
) -> DataFrame:
    """GPT-style sequence packing: within each shard (id mod
    ``n_shards``), documents are concatenated in id order and cut every
    ``capacity`` tokens. Emits per doc: shard, token count, the
    sequence index where the doc STARTS, and its token offset within
    that sequence.

    Scale shape: ONE window aggregate partitioned by shard — cumulative
    sums run in parallel across shards, and shard count scales with the
    corpus (pick n_shards so a shard's docs fit a task). This is the
    deterministic packing a re-materializable shard layout needs; no
    single-partition anything.
    """
    tok = textfns.token_count(F.col(text_col))
    shard = F.pmod(F.col(id_col), F.lit(n_shards)).cast("long")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = df.select(
        F.col(id_col), shard.alias("shard"), tok.alias("n_tokens")
    ).withColumn("__cum", F.sum("n_tokens").over(w))
    start = F.col("__cum") - F.col("n_tokens")
    return staged.select(
        id_col,
        "shard",
        "n_tokens",
        F.floor(start / F.lit(capacity)).cast("long").alias("seq_id"),
        (start % F.lit(capacity)).cast("long").alias("seq_offset"),
    )
