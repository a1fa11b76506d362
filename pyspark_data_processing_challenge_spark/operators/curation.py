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


def hashed_linear_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    int_weights: Sequence[int],
    scale: int = 4,
) -> DataFrame:
    """fastText-style linear quality classifier with no model
    dependency: hashing-trick bag-of-words features (Weinberger et al.
    2009 — the docs_hashed_features scheme: bucket = char_hash % dim,
    sign from the hash's next bit) dotted with a fixed integer weight
    vector, squashed through a sigmoid.

    Engine-portability is designed in (the CLAUDE.md float rules):
    the dot product is an EXACT BIGINT — each token contributes
    ``sign * int_weights[bucket]`` and integer sums are
    order-independent, so no float ever rides through a shuffle. The
    logit is one IEEE division of exact integers,
    ``z_num / (scale * dl)`` (dl = token count, the per-doc length
    normalizer), and the only transcendental is the final sigmoid.

    Scale shape: tokenize → per-token weight term → ONE groupBy(id)
    aggregate (map-side combined); the weight vector is a single
    64-int array literal in the plan, never a join. Inference over
    100 TB is a scan + one keys-only shuffle.

    Returns (id, dl, z_num, logit, prob, keep): exact token count and
    integer dot, the raw logit/probability (UNrounded — query-layer
    rounds for hashed outputs), and keep = z_num >= 0 (exact-integer
    decision, no float threshold).
    """
    dim = len(int_weights)
    if dim == 0:
        raise ValueError("int_weights must be non-empty")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(textfns.tokens(F.col(text_col))).alias("tok"),
    )
    staged = toks.withColumn("__h", textfns.char_hash(F.col("tok")))
    wlit = F.lit([int(x) for x in int_weights])
    sgn = F.when(
        (F.floor(F.col("__h") / dim) % 2) == 0, F.lit(1)
    ).otherwise(F.lit(-1)).cast("long")
    term = sgn * F.element_at(
        wlit, (F.col("__h") % dim).cast("int") + F.lit(1)
    ).cast("long")
    agg = staged.select("id", term.alias("__term")).groupBy("id").agg(
        F.sum("__term").alias("z_num"), F.count(F.lit(1)).alias("dl")
    )
    logit = F.col("z_num").cast("double") / (
        F.lit(float(scale)) * F.col("dl").cast("double")
    )
    return agg.select(
        "id",
        "dl",
        "z_num",
        logit.alias("logit"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))).alias("prob"),
        (F.col("z_num") >= 0).alias("keep"),
    )


def bpe_train_merges(
    df: DataFrame, text_col: str, *, n_merges: int
) -> DataFrame:
    """BPE tokenizer TRAINING to a merge list (Sennrich et al. 2016),
    distributed — the N-iteration composition of the single
    docs_bpe_merge_step: repeatedly count adjacent symbol pairs, take
    the best merge (max count, lexicographic tie-break), apply it
    corpus-wide, and continue on the merged symbols.

    Scale shape (what real corpus-scale BPE trainers do): the corpus
    collapses ONCE to the distinct-word frequency table — pair counts
    are then frequency-weighted sums over the (small) word vocabulary,
    so each training iteration is one pair-keyed aggregate over vocab
    rows, NOT a rescan of 100 TB of text. Each iteration
    localCheckpoints the rewritten word table (the CLAUDE.md
    iterative-operator rule — without it iteration k re-executes all
    k-1 prior rewrites) and collects exactly ONE row (the argmax pair)
    to drive the next plan.

    Merge semantics: ``replace(word, pair, chr(i))`` — leftmost
    non-overlapping greedy, BPE's definition ("aaaa" under merge "aa"
    is two merged symbols). Each merge's symbol is a distinct sentinel
    char, so later pairs can span merged symbols; the returned
    ``pair`` column expands sentinels recursively to a bracketed
    display form ("[ab]c" = merge of the ab-symbol with c).

    Returns one row per executed merge: (merge_rank, pair, n,
    n_symbols) with n = the merge's weighted pair count and n_symbols
    = the distinct symbol count of the FINAL rewritten vocabulary
    (base characters + surviving merge symbols) — the trained vocab
    size. All counts are exact BIGINTs; the only strings are sentinel
    arithmetic — an external SQL engine replays the whole loop
    bit-identically.
    """
    if n_merges < 1 or n_merges > 30:
        raise ValueError("n_merges must be in [1, 30] (sentinel chars)")
    spark = df.sparkSession
    words = df.select(F.explode(textfns.tokens(F.col(text_col))).alias("w"))
    wf = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .localCheckpoint()
    )
    merges: list[tuple[int, str, int]] = []
    for i in range(1, n_merges + 1):
        c = F.split(F.col("w"), "")
        pairs = wf.select(
            "f",
            F.explode(
                F.when(
                    F.size(c) < 2, F.array().cast("array<string>")
                ).otherwise(
                    F.transform(
                        F.sequence(F.lit(0), F.size(c) - 2),
                        lambda j: F.concat_ws("", F.slice(c, j + 1, 2)),
                    )
                )
            ).alias("pair"),
        )
        best = (
            pairs.groupBy("pair")
            .agg(F.sum("f").alias("n"))
            .orderBy(F.desc("n"), "pair")
            .limit(1)
            .collect()
        )
        if not best:
            break
        mp, n = best[0]["pair"], int(best[0]["n"])
        merges.append((i, mp, n))
        wf = wf.select(
            F.replace(F.col("w"), F.lit(mp), F.lit(chr(i))).alias("w"), "f"
        ).localCheckpoint()
    n_symbols = int(
        wf.select(F.explode(F.split(F.col("w"), "")).alias("ch"))
        .agg(F.count_distinct("ch"))
        .collect()[0][0]
    )
    disp: dict[int, str] = {}
    rows = []
    for i, mp, n in merges:
        s = mp
        for j in range(i - 1, 0, -1):
            s = s.replace(chr(j), "[" + disp[j] + "]")
        disp[i] = s
        rows.append((i, s, n, n_symbols))
    return spark.createDataFrame(
        rows, "merge_rank long, pair string, n long, n_symbols long"
    )


def perceptron_train(
    df: DataFrame,
    text_col: str,
    id_col: str,
    label,
    *,
    dim: int = 64,
    steps: int = 4,
    weights_into: list | None = None,
    feats_into: list | None = None,
) -> DataFrame:
    """Distributed BATCH PERCEPTRON training over hashing-trick
    features — the training counterpart of
    :func:`hashed_linear_score`'s inference, with the property that
    makes corpus-scale training verifiable: every quantity in the loop
    is an exact INTEGER (features are signed counts, weights start at
    0 and move by integer aggregate updates, the misclassification
    decision is ``y * z <= 0``), so there is no float summation order
    to drift and an external SQL engine replays every step
    bit-identically. This is the classic reason the perceptron — not
    logistic SGD — is the distributed-exactness demonstration: SGD's
    gradient is a float sum whose value depends on reduction order.

    ``label`` is a Column evaluating to +1/-1 per row (weak labels —
    e.g. a length or rule-based signal). Features: bucket =
    char_hash(token) % dim with a sign bit (the docs_hashed_features
    scheme) plus a constant bias feature at bucket ``dim``.

    Per step (batch perceptron): z = x·w per doc (broadcast of the
    dim+1-row weight table), misclassified = y*z <= 0, weight delta =
    sum over misclassified of y*x per bucket (map-side-combined
    aggregate over a doc-keyed equi-join — both sides corpus-sized, so
    NO broadcast of the misclassified set), w += delta. The weight
    table localCheckpoints per step (the iterative-operator rule — the
    step-k plan otherwise re-executes all k-1 prior steps, twice each,
    2^k blow-up); the feature table checkpoints once.

    Returns one row per step: (step, n_errors, delta_l1) — training
    error count and total absolute weight movement (0 = converged).
    The per-step stats stay LAZY (a union of one-row aggregates over
    the checkpointed inputs, evaluated once when the caller
    materializes) — collecting them eagerly per step tripled the
    action count and doubled wall time at bench scale.

    ``weights_into`` (optional list) receives the FINAL (bucket, w)
    weight table — already checkpointed, dim+1 rows — so a caller can
    close the train→infer loop (docs_trained_classifier_eval scores
    the corpus with these instead of fixed weights). ``feats_into``
    receives the checkpointed (id, bucket, x) feature table (bias row
    included) for inference over the identical features.
    """
    spark = df.sparkSession
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(textfns.tokens(F.col(text_col))).alias("tok"),
    )
    staged = toks.withColumn("__h", textfns.char_hash(F.col("tok")))
    sgn = F.when(
        (F.floor(F.col("__h") / dim) % 2) == 0, F.lit(1)
    ).otherwise(F.lit(-1)).cast("long")
    sparse = (
        staged.select(
            "id",
            (F.col("__h") % dim).cast("long").alias("bucket"),
            sgn.alias("__s"),
        )
        .groupBy("id", "bucket")
        .agg(F.sum("__s").alias("x"))
        .filter(F.col("x") != 0)
    )
    bias = df.select(
        F.col(id_col).alias("id"),
        F.lit(dim).cast("long").alias("bucket"),
        F.lit(1).cast("long").alias("x"),
    )
    feats = sparse.unionByName(bias).localCheckpoint()
    ydf = df.select(
        F.col(id_col).alias("id"), label.cast("long").alias("y")
    ).localCheckpoint()
    w = spark.createDataFrame(
        [(b, 0) for b in range(dim + 1)], "bucket long, w long"
    ).localCheckpoint()
    stats: list[DataFrame] = []
    for step in range(1, steps + 1):
        z = (
            feats.join(F.broadcast(w), "bucket")
            .groupBy("id")
            .agg(F.sum(F.col("x") * F.col("w")).alias("z"))
        )
        mis = (
            z.join(ydf, "id")
            .filter(F.col("y") * F.col("z") <= 0)
            .select("id", "y")
        )
        g = (
            feats.join(mis, "id")
            .groupBy("bucket")
            .agg(F.sum(F.col("y") * F.col("x")).alias("g"))
        )
        w_new = (
            w.join(g, "bucket", "left")
            .select(
                "bucket",
                (F.col("w") + F.coalesce(F.col("g"), F.lit(0))).alias("w"),
            )
            .localCheckpoint()
        )
        stats.append(
            mis.agg(F.count(F.lit(1)).alias("n_errors"))
            .crossJoin(
                g.agg(
                    F.coalesce(F.sum(F.abs(F.col("g"))), F.lit(0)).alias(
                        "delta_l1"
                    )
                )
            )
            .select(
                F.lit(step).cast("long").alias("step"),
                F.col("n_errors").cast("long"),
                F.col("delta_l1").cast("long"),
            )
        )
        w = w_new
    if weights_into is not None:
        weights_into.append(w)
    if feats_into is not None:
        feats_into.append(feats)
    out = stats[0]
    for s in stats[1:]:
        out = out.unionByName(s)
    return out
