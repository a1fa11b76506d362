"""Similarity search over embedding columns.

North-star extension (SURVEY.md §7.4). Two tiers:

- ``cosine_topk``: exact brute-force top-k — broadcast the (small)
  query set against the corpus, score JVM-side, window top-k. The
  correctness baseline; O(corpus × queries) but embarrassingly
  parallel and shuffle-light (one shuffle on query_id for the top-k).
- ``lsh_topk`` / ``embedding_near_duplicates``: sign-random-projection
  bucketing → only same-bucket pairs are scored. Linear candidate
  generation — the 100 TB path. Recall < 1.0 by construction; raise
  num_planes/probes for tighter recall.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` must be small (it is broadcast — no shuffle of the
    corpus). Output: (query_id, neighbor_id, cosine, rank), rank 1..k,
    deterministic tie-break on neighbor id. Self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            vectors.cosine(F.col("qvec"), F.col("cvec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def with_lsh_bucket(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 11,
    out_col: str = "bucket",
) -> DataFrame:
    planes = vectors.random_planes(num_planes, dim, seed)
    return df.withColumn(out_col, vectors.lsh_bucket(F.col(vec_col), planes))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 11,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket. Same output shape as :func:`cosine_topk`; queries may find
    fewer than k neighbors (bucket smaller than k) — that's the
    approximation trade, tune num_planes down / add multi-probe for
    more candidates.
    """
    qb = with_lsh_bucket(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")),
        vec_col="qvec", num_planes=num_planes, dim=dim, seed=seed,
    )
    cb = with_lsh_bucket(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")),
        vec_col="cvec", num_planes=num_planes, dim=dim, seed=seed,
    )
    scored = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            vectors.cosine(F.col("qvec"), F.col("cvec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "cvec",
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid by cosine (deterministic tie-break: smallest centroid id).

    ``centroids`` is small (the codebook) → broadcast; the corpus is
    scanned once, scoring |codebook| cosines per row JVM-side. Output:
    (id, vec, centroid_id). At 100 TB this is the linear pass that
    buckets the corpus; writing the result partitioned by centroid_id
    gives pruned ANN probes on read.
    """
    c = corpus.select(F.col(id_col).alias("doc"), F.col(vec_col).alias("vec"))
    cb = centroids.select(
        F.col(centroid_id).alias("cid"), F.col(centroid_vec).alias("cv")
    )
    scored = c.join(F.broadcast(cb)).select(
        "doc", "vec", "cid", vectors.cosine(F.col("vec"), F.col("cv")).alias("cos")
    )
    w = Window.partitionBy("doc").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc", "vec", F.col("cid").alias("centroid_id"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF ANN search: score only corpus vectors whose centroid is among
    the query's ``nprobe`` nearest centroids. Recall < 1 by construction
    (the IVF trade); raise nprobe → exact at nprobe=|codebook|.

    Output: (query_id, neighbor_id, cosine, rank). Self-matches excluded.
    """
    cb = centroids.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
    )
    assigned = ivf_assign(
        corpus,
        cb,
        id_col=id_col,
        vec_col=vec_col,
        centroid_id="cid",
        centroid_vec="cv",
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    qscored = q.join(F.broadcast(cb)).select(
        "query_id", "qvec", "cid",
        vectors.cosine(F.col("qvec"), F.col("cv")).alias("qcos"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("qcos").desc(), F.col("cid"))
    probes = (
        qscored.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "qvec", F.col("cid").alias("centroid_id"))
    )
    cand = assigned.join(F.broadcast(probes), "centroid_id").filter(
        F.col("query_id") != F.col("doc")
    )
    scored = cand.select(
        "query_id",
        F.col("doc").alias("neighbor_id"),
        vectors.cosine(F.col("qvec"), F.col("vec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def embedding_near_duplicates(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 11,
    exact: bool = False,
) -> DataFrame:
    """Pairs with cosine >= threshold. Default: LSH-bucketed self-join
    (linear candidates, approximate recall). ``exact=True`` scores all
    pairs — verification/small-corpus mode only.
    """
    base = df.select(F.col(id_col).alias("doc"), F.col(vec_col).alias("vec"))
    if exact:
        l = base.select(F.col("doc").alias("id_a"), F.col("vec").alias("vec_a"))
        r = base.select(F.col("doc").alias("id_b"), F.col("vec").alias("vec_b"))
        pairs = l.join(r, F.col("id_a") < F.col("id_b"))
    else:
        bucketed = with_lsh_bucket(
            base, vec_col="vec", num_planes=num_planes, dim=dim, seed=seed
        )
        l = bucketed.select(
            F.col("doc").alias("id_a"), F.col("vec").alias("vec_a"), "bucket"
        )
        r = bucketed.select(
            F.col("doc").alias("id_b"), F.col("vec").alias("vec_b"), "bucket"
        )
        pairs = l.join(r, "bucket").filter(F.col("id_a") < F.col("id_b"))
    cos = vectors.cosine(F.col("vec_a"), F.col("vec_b"))
    return pairs.select("id_a", "id_b", cos.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )
