"""The Arrow kNN-graph kernel's equivalence contract: knn_graph_arrow
must reproduce similarity.knn_graph BIT-FOR-BIT (same cosines, same
ranks, same tie-breaks) at both membership depths — the fast_text.py
twin-proof pattern. The serving build (_knn_graph_frame) uses the
Arrow kernel; the DataFrame twin and the shared DuckDB oracle are the
two independent proofs that the numpy per-dimension accumulation
preserves the fold's addition order exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_data_processing_challenge_spark.operators import similarity
from tests.conftest import SF_DIR


def test_knn_graph_arrow_matches_dataframe_twin(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cent = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    for p in (1, 2):
        a = sorted(
            tuple(r) for r in similarity.knn_graph(emb, cent, k=5, p=p).collect()
        )
        b = sorted(
            tuple(r)
            for r in similarity.knn_graph_arrow(emb, cent, k=5, p=p).collect()
        )
        # tuple equality on collected Python floats == exact double
        # equality — no tolerance, that's the contract
        assert a == b, f"arrow kernel diverged from twin at p={p}"
        assert len(a) > 0


def test_knn_graph_arrow_zero_norm_matches_twin(spark):
    """Planted zero vectors (VERDICT r14 #5): a zero-norm vector's
    cosines are NULL on both paths — the twin via try_divide, the
    kernel by emitting None for NaN (a NaN leaking through Arrow
    would sort FIRST under Spark's desc, inverting the rank) — and
    NULL pairs rank NULLS-LAST by neighbor_id, so short-of-finite
    nodes pad their top-k identically. The contract is now enforced
    equivalence, not a documented divergence."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(200)
    dim = len(emb.select("embedding").first()[0])
    zeros = spark.range(3).select(
        (F.col("id") + 1_000_000).alias("vec_id"),
        F.array(*[F.lit(0.0) for _ in range(dim)]).alias("embedding"),
        F.lit(0).alias("label"),
    )
    corpus = emb.select("vec_id", "embedding", "label").unionByName(zeros)
    cent = corpus.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    for p in (1, 2):
        a = sorted(
            tuple(r)
            for r in similarity.knn_graph(corpus, cent, k=5, p=p).collect()
        )
        b = sorted(
            tuple(r)
            for r in similarity.knn_graph_arrow(corpus, cent, k=5, p=p).collect()
        )
        assert a == b, f"zero-norm divergence at p={p}"
        # the planted zero vectors must actually exercise the NULL
        # path: some pair rows carry NULL cosine on BOTH sides
        assert any(r[2] is None for r in a), "no NULL-cosine rows planted"
