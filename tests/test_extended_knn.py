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
