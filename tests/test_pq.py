"""Product quantization: recall sanity + plan discipline
(operators/similarity.pq_encode / pq_adc_topk)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_data_processing_challenge_spark import plans
from pyspark_data_processing_challenge_spark.queries import advanced
from tests.conftest import SF01_DIR


def test_pq_codes_shape_and_range(spark):
    out = advanced.pq_codes(spark, SF01_DIR).collect()
    assert len(out) == 500
    for r in out:
        codes = [int(c) for c in r.codes.split(",")]
        assert len(codes) == advanced.PQ_M
        assert all(0 <= c < advanced.PQ_NCODES for c in codes)


def _exact_topk_ids(spark):
    from pyspark_data_processing_challenge_spark.queries._util import t

    emb = t(spark, SF01_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") == advanced.PQ_QID).first().embedding
    exact = (
        emb.select(
            "vec_id",
            F.aggregate(
                F.zip_with(
                    "embedding",
                    F.array(*[F.lit(float(x)) for x in q]),
                    lambda x, y: (x.cast("double") - y.cast("double"))
                    * (x.cast("double") - y.cast("double")),
                ),
                F.lit(0.0),
                lambda a, b: a + b,
            ).alias("d"),
        )
        .orderBy("d", "vec_id")
        .limit(advanced.PQ_TOPK)
        .collect()
    )
    return {r.vec_id for r in exact}


def test_pq_adc_recall_vs_exact(spark):
    approx = [r.vec_id for r in advanced.pq_topk(spark, SF01_DIR).collect()]
    exact_ids = _exact_topk_ids(spark)
    # the query vector itself must be found (its ADC distance is the
    # quantization floor), and compressed search should recover a fair
    # share of the true neighbors on 16-code-per-subspace quantization
    assert advanced.PQ_QID in approx
    overlap = len(exact_ids & set(approx))
    assert overlap >= 3, (overlap, approx, sorted(exact_ids))


def test_pq_trained_recall_at_least_convention(spark):
    """Lloyd training must not LOSE recall vs the first-16 convention
    init — the point of pq_trained_topk (VERDICT r05 item 3)."""
    exact_ids = _exact_topk_ids(spark)
    conv = {r.vec_id for r in advanced.pq_topk(spark, SF01_DIR).collect()}
    trained_rows = advanced.pq_trained_topk(spark, SF01_DIR).collect()
    trained = {r.vec_id for r in trained_rows}
    assert advanced.PQ_QID in trained
    conv_recall = len(exact_ids & conv)
    trained_recall = len(exact_ids & trained)
    assert trained_recall >= conv_recall, (
        trained_recall, conv_recall, sorted(trained), sorted(conv),
    )


def test_pq_trained_plan_broadcasts(spark):
    top = advanced.pq_trained_topk(spark, SF01_DIR)
    # init codebook (E-step), trained codebook (encode), query table
    assert plans.broadcast_join_count(top) >= 3
    assert plans.sort_merge_join_count(top) == 0


def test_pq_plans_broadcast_codebook(spark):
    df = advanced.pq_codes(spark, SF01_DIR)
    assert plans.broadcast_join_count(df) >= 1
    top = advanced.pq_topk(spark, SF01_DIR)
    assert plans.broadcast_join_count(top) >= 2  # codebook + query table
    assert plans.sort_merge_join_count(top) == 0


def test_ivfpq_probes_subset_and_broadcasts(spark):
    # the composite path must rank a SUBSET (probed lists only) and
    # keep every small side broadcast
    top = advanced.ivfpq_topk(spark, SF01_DIR)
    rows = top.collect()
    assert len(rows) == advanced.PQ_TOPK
    assert plans.broadcast_join_count(top) >= 3  # centroids, probes, codebook
    assert plans.sort_merge_join_count(top) == 0
