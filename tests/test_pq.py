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


def test_kmeanspp_seeds_beat_convention_after_one_lloyd_step(spark):
    """VERDICT r09 item 6: k-means++ (maximin) seeding must improve the
    spherical-k-means objective (mean cosine to the assigned centroid)
    over the convention first-k-ids codebook, measured after ONE Lloyd
    step from each init — the pq_lloyd_step precedent. Deterministic
    data + deterministic seeding → a pinned relation, not a flaky
    statistical bet (measured 0.2480 vs 0.2427 at sf0.001, 0.2449 vs
    0.2417 at sf0.01)."""
    from pyspark_data_processing_challenge_spark.functions import vectors
    from pyspark_data_processing_challenge_spark.operators import similarity
    from pyspark_data_processing_challenge_spark.queries._util import spread, t
    from tests.conftest import SF_DIR

    emb = spread(t(spark, SF_DIR, "embeddings"))

    def one_step_objective(cent):
        a = similarity.ivf_assign(
            emb, cent, centroid_id="cid", centroid_vec="cv"
        )
        means = (
            a.select("centroid_id", F.posexplode("vec").alias("dim", "v"))
            .groupBy("centroid_id", "dim")
            .agg(F.avg("v").alias("c"))
        )
        cent2 = (
            means.groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "c"))),
                    lambda x: x["c"],
                ).alias("cv")
            )
            .select(F.col("centroid_id").alias("cid"), "cv")
        )
        a2 = similarity.ivf_assign(
            emb, cent2, centroid_id="cid", centroid_vec="cv"
        )
        j = a2.join(cent2, a2.centroid_id == cent2.cid).select(
            vectors.cosine(F.col("vec"), F.col("cv")).alias("cos")
        )
        return j.agg(F.avg("cos")).collect()[0][0]

    seeds = similarity.kmeanspp_seed(emb, k=8, n_candidates=64, salt="kmpp")
    pp = seeds.select(F.col("id").alias("cid"), F.col("vec").alias("cv"))
    conv = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    assert one_step_objective(pp) >= one_step_objective(conv)


def test_kmeanspp_seed_determinism_and_shape(spark):
    from pyspark_data_processing_challenge_spark.operators import similarity
    from pyspark_data_processing_challenge_spark.queries._util import t
    from tests.conftest import SF_DIR

    emb = t(spark, SF_DIR, "embeddings")
    a = similarity.kmeanspp_seed(emb, k=5, n_candidates=32, salt="x").collect()
    b = similarity.kmeanspp_seed(emb, k=5, n_candidates=32, salt="x").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert [r["seed_rank"] for r in a] == [1, 2, 3, 4, 5]
    assert len({r["id"] for r in a}) == 5
    assert a[0]["min_dist2"] == 0.0
    # maximin distances are non-increasing in rank
    ds = [r["min_dist2"] for r in a[1:]]
    assert all(x >= y for x, y in zip(ds, ds[1:]))
