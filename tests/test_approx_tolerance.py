"""Tolerance checks for the approximate aggregates: the raw sketch
estimates (no bit-exact cross-engine oracle exists for sketches) and
the catalog query's tolerance-contract booleans."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_data_processing_challenge_spark.queries.extended import (
    approx_distinct_detail,
    approx_distinct_stats,
)
from tests.conftest import SF01_DIR


def test_approx_within_tolerance(spark):
    got = {
        r["l_returnflag"]: r for r in approx_distinct_detail(spark, SF01_DIR).collect()
    }
    li = spark.read.parquet(f"{SF01_DIR}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.percentile("l_extendedprice", 0.5).alias("median"),
        )
        .collect()
    }
    for flag, e in exact.items():
        g = got[flag]
        assert g["n_parts"] == e["parts"]
        assert abs(g["exact_median_price"] - e["median"]) < 1e-9
        # HLL++ default rsd = 5%
        assert abs(g["approx_parts"] - e["parts"]) <= 0.1 * e["parts"]
        # percentile_approx default accuracy: generous 5% relative bound
        assert abs(g["approx_median_price"] - e["median"]) <= 0.05 * e["median"]


def test_approx_contract_booleans_true(spark):
    rows = approx_distinct_stats(spark, SF01_DIR).collect()
    assert rows
    assert all(r["approx_parts_ok"] and r["approx_median_ok"] for r in rows)


def test_histogram_quantile_within_one_bin(spark):
    """The histogram sketch's estimate (upper edge of the bin where the
    cumulative count reaches ceil(q*n)) must land within one bin width
    of the true order statistic, and the merge contract must hold."""
    from pyspark_data_processing_challenge_spark.queries.advanced import (
        HQ_BINS,
        histogram_quantile_sketch,
    )
    from pyspark_data_processing_challenge_spark.queries._util import t

    rows = histogram_quantile_sketch(spark, SF01_DIR).collect()
    assert {r["q"] for r in rows} == {0.5, 0.9, 0.99}
    assert all(r["merge_lossless"] for r in rows)
    e = t(spark, SF01_DIR, "events")
    stats = e.agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        *[
            F.percentile("value", q).alias(f"p{int(q * 100)}")
            for q in (0.5, 0.9, 0.99)
        ],
    ).first()
    width = (stats["hi"] - stats["lo"]) / HQ_BINS
    for r in rows:
        exact = stats[f"p{int(r['q'] * 100)}"]
        assert abs(r["est"] - exact) <= width + 1e-9, (r["q"], r["est"], exact)


def test_random_projection_recall(spark):
    """JL projection to 16 dims must preserve the planted near-dup
    structure perfectly: every base vector's projected nearest
    neighbor is its own 1/1024-nudged copy. (Plain top-k recall is
    meaningless on this isotropic corpus — distances concentrate — so
    the planted-pair contract is the honest JL test.)"""
    from pyspark_data_processing_challenge_spark.queries.llm import (
        embedding_random_projection,
    )

    row = embedding_random_projection(spark, SF01_DIR).collect()[0]
    assert row["n_queries"] == 200
    assert row["n_copy_is_nn"] == 200
    assert row["recall_at_1"] == 1.0


def test_hashed_embedding_gate_discriminates(spark):
    """The planted-cosine gate must SEPARATE planted near-dup pairs
    from the unrelated-pair negative control — this is the regression
    net for sign-matrix rank collapse (a parity-separable mix makes
    every embedding collinear: every cosine is ±1, the positive half
    passes vacuously, and ~half the CONTROL pairs land at exactly
    +1.0). Measured at sf0.01 after the r11 fix: 499/500 positives
    >= 0.8 vs 92/499 controls — wide margins on both bounds."""
    from pyspark_data_processing_challenge_spark.queries.llm import (
        hashed_embedding_planted_cosine,
    )

    row = hashed_embedding_planted_cosine(spark, SF01_DIR).collect()[0]
    assert row["n_pairs"] > 0 and row["n_neg_pairs"] > 0
    pos_rate = row["n_above"] / row["n_pairs"]
    neg_rate = row["n_neg_above"] / row["n_neg_pairs"]
    assert pos_rate >= 0.95, (row["n_above"], row["n_pairs"])
    assert neg_rate <= 0.35, (row["n_neg_above"], row["n_neg_pairs"])
    # collapse signature: min positive cosine pinned at exactly 1.0
    assert row["min_cosine"] < 1.0
