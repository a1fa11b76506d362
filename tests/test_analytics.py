"""Behavioral invariants for the round-6 analytics module — properties
the oracle hash can't state directly (coverage, stochasticity, mass
conservation)."""

from __future__ import annotations

from pyspark_data_processing_challenge_spark.queries import analytics
from pyspark_data_processing_challenge_spark.queries.analytics import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
)
from tests.conftest import SF_DIR


def test_rag_chunks_cover_every_token(spark):
    from pyspark.sql import functions as F

    from pyspark_data_processing_challenge_spark.functions import textfns

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", F.size(textfns.tokens(F.col("text"))).alias("n"))
        .toPandas()
        .set_index("doc_id")["n"]
    )
    chunks = analytics.docs_rag_chunks(spark, SF_DIR).toPandas()
    for doc_id, grp in chunks.groupby("doc_id"):
        n = int(docs[doc_id])
        ids = sorted(grp["chunk_id"])
        # chunk ids are dense from 0 with the documented count formula
        expected = (max(n - CHUNK_TOKENS, 0) + CHUNK_STRIDE - 1) // CHUNK_STRIDE + 1
        assert ids == list(range(expected))
        # stride coverage: last chunk reaches the final token; every
        # earlier chunk is full-width
        sizes = grp.sort_values("chunk_id")["n_tokens"].tolist()
        assert all(s == CHUNK_TOKENS for s in sizes[:-1])
        assert (expected - 1) * CHUNK_STRIDE + sizes[-1] == max(n, 0) or n <= CHUNK_TOKENS
        if n <= CHUNK_TOKENS:
            assert sizes == [n]


def test_transition_rows_are_stochastic(spark):
    rows = analytics.event_transitions(spark, SF_DIR).toPandas()
    for _, grp in rows.groupby("src_type"):
        assert abs(grp["p_transition"].sum() - 1.0) < 1e-4
        assert (grp["n_transitions"] > 0).all()


def test_pagerank_mass_is_conserved(spark):
    rows = analytics.nation_trade_pagerank(spark, SF_DIR).toPandas()
    # every trading nation keeps its mass: Σp = 0.15 + 0.85·S/N where S
    # is the number of nations with out-edges; with all N trading, Σp=1
    # per-row half-up rounding at 1e-6 can shift the N-row sum by N/2e6
    assert 0.15 - 1e-9 <= rows["pagerank"].sum() <= 1.0 + 1e-4
    assert (rows["pagerank"] > 0).all()
    assert len(rows) == rows["n_name"].nunique()


def test_zscore_flags_only_large_deviations(spark):
    rows = analytics.events_rolling_zscore(spark, SF_DIR).toPandas()
    flagged = rows[rows["is_anomaly"] == 1]
    assert (flagged["z_score"].abs() > 2).all()
    ok = rows[rows["z_score"].notna()]
    assert ((ok["z_score"].abs() > 2) == (ok["is_anomaly"] == 1)).all()


def test_cohort_week_zero_has_every_cohort_user(spark):
    import pandas as pd

    rows = analytics.cohort_retention(spark, SF_DIR).toPandas()
    # offset 0 exists for every cohort (the first-event week itself) and
    # is the retention maximum of the cohort's triangle row
    zero = rows[rows["week_offset"] == 0].set_index("cohort_week")["n_users"]
    maxes = rows.groupby("cohort_week")["n_users"].max()
    pd.testing.assert_series_equal(
        zero.sort_index(), maxes.sort_index(), check_names=False
    )


def test_rfm_scores_are_balanced_quintiles(spark):
    rows = analytics.rfm_segments(spark, SF_DIR).toPandas()
    n = len(rows)
    assert n == rows["o_custkey"].nunique()
    for col in ("r_score", "f_score", "m_score"):
        sizes = rows[col].value_counts()
        assert set(sizes.index) <= {1, 2, 3, 4, 5}
        # exact ntile: bucket sizes differ by at most one
        assert sizes.max() - sizes.min() <= 1
    assert (rows["segment"] == rows["r_score"].astype(str)
            + rows["f_score"].astype(str) + rows["m_score"].astype(str)).all()


def test_conversion_shares_sum_to_one(spark):
    rows = analytics.conversion_lag_histogram(spark, SF_DIR).toPandas()
    assert abs(rows["share"].sum() - 1.0) < 1e-4
    assert rows["n_purchases"].sum() > 0


def test_skew_profile_conserves_rows(spark):
    li_rows = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    rows = analytics.lineitem_skew_profile(spark, SF_DIR).toPandas()
    assert (rows["n_rows"] == li_rows).all()
    assert (rows["max_count"] <= rows["n_rows"]).all()
    assert (rows["skew_ratio"] >= 1.0).all()


def test_pair_affinity_is_upper_triangle(spark):
    rows = analytics.part_pair_affinity(spark, SF_DIR).toPandas()
    assert len(rows) <= analytics.AFFINITY_TOP
    assert (rows["part_a"] < rows["part_b"]).all()
    assert (rows["lift"] > 0).all()


def test_event_paths_share_and_shape(spark):
    rows = analytics.top_event_paths(spark, SF_DIR).toPandas()
    assert len(rows) <= analytics.PATHS_TOP
    assert (rows["path"].str.count(">") == 2).all()
    assert rows["share"].between(0, 1).all()


def test_benford_shares_are_a_distribution(spark):
    rows = analytics.benford_totalprice(spark, SF_DIR).toPandas()
    assert set(rows["digit"]) <= set(range(1, 10))
    assert abs(rows["observed_share"].sum() - 1.0) < 1e-4
    # expected shares are the Benford masses for the digits present
    import math

    for _, r in rows.iterrows():
        assert abs(r["expected_share"] - round(math.log10(1 + 1 / r["digit"]), 6) < 1e-9)


def test_mom_yoy_null_only_at_series_edges(spark):
    rows = analytics.revenue_mom_yoy(spark, SF_DIR).toPandas().sort_values("month")
    # first month has no prior month; first 12 have no prior year
    assert rows["mom_pct"].isna().sum() == 1
    assert rows["yoy_pct"].isna().sum() == 12


def test_surprisal_bounded_by_corpus_size(spark):
    import math

    from pyspark_data_processing_challenge_spark.queries import llm

    rows = llm.docs_unigram_surprisal(spark, SF_DIR).toPandas()
    n_total = rows["n_tokens"].sum()
    got = rows[rows["n_tokens"] > 0]
    # p(token) >= 1/N so surprisal <= log2(N); empty docs carry null
    assert (got["avg_surprisal_bits"] <= math.log2(n_total) + 1e-9).all()
    assert (got["avg_surprisal_bits"] > 0).all()
    assert rows[rows["n_tokens"] == 0]["avg_surprisal_bits"].isna().all()


def test_cluster_split_kills_near_dup_leakage(spark):
    """The dedup-aware split assigner's contract (VERDICT r12 #2):
    cluster-keyed splits make cross-split near-dup pairs IMPOSSIBLE
    (same component -> same split) and drop gram leakage to the
    sub-threshold boilerplate floor, while the doc-hash scheme leaks
    most planted-copy grams. Assignment itself must keep every
    cluster in exactly one split."""
    from pyspark_data_processing_challenge_spark.queries import llm

    rows = llm.split_cluster_leakage_eval(spark, SF_DIR).toPandas()
    byscheme = rows.set_index(["scheme", "split"])
    for split in ("val", "test"):
        assert byscheme.loc[("cluster", split), "n_train_cross_pairs"] == 0
        assert byscheme.loc[("doc_hash", split), "n_train_cross_pairs"] > 0
        assert (
            byscheme.loc[("cluster", split), "gram_leak_rate"]
            < 0.1 * byscheme.loc[("doc_hash", split), "gram_leak_rate"]
        )
    assigned = llm.split_cluster_assign(spark, SF_DIR).toPandas()
    n_splits_per_cluster = assigned.groupby("cluster")["split"].nunique()
    assert (n_splits_per_cluster == 1).all()
    # ratios stay roughly 80/10/10 in expectation over clusters
    frac_train = (assigned["split"] == "train").mean()
    assert 0.6 < frac_train < 0.95


def test_oov_report_shape(spark):
    from pyspark_data_processing_challenge_spark.queries import llm

    rows = llm.split_oov_rate(spark, SF_DIR).toPandas()
    assert set(rows["split"]) <= {"val", "test"}
    assert (rows["n_oov"] <= rows["n_tokens"]).all()
    assert (rows["n_oov_types"] <= rows["n_types"]).all()
    assert rows["oov_rate"].between(0, 1).all()


def test_incremental_cluster_split_equals_full(spark):
    """The ingest path (banded-store probe + spanning-forest CC fold)
    must reproduce split_cluster_assign ROW-FOR-ROW — same clusters,
    same splits — the incremental-family exactness contract."""
    from pyspark_data_processing_challenge_spark.queries import llm

    full = {
        (r.doc_id, r.cluster, r.split)
        for r in llm.split_cluster_assign(spark, SF_DIR).collect()
    }
    inc = {
        (r.doc_id, r.cluster, r.split)
        for r in llm.split_cluster_assign_incremental(
            spark, SF_DIR
        ).collect()
    }
    assert inc == full


def test_split_balance_report_is_a_distribution(spark):
    from pyspark_data_processing_challenge_spark.queries import llm

    rows = llm.split_balance_report(spark, SF_DIR).toPandas()
    assert set(rows["split"]) == {"train", "val", "test"}
    assert abs(rows["share"].sum() - 1.0) < 1e-4
    assert (rows["n_clusters"] <= rows["n_docs"]).all()
    # block-moves widen deviation vs iid, but it must stay sane
    assert (rows["abs_dev"] < 0.15).all()
    assert abs(rows["target_share"].sum() - 1.0) < 1e-9


def test_softdedup_weights_conserve_cluster_mass(spark):
    """SoftDeDup's invariant: every near-dup cluster contributes ONE
    document's worth of sampling mass (sum of weights per cluster = 1
    up to the 6-digit output rounding), singletons keep weight 1, and
    Σ eff_tokens equals the duplicate-discounted token budget."""
    from pyspark_data_processing_challenge_spark.queries import llm

    rows = llm.docs_softdedup_weights(spark, SF_DIR).toPandas()
    per = rows.groupby("cluster").agg(
        wsum=("weight", "sum"), n=("doc_id", "size"), size=("cluster_size", "max")
    )
    assert (per["n"] == per["size"]).all()
    assert (per["wsum"] - 1.0).abs().max() < 1e-4
    singles = rows[rows["cluster_size"] == 1]
    assert (singles["weight"] == 1.0).all()
    assert (singles["eff_tokens"] == singles["n_tokens"]).all()
    # the doubled corpus: planted copies guarantee multi-doc clusters
    assert (rows["cluster_size"] >= 2).any()
    eff = (rows["n_tokens"] / rows["cluster_size"]).sum()
    assert abs(rows["eff_tokens"].sum() - eff) < 1e-3


def test_embedding_decontaminate_partition_contract(spark):
    """The gate's structural contract: benchmark vectors never appear
    as corpus rows, every corpus vector reports exactly one nearest
    benchmark item, and cosines are bounded."""
    from pyspark_data_processing_challenge_spark.queries import llm

    rows = llm.embedding_decontaminate(spark, SF_DIR).toPandas()
    assert (rows["vec_id"] >= llm.SEMDECON_NBENCH).all()
    assert (rows["bench_id"] < llm.SEMDECON_NBENCH).all()
    assert rows["vec_id"].is_unique
    assert rows["max_cos"].between(-1.000001, 1.000001).all()
    flagged = rows[rows["contaminated"]]
    assert (flagged["max_cos"] >= llm.SEMDECON_THRESHOLD - 1e-6).all()
    clean = rows[~rows["contaminated"]]
    assert (clean["max_cos"] < llm.SEMDECON_THRESHOLD + 1e-6).all()


def test_link_prediction_predicts_only_absent_edges(spark):
    """Link-prediction invariants: predicted pairs are NOT existing
    edges, keys are ordered, support >= AA_MIN_COMMON, the list is the
    deterministic top-AA_TOPN by (aa desc, keys), and per pair
    AA >= RA > 0 (1/log2(d) >= 1/d for every apex degree d >= 2)."""
    edges = {
        (r.u, r.v)
        for r in analytics._copurchase_edges(
            spark, SF_DIR, support=2
        ).collect()
    }
    rows = analytics.copurchase_link_prediction(spark, SF_DIR).toPandas()
    assert len(rows) <= analytics.AA_TOPN
    assert (rows["part_a"] < rows["part_b"]).all()
    assert (rows["n_common"] >= analytics.AA_MIN_COMMON).all()
    for r in rows.itertuples():
        assert (r.part_a, r.part_b) not in edges
        assert r.aa_score >= r.ra_score > 0
    # deterministic ordering as emitted
    key = list(
        zip(-rows["aa_score"], rows["part_a"], rows["part_b"])
    )
    assert key == sorted(key)


def test_tombstone_compact_accounting(spark):
    """Delete-lifecycle invariants: posting mass is conserved
    (n_after = n_before - n_tombstoned exactly on compacted lists,
    n_before otherwise; pending tombstones only on uncompacted lists),
    and the synthetic delete rate yields BOTH compacted and
    tombstone-carrying lists so the scheduler table is non-vacuous."""
    from pyspark_data_processing_challenge_spark.queries import extended

    rows = extended.ivf_tombstone_compact(spark, SF_DIR).toPandas()
    assert len(rows) == extended.IVF_NCENTROIDS
    comp = rows[rows["compacted"]]
    keep = rows[~rows["compacted"]]
    assert len(comp) > 0 and len(keep) > 0
    assert (comp["n_after"] == comp["n_before"] - comp["n_tombstoned"]).all()
    assert (comp["n_pending"] == 0).all()
    assert (keep["n_after"] == keep["n_before"]).all()
    assert (keep["n_pending"] == keep["n_tombstoned"]).all()
    assert (
        rows["frac_deleted"] >= extended.TS_COMPACT_FRAC - 1e-9
    ).eq(rows["compacted"]).all()


def test_tombstone_probe_masks_deletes(spark):
    """Serving under deletes: the unmasked probe WOULD have returned
    stale (tombstoned) results for at least one query — the eval's
    reason to exist — and the masked probe's recall is measured against
    exact brute force over the surviving corpus only."""
    from pyspark_data_processing_challenge_spark.queries import extended

    rows = extended.ivf_tombstone_probe_eval(spark, SF_DIR).toPandas()
    assert len(rows) == extended.IVF_QUERY_HI - extended.IVF_QUERY_LO
    assert rows["n_stale"].sum() > 0
    assert (rows["n_stale"] <= extended.IVF_K).all()
    assert (rows["n_hit"] <= extended.IVF_K).all()
    assert rows["recall"].between(0, 1).all()


def test_dp_release_mechanism_properties(spark):
    """Laplace-release invariants: released values are non-negative,
    noise actually perturbs at the b = 1/epsilon scale (the trailing-
    salt correlation bug produced ~1e-6 noise — pin against it), the
    mechanism is deterministic across runs, and no released value
    leaks the true count exactly."""
    from pyspark_data_processing_challenge_spark.queries import extra

    rows = extra.customers_dp_release(spark, SF_DIR).toPandas()
    assert (rows["n_released"] >= 0).all()
    assert (rows["epsilon"] == extra.DP_EPS).all()
    # scale sanity: mean |noise| of Laplace(b) is b; with 5 draws allow
    # a wide band but far above the correlated-hash failure mode
    assert rows["noise"].abs().max() > 0.1
    assert rows["noise"].abs().max() < 40 * extra.DP_B
    assert (rows["noise"] != 0).all()
    again = extra.customers_dp_release(spark, SF_DIR).toPandas()
    assert rows.sort_values("c_mktsegment")["n_released"].tolist() == \
        again.sort_values("c_mktsegment")["n_released"].tolist()
