"""Unit tests for A-ES weighted sampling without replacement
(operators/selection.weighted_sample_without_replacement)."""

from __future__ import annotations

import math

from pyspark_data_processing_challenge_spark.functions.textfns import HASH_MOD
from pyspark_data_processing_challenge_spark.operators import selection


def _py_char_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % HASH_MOD
    return h


def _py_es_topk(rows, k, salt="wswr"):
    scored = []
    for key, w in rows:
        u = (_py_char_hash(f"{key}{salt}") + 1) / float(HASH_MOD + 1)
        scored.append((math.log(u) / w, -key))
    scored.sort(reverse=True)
    return {-neg for _, neg in scored[:k]}


def test_matches_reference_implementation(spark):
    rows = [(i, 10 + 7 * (i % 13)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, ["id", "w"])
    out = selection.weighted_sample_without_replacement(
        df, key_col="id", weight_col="w", k=15
    )
    got = {r.id for r in out.collect()}
    assert got == _py_es_topk(rows, 15)


def test_per_stratum_counts_and_determinism(spark):
    rows = [(i, i % 4, 1 + i % 9) for i in range(1, 201)]
    df = spark.createDataFrame(rows, ["id", "g", "w"])

    def run():
        out = selection.weighted_sample_without_replacement(
            df, key_col="id", weight_col="w", k=7, strata_cols=["g"]
        )
        return sorted((r.g, r.rk, r.id) for r in out.collect())

    first = run()
    assert first == run()  # rerun-stable
    per_g = {}
    for g, rk, _ in first:
        per_g.setdefault(g, []).append(rk)
    assert set(per_g) == {0, 1, 2, 3}
    assert all(sorted(v) == list(range(1, 8)) for v in per_g.values())


def test_zero_weight_rows_excluded(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 5), (4, 5)], ["id", "w"]
    )
    out = selection.weighted_sample_without_replacement(
        df, key_col="id", weight_col="w", k=10
    )
    assert {r.id for r in out.collect()} == {3, 4}


def test_weight_bias_statistical(spark):
    # one heavy item among light ones: across many salts the heavy item
    # must be sampled far more often than any individual light item
    rows = [(i, 1) for i in range(1, 50)] + [(99, 60)]
    df = spark.createDataFrame(rows, ["id", "w"])
    hits = 0
    for s in range(20):
        out = selection.weighted_sample_without_replacement(
            df, key_col="id", weight_col="w", k=1, salt=f"s{s}"
        )
        if out.collect()[0].id == 99:
            hits += 1
    # P(heavy wins a draw) = 60/109 ~ 0.55; 20 trials -> expect ~11.
    # A light item individually wins ~0.9% of trials.
    assert hits >= 5
