"""Golden end-to-end test (SURVEY.md §5.2.2): run the full pipeline on
the reference's own raw CSV with the reference's own config.yaml
(read-only at /root/reference) and assert row-for-row equality with its
committed PROD output parquet — 129 rows, 6 partitions, written by the
reference itself (reference: data/processed/PROD)."""

from __future__ import annotations

import os

import pytest

from pyspark_data_processing_challenge_spark import pipeline

REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_golden_parity_with_reference_output(spark, tmp_path):
    conf = pipeline.load_config(f"{REF}/config.yaml")
    result = pipeline.run(
        spark,
        conf,
        base_dir=REF,
        output_path=str(tmp_path / "out"),
        write=True,
        reference_semantics=True,
    )
    assert result.metrics.get("rows_after_filters") == 129

    golden = spark.read.parquet(f"{REF}/data/processed/PROD")
    mine = spark.read.parquet(str(tmp_path / "out"))

    assert sorted(mine.columns) == sorted(golden.columns)
    cols = sorted(golden.columns)

    def rows(df):
        return sorted(
            (tuple(str(r[c]) for c in cols) for r in df.collect())
        )

    g, m = rows(golden), rows(mine)
    assert len(m) == len(g) == 129
    assert m == g
