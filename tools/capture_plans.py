"""Capture .explain('formatted') for catalog queries into plans/r17/.

Usage:
    python tools/capture_plans.py <suffix> <query> [<query> ...]

Writes plans/r17/<query>_<suffix>.txt for each named query, using the
sf0.1 test data (plan shape is SF-independent; the driver cannot run
Spark and audits these files against the code).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark_data_processing_challenge_spark.session import get_session  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(__file__), "..", "plans", "r17")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session("capture-plans")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
