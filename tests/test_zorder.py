"""Z-order clustered rewrite: verify the layout actually enables
multi-dimensional file skipping (sources/maintenance.zorder_rewrite)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from pyspark_data_processing_challenge_spark.sources import maintenance as mnt
from tests.conftest import SF_DIR


def _file_boxes(spark, path, col1, col2):
    boxes = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        r = (
            spark.read.parquet(f)
            .agg(
                F.min(col1), F.max(col1), F.min(col2), F.max(col2), F.count("*")
            )
            .first()
        )
        boxes.append((r[0], r[1], r[2], r[3], r[4]))
    return boxes


def _sum_area(boxes):
    return sum((a2 - a1 + 1) * (b2 - b1 + 1) for a1, a2, b1, b2, _ in boxes)


def test_zorder_rewrite_shrinks_bounding_boxes(spark, tmp_path):
    src = f"{SF_DIR}/orders.parquet"
    # stage orders with an integer day column (z-order needs numerics)
    staged = str(tmp_path / "staged")
    (
        spark.read.parquet(src)
        .withColumn(
            "day_num",
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1990-01-01").cast("date")
            ),
        )
        .write.parquet(staged)
    )

    plain = str(tmp_path / "plain")
    # baseline: same file count, no clustering (round-robin repartition)
    spark.read.parquet(staged).repartition(8).write.parquet(plain)
    zed = str(tmp_path / "zed")
    mnt.zorder_rewrite(spark, staged, zed, "o_custkey", "day_num", num_files=8)

    # identical content
    n_src = spark.read.parquet(staged).count()
    assert spark.read.parquet(zed).count() == n_src
    assert (
        spark.read.parquet(zed)
        .exceptAll(spark.read.parquet(staged))
        .count()
        == 0
    )

    boxes_plain = _file_boxes(spark, plain, "o_custkey", "day_num")
    boxes_z = _file_boxes(spark, zed, "o_custkey", "day_num")
    assert len(boxes_z) >= 4  # range partitioner actually split the data
    # every unclustered file spans ~the whole (custkey, day) rectangle;
    # z-ordered files must cover far less combined area
    assert _sum_area(boxes_z) < 0.5 * _sum_area(boxes_plain)

    # a point-ish query box should intersect only a minority of files
    r = (
        spark.read.parquet(staged)
        .agg(
            F.min("o_custkey"), F.max("o_custkey"),
            F.min("day_num"), F.max("day_num"),
        )
        .first()
    )
    qc_hi = r[0] + (r[1] - r[0]) // 4
    qd_hi = r[2] + (r[3] - r[2]) // 4

    def hits(boxes):
        return sum(
            1
            for a1, a2, b1, b2, _ in boxes
            if a1 <= qc_hi and b1 <= qd_hi  # box intersects the corner query
        )

    assert hits(boxes_z) < len(boxes_z)
    assert hits(boxes_z) <= hits(boxes_plain)


def test_hilbert_is_bijective_and_fully_local(spark):
    # every consecutive pair of Hilbert indices is GRID-ADJACENT (the
    # locality property Morton lacks — its worst-case jumps span rows)
    import itertools

    from pyspark.sql import functions as SF

    rows = [(x, y) for x, y in itertools.product(range(16), repeat=2)]
    df = spark.createDataFrame(rows, ["x", "y"])
    hil = {
        r.h: (r.x, r.y)
        for r in mnt.hilbert_index(df, "x", "y", bits=4, out_col="h").collect()
    }
    assert sorted(hil) == list(range(256))  # bijection
    assert all(
        abs(hil[i][0] - hil[i + 1][0]) + abs(hil[i][1] - hil[i + 1][1]) == 1
        for i in range(255)
    )
    mor = {
        r.z: (r.x, r.y)
        for r in df.select(
            "x", "y", mnt.interleave_bits(SF.col("x"), SF.col("y"), 4).alias("z")
        ).collect()
    }
    worst_morton = max(
        abs(mor[i][0] - mor[i + 1][0]) + abs(mor[i][1] - mor[i + 1][1])
        for i in range(255)
    )
    assert worst_morton > 1  # Morton jumps; Hilbert never does


def test_hilbert_rewrite_shrinks_boxes_too(spark, tmp_path):
    staged = str(tmp_path / "hstaged")
    (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .withColumn(
            "day_num",
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1990-01-01").cast("date")
            ),
        )
        .write.parquet(staged)
    )
    plain = str(tmp_path / "hplain")
    spark.read.parquet(staged).repartition(8).write.parquet(plain)
    hil = str(tmp_path / "hil")
    mnt.zorder_rewrite(
        spark, staged, hil, "o_custkey", "day_num", num_files=8,
        curve="hilbert",
    )
    assert spark.read.parquet(hil).count() == spark.read.parquet(staged).count()
    boxes_h = _file_boxes(spark, hil, "o_custkey", "day_num")
    boxes_plain = _file_boxes(spark, plain, "o_custkey", "day_num")
    assert len(boxes_h) >= 4
    assert _sum_area(boxes_h) < 0.5 * _sum_area(boxes_plain)
