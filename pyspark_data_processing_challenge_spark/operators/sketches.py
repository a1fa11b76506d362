"""Count-min sketch building blocks shared by the batch query
(queries/advanced.cms_heavy_hitters) and the streaming ingest sink
(streaming/events.cms_ingest_sink).

The sketch is D hash rows x W buckets; cell (d, b) holds the summed
count of every key whose d-th hash lands in bucket b. Cells are
SUMS, so partial sketches (per partition, per day, per micro-batch)
merge by cell-wise addition — the property both consumers rely on.
Hashes are ``(a_d * char_hash(key) + b_d) mod p mod W`` from the
shared LCG coefficient family, so a SQL oracle reproduces the filter
bit-for-bit and char_hash folds once per DISTINCT key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import textfns

CMS_D, CMS_W = 4, 512  # depth (hash rows) x width (buckets per row)
CMS_SEED = 101


def cms_fan(df: DataFrame, keep: list[str]) -> DataFrame:
    """Explode each (key-hash ``h``, count ``cnt``) row into its D
    (d, bucket) cells, carrying ``keep`` columns through. One affine
    map per row per hash — char_hash was already staged upstream."""
    coeffs = textfns.minhash_coeffs(CMS_D, seed=CMS_SEED)
    p = textfns.MINHASH_P
    return df.select(
        *keep,
        "cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(di).alias("d"),
                        (
                            ((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(p))
                            % F.lit(CMS_W)
                        ).alias("bucket"),
                    )
                    for di, (a, b) in enumerate(coeffs)
                ]
            )
        ).alias("db"),
    ).select(
        *keep, "cnt", F.col("db.d").alias("d"), F.col("db.bucket").alias("bucket")
    )


def cms_cells(
    keyed_counts: DataFrame, *, key_col: str, count_col: str, keep: list[str] = []
) -> DataFrame:
    """(key, count) rows -> CMS cells (``keep`` + d, bucket, c).
    ``keyed_counts`` should already be aggregated per distinct key so
    the char_hash fold runs once per key."""
    hashed = keyed_counts.select(
        *keep,
        F.col(count_col).alias("cnt"),
        textfns.char_hash(F.col(key_col).cast("string")).alias("h"),
    )
    return (
        cms_fan(hashed, keep)
        .groupBy(*keep, "d", "bucket")
        .agg(F.sum("cnt").cast("long").alias("c"))
    )
