"""Table maintenance: small-file compaction + sorted rewrite.

The 100 TB failure mode these address: streaming sinks and
per-partition appends leave thousands of KB-sized parquet files, and
every downstream scan then pays file-open + footer-read per file while
the scheduler drowns in splits. Compaction rewrites a directory into
size-targeted files; the optional range-sorted rewrite additionally
gives parquet row-group min/max stats that let scans skip files
entirely (poor-man's clustering — the same idea as Z-ordering on one
key prefix).
"""

from __future__ import annotations

import math
import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession


def input_file_stats(df: DataFrame) -> tuple[int, int]:
    """(n_files, total_bytes) of the files backing a file-scan frame.

    Sizes come from the local filesystem (``inputFiles`` returns URIs);
    on a real cluster swap the stat for the Hadoop FileSystem API — the
    compaction math is unchanged.
    """
    files = df.inputFiles()
    total = 0
    for uri in files:
        p = urlparse(uri)
        total += os.path.getsize(unquote(p.path))
    return len(files), total


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    *,
    target_file_mb: float = 256,
    sort_by: str | None = None,
) -> int:
    """Rewrite ``src_dir`` into ``dst_dir`` with files sized toward
    ``target_file_mb``; returns the output file count.

    File count is derived from the ACTUAL input bytes (not row counts —
    compression ratio is what matters). ``sort_by`` switches the
    repartition to a range partitioning plus a within-partition sort, so
    each output file covers a disjoint key range and carries tight
    min/max stats for scan pruning.
    """
    df = spark.read.parquet(src_dir)
    _, total_bytes = input_file_stats(df)
    n_out = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    if sort_by:
        out = df.repartitionByRange(n_out, sort_by).sortWithinPartitions(sort_by)
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(dst_dir)
    return n_out
