"""File-level statistics index + manifest-style file skipping.

What Delta/Iceberg manifests buy — "don't even open files whose
min/max can't match the predicate" — reconstructed for plain parquet
directories. Two pieces:

- :func:`build_stats_index` computes one row PER FILE (path, row
  count, per-column min/max) in a single scan keyed by
  ``input_file_name()`` — the aggregate output is proportional to the
  file count, not the row count, so the index for a 100 TB table with
  100k files is 100k tiny rows.
- :func:`pruned_parquet_read` consults the index and reads ONLY the
  files whose [min, max] range overlaps the requested interval. The
  surviving file list is collected to the driver — bounded by file
  count (the same list Spark's own FileIndex holds), never by data.

Works best on range-sorted / Hive-partitioned layouts (see
``sinks.write.write_range_sorted``): sorted layout → disjoint per-file
ranges → most files skipped. On a randomly-laid-out table every file
overlaps and pruning honestly degrades to a full read (correct, just
not faster) — same behavior as any min/max zone map.

The caller must still apply the residual row-level filter; file
skipping is a superset guarantee (every matching row lives in a kept
file), exactly like parquet row-group stats one level up.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_stats_index(
    spark: SparkSession, path: str, columns: Sequence[str]
) -> DataFrame:
    """One row per physical file: (file, n_rows, min_<c>, max_<c>...)."""
    df = spark.read.parquet(path)
    return df.groupBy(F.input_file_name().alias("file")).agg(
        F.count("*").alias("n_rows"),
        *[F.min(c).alias(f"min_{c}") for c in columns],
        *[F.max(c).alias(f"max_{c}") for c in columns],
    )


def prune_files(index: DataFrame, column: str, lo, hi) -> list[str]:
    """File paths whose [min, max] overlaps [lo, hi] (NULL-stat files
    are conservatively kept)."""
    keep = index.filter(
        (F.col(f"max_{column}").isNull() | (F.col(f"max_{column}") >= lo))
        & (F.col(f"min_{column}").isNull() | (F.col(f"min_{column}") <= hi))
    )
    return [r["file"] for r in keep.select("file").collect()]


def pruned_parquet_read(
    spark: SparkSession,
    path: str,
    column: str,
    lo,
    hi,
    index: DataFrame | None = None,
) -> tuple[DataFrame, int, int]:
    """Read only the files that can contain ``column`` values in
    [lo, hi]. Returns (df, n_files_read, n_files_total).

    Pass a persisted ``index`` (from :func:`build_stats_index`, e.g.
    refreshed per ingestion batch) to skip the stats scan; without one
    the index is built on the fly, which still pays off when the same
    index serves many point/range reads.
    """
    idx = index if index is not None else build_stats_index(spark, path, [column])
    idx = idx.localCheckpoint()  # pin: prune + count read the same stats
    total = idx.count()
    files = prune_files(idx, column, lo, hi)
    if not files:
        empty = spark.read.parquet(path).limit(0)
        return empty, 0, total
    return spark.read.parquet(*files), len(files), total
