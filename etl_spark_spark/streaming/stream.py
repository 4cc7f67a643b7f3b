"""Structured Streaming ingestion path.

Batch and stream share the same transformations; this module wires the
streaming side: file-source ``readStream`` over the same parquet layout
the batch engine reads, watermarked event-time windows for late data,
and an ``availableNow`` runner that drains everything currently
available and stops (the incremental-batch pattern that replaces the
reference's daily-file enumeration + cron, SURVEY.md §2.9/§7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # nanos-as-long (see sources)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """Streaming read of the events feed (explicit schema — required by
    file streams — with the nanosecond ts rebuilt as a timestamp).
    ``path`` must be a directory (file-source contract); use ``glob``
    to select one table out of a multi-table directory.
    ``max_files_per_trigger`` bounds micro-batch size (and is how tests
    force multi-batch runs to exercise watermark advancement)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", str(max_files_per_trigger)
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.parquet(path)
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def stream_events_tumbling(
    spark: SparkSession,
    path: str,
    duration: str = "1 hour",
    watermark: str = "2 hours",
    glob: str | None = None,
) -> DataFrame:
    """Watermarked tumbling count/sum per event_type over a stream of
    the events feed. Late rows beyond the watermark are dropped;
    state is bounded by watermark horizon × window count."""
    events = read_events_stream(spark, path, glob=glob)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def write_stream_files(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str | None = None,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    query_name: str = "file_sink",
    timeout_sec: int = 120,
) -> None:
    """Production file sink with managed checkpointing: exactly-once
    parquet/orc output under ``path``.

    The checkpoint (source offsets + commit log) defaults to
    ``<path>/_checkpoint`` — underscore-prefixed, so batch readers of
    ``path`` ignore it and the sink is fully self-contained; pass
    ``checkpoint_dir`` to relocate it (e.g. onto faster storage).
    Restarting with the same checkpoint RESUMES after the last
    committed batch: input processed by a previous run is never
    re-emitted, and the sink's ``_spark_metadata`` commit log hides
    files from uncommitted batches, so readers can't observe a torn
    write. File sinks are append-only (Spark contract): aggregations
    must be watermarked so closed windows append.

    availableNow trigger — drain everything currently available and
    stop — which makes this the incremental-batch writer: schedule the
    call (cron/Airflow), and each run picks up exactly the new files.
    """
    writer = (
        stream_df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir or f"{path}/_checkpoint")
        .outputMode("append")
        .queryName(query_name)
        .trigger(availableNow=True)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    q = writer.start()
    try:
        if not q.awaitTermination(timeout_sec):
            raise TimeoutError(
                f"stream '{query_name}' did not drain within {timeout_sec}s"
            )
    finally:
        q.stop()


def run_available_now(
    stream_df: DataFrame,
    query_name: str = "drain",
    output_mode: str = "complete",
) -> list:
    """Drain the stream with trigger(availableNow) into an in-memory
    table and return the rows — the batch-parity runner used by tests.
    ``output_mode``: complete for full aggregations, update for
    stateful operators, append for watermarked emissions."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(120)
        if not finished:
            raise TimeoutError(
                f"stream '{query_name}' did not drain within 120s — "
                "refusing to return a partial snapshot"
            )
        spark = stream_df.sparkSession
        return spark.table(query_name).collect()
    finally:
        q.stop()
