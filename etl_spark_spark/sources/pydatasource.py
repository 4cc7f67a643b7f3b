"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API).

The engine's extension point for systems Spark has no built-in
connector for (REST APIs, internal services, bespoke formats): a pure-
Python reader that still scales, because work is split into
``InputPartition``s the scheduler fans out across executors — each
partition generates (or would fetch) only its own slice, so a
1000-executor cluster reads 1000 slices concurrently. Arrow-batched
hand-off applies when the reader yields pyarrow record batches; this
reference implementation yields tuples (fine for its test-scale use).

``SynthDocsDataSource`` is the deterministic instance: a synthetic
corpus whose values are pure integer arithmetic on the row id, so an
oracle can regenerate the identical table with SQL ``range()`` — the
correctness gate covers the full read path (partition planning,
per-partition generation, schema projection) bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# deliberately plain integer arithmetic (Knuth multiplicative constant)
# — mirrored verbatim by the SQL oracle; NOT a quality hash
_MULT = 2654435761
_MOD = 997


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SynthDocsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.parts = int(options.get("parts", 4))

    def partitions(self):
        per = (self.rows + self.parts - 1) // self.parts
        return [
            _Slice(i * per, min((i + 1) * per, self.rows))
            for i in range(self.parts)
            if i * per < self.rows
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield (i, f"s{i % 5}", (i * _MULT) % _MOD)


class SynthDocsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthdocs"

    def schema(self):
        return "doc_id bigint, source string, n_chars bigint"

    def reader(self, schema):
        return SynthDocsReader(self.options)


def register_synthdocs(spark) -> None:
    """Idempotent registration of the synthdocs format."""
    spark.dataSource.register(SynthDocsDataSource)
