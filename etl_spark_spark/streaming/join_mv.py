"""Incremental JOIN-view maintenance (delta joins).

``streaming/mv.py`` keeps an ADDITIVE rollup fresh; this module keeps
an equi-JOIN view fresh — the other classic materialized view a
warehouse maintains incrementally instead of recomputing. Per
micro-batch with inserts ΔL and ΔR, the view grows by exactly

    ΔV = (ΔL ⋈ R_prev) ∪ (L_prev ⋈ ΔR) ∪ (ΔL ⋈ ΔR)

(the standard bilinear delta rule for insert-only streams — each new
pair of matching rows has its left part, its right part, or both in
this batch, and the three terms are disjoint by construction). The
full view is NEVER recomputed: per-batch work is two Δ⋈history joins
plus the tiny Δ⋈Δ.

Storage/exactly-once (the proven ``streaming/dedup.py`` pattern): all
three tables — accumulated left, accumulated right, and the view —
are APPEND-ONLY parquet partitioned by ``__batch_id`` written with
dynamic partition overwrite. A replayed batch reads history filtered
to STRICTLY earlier batch ids (reconstructing the exact pre-batch
state even if its own crashed-attempt partitions exist) and rewrites
its own partitions byte-identically. At-least-once delivery x
idempotent partition writes = effectively-once view contents, equal
to a batch join over everything delivered (pinned by test and by the
registry oracle).

At 100 TB: the Δ⋈history joins shuffle the HISTORY side each batch
unless the layout co-locates the key — write the accumulated sides
bucketed on the join key (``sinks.write`` bucketed tables) and the
per-batch cost drops to Δ-proportional shuffle + co-located probes;
the view itself is only ever appended one ΔV partition at a time.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _path_exists(spark: SparkSession, path: str) -> bool:
    """Filesystem-agnostic existence probe via the Hadoop FS API (works
    for local paths and any configured object-store scheme)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def _has_batch_partitions(spark: SparkSession, path: str) -> bool:
    """True iff the table directory contains at least one
    ``__batch_id=*`` partition — an EXPLICIT emptiness probe (listing,
    not exception-catching): a side whose every partition was evicted
    (temporal form) is legitimately empty history, while a torn footer
    inside an existing partition still propagates from the read."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    for st in fs.listStatus(hpath):
        if st.isDirectory() and st.getPath().getName().startswith(
            "__batch_id="
        ):
            return True
    return False


_COMPACT_MANIFEST = "_compact.json"


def _require_local_state(path: str, op: str) -> None:
    """The driver-side maintenance ops (manifest read-modify-replace,
    partition directory deletes) use local-filesystem APIs (os/open/
    shutil), while the data READ paths go through the Hadoop FS API and
    work on any configured scheme. On an object-store ``state_path``
    the maintenance ops would half-work — ``os.path.isdir`` is False
    for URIs, so compaction silently no-ops and manifests land in the
    wrong place (ADVICE r7). Refuse loudly instead: maintenance of a
    non-local state table needs these ops routed through the Hadoop FS
    API (or a table format's own maintenance), not a silent no-op."""
    from urllib.parse import urlparse

    if urlparse(path).scheme:
        raise ValueError(
            f"{op} uses local-filesystem maintenance APIs and requires "
            f"a bare local state_path; got {path!r}. For object-store "
            "state, run maintenance where the store is mounted locally "
            "or use a table-format-native maintenance op."
        )


def _compact_info(path: str) -> dict | None:
    """The table's compaction manifest ({staging, min_batch}) or None.
    Driver-side file next to the batch partitions; published with an
    atomic replace, so it either names a COMPLETE consolidated staging
    directory or does not exist."""
    import json
    import os

    p = f"{path}/{_COMPACT_MANIFEST}"
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _read_prior(
    spark: SparkSession, path: str, batch_id: int
) -> DataFrame | None:
    """History strictly BEFORE ``batch_id`` (replay-safe), or None ONLY
    if the table does not exist yet / holds no batch partitions (all
    evicted). A read failure on an EXISTING partition (torn footer
    from a crashed attempt, transient FS error) must propagate:
    silently treating it as empty history would drop the ΔL⋈R_prev /
    L_prev⋈ΔR delta terms and permanently corrupt the maintained view
    (ADVICE r6).

    Compaction-aware: when a ``_compact.json`` manifest exists, the
    pre-``min_batch`` history comes from the consolidated staging
    directory and only partitions >= min_batch are read from the
    batch layout — leftover un-deleted old partitions (a crash between
    manifest publish and cleanup) are invisible by the same filter.
    Replaying a batch BELOW the compaction fence raises: the caller
    promised those batches were checkpoint-committed when it
    compacted."""
    if not _path_exists(spark, path):
        return None
    info = _compact_info(path)
    parts = None
    if _has_batch_partitions(spark, path):
        parts = spark.read.parquet(path).withColumn(
            "__batch_id", F.col("__batch_id").cast("long")
        )
    if info is None:
        if parts is None:
            return None
        return parts.filter(
            F.col("__batch_id") < F.lit(batch_id)
        ).drop("__batch_id")
    if batch_id < info["min_batch"]:
        raise ValueError(
            f"batch {batch_id} replays below the compaction fence "
            f"{info['min_batch']} — compact only batches the stream "
            "checkpoint has committed"
        )
    comp = spark.read.parquet(f"{path}/{info['staging']}")
    if parts is not None:
        live = parts.filter(
            (F.col("__batch_id") >= F.lit(info["min_batch"]))
            & (F.col("__batch_id") < F.lit(batch_id))
        )
        comp = comp.filter(
            F.col("__batch_id") < F.lit(batch_id)
        ).unionByName(live)
    return comp.drop("__batch_id")


def compact_join_mv_history(
    spark: SparkSession,
    state_path: str,
    upto_batch_id: int,
    sides: Sequence[str] | None = None,
) -> dict[str, int]:
    """Consolidate every batch partition with ``__batch_id <
    upto_batch_id`` into ONE staging directory per table — the
    small-partitions maintenance op the append-only join-MV layout
    needs: a year of 15-minute micro-batches is ~35k directories per
    side, and every fold then pays listing + footer opens proportional
    to the stream's LIFETIME; after compaction it pays O(window).

    Crash-safe two-phase publish, per table:

    1. write the consolidated rows (history < upto, retagged
       ``__batch_id = upto_batch_id - 1`` as a data column) into a
       hidden ``.compact-{uuid}`` directory readers never list;
    2. atomically replace the ``_compact.json`` manifest to point at
       it ({staging, min_batch}); from that instant readers take
       pre-fence history from the staging dir and IGNORE partitions
       below the fence — so the cleanup (3: delete old partitions +
       superseded stagings) is lazy and idempotent, and a crash
       between any two steps leaves every reader consistent.

    READER CONTRACT: after a compaction, the pre-fence history lives
    ONLY in the hidden staging dir + manifest — consumers MUST read
    through :func:`read_join_view` / :func:`read_join_view_z` /
    ``_read_prior`` (all manifest-aware); a raw
    ``spark.read.parquet(path)`` silently loses the compacted history
    because Spark readers skip dot-directories.

    FENCE CONTRACT (same as temporal eviction): pass an
    ``upto_batch_id`` no greater than the stream checkpoint's lowest
    possibly-replayable batch; replaying below the fence raises in
    ``_read_prior`` instead of silently recomputing against
    post-compaction state. Rows are preserved verbatim (concat, no
    dedup), so the op is correct for the insert-only, Z-set, and
    temporal layouts alike — EXCEPT that for a TEMPORAL layout
    (``_ts_stats.json`` present) the accumulated left/right sides are
    skipped automatically when ``sides`` is left at its default: their
    partitions are subject to partition-level eviction, and
    consolidating them would make the rows unevictable (only the
    never-evicted view is compacted). EXPLICITLY passing a left/right
    side on a temporal layout raises instead of silently no-oping.
    Local-filesystem op: raises on an object-store ``state_path``.
    Returns {table: rows_consolidated}."""
    import json
    import os
    import shutil
    import uuid as _uuid

    _require_local_state(state_path, "compact_join_mv_history")
    # Temporal layout: eviction deletes whole __batch_id partitions,
    # but compaction retags pre-fence history into ONE staging dir —
    # compacted accumulated-side rows would become permanently
    # unevictable and the bounded-state guarantee would quietly stop
    # applying (ADVICE r7). When a _ts_stats manifest marks the layout
    # temporal, only the view (output, never evicted) is compacted.
    temporal = os.path.exists(_ts_stats_path(state_path))
    explicit = sides is not None
    if sides is None:
        sides = ("left", "right", "view")
    if explicit and temporal:
        # an explicitly-requested evictable side must not silently
        # no-op (same failure mode _require_local_state eliminates):
        # the caller asked for work this layout forbids — say so.
        blocked = [s for s in sides if s in ("left", "right")]
        if blocked:
            raise ValueError(
                f"sides {blocked} were explicitly requested but this is "
                "a temporal layout (_ts_stats.json present): the "
                "accumulated left/right sides are partition-evicted and "
                "compacting them would make their rows unevictable. "
                "Compact only 'view', or omit sides for the automatic "
                "skip."
            )
    out: dict[str, int] = {}
    for side in sides:
        if temporal and side in ("left", "right"):
            continue
        path = f"{state_path}/{side}"
        if not os.path.isdir(path):
            continue
        prior = _read_prior(spark, path, upto_batch_id)
        if prior is None:
            continue
        staged = prior.withColumn(
            "__batch_id", F.lit(upto_batch_id - 1).cast("long")
        )
        name = f".compact-{_uuid.uuid4().hex}"
        staged.write.mode("errorifexists").parquet(f"{path}/{name}")
        old = _compact_info(path)
        tmp = f"{path}/{_COMPACT_MANIFEST}.tmp"
        with open(tmp, "w") as f:
            json.dump({"staging": name, "min_batch": upto_batch_id}, f)
        os.replace(tmp, f"{path}/{_COMPACT_MANIFEST}")
        # lazy cleanup — readers already ignore everything below the
        # fence, so deletion order cannot be observed
        for entry in os.listdir(path):
            full = f"{path}/{entry}"
            if entry.startswith("__batch_id="):
                bid = int(entry.split("=", 1)[1])
                if bid < upto_batch_id:
                    shutil.rmtree(full, ignore_errors=True)
            elif entry.startswith(".compact-") and entry != name:
                shutil.rmtree(full, ignore_errors=True)
        out[side] = spark.read.parquet(f"{path}/{name}").count()
    return out


def _append_partition(df: DataFrame, batch_id: int, path: str) -> None:
    (
        df.withColumn("__batch_id", F.lit(batch_id).cast("long"))
        .write.mode("overwrite")
        .partitionBy("__batch_id")
        .parquet(path)
    )


def _concurrently(*thunks):
    """Overlap this fold's independent actions (round-13, guide §2.6;
    canonical helper: ``etl_spark_spark.concurrency.run_concurrently``).
    Each per-batch state write is its own scheduler job whose FIXED
    cost (~100-200 ms of AQE/stage bookkeeping at fixture scale;
    round-13 profile: join_mv_temporal ran 53 jobs carrying 1.0 s of
    task work under a 3.6 s wall) is paid serially when the driver
    calls actions one after another. The per-fold writes (left / right
    / view) and the two batch-input pins are mutually independent: the
    view delta reads only the CHECKPOINTED batch inputs plus history
    partitions STRICTLY BELOW this batch id — listed before any write
    starts, and excluded by the ``__batch_id < batch_id`` filter even
    if re-listed — so overlapping them costs max() instead of sum()
    and cannot change any row written."""
    from ..concurrency import run_concurrently

    return run_concurrently(*thunks)


def apply_join_batch(
    batch_left: DataFrame,
    batch_right: DataFrame,
    batch_id: int,
    on: Sequence[str],
    state_path: str,
) -> None:
    """Fold one micro-batch of inserts into the maintained join view.
    ``on`` is the equi-join key column list (USING semantics: key
    columns appear once in the view). Replay-idempotent: re-running a
    (batch_left, batch_right, batch_id) triple rewrites the same three
    partitions with the same content."""
    spark = batch_left.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    on = list(on)
    l_path = f"{state_path}/left"
    r_path = f"{state_path}/right"
    v_path = f"{state_path}/view"

    # pin the batch inputs: each side is referenced by two delta terms
    # and then appended — one materialization keeps them consistent
    # (the two pins and the three state writes below each run as
    # overlapped driver threads — see _concurrently)
    bl, br = _concurrently(
        batch_left.localCheckpoint, batch_right.localCheckpoint
    )

    l_prev = _read_prior(spark, l_path, batch_id)
    r_prev = _read_prior(spark, r_path, batch_id)

    dv = bl.join(br, on)
    if r_prev is not None:
        dv = dv.unionByName(bl.join(r_prev, on))
    if l_prev is not None:
        dv = dv.unionByName(l_prev.join(br, on))

    _concurrently(
        lambda: _append_partition(bl, batch_id, l_path),
        lambda: _append_partition(br, batch_id, r_path),
        lambda: _append_partition(dv, batch_id, v_path),
    )


def _read_all(spark: SparkSession, path: str) -> DataFrame:
    """Every row of a batch-partitioned state table, compaction-aware:
    manifest staging (pre-fence history) ∪ partitions at/after the
    fence."""
    info = _compact_info(path)
    parts = None
    if _has_batch_partitions(spark, path):
        parts = spark.read.parquet(path).withColumn(
            "__batch_id", F.col("__batch_id").cast("long")
        )
    if info is None:
        if parts is None:
            return spark.read.parquet(path)  # surface the real error
        return parts
    comp = spark.read.parquet(f"{path}/{info['staging']}")
    if parts is None:
        return comp
    return comp.unionByName(
        parts.filter(F.col("__batch_id") >= F.lit(info["min_batch"]))
    )


def read_join_view(spark: SparkSession, state_path: str) -> DataFrame:
    """The maintained view: every committed ΔV partition (plus the
    consolidated pre-fence history after a compaction)."""
    return _read_all(spark, f"{state_path}/view").drop("__batch_id")


def _bucket_manifest(location_root: str) -> str:
    return f"{location_root}/_bucket_meta.json"


def register_join_mv_tables(
    spark: SparkSession, location_root: str
) -> list[str]:
    """Re-register the bucketed side tables in a NEW session's catalog
    from the on-disk manifest ``_bucket_meta.json`` (written by
    :func:`apply_join_batch_bucketed` when given ``location_root``).

    This closes the shared-metastore gap: bucket metadata normally
    lives only in the session catalog that ran ``saveAsTable``, so a
    fresh session reading the same files would lose the bucketing and
    pay a full history shuffle per delta join. The manifest records
    (schema DDL, bucket columns, bucket count, location); registration
    is a ``CREATE TABLE ... USING parquet CLUSTERED BY ... INTO n
    BUCKETS LOCATION ...`` plus partition recovery — after it, the
    delta-join plan is exchange-free on the history side again
    (pinned by test). Idempotent: already-registered tables are
    skipped. Returns the tables it created."""
    import json

    with open(_bucket_manifest(location_root)) as f:
        meta = json.load(f)
    created: list[str] = []
    for tbl, info in meta["tables"].items():
        if spark.catalog.tableExists(tbl):
            continue
        cluster = ", ".join(f"`{c}`" for c in info["bucket_cols"])
        spark.sql(
            f"CREATE TABLE {tbl} ({info['schema_ddl']}) USING parquet "
            f"PARTITIONED BY (`__batch_id`) "
            f"CLUSTERED BY ({cluster}) INTO {info['num_buckets']} BUCKETS "
            f"LOCATION '{info['location']}'"
        )
        spark.catalog.recoverPartitions(tbl)
        created.append(tbl)
    return created


def apply_join_batch_bucketed(
    batch_left: DataFrame,
    batch_right: DataFrame,
    batch_id: int,
    on: Sequence[str],
    table_prefix: str,
    view_path: str,
    num_buckets: int = 32,
    location_root: str | None = None,
) -> None:
    """SCALE form of :func:`apply_join_batch`: the accumulated sides
    live as BUCKETED catalog tables (hash-bucketed on the join key,
    partitioned by ``__batch_id``), so the Δ⋈history joins read the
    history side WITHOUT an exchange — only the delta shuffles. The
    plain path-based form re-shuffles the whole accumulated side every
    batch (measured: 100x batch walls grew 9 → 21 s across six folds,
    BASELINE.md round-6); here per-batch shuffle cost is
    Δ-proportional, which is the property that makes daily maintenance
    of a year-deep join view viable at 100 TB.

    Same replay story: history reads filter to strictly-earlier batch
    partitions; a replayed batch dynamic-overwrites its own partitions
    in both side tables and the view. First batch creates the tables
    (``bucketBy`` needs ``saveAsTable`` — bucket metadata cannot live
    on bare paths, which is exactly why the plain form can't have this
    cost profile).

    With ``location_root`` the side tables are EXTERNAL (data under
    ``{location_root}/{table}``) and a ``_bucket_meta.json`` manifest
    is maintained next to them, so a NEW session — a restarted driver,
    another cluster — re-registers the bucketed sides with
    :func:`register_join_mv_tables` and keeps the exchange-free
    history plan. Without it, bucket metadata lives only in this
    session's catalog (the round-6 limitation this closes)."""
    spark = batch_left.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    on = list(on)
    bl, br = _concurrently(
        batch_left.localCheckpoint, batch_right.localCheckpoint
    )
    # NOTE: unlike the path-based forms, the three writes below stay
    # SEQUENTIAL — the two _accumulate calls mutate the shared session
    # catalog (saveAsTable / insertInto) and, with location_root, a
    # shared _bucket_meta.json via read-modify-replace; overlapping
    # them would race the manifest on the table-creation batch.

    def _record_manifest(batch: DataFrame, tbl: str) -> None:
        """Append this table to the location_root manifest so a fresh
        session can re-register the bucketed side (tiny driver-side
        JSON, rewritten atomically via os.replace)."""
        import json
        import os as _os

        # data columns' DDL; the partition column is declared last so
        # CREATE TABLE + recoverPartitions reproduce this exact layout
        ddl = batch._jdf.schema().toDDL() + ", `__batch_id` BIGINT"
        manifest = _bucket_manifest(location_root)
        meta = {"tables": {}}
        if _os.path.exists(manifest):
            with open(manifest) as f:
                meta = json.load(f)
        meta["tables"][tbl] = {
            "location": f"{location_root}/{tbl}",
            "bucket_cols": on,
            "num_buckets": num_buckets,
            "schema_ddl": ddl,
        }
        tmp = f"{manifest}.tmp{batch_id}"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        _os.replace(tmp, manifest)

    def _accumulate(batch: DataFrame, tbl: str) -> None:
        tagged = batch.withColumn(
            "__batch_id", F.lit(batch_id).cast("long")
        )
        if not spark.catalog.tableExists(tbl):
            writer = (
                tagged.write.format("parquet")
                .partitionBy("__batch_id")
                .bucketBy(num_buckets, *on)
                .mode("overwrite")
            )
            if location_root is not None:
                writer = writer.option("path", f"{location_root}/{tbl}")
            writer.saveAsTable(tbl)
            if location_root is not None:
                _record_manifest(batch, tbl)
        else:
            cols = spark.table(tbl).columns  # insertInto is positional
            tagged.select(*cols).write.insertInto(tbl, overwrite=True)

    def _prior(tbl: str) -> DataFrame | None:
        if not spark.catalog.tableExists(tbl):
            return None
        return (
            spark.table(tbl)
            .filter(F.col("__batch_id") < F.lit(batch_id))
            .drop("__batch_id")
        )

    l_tbl, r_tbl = f"{table_prefix}_left", f"{table_prefix}_right"
    l_prev, r_prev = _prior(l_tbl), _prior(r_tbl)

    dv = bl.join(br, on)
    if r_prev is not None:
        dv = dv.unionByName(bl.join(r_prev, on))
    if l_prev is not None:
        dv = dv.unionByName(l_prev.join(br, on))

    _accumulate(bl, l_tbl)
    _accumulate(br, r_tbl)
    _append_partition(dv, batch_id, view_path)


def apply_join_batch_temporal(
    batch_left: DataFrame,
    batch_right: DataFrame,
    batch_id: int,
    on: Sequence[str],
    ts_left: str,
    ts_right: str,
    band_seconds: int,
    state_path: str,
    delay_seconds: int = 0,
) -> None:
    """TEMPORAL (banded) join-view maintenance with BOUNDED state —
    the form an unbounded stream actually needs at 100 TB. Join
    condition: key equality AND ``|ts_left - ts_right| <=
    band_seconds`` (the stream-stream interval join: views⋈purchases
    within an hour, sensor⋈calibration within a day, ...).

    Why the band changes everything: with a pure equi join, EVERY
    historical row can match a future delta, so accumulated state must
    grow forever (the plain :func:`apply_join_batch` contract). With a
    band, a future row's event time is bounded below by the WATERMARK
    (max event time seen, minus ``delay_seconds`` of allowed
    lateness), so any history row older than ``watermark -
    band_seconds`` can never join again — it is EVICTABLE, and state
    size tracks the band + delay window, not the stream's lifetime.

    Mechanics (same replay-idempotent layout as the equi form —
    batch-id partitions, dynamic overwrite, strictly-earlier history
    reads):

    - each fold records its batch's max event ts in a tiny driver-side
      manifest (``_ts_stats.json``, atomically replaced) — one number
      per batch per side, the per-partition stat a table format would
      keep in its metadata;
    - history reads DO NOT re-filter by time (correctness never
      depends on eviction; a row evicted early would be a bug, a row
      evicted late is only storage);
    - :func:`evict_join_mv_state` deletes whole batch partitions whose
      manifest max ts is older than ``watermark - band - delay`` —
      partition-level deletes, no rewrite, no read amplification.
      Eviction is SAFE with respect to replay because Structured
      Streaming replays only the last uncommitted batch: every batch
      id <= the committed watermark is final, and a future batch's
      rows all carry ts >= watermark - delay (late rows beyond
      ``delay_seconds`` are the documented loss, exactly the
      watermark contract of a stateful stream-stream join). The
      replay-facing subtlety — the uncommitted batch must neither be
      considered for eviction NOR advance the eviction watermark — is
      enforced by ``committed_below`` (see evict_join_mv_state;
      ADVICE r7 fix, crash-replay pinned).

    Rows on either side with NULL event time are rejected (they could
    never be evicted and the band is undefined on them)."""
    spark = batch_left.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    on = list(on)
    if band_seconds < 0 or delay_seconds < 0:
        raise ValueError("band_seconds/delay_seconds must be >= 0")
    _require_local_state(state_path, "apply_join_batch_temporal")

    def _pin_and_stats(df: DataFrame, ts: str) -> tuple[DataFrame, int | None]:
        """Pin the batch and compute BOTH per-batch stats the fold
        needs — the NULL-event-time guard and the eviction manifest's
        max event time — in ONE aggregate over the pinned rows
        (round-13: previously a limit-probe job + a checkpoint job + a
        separate max-collect job per side; the fold family's wall is
        scheduler-job fixed cost, so every merged job counts)."""
        pinned = df.localCheckpoint()
        row = pinned.agg(
            F.max(F.col(ts).cast("long")).alias("m"),
            F.count(F.when(F.col(ts).isNull(), 1)).alias("n_null"),
        ).collect()[0]
        if row["n_null"]:
            raise ValueError(
                f"temporal join-MV rows must carry a non-null {ts!r} "
                "event time (NULL rows are never evictable)"
            )
        return pinned, (None if row["m"] is None else int(row["m"]))

    (bl, max_l), (br, max_r) = _concurrently(
        lambda: _pin_and_stats(batch_left, ts_left),
        lambda: _pin_and_stats(batch_right, ts_right),
    )
    l_path = f"{state_path}/left"
    r_path = f"{state_path}/right"
    v_path = f"{state_path}/view"
    l_prev = _read_prior(spark, l_path, batch_id)
    r_prev = _read_prior(spark, r_path, batch_id)

    band = F.abs(
        F.col(ts_left).cast("long") - F.col(ts_right).cast("long")
    ) <= F.lit(band_seconds)

    def _bjoin(a: DataFrame, b: DataFrame) -> DataFrame:
        return a.join(b, on).filter(band)

    dv = _bjoin(bl, br)
    if r_prev is not None:
        dv = dv.unionByName(_bjoin(bl, r_prev))
    if l_prev is not None:
        dv = dv.unionByName(_bjoin(l_prev, br))

    _concurrently(
        lambda: _append_partition(bl, batch_id, l_path),
        lambda: _append_partition(br, batch_id, r_path),
        lambda: _append_partition(dv, batch_id, v_path),
    )
    _record_ts_stats(
        state_path,
        batch_id,
        {"left": max_l, "right": max_r},
    )


def _ts_stats_path(state_path: str) -> str:
    return f"{state_path}/_ts_stats.json"


def _record_ts_stats(
    state_path: str, batch_id: int, maxima: dict[str, int | None]
) -> None:
    """Per-batch max event time, one tiny JSON atomically replaced —
    the partition-level stat eviction prunes on (a table format would
    keep this in its manifest; replay of a batch overwrites its own
    entry, matching the partition overwrite)."""
    import json
    import os

    p = _ts_stats_path(state_path)
    stats: dict = {"batches": {}}
    if os.path.exists(p):
        with open(p) as f:
            stats = json.load(f)
    entry = stats["batches"].setdefault(str(batch_id), {})
    for side, m in maxima.items():
        if m is not None:
            entry[side] = m
            # the stream's high-water mark is monotone and survives
            # eviction tombstones (a watermark must never regress)
            if m > stats.get("max_ts", m - 1):
                stats["max_ts"] = m
    tmp = f"{p}.tmp{batch_id}"
    with open(tmp, "w") as f:
        json.dump(stats, f, indent=1)
    os.replace(tmp, p)


def stream_watermark(state_path: str, delay_seconds: int = 0) -> int | None:
    """The temporal stream's watermark: max event time recorded across
    all folded batches, minus the allowed lateness. None before any
    fold."""
    import json
    import os

    p = _ts_stats_path(state_path)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        stats = json.load(f)
    if "max_ts" not in stats:
        return None
    return int(stats["max_ts"]) - delay_seconds


def evict_join_mv_state(
    state_path: str,
    band_seconds: int,
    delay_seconds: int = 0,
    committed_below: int | None = None,
    *,
    allow_uncommitted_watermark: bool = False,
) -> list[tuple[str, int]]:
    """Drop accumulated-side batch partitions that can NEVER join a
    future delta: a partition is evictable when its recorded max event
    time < watermark - band - delay. Whole-directory deletes — no
    rewrite. The VIEW is untouched (it is output, not join state).

    ``committed_below``: only partitions with batch_id strictly below
    this are considered AND — critically — the eviction watermark is
    computed from COMMITTED batches only (stats entries with
    ``batch_id < committed_below``). An uncommitted batch could still
    replay, and the replay's ``_read_prior`` must see the exact
    pre-state the first attempt saw; letting the uncommitted batch's
    own max event time advance the horizon would evict pre-state the
    first attempt joined against, silently shrinking the replayed view
    partition (standard stream-stream joins evict on the PREVIOUS
    batch's watermark for exactly this reason; ADVICE r7). The
    committed watermark stays monotone across eviction tombstones via
    a ``committed_max_ts`` high-water mark in the manifest.

    ``committed_below`` is effectively required: omitting it computes
    the watermark from the GLOBAL max event time — including a crashed
    uncommitted attempt's stats — which is replay-unsafe, so the call
    refuses unless ``allow_uncommitted_watermark=True`` (legitimate
    only when no fold can replay, e.g. after a clean availableNow
    drain has stopped).

    Single-writer op: run from the same maintenance loop that folds
    batches (run_stream_join_mv_temporal runs it BEFORE each fold so
    first run and replay of a batch observe identical pre-state), not
    concurrently with an in-flight fold — the manifest is a
    read-modify-replace. Returns [(side, batch_id)] evicted."""
    import json
    import os
    import shutil

    _require_local_state(state_path, "evict_join_mv_state")
    if committed_below is None and not allow_uncommitted_watermark:
        # the global max_ts includes a crashed UNCOMMITTED attempt's
        # recorded stats, so an unfenced watermark can evict pre-state
        # a replay of that attempt still needs — refusing by default
        # makes the replay-unsafe mode an explicit opt-in (ADVICE r8)
        raise ValueError(
            "evict_join_mv_state needs committed_below (the stream "
            "checkpoint's lowest possibly-replayable batch id) to "
            "compute a replay-safe watermark. Pass "
            "allow_uncommitted_watermark=True only when no fold can "
            "replay (e.g. the stream is drained and stopped)."
        )
    p = _ts_stats_path(state_path)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        stats = json.load(f)
    if committed_below is None:
        if "max_ts" not in stats:
            return []
        wm = int(stats["max_ts"]) - delay_seconds
    else:
        # committed-only watermark: max recorded event time over
        # batches the checkpoint has committed, carried monotonically
        # across tombstones so consumed stats never regress it
        cand = [int(stats["committed_max_ts"])] if "committed_max_ts" in stats else []
        for bid_str, entry in stats["batches"].items():
            if int(bid_str) >= committed_below:
                continue
            cand.extend(m for m in (entry.get("left"), entry.get("right")) if m is not None)
        if not cand:
            return []
        stats["committed_max_ts"] = max(cand)
        wm = stats["committed_max_ts"] - delay_seconds
    horizon = wm - band_seconds
    evicted: list[tuple[str, int]] = []
    for bid_str, entry in sorted(stats["batches"].items(), key=lambda kv: int(kv[0])):
        bid = int(bid_str)
        if committed_below is not None and bid >= committed_below:
            continue
        for side in ("left", "right"):
            m = entry.get(side)
            if m is None or m >= horizon:
                continue
            part = f"{state_path}/{side}/__batch_id={bid}"
            if os.path.isdir(part):
                shutil.rmtree(part)
                evicted.append((side, bid))
            entry[side] = None  # tombstone: stat consumed
    tmp = f"{p}.tmp-evict"
    with open(tmp, "w") as f:
        json.dump(stats, f, indent=1)
    os.replace(tmp, p)
    return evicted


def run_stream_join_mv(
    stream_df: DataFrame,
    on: Sequence[str],
    side_col: str,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    table_prefix: str,
    view_path: str,
    checkpoint_dir: str,
    num_buckets: int = 32,
    location_root: str | None = None,
    watermark: tuple[str, str] | None = None,
    query_name: str = "stream_join_mv",
    timeout_sec: int = 120,
) -> None:
    """TRUE ``readStream`` entry point for join-view maintenance
    (mirrors :func:`streaming.mv.run_stream_rollup`): drain a
    multiplexed CDC-style stream — each row tagged ``side_col`` in
    {'left','right'}, carrying the union of both sides' columns —
    with an availableNow trigger, folding every micro-batch through
    :func:`apply_join_batch_bucketed`.

    Late data contract: the maintained join view is TOTAL, not
    windowed — a batch whose rows are event-time late relative to
    earlier batches still folds in via the same bilinear delta rule
    (insert order never matters for ΔL⋈R_prev ∪ L_prev⋈ΔR ∪ ΔL⋈ΔR),
    so the end state equals a batch join over everything delivered
    INCLUDING late arrivals (pinned by test). ``watermark=(ts_col,
    delay)`` is accepted for composition with upstream windowed
    stages; it does not evict join-MV state — eviction policy for
    unbounded sides belongs to a TTL'd variant, not silent drops.

    Exactly-once: Structured Streaming's checkpoint makes delivery
    at-least-once per batch id; the fold is replay-idempotent by
    batch-id partition overwrite, so crash/replay cannot double-count
    (same story as the batch entry points, pinned there)."""
    on = list(on)
    left_cols = list(left_cols)
    right_cols = list(right_cols)
    if watermark is not None:
        stream_df = stream_df.withWatermark(*watermark)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        bl = batch_df.filter(F.col(side_col) == "left").select(
            *on, *left_cols
        )
        br = batch_df.filter(F.col(side_col) == "right").select(
            *on, *right_cols
        )
        apply_join_batch_bucketed(
            bl,
            br,
            batch_id,
            on,
            table_prefix,
            view_path,
            num_buckets=num_buckets,
            location_root=location_root,
        )

    q = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_sec):
            raise TimeoutError(
                f"stream '{query_name}' did not drain within {timeout_sec}s"
            )
    finally:
        q.stop()


def run_stream_join_mv_temporal(
    stream_df: DataFrame,
    on: Sequence[str],
    side_col: str,
    ts_col: str,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    band_seconds: int,
    state_path: str,
    checkpoint_dir: str,
    delay_seconds: int = 0,
    query_name: str = "stream_join_mv_temporal",
    timeout_sec: int = 120,
) -> None:
    """readStream runner for the TEMPORAL join-MV: drain a multiplexed
    left/right feed with availableNow, folding each micro-batch through
    :func:`apply_join_batch_temporal` and running
    :func:`evict_join_mv_state` after every fold (fenced to batches
    strictly below the one just committed) — the complete bounded-state
    maintenance loop: state is trimmed continuously as the watermark
    advances, so a drain over months of stream keeps only the band +
    delay window of accumulated sides on disk.

    The stream's event-time column ``ts_col`` serves both sides (the
    multiplexed feed carries one timestamp per row); rows are split by
    ``side_col`` in {'left','right'} exactly as in
    :func:`run_stream_join_mv`. Late rows beyond ``delay_seconds``
    may fail to pair with already-evicted state — the standard
    watermark loss contract, measurable here as view rows missing vs
    an unbounded recompute (pinned by test both ways: within-delay
    late data pairs, beyond-delay late data against evicted state
    does not)."""
    on = list(on)
    left_cols = list(left_cols)
    right_cols = list(right_cols)
    last_bid: dict[str, int] = {}

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        last_bid["bid"] = batch_id
        # Evict BEFORE the fold, fenced to committed batches: batch_id
        # itself is uncommitted until the checkpoint records it, so the
        # eviction horizon must neither consider its partitions nor let
        # its rows' event times advance the watermark — otherwise a
        # crash between fold and commit would replay this batch against
        # less history than the first attempt saw (ADVICE r7). Running
        # eviction first (and committed-only inside evict_join_mv_state)
        # makes first run and replay observe identical pre-state: a
        # crashed attempt's own _ts_stats entry is excluded by the
        # bid < committed_below fence, so re-running evicts nothing new.
        evict_join_mv_state(
            state_path,
            band_seconds,
            delay_seconds=delay_seconds,
            committed_below=batch_id,
        )
        bl = batch_df.filter(F.col(side_col) == "left").select(
            *on, F.col(ts_col).alias("__ts_l"), *left_cols
        )
        br = batch_df.filter(F.col(side_col) == "right").select(
            *on, F.col(ts_col).alias("__ts_r"), *right_cols
        )
        apply_join_batch_temporal(
            bl,
            br,
            batch_id,
            on,
            "__ts_l",
            "__ts_r",
            band_seconds,
            state_path,
            delay_seconds=delay_seconds,
        )

    q = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_sec):
            raise TimeoutError(
                f"stream '{query_name}' did not drain within {timeout_sec}s"
            )
    finally:
        q.stop()
    # the drain committed every batch (availableNow terminated cleanly),
    # so the final batch's event times are now safely part of the
    # committed watermark — one closing eviction trims state all the way
    # to the current horizon without waiting for the next drain
    if "bid" in last_bid:
        evict_join_mv_state(
            state_path,
            band_seconds,
            delay_seconds=delay_seconds,
            committed_below=last_bid["bid"] + 1,
        )


MULT_COL = "__mult"


def apply_join_batch_z(
    batch_left: DataFrame,
    batch_right: DataFrame,
    batch_id: int,
    on: Sequence[str],
    state_path: str,
) -> None:
    """Z-SET form of :func:`apply_join_batch`: batches carry a signed
    multiplicity column ``__mult`` (+1 insert, -1 retraction; absent →
    all +1), which upgrades the maintained join view from insert-only
    to full UPDATE/DELETE support — an update is retract-old +
    insert-new, the standard incremental-view-maintenance encoding
    (DBSP / differential-dataflow Z-sets).

    The bilinear delta rule is unchanged because join is bilinear over
    signed multiplicities: joined mult = ml·mr, and
    ΔV = ΔL⋈R_prev + L_prev⋈ΔR + ΔL⋈ΔR holds term-for-term with signs.
    Nothing is consolidated on write (partitions stay append-only and
    replay-idempotent exactly like the insert-only form);
    :func:`read_join_view_z` consolidates at read time — group by the
    row, sum multiplicities, keep positive. Retractions of
    never-inserted rows simply leave non-positive sums (dropped), so
    out-of-order correction feeds degrade gracefully.

    Scale: identical shuffle shape to the insert-only form plus one
    multiply; consolidation is one hash aggregate over the view. For
    heavily-churned views, periodically rewrite the consolidated
    result as a compacted baseline partition (same maintenance loop as
    ``sinks.versioned.compact_table``)."""
    spark = batch_left.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    on = list(on)

    def _signed(df: DataFrame) -> DataFrame:
        if MULT_COL not in df.columns:
            df = df.withColumn(MULT_COL, F.lit(1).cast("long"))
        return df.withColumn(MULT_COL, F.col(MULT_COL).cast("long"))

    bl, br = _concurrently(
        lambda: _signed(batch_left).localCheckpoint(),
        lambda: _signed(batch_right).localCheckpoint(),
    )
    l_path = f"{state_path}/left"
    r_path = f"{state_path}/right"
    v_path = f"{state_path}/view"
    l_prev = _read_prior(spark, l_path, batch_id)
    r_prev = _read_prior(spark, r_path, batch_id)

    def _zjoin(a: DataFrame, b: DataFrame) -> DataFrame:
        al = a.withColumnRenamed(MULT_COL, "__ml")
        bm = b.withColumnRenamed(MULT_COL, "__mr")
        return (
            al.join(bm, on)
            .withColumn(MULT_COL, F.col("__ml") * F.col("__mr"))
            .drop("__ml", "__mr")
        )

    dv = _zjoin(bl, br)
    if r_prev is not None:
        dv = dv.unionByName(_zjoin(bl, r_prev))
    if l_prev is not None:
        dv = dv.unionByName(_zjoin(l_prev, br))

    _concurrently(
        lambda: _append_partition(bl, batch_id, l_path),
        lambda: _append_partition(br, batch_id, r_path),
        lambda: _append_partition(dv, batch_id, v_path),
    )


def read_join_view_z(spark: SparkSession, state_path: str) -> DataFrame:
    """Consolidated Z-set view: rows with their net positive
    multiplicity as ``mult`` (retracted rows net to 0 and vanish)."""
    raw = _read_all(spark, f"{state_path}/view").drop("__batch_id")
    cols = [c for c in raw.columns if c != MULT_COL]
    return (
        raw.groupBy(*cols)
        .agg(F.sum(MULT_COL).alias("mult"))
        .filter(F.col("mult") > 0)
    )
