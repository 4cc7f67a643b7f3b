"""maintenance queries split out of __spark_entry__.py (round 9) — see that module's docstring for the driver contract. Mechanically moved, text verbatim."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_spark_spark.functions.money import money_sum, money_sum_sql
from etl_spark_spark.functions.normalize import (
    _ACCENTS_DST,
    _ACCENTS_SRC,
    cnpj_normalize,
    etiqueta,
    strip_normalize,
    upper_trim,
)
from etl_spark_spark.functions.text import (
    LANG_PROFILES,
    bpe_token_count,
    bpe_token_count_sql,
    dup_fraction,
    fingerprint,
    lang_id,
    lang_scores,
    punct_count,
    quality_score,
    stopword_hits,
    token_count,
    tokens,
    word_shingles,
)
from etl_spark_spark.functions.scrub import scrub_pii, scrub_pii_sql_stages
from etl_spark_spark.operators.dedup import dedup_any, dedup_latest
from etl_spark_spark.operators.multimodal import (
    attach_media,
    extract_features,
    sample_frames,
)
from etl_spark_spark.operators.neardup import (
    contamination_scores,
    exact_dedup,
    near_dup_minhash,
    ngram_jaccard_pairs,
    prefix_filtered_jaccard_pairs,
    shingle_set,
    simhash,
    simhash_near_dup,
)
from etl_spark_spark.operators.fuzzy import fuzzy_join
from etl_spark_spark.operators.quality import (
    expectation_metrics,
    fk_violation_count,
    functional_dependencies,
)
from etl_spark_spark.operators.sampling import (
    hash_bucket,
    hash_split,
    temperature_sample,
    stratified_hash_sample,
)
from etl_spark_spark.operators.similarity import (
    cosine_near_dup_pairs,
    cosine_topk,
    cosine_topk_ivf,
    cosine_topk_ivf_pq,
    cosine_topk_lsh,
)
from etl_spark_spark.operators.reconcile import reconcile_full_outer
from etl_spark_spark.operators.graph import connected_components
from etl_spark_spark.operators.packing import pack_by_token_budget
from etl_spark_spark.operators.windows import partial_topk, top_k_per_group
from etl_spark_spark.functions.vectors import norm
from etl_spark_spark.pipelines.ressarcimento import allocation_pipeline
from etl_spark_spark.pipelines.superdesconto import best_sale_pipeline
from etl_spark_spark.sources import read_events, table, year_range_filter
from etl_spark_spark.streaming import sessionize_batch, sliding_agg, tumbling_agg

from ._shared import *  # noqa: F401,F403



def q_scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 dimension history: fold two customer snapshots
    (the base table, then a derived second snapshot where every 10th
    customer's balance moved) through scd2_apply. Changed keys carry a
    closed row (valid_to stamped) plus a new current row; unchanged
    keys keep their original open row. Pure DataFrame fold with
    literal as_of stamps, so the full history is bit-reproducible and
    SQL-expressible."""
    from etl_spark_spark.operators.scd import scd2_apply

    snap1 = table(
        spark, sf_dir, "customer", columns=["c_custkey", "c_acctbal"]
    )
    snap2 = snap1.withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 10 == 0, F.round(F.col("c_acctbal") + 100.0, 2)
        ).otherwise(F.col("c_acctbal")),
    )
    h1 = scd2_apply(None, snap1, ["c_custkey"], "2024-01-01")
    return scd2_apply(h1, snap2, ["c_custkey"], "2024-02-01")



def q_orders_pit_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension join: enrich each order with the
    customer attribute that was CURRENT on the order date, against an
    SCD2 history (two snapshots: a 1995-06-01 bootstrap, then a
    1996-06-01 balance change for every 10th customer). The join is an
    equi-join on custkey with the validity range as a join filter —
    the standard PIT pattern; unhinted, since an SCD2 history over a
    customer-scaling dimension is itself SF-scaling (AQE broadcasts it
    only while small — round-11 audit, PLANS.md); a LEFT join so orders placed
    before the dimension existed survive with NULL attributes (that
    edge is pinned, not papered over). Validity stamps are ISO strings
    compared lexicographically — portable to the oracle."""
    from etl_spark_spark.operators.scd import scd2_apply

    orders = table(
        spark, sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    snap1 = table(spark, sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    snap2 = snap1.withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 10 == 0, F.round(F.col("c_acctbal") + 100.0, 2)
        ).otherwise(F.col("c_acctbal")),
    )
    hist = scd2_apply(
        scd2_apply(None, snap1, ["c_custkey"], "1995-06-01"),
        snap2, ["c_custkey"], "1996-06-01",
    )
    od = F.date_format("o_orderdate", "yyyy-MM-dd")
    o = orders.withColumn("order_date", od)
    cond = (
        (F.col("o_custkey") == F.col("c_custkey"))
        & (F.col("valid_from") <= F.col("order_date"))
        & (F.col("valid_to").isNull() | (F.col("order_date") < F.col("valid_to")))
    )
    return o.join(hist, cond, "left").select(
        "o_orderkey",
        "o_custkey",
        "order_date",
        F.col("c_acctbal").alias("acctbal_at_order"),
        F.col("valid_from").alias("dim_from"),
    )



_SCRATCH_DIRS: dict[str, str] = {}



def _scratch_dir(name: str) -> str:
    """Per-process scratch dir for side-effecting queries (merge_upsert,
    indexed_zorder_scan). One dir per query name per process: the first
    call mkdtemps and registers an atexit rmtree; later calls in the
    same process WIPE and reuse it. Repeated driver / bench /
    plan-snapshot runs therefore leave zero /tmp garbage behind
    (VERDICT r5), while two concurrent processes still get disjoint
    dirs (mkdtemp) so a bench and a mirror run cannot race on one
    table. Results stay deterministic — only the path changes."""
    import atexit
    import shutil
    import tempfile

    import glob
    import os

    # reap leftovers from processes that died without atexit (SIGTERM
    # from a timeout kill skips atexit): the owner pid is embedded in
    # the dir name, so a dir whose pid is gone AND whose mtime is past
    # the TTL is garbage. The TTL guards the PID-namespace hazard
    # (ADVICE r6): in a container sharing /tmp, a live sibling's pid is
    # absent from this namespace's /proc — age is the cross-namespace
    # signal that nobody is mid-query in the dir.
    import time

    reap_ttl_sec = 3600.0
    now = time.time()

    def _tree_is_live(path: str, deadline: float) -> bool:
        # a directory's own mtime only moves on DIRECT entry changes —
        # a sibling process writing inside nested subdirs (one long
        # query laying out table data) leaves the top-level mtime
        # stale, so the liveness signal is the NEWEST mtime anywhere in
        # the tree (ADVICE r7). The walk short-circuits on the FIRST
        # entry newer than the deadline (the dir is provably live) so a
        # large leftover table costs O(files) stats only when it is
        # genuinely all-stale and about to be reaped anyway (ADVICE r8)
        if os.path.getmtime(path) > deadline:
            return True
        for dirpath, _dirnames, filenames in os.walk(path):
            try:
                if os.path.getmtime(dirpath) > deadline:
                    return True
                for fn in filenames:
                    if (
                        os.path.getmtime(os.path.join(dirpath, fn))
                        > deadline
                    ):
                        return True
            except OSError:
                continue  # entry vanished mid-walk; other stats decide
        return False

    for stale in glob.glob(f"{tempfile.gettempdir()}/spark_graft_*_p*"):
        try:
            pid = int(stale.rsplit("_p", 1)[1].split("_", 1)[0])
            if (
                pid != os.getpid()
                and not os.path.exists(f"/proc/{pid}")
                and not _tree_is_live(stale, now - reap_ttl_sec)
            ):
                shutil.rmtree(stale, ignore_errors=True)
        except (ValueError, IndexError, OSError):
            pass

    root = _SCRATCH_DIRS.get(name)
    if root is None:
        root = tempfile.mkdtemp(
            prefix=f"spark_graft_{name}_p{os.getpid()}_"
        )
        _SCRATCH_DIRS[name] = root
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    else:
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root, exist_ok=True)
    return root



def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO under the hash gate — the reference's flagship sink
    semantic (reference etl_job.py:79-85, ``merge_table_iceberg`` ON
    t.etiqueta = s.etiqueta) run through the catalog-less versioned
    emulation (sinks/versioned.py merge_into_versioned: COW snapshot +
    CAS commit):

    1. bootstrap the target with the even-custkey half of customer
       (batch 0, balances in exact integer cents);
    2. MERGE the custkey%3==0 batch (batch 1, balances bumped +$100):
       matched keys (custkey %6==0) are REPLACED whole-row, unmatched
       odd multiples of 3 are INSERTED;
    3. return the committed snapshot.

    The oracle replays the same MERGE in plain SQL (anti-join + union
    — the standard WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT
    expansion), so the upsert result itself sits under the row/schema/
    value-hash gate, not just pytest. Each call merges into a fresh
    private temp table (idempotent across driver/bench/plan-snapshot
    invocations; the ~2k-row demo table lives in a per-process scratch
    dir that is wiped on reuse and removed at exit — see
    ``_scratch_dir``). Round-7: the merges route through the
    PLUGGABLE backend interface (sinks/catalog.py merge_into) — a
    capability probe selects a real Delta/Iceberg ``MERGE INTO``
    where the jars exist and the versioned-parquet COW emulation
    here (this container has no catalog jars), so this oracle row
    now gates the adapter itself, not just the fallback. Scale note:
    the fallback rewrites only the TARGET table (one anti-join +
    union, shuffle on the merge key); a catalog MERGE rewrites
    matched files only — same semantics, different cost profile."""
    from etl_spark_spark.sinks.catalog import merge_into, read_merged

    cust = table(
        spark, sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"]
    )
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    target0 = cust.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey",
        "c_name",
        cents.alias("acctbal_cents"),
        F.lit(0).alias("batch"),
    )
    source = cust.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        "c_name",
        (cents + F.lit(10_000)).alias("acctbal_cents"),
        F.lit(1).alias("batch"),
    )
    from etl_spark_spark.sinks.catalog import detect_backend

    backend = detect_backend(spark)
    if backend == "versioned_parquet":
        target = _scratch_dir("merge_upsert")
    else:  # catalog backends take a table identifier, not a path
        target = "merge_upsert_demo"
        spark.sql(f"DROP TABLE IF EXISTS {target}")  # idempotent rerun
    merge_into(spark, target0, target, ["c_custkey"], backend=backend)
    merge_into(spark, source, target, ["c_custkey"], backend=backend)
    return read_merged(spark, target, backend=backend).select(
        "c_custkey", "c_name", "acctbal_cents", "batch"
    )



def q_cast_decimal_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-driven Decimal/TimestampNTZ cast policy (SURVEY §2 F16,
    reference etl_job.py:15-25) under the hash gate — the one §2 item
    that previously had no oracle row because the fixtures carry no
    DecimalType. The query STAGES a genuinely decimal-typed table
    (cast lineitem money columns to DECIMAL(18,4)/DECIMAL(9,6), write
    parquet, read back — the read schema IS decimal, asserted), then
    applies the policy three ways:

    - default: every decimal -> double (the reference's sink rule);
    - ``to=DecimalType(38,6)``: exact-decimal retention branch,
      emitted as a string so both engines pin the exact scaled digits;
    - ``timestamp_ntz=True``: timestamps -> TimestampNTZ, emitted as
      an ISO string (the repo's date-output convention).

    The oracle reproduces each branch with plain casts on the source
    rows, so the staged write/read roundtrip is proven value-lossless
    and the policy semantics are pinned cross-engine."""
    from etl_spark_spark.functions.nulls import cast_decimals

    li = table(
        spark,
        sf_dir,
        "lineitem",
        columns=[
            "l_orderkey",
            "l_linenumber",
            "l_suppkey",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    ).filter(F.col("l_suppkey") <= 5)
    staged = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").cast("decimal(18,4)").alias("price_dec"),
        F.col("l_discount").cast("decimal(9,6)").alias("disc_dec"),
        F.col("l_shipdate").cast("timestamp").alias("ship_ts"),
    )
    root = _scratch_dir("cast_decimal")
    path = f"{root}/staged"
    staged.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    for c in ("price_dec", "disc_dec"):
        if not isinstance(back.schema[c].dataType, T.DecimalType):
            raise TypeError(
                f"staging failed: {c} read back as "
                f"{back.schema[c].dataType}, expected DecimalType"
            )
    # both policy modes CHAINED on one pipeline (no key join — the
    # synthetic fixture's (orderkey, linenumber) is not unique):
    # decimal(18,4) --exact policy--> decimal(38,6), freeze the exact
    # branch as a string, then --default policy--> double + NTZ. The
    # widening cast is exact, so the double branch equals casting the
    # original decimals directly (what the oracle does).
    exact = cast_decimals(back, to=T.DecimalType(38, 6))
    if not isinstance(exact.schema["price_dec"].dataType, T.DecimalType):
        raise TypeError("exact-retention policy lost the decimal type")
    dbl = cast_decimals(
        exact.withColumn(
            "price_dec38", F.col("price_dec").cast("string")
        ),
        timestamp_ntz=True,
    )
    if not isinstance(dbl.schema["ship_ts"].dataType, T.TimestampNTZType):
        raise TypeError("timestamp_ntz policy did not produce NTZ")
    return dbl.select(
        "l_orderkey",
        "l_linenumber",
        F.col("price_dec").alias("price_double"),
        F.col("disc_dec").alias("disc_double"),
        "price_dec38",
        F.date_format("ship_ts", "yyyy-MM-dd HH:mm:ss").alias("ship_ntz"),
    )



def q_indexed_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end z-order + stats-index scan path under the hash gate:
    write orders Morton-clustered on (o_custkey, o_totalprice)
    (sinks/zorder.py — codegen bit-interleave, one range exchange),
    then read it back through ``sources.stats_index.indexed_read``
    with ranges on BOTH clustered columns — file skipping from the
    per-file min/max manifest plus the exact residual filter, the
    lakehouse OPTIMIZE ZORDER BY + data-skipping loop reconstructed
    for plain parquet. The oracle runs the same two range predicates
    over the source table directly, so the gate proves the layout +
    prune + residual pipeline is row-for-row lossless. The
    n_files_read < n_files_total skipping claim is pinned by
    tests/test_stats_index.py (file counts are layout-dependent;
    results are not).

    At 100 TB: the z-ordered write is one range exchange over the
    Morton key; the index is one file-count-sized aggregate refreshed
    per ingestion batch; every multi-dimensional range query then
    opens only overlapping files — the scan cost tracks the
    selectivity, not the table size."""
    from etl_spark_spark.sinks.zorder import write_zordered
    from etl_spark_spark.sources.stats_index import indexed_read

    orders = table(
        spark,
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    root = _scratch_dir("zorder_scan")
    path = f"{root}/orders_z"
    write_zordered(orders, path, ["o_custkey", "o_totalprice"], num_files=16)
    scan = indexed_read(
        spark,
        path,
        {"o_custkey": (10, 100), "o_totalprice": (50_000.0, 150_000.0)},
    )
    return scan.df.select("o_orderkey", "o_custkey", "o_totalprice")



def q_production_daily_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's PRODUCTION CYCLE end-to-end under one hash gate
    (reference utils_superdesconto.py:62-66 + etl_job.py:79-85):

    1. stage the POS feed z-ordered on (ship day, product) — the
       OPTIMIZE ZORDER layout an ingested feed converges to;
    2. two incremental runs (Jan 1995, then Feb 1995), each:
       stats-index-pruned date-window read (only files overlapping the
       window are OPENED — pinned n_files_read < n_files_total in
       tests/test_daily_loop.py) → superdesconto transform (best
       discounted sale per label + dimension joins, tagged with the
       window) → COW versioned MERGE on etiqueta;
    3. return the committed snapshot: Feb rows replaced matched
       labels, unmatched Jan rows survive (src_window says which).

    The oracle replays the same two windowed best-sale selections and
    the MERGE expansion (window-2 rows UNION ALL anti-joined window-1
    rows) in plain SQL — value-hash equality proves the z-order
    rewrite, the file skip + residual filter, the transform, and the
    MERGE are jointly lossless. Scale: every stage is the audited
    scale path (pipelines/daily_loop.py docstring)."""
    import datetime as dt

    from etl_spark_spark.pipelines.daily_loop import run_daily_loop, stage_feed

    root = _scratch_dir("production_loop")
    feed = f"{root}/pos_feed"
    target = f"{root}/best_sales"
    stage_feed(spark, sf_dir, feed)
    snap, _scans = run_daily_loop(
        spark,
        sf_dir,
        feed,
        target,
        windows=[
            (dt.date(1995, 1, 1), dt.date(1995, 1, 31), "w1"),
            (dt.date(1995, 2, 1), dt.date(1995, 2, 28), "w2"),
        ],
    )
    return snap.select(
        "etiqueta",
        "filial",
        "cod_prod",
        "periodo",
        "venda",
        "venda_desconto",
        "perc_dsc_cupom",
        "produto_nome",
        "produto_marca",
        "preco_tabela",
        "fornecedor_nome",
        "src_window",
    )



def q_join_mv_retractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-view maintenance under UPDATES: batch 0 builds the Jan-Feb
    1995 orders⋈lineitem view; batch 1 delivers a correction feed that
    RETRACTS (mult -1) every order of custkey%5==0 customers and
    re-inserts it with status 'X' — the Z-set encoding of an UPDATE
    (streaming/join_mv.py:apply_join_batch_z). The consolidated view
    must equal the join against the corrected final state, which is
    exactly what the oracle computes (CASE-patched orders, COUNT(*) as
    the row multiplicity) — hash equality proves retraction algebra,
    the bilinear delta terms, and read-time consolidation jointly."""
    from etl_spark_spark.streaming.join_mv import (
        apply_join_batch_z,
        read_join_view_z,
    )

    root = _scratch_dir("join_mv_z")
    li = table(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    ).withColumnRenamed("l_orderkey", "orderkey")
    orders = (
        table(
            spark, sf_dir, "orders",
            columns=["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"],
        )
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-03-01").cast("timestamp"))
        )
        .withColumnRenamed("o_orderkey", "orderkey")
        .drop("o_orderdate")
    )
    corrected = orders.filter(F.col("o_custkey") % 5 == 0)
    retract = corrected.withColumn("__mult", F.lit(-1))
    reinsert = corrected.withColumn(
        "o_orderstatus", F.lit("X")
    ).withColumn("__mult", F.lit(1))
    empty_left = li.filter(F.lit(False))
    state = f"{root}/state"
    apply_join_batch_z(li, orders, 0, ["orderkey"], state)
    apply_join_batch_z(
        empty_left, retract.unionByName(reinsert), 1, ["orderkey"], state
    )
    view = read_join_view_z(spark, state)
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return view.select(
        "orderkey",
        "l_linenumber",
        "o_custkey",
        "o_orderstatus",
        cents.alias("price_cents"),
        F.col("mult").cast("long").alias("mult"),
    )



def q_compacted_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE under the hash gate: run the merge_upsert MERGE
    sequence, then COMPACT the committed snapshot (compact_table with
    order_by — few range-clustered files sorted on the merge key,
    published as one more CAS commit) and return the compacted
    snapshot. The oracle is the same MERGE expansion as q_merge_upsert,
    so hash equality proves compaction is row-for-row lossless while
    the layout becomes stats-discriminating; the pre-compaction
    version stays time-travelable and a racing merge makes the CAS
    refuse (both pinned in tests/test_sinks.py). This is the
    small-files maintenance pass every ingesting table needs — a
    thousand tiny MERGE outputs otherwise destroy scan throughput."""
    from etl_spark_spark.sinks.versioned import (
        compact_table,
        merge_into_versioned,
        read_versioned,
    )

    cust = table(
        spark, sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"]
    )
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    target0 = cust.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey",
        "c_name",
        cents.alias("acctbal_cents"),
        F.lit(0).alias("batch"),
    )
    source = cust.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        "c_name",
        (cents + F.lit(10_000)).alias("acctbal_cents"),
        F.lit(1).alias("batch"),
    )
    root = _scratch_dir("compacted_snapshot")
    merge_into_versioned(spark, target0, root, ["c_custkey"])
    merge_into_versioned(spark, source, root, ["c_custkey"])
    compact_table(
        spark, root, target_file_bytes=32 * 1024, order_by=["c_custkey"]
    )
    return read_versioned(spark, root).select(
        "c_custkey", "c_name", "acctbal_cents", "batch"
    )



def q_incremental_join_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance under the hash gate: the
    Jan-Feb 1995 orders⋈lineitem view is built by THREE insert
    micro-batches through the bilinear delta rule
    ΔV = ΔL⋈R_prev ∪ L_prev⋈ΔR ∪ ΔL⋈ΔR (streaming/join_mv.py) — the
    view is never recomputed, each batch appends exactly its delta
    partition. Batches slice the two sides INDEPENDENTLY (lineitem by
    supplier mod 3, orders by customer mod 3) so ~2/3 of all matches
    straddle batches — the cross-batch terms carry real weight. The
    oracle is the plain one-shot join, so hash equality proves the
    fold reconstructs it exactly."""
    from etl_spark_spark.streaming.join_mv import (
        apply_join_batch,
        read_join_view,
    )

    root = _scratch_dir("join_mv")
    li = table(
        spark,
        sf_dir,
        "lineitem",
        columns=[
            "l_orderkey",
            "l_linenumber",
            "l_suppkey",
            "l_extendedprice",
            "l_discount",
        ],
    ).withColumnRenamed("l_orderkey", "orderkey")
    orders = (
        table(
            spark,
            sf_dir,
            "orders",
            columns=["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"],
        )
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-03-01").cast("timestamp"))
        )
        .withColumnRenamed("o_orderkey", "orderkey")
        .drop("o_orderdate")
    )
    for b in range(3):
        apply_join_batch(
            li.filter(F.col("l_suppkey") % 3 == b),
            orders.filter(F.col("o_custkey") % 3 == b),
            b,
            ["orderkey"],
            f"{root}/state",
        )
    view = read_join_view(spark, f"{root}/state")
    return view.select(
        "orderkey",
        "l_linenumber",
        "l_suppkey",
        "o_custkey",
        "o_orderstatus",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        )
        .cast("long")
        .alias("revenue_cents"),
    )



def q_join_mv_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPORAL join-view maintenance with BOUNDED state under the
    hash gate (round-7): views⋈purchases per user within a 1-hour
    event-time band, folded as THREE time-ordered micro-batches
    (10-day windows) through the banded delta rule
    (streaming/join_mv.py apply_join_batch_temporal). Between batches
    1 and 2 the maintenance loop EVICTS every accumulated-side
    partition whose manifest max event time sits behind
    watermark − band (evict_join_mv_state — whole-directory deletes,
    the view untouched); the oracle is the one-shot banded join over
    ALL events, so hash equality proves eviction dropped only state
    that could never join again. This is the form whose state size
    tracks the band window, not the stream's lifetime — the property
    an unbounded 100 TB stream requires (the pure equi-join MV must
    keep full history by construction)."""
    from etl_spark_spark.streaming.join_mv import (
        apply_join_batch_temporal,
        evict_join_mv_state,
    )

    root = _scratch_dir("join_mv_temporal")
    state = f"{root}/state"
    ev = read_events(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    cuts = ["2024-01-11", "2024-01-21"]
    windows = [
        (None, cuts[0]),
        (cuts[0], cuts[1]),
        (cuts[1], None),
    ]

    def _slice(df: DataFrame, ts: str, lo: str | None, hi: str | None):
        out = df
        if lo is not None:
            out = out.filter(F.col(ts) >= F.lit(lo).cast("timestamp"))
        if hi is not None:
            out = out.filter(F.col(ts) < F.lit(hi).cast("timestamp"))
        return out

    for b, (lo, hi) in enumerate(windows):
        if b == 2:
            # maintenance: batches 0-1 are checkpoint-committed; the
            # watermark is ~Jan 20, so batch 0 (max ts < Jan 11) sits
            # behind watermark − 1h and its partitions are dropped —
            # bounded state, proven lossless by the oracle below
            evicted = evict_join_mv_state(
                state, band_seconds=3600, committed_below=2
            )
            if not {("left", 0), ("right", 0)} <= set(evicted):
                raise AssertionError(
                    f"expected batch-0 state eviction, got {evicted}"
                )
        apply_join_batch_temporal(
            _slice(views, "view_ts", lo, hi),
            _slice(purchases, "purchase_ts", lo, hi),
            b,
            ["user_id"],
            "view_ts",
            "purchase_ts",
            band_seconds=3600,
            state_path=state,
        )
    view = spark.read.parquet(f"{state}/view").drop("__batch_id")
    return view.select(
        "user_id",
        "view_id",
        "purchase_id",
        F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_time"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias(
            "purchase_time"
        ),
        F.round(F.col("purchase_value") * 100)
        .cast("long")
        .alias("purchase_cents"),
    )



def q_text_formats_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-format round trip under the hash gate: customer is
    written to CSV and orders to JSON-lines (the two text formats a
    real feed arrives in), read back through the engine's
    schema-contract readers (``sources.text_formats`` — explicit
    schema, no inference pass, malformed-row policy), joined, and
    aggregated to per-(mktsegment, orderstatus) integer-cents revenue.
    The oracle computes the same aggregate from the PARQUET originals,
    so value-hash equality proves the CSV and JSONL write→read cycles
    preserved every key, every double (shortest-roundtrip repr), and
    every timestamp that survives into the result — quoting, NULL, or
    type-inference drift anywhere breaks the gate. Scratch lives in
    the per-process atexit-cleaned dir."""
    from etl_spark_spark.sources.text_formats import read_csv, read_jsonl

    root = _scratch_dir("text_formats")
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    cust.write.mode("overwrite").option("header", "true").csv(f"{root}/cust_csv")
    orders.write.mode("overwrite").json(f"{root}/orders_jsonl")
    cust_rt = read_csv(
        spark,
        f"{root}/cust_csv",
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string",
        mode="FAILFAST",
    )
    orders_rt = read_jsonl(
        spark,
        f"{root}/orders_jsonl",
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
        mode="FAILFAST",
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        orders_rt.filter(
            F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp")
        )
        .join(cust_rt, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(cents) / 100.0).alias("revenue"),
        )
    )



def q_replica_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy replica comparison (Merkle-style): a 'replica' of
    customer with deterministic injected drift (every 97th key's
    balance bumped, every 131st key missing, every 113th key an extra
    synthetic row) is reconciled against the original by per-bucket
    count+XOR digests — one tiny aggregate per side — and ONLY the
    divergent buckets get a row-level full outer. The output is the
    repair plan: (key, left_only | right_only | modified). This is how
    you compare two 100 TB copies without shipping either."""
    from etl_spark_spark.operators.reconcile import bucket_scoped_diff

    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    cust = table(spark, sf_dir, "customer", columns=cols)
    replica = (
        cust.filter(F.col("c_custkey") % 131 != 0)
        .withColumn(
            "c_acctbal",
            F.when(
                F.col("c_custkey") % 97 == 0,
                F.round(F.col("c_acctbal") + 1.0, 2),
            ).otherwise(F.col("c_acctbal")),
        )
        .unionByName(
            cust.filter(F.col("c_custkey") % 113 == 0).select(
                (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
                "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
            )
        )
    )
    return bucket_scoped_diff(cust, replica, "c_custkey", cols)



def q_mv_routed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view routing (plans/mv.py): revenue by returnflag
    answered from a (returnflag, linestatus, ship_year) additive rollup
    instead of rescanning lineitem — the router re-aggregates integer
    partial states, so the answer is bit-identical to the base-table
    aggregate the oracle computes. The routing decision itself is
    pinned by tests/test_mv.py."""
    from etl_spark_spark.plans.mv import answer, materialize_rollup

    li = table(
        spark, sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_shipdate",
                 "l_extendedprice", "l_discount"],
    ).withColumn(
        "revenue", F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).withColumn("ship_year", F.year("l_shipdate"))
    measures = {
        "revenue_cents": ("revenue", "sum_cents"),
        "n_lines": (None, "count"),
    }
    view = materialize_rollup(
        li, "rf_ls_year", ["l_returnflag", "l_linestatus", "ship_year"], measures
    )
    routed, source = answer(
        [view], lambda: li, ["l_returnflag"], measures
    )
    assert source == "rf_ls_year"  # must not fall back to a base scan
    return routed


_SCD2_CUSTOMER_HISTORY_SQL = """
WITH changed AS (SELECT c_custkey FROM customer WHERE c_custkey % 10 = 0)
SELECT c_custkey, c_acctbal,
       '2024-01-01' AS valid_from, NULL AS valid_to, true AS is_current
FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM changed)
UNION ALL
SELECT c_custkey, c_acctbal, '2024-01-01', '2024-02-01', false
FROM customer WHERE c_custkey IN (SELECT c_custkey FROM changed)
UNION ALL
SELECT c_custkey, round(c_acctbal + 100.0, 2), '2024-02-01', NULL, true
FROM customer WHERE c_custkey IN (SELECT c_custkey FROM changed)
"""


_ORDERS_PIT_DIMENSION_SQL = """
WITH changed AS (SELECT c_custkey FROM customer WHERE c_custkey % 10 = 0),
hist AS (
  SELECT c_custkey, c_acctbal,
         '1995-06-01' AS valid_from, NULL AS valid_to
  FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM changed)
  UNION ALL
  SELECT c_custkey, c_acctbal, '1995-06-01', '1996-06-01'
  FROM customer WHERE c_custkey IN (SELECT c_custkey FROM changed)
  UNION ALL
  SELECT c_custkey, round(c_acctbal + 100.0, 2), '1996-06-01', NULL
  FROM customer WHERE c_custkey IN (SELECT c_custkey FROM changed)
)
SELECT o_orderkey, o_custkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       c_acctbal AS acctbal_at_order,
       valid_from AS dim_from
FROM orders
LEFT JOIN hist
  ON o_custkey = c_custkey
 AND valid_from <= strftime(o_orderdate, '%Y-%m-%d')
 AND (valid_to IS NULL OR strftime(o_orderdate, '%Y-%m-%d') < valid_to)
"""


_CAST_DECIMAL_POLICY_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice AS DECIMAL(18,4)) AS DOUBLE)
         AS price_double,
       CAST(CAST(l_discount AS DECIMAL(9,6)) AS DOUBLE) AS disc_double,
       CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) AS DECIMAL(38,6))
            AS VARCHAR) AS price_dec38,
       strftime(CAST(l_shipdate AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
         AS ship_ntz
FROM lineitem WHERE l_suppkey <= 5
"""


_MERGE_UPSERT_SQL = """
WITH target AS (
  SELECT c_custkey, c_name,
         CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
         0 AS batch
  FROM customer WHERE c_custkey % 2 = 0
), source AS (
  SELECT c_custkey, c_name,
         CAST(round(c_acctbal * 100) AS BIGINT) + 10000 AS acctbal_cents,
         1 AS batch
  FROM customer WHERE c_custkey % 3 = 0
)
SELECT t.* FROM target t
WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.c_custkey = t.c_custkey)
UNION ALL
SELECT * FROM source
"""


_INDEXED_ZORDER_SCAN_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_custkey BETWEEN 10 AND 100
  AND o_totalprice BETWEEN 50000.0 AND 150000.0
"""


def _windowed_best_sql(lo: str, hi: str, tag: str) -> str:
    """One incremental window of the production loop: the windowed
    best-discounted-sale-per-label selection (same ranking the
    superdesconto oracle uses), tagged with its window. ``periodo`` is
    the ISO date string of the sale, so BETWEEN on strings is the
    date-window filter."""
    return f"""
  SELECT etiqueta, filial, cod_prod, periodo, venda, venda_desconto,
         perc_dsc_cupom, '{tag}' AS src_window
  FROM (
    SELECT *, row_number() OVER (
        PARTITION BY etiqueta
        ORDER BY venda_desconto DESC, src_ordem, src_linha
    ) AS rn
    FROM cupom
    WHERE periodo BETWEEN '{lo}' AND '{hi}'
  ) t WHERE rn = 1
"""



_PRODUCTION_DAILY_LOOP_SQL = f"""
WITH cupom AS ({_FEED_SQL.format(st="O")} UNION ALL {_FEED_SQL.format(st="F")}),
w1 AS ({_windowed_best_sql("1995-01-01", "1995-01-31", "w1")}),
w2 AS ({_windowed_best_sql("1995-02-01", "1995-02-28", "w2")}),
-- MERGE ON etiqueta, whole-row replace + insert-unmatched expansion:
-- window-2 rows win; window-1 rows survive only for untouched labels
merged AS (
  SELECT * FROM w2
  UNION ALL
  SELECT * FROM w1
  WHERE NOT EXISTS (SELECT 1 FROM w2 WHERE w2.etiqueta = w1.etiqueta)
)
SELECT m.etiqueta, m.filial, m.cod_prod, m.periodo, m.venda,
       m.venda_desconto, m.perc_dsc_cupom,
       p.p_name AS produto_nome, p.p_brand AS produto_marca,
       p.p_retailprice AS preco_tabela, s.s_name AS fornecedor_nome,
       m.src_window
FROM merged m
JOIN part p ON m.cod_prod = p.p_partkey
JOIN supplier s ON m.filial = s.s_suppkey
"""


_REPLICA_DRIFT_AUDIT_SQL = """
WITH cust AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer
),
replica AS (
  SELECT c_custkey, c_name, c_nationkey,
         CASE WHEN c_custkey % 97 = 0 THEN round(c_acctbal + 1.0, 2)
              ELSE c_acctbal END AS c_acctbal,
         c_mktsegment
  FROM cust WHERE c_custkey % 131 <> 0
  UNION ALL
  SELECT c_custkey + 10000000, c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM cust WHERE c_custkey % 113 = 0
),
lf AS (SELECT c_custkey AS key, c_custkey % 64 AS bkt, CAST(('0x' || substr(md5(concat_ws(chr(31), coalesce(CAST(c_custkey AS VARCHAR), chr(0)), coalesce(CAST(c_name AS VARCHAR), chr(0)), coalesce(CAST(c_nationkey AS VARCHAR), chr(0)), coalesce(CAST(c_acctbal AS VARCHAR), chr(0)), coalesce(CAST(c_mktsegment AS VARCHAR), chr(0)))), 1, 15)) AS BIGINT) AS fp FROM cust),
rf AS (SELECT c_custkey AS key, c_custkey % 64 AS bkt, CAST(('0x' || substr(md5(concat_ws(chr(31), coalesce(CAST(c_custkey AS VARCHAR), chr(0)), coalesce(CAST(c_name AS VARCHAR), chr(0)), coalesce(CAST(c_nationkey AS VARCHAR), chr(0)), coalesce(CAST(c_acctbal AS VARCHAR), chr(0)), coalesce(CAST(c_mktsegment AS VARCHAR), chr(0)))), 1, 15)) AS BIGINT) AS fp FROM replica),
ldig AS (SELECT bkt, count(*) AS n, bit_xor(fp) AS d FROM lf GROUP BY bkt),
rdig AS (SELECT bkt, count(*) AS n, bit_xor(fp) AS d FROM rf GROUP BY bkt),
bad AS (
  SELECT coalesce(l.bkt, r.bkt) AS bkt
  FROM ldig l FULL OUTER JOIN rdig r ON l.bkt = r.bkt
  WHERE NOT (l.n IS NOT DISTINCT FROM r.n AND l.d IS NOT DISTINCT FROM r.d)
),
lb AS (SELECT key, fp FROM lf WHERE bkt IN (SELECT bkt FROM bad)),
rb AS (SELECT key, fp FROM rf WHERE bkt IN (SELECT bkt FROM bad))
SELECT coalesce(lb.key, rb.key) AS key,
       CASE WHEN rb.key IS NULL THEN 'left_only'
            WHEN lb.key IS NULL THEN 'right_only'
            WHEN lb.fp <> rb.fp THEN 'modified' END AS change_type
FROM lb FULL OUTER JOIN rb ON lb.key = rb.key
WHERE (CASE WHEN rb.key IS NULL THEN 'left_only'
            WHEN lb.key IS NULL THEN 'right_only'
            WHEN lb.fp <> rb.fp THEN 'modified' END) IS NOT NULL
"""



_MV_ROUTED_REVENUE_SQL = """
SELECT l_returnflag,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem GROUP BY 1
"""



def q_schema_evolution_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA EVOLUTION on the scan path: two parquet generations of a
    feed — gen=1 written before a column existed, gen=2 with the new
    ``channel`` column — read back as ONE dataset via partition
    discovery + mergeSchema. This is the lakehouse reality the fixed
    fixtures cannot show (producers add columns; history does not get
    rewritten): the merged read must surface the union schema, old
    rows as NULL channel, with partition pruning still live. Staged
    in-query under _scratch_dir (cast_decimal_policy's pattern); the
    oracle replays the same split + derivation from the source rows,
    so the staged write -> evolved read roundtrip is value-lossless
    under the hash gate."""
    orders = table(
        spark,
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"],
    )
    gen1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    gen2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
        F.when(F.col("o_orderpriority") < F.lit("3"), F.lit("online"))
        .otherwise(F.lit("store"))
        .alias("channel"),
    )
    root = _scratch_dir("schema_evolution")
    gen1.write.mode("overwrite").parquet(f"{root}/feed/gen=1")
    gen2.write.mode("overwrite").parquet(f"{root}/feed/gen=2")
    back = spark.read.option("mergeSchema", "true").parquet(f"{root}/feed")
    if "channel" not in back.columns or "gen" not in back.columns:
        raise RuntimeError(
            f"mergeSchema lost columns: {back.columns}"
        )
    return back.groupBy("gen", "channel").agg(
        F.count("*").alias("n_orders"),
        F.sum("price_cents").alias("cents_sum"),
    )


_SCHEMA_EVOLUTION_SQL = """
WITH src AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
         CASE WHEN o_orderkey % 2 = 1 THEN
           CASE WHEN o_orderpriority < '3' THEN 'online' ELSE 'store' END
         END AS channel,
         CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 2 END AS gen
  FROM orders
)
SELECT gen, channel, count(*) AS n_orders,
       CAST(sum(price_cents) AS BIGINT) AS cents_sum
FROM src GROUP BY 1, 2
"""


__all__ = [
    'q_schema_evolution_scan',
    '_SCHEMA_EVOLUTION_SQL',
    'q_scd2_customer_history',
    'q_orders_pit_dimension',
    '_SCRATCH_DIRS',
    '_scratch_dir',
    'q_merge_upsert',
    'q_cast_decimal_policy',
    'q_indexed_zorder_scan',
    'q_production_daily_loop',
    'q_join_mv_retractions',
    'q_compacted_snapshot',
    'q_incremental_join_mv',
    'q_join_mv_temporal',
    'q_text_formats_roundtrip',
    'q_replica_drift_audit',
    'q_mv_routed_revenue',
    '_SCD2_CUSTOMER_HISTORY_SQL',
    '_ORDERS_PIT_DIMENSION_SQL',
    '_CAST_DECIMAL_POLICY_SQL',
    '_MERGE_UPSERT_SQL',
    '_INDEXED_ZORDER_SCAN_SQL',
    '_windowed_best_sql',
    '_PRODUCTION_DAILY_LOOP_SQL',
    '_REPLICA_DRIFT_AUDIT_SQL',
    '_MV_ROUTED_REVENUE_SQL',
]
