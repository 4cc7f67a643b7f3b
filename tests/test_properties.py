"""Property-based tests (hypothesis): the engine's determinism
contracts hold for arbitrary inputs, not just the fixtures."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_spark_spark.functions.money import money_sum
from etl_spark_spark.operators.multimodal import attach_media, sample_frames

MONEY = st.decimals(
    min_value="-99999.99", max_value="99999.99", places=2
).map(float)


@settings(max_examples=20, deadline=None)
@given(st.lists(MONEY, min_size=1, max_size=50))
def test_money_sum_is_exact(spark, values):
    """money_sum over 2-decimal inputs equals the exact rational sum
    regardless of row order or partitioning."""
    df = spark.createDataFrame([(v,) for v in values], "v double").repartition(4)
    got = df.agg(money_sum("v").alias("s")).collect()[0].s
    exact = float(sum(Fraction(f"{v:.2f}") for v in values))
    assert got == exact


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 1000), st.integers(0, 10**6)),
        min_size=1,
        max_size=60,
    )
)
def test_dedup_latest_picks_true_max(spark, rows):
    """dedup_latest keeps exactly the per-key row that a driver-side
    max over (ts, uid) would pick."""
    from etl_spark_spark.operators.dedup import dedup_latest

    uniq = {(k, ts, uid) for k, ts, uid in rows}
    df = spark.createDataFrame(list(uniq), "k int, ts int, uid int")
    got = {
        r.k: (r.ts, r.uid)
        for r in dedup_latest(
            df, ["k"], [F.col("ts").desc(), F.col("uid").desc()]
        ).collect()
    }
    want: dict[int, tuple[int, int]] = {}
    for k, ts, uid in uniq:
        if k not in want or (ts, uid) > want[k]:
            want[k] = (ts, uid)
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.floats(0, 100)),
            st.one_of(st.none(), st.floats(0, 100)),
            st.one_of(st.none(), st.floats(0, 100)),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_allocation_cascade_property(spark, rows):
    """For arbitrary (weight, total, amount) incl. NULLs and zeros, the
    allocation operator equals the reference cascade computed in
    Python: share if computable, else whole amount, else 0."""
    from etl_spark_spark.operators.reconcile import allocate_proportional

    df = spark.createDataFrame(rows, "w double, t double, a double")
    got = [
        r.alloc
        for r in allocate_proportional(df, "w", "t", "a", "alloc").collect()
    ]
    want = []
    for w, t, a in rows:
        if w is not None and t not in (None, 0.0) and a is not None:
            want.append(w / t * a)
        elif a is not None:
            want.append(a)
        else:
            want.append(0.0)
    # row order is preserved for a single-partition local relation.
    # NaN-aware equality: w/t can overflow to inf (t denormal), and
    # inf*0 = nan on BOTH sides — but nan != nan under ==
    import math

    assert len(got) == len(want)
    for g, w_ in zip(got, want):
        if isinstance(w_, float) and math.isnan(w_):
            assert isinstance(g, float) and math.isnan(g)
        else:
            assert g == w_


def test_resize_media_shape(spark):
    from etl_spark_spark.operators.multimodal import resize_media

    df = spark.createDataFrame([(1, b"abc"), (2, b"")], ["doc_id", "payload"])
    media = attach_media(df, "doc_id", "payload", "image/fake")
    out = resize_media(media, width=8, height=4).collect()
    assert all(r.media_size == 32 and r.width == 8 and r.height == 4 for r in out)
    assert {r.id for r in out} == {1, 2}


def test_frame_sampling_shape(spark):
    df = spark.createDataFrame(
        [(1, bytes(range(256)) * 4), (2, b"xy")], ["doc_id", "payload"]
    )
    media = attach_media(df, "doc_id", "payload", "video/fake")
    frames = sample_frames(media, n_frames=4, frame_bytes=16).collect()
    assert len(frames) == 8  # 2 items x 4 frames
    by_id = {}
    for r in frames:
        by_id.setdefault(r.id, []).append(r)
    assert [r.frame_no for r in sorted(by_id[1], key=lambda r: r.frame_no)] == [0, 1, 2, 3]
    assert all(len(r.frame) <= 16 for r in frames)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.dictionaries(
            st.integers(0, 6),  # key
            st.integers(0, 3),  # value
            min_size=0,
            max_size=7,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_scd2_fold_reconstructs_every_snapshot(spark, snaps):
    """Folding ANY sequence of snapshots through scd2_apply (with
    close_missing) yields a history whose as-of reconstruction at each
    fold instant equals that snapshot exactly, and at most one current
    row exists per key."""
    from etl_spark_spark.operators.scd import scd2_apply, scd2_as_of

    hist = None
    stamps = []
    for i, snap in enumerate(snaps):
        stamp = f"2024-01-{i + 1:02d}"
        stamps.append(stamp)
        rows = [(k, v) for k, v in snap.items()] or [(None, None)]
        df = spark.createDataFrame(rows, "k int, v int").filter(
            F.col("k").isNotNull()
        )
        hist = scd2_apply(hist, df, ["k"], stamp, close_missing=True)
    collected = hist.collect()
    per_key_current = {}
    for r in collected:
        if r.is_current:
            per_key_current[r.k] = per_key_current.get(r.k, 0) + 1
    assert all(n == 1 for n in per_key_current.values())
    for i, snap in enumerate(snaps):
        got = {
            (r.k, r.v)
            for r in scd2_as_of(hist, stamps[i] + "T12:00").collect()
        }
        assert got == set(snap.items()), f"snapshot {i} not reconstructed"


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 2), MONEY),
        min_size=0, max_size=15, unique_by=lambda t: t[0],
    ),
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 2), MONEY),
        min_size=0, max_size=15, unique_by=lambda t: t[0],
    ),
)
def test_incremental_rollup_equals_recompute(spark, tmp_path_factory, v1, v2):
    """For ANY two keyed versions, applying the CDC delta to the v1
    rollup reproduces the v2 rollup bit-for-bit (inserts, deletes,
    value updates, and group-changing updates all arise from random
    pairs)."""
    from etl_spark_spark.operators.rollup import agg_snapshot, apply_agg_delta
    from etl_spark_spark.sinks.versioned import snapshot_diff, write_version

    t = tmp_path_factory.mktemp("roll") / "t"
    schema = "id long, grp long, amount double"
    d1 = spark.createDataFrame(v1, schema) if v1 else spark.createDataFrame([], schema)
    d2 = spark.createDataFrame(v2, schema) if v2 else spark.createDataFrame([], schema)
    write_version(spark, d1, t)
    write_version(spark, d2, t)
    measures = {"n": (None, "count"), "cents": ("amount", "sum_cents")}
    delta = snapshot_diff(spark, t, 1, 2, ["id"], include_old=True)
    got = {
        (r.grp): (r.n, r.cents)
        for r in apply_agg_delta(
            agg_snapshot(d1, ["grp"], measures), delta, ["grp"], measures
        ).collect()
    }
    want = {
        (r.grp): (r.n, r.cents)
        for r in agg_snapshot(d2, ["grp"], measures).collect()
    }
    assert got == want
