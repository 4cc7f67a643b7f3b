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


def test_epoch_shuffle_is_seedwise_permutation(spark):
    """epoch_shuffle emits exactly the positions 1..n (a permutation),
    is invariant to input partitioning, and a different seed gives a
    genuinely different order over the same id set."""
    from etl_spark_spark.operators.sampling import epoch_shuffle

    df = spark.range(0, 997).withColumnRenamed("id", "doc_id")

    def order(seed, parts):
        got = epoch_shuffle(df.repartition(parts), "doc_id", seed=seed)
        rows = {r["position"]: r["doc_id"] for r in got.collect()}
        assert sorted(rows) == list(range(1, 998))  # permutation
        return tuple(rows[p] for p in sorted(rows))

    a1 = order(0, 1)
    a8 = order(0, 8)
    assert a1 == a8  # partitioning-invariant
    b = order(1, 8)
    assert a1 != b  # seed switches the epoch permutation
    assert sorted(a1) == sorted(b)  # over the same ids


def test_dsir_weights_order_invariant_and_target_sensitive(spark):
    """dsir_log_weights must not depend on row order/partitioning, and
    docs matching the target slice's vocabulary must outweigh docs
    made of out-of-target tokens."""
    from pyspark.sql import functions as F

    from etl_spark_spark.operators.lm import dsir_log_weights

    rows = (
        [(i, "alpha beta gamma delta", "t") for i in range(10)]
        + [(100 + i, "alpha beta gamma epsilon", "s") for i in range(5)]
        + [(200 + i, "zeta eta theta iota", "s") for i in range(5)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, src string")
    w1 = {
        r["doc_id"]: r["log_weight_milli"]
        for r in dsir_log_weights(
            docs, "doc_id", "text", F.col("src") == "t"
        ).collect()
    }
    w2 = {
        r["doc_id"]: r["log_weight_milli"]
        for r in dsir_log_weights(
            docs.repartition(7).sort(F.col("doc_id").desc()),
            "doc_id",
            "text",
            F.col("src") == "t",
        ).collect()
    }
    assert w1 == w2  # partitioning/order-invariant, bit-stable
    # target-shaped doc beats the out-of-target doc
    assert w1[100] > w1[200]


def test_embedding_covariance_matches_definition(spark):
    """Covariance cells equal the exact integer definition computed in
    unbounded Python ints, diagonals are non-negative, and the result
    is partitioning-invariant."""
    from pyspark.sql import functions as F  # noqa: F401

    from etl_spark_spark.operators.stats import embedding_covariance

    vecs = [
        [0.1, -0.2, 0.3],
        [-0.05, 0.25, -0.15],
        [0.2, 0.0, 0.05],
        [-0.3, 0.1, 0.2],
        [0.07, -0.07, 0.0],
    ]
    emb = spark.createDataFrame(
        [(v,) for v in vecs], "embedding array<double>"
    )
    got = {
        (r["dim_i"], r["dim_j"]): r["cov_q2"]
        for r in embedding_covariance(emb, "embedding").collect()
    }
    got_re = {
        (r["dim_i"], r["dim_j"]): r["cov_q2"]
        for r in embedding_covariance(
            emb.repartition(4), "embedding"
        ).collect()
    }
    assert got == got_re
    q = [[round(x * 10**6) for x in v] for v in vecs]
    n = len(q)
    for i in range(3):
        for j in range(i, 3):
            num = n * sum(r[i] * r[j] for r in q) - sum(
                r[i] for r in q
            ) * sum(r[j] for r in q)
            assert got[(i, j)] == float(num) / float(n * n)
        assert got[(i, i)] >= 0.0


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=0, max_value=59),
    st.data(),
)
def test_simhash_probe_plan_pigeonhole_guarantee(d, data):
    """Pure-math property of plan_simhash_probe (no Spark): for ANY
    hamming budget d and ANY pair of 60-bit values within hamming d,
    some band's keys differ by at most the planned probe_flips — i.e.
    the enumerated XOR masks are guaranteed to connect the pair. Also
    pins the plan's structural invariants (band coverage, probe
    budget, t = d // b)."""
    from math import comb

    from etl_spark_spark.operators.neardup import plan_simhash_probe

    b, k, t = plan_simhash_probe(d)
    assert 1 <= b <= d + 1 and b * k <= 60 and t == d // b
    assert sum(comb(k, i) for i in range(t + 1)) <= 512

    # adversarial pair: x random, y = x with up to d flipped bits,
    # positions chosen by hypothesis (including clustered-in-one-band)
    x = data.draw(st.integers(min_value=0, max_value=(1 << 60) - 1))
    n_flips = data.draw(st.integers(min_value=0, max_value=d))
    positions = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=59),
            min_size=n_flips, max_size=n_flips, unique=True,
        )
    )
    y = x
    for p in positions:
        y ^= 1 << p
    mask = (1 << k) - 1
    band_flips = [
        bin(((x >> (k * i)) ^ (y >> (k * i))) & mask).count("1")
        for i in range(b)
    ]
    assert min(band_flips) <= t, (d, b, k, t, positions, band_flips)
