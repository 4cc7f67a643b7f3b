"""Semantics pins for operators/bloom.py: no false negatives ever,
false positives appear exactly where a bit-level replay says they
must, and builds merge by bit_or."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from etl_spark_spark.operators.bloom import (
    WORD_BITS,
    bloom_build,
    bloom_probe,
)


def _positions_py(key: str, m_bits: int, k: int) -> list[int]:
    return [
        int(hashlib.md5(f"bf{i}~{key}".encode()).hexdigest()[:15], 16)
        % m_bits
        for i in range(k)
    ]


def _hist(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k string")


def test_no_false_negatives_tiny_filter(spark):
    """Even a saturated 64-bit filter never misses a member."""
    keys = [f"doc-{i}" for i in range(50)]
    hist = _hist(spark, keys)
    bloom = bloom_build(hist, "k", m_bits=64, k=3)
    probed = bloom_probe(hist, bloom, "k", m_bits=64, k=3)
    assert all(r["bloom_hit"] for r in probed.collect())


def test_matches_python_bit_replay(spark):
    """Verdicts equal a pure-Python replay of the same md5 positions —
    including false positives the replay predicts."""
    m, k = 256, 3
    members = [f"m{i}" for i in range(30)]
    probes = members[:5] + [f"q{i}" for i in range(40)]
    words: dict[int, int] = {}
    for key in members:
        for p in _positions_py(key, m, k):
            w, b = divmod(p, WORD_BITS)
            words[w] = words.get(w, 0) | (1 << b)
    expect = {
        key: all(
            (words.get(p // WORD_BITS, 0) >> (p % WORD_BITS)) & 1
            for p in _positions_py(key, m, k)
        )
        for key in probes
    }
    # a filter this loaded (90 bits of 256) must produce at least one
    # false positive among 40 non-members, or the test is vacuous
    assert any(expect[q] for q in probes[5:])

    bloom = bloom_build(_hist(spark, members), "k", m_bits=m, k=k)
    got = {
        r["k"]: r["bloom_hit"]
        for r in bloom_probe(
            _hist(spark, probes), bloom, "k", m_bits=m, k=k
        ).collect()
    }
    assert got == expect


def test_merge_builds_by_bit_or(spark):
    """bloom(A) ∪ bloom(B) via bit_or == bloom(A ∪ B)."""
    a = [f"a{i}" for i in range(20)]
    b = [f"b{i}" for i in range(20)]
    m, k = 512, 4
    merged = (
        bloom_build(_hist(spark, a), "k", m_bits=m, k=k)
        .unionByName(bloom_build(_hist(spark, b), "k", m_bits=m, k=k))
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )
    direct = bloom_build(_hist(spark, a + b), "k", m_bits=m, k=k)
    assert {
        (r["word"], r["bits"]) for r in merged.collect()
    } == {(r["word"], r["bits"]) for r in direct.collect()}


def test_validation(spark):
    import pytest

    with pytest.raises(ValueError):
        bloom_build(_hist(spark, ["x"]), "k", m_bits=0, k=3)
    with pytest.raises(ValueError):
        bloom_build(_hist(spark, ["x"]), "k", m_bits=64, k=0)


def test_inline_probe_equals_join_probe(spark):
    """bloom_probe_inline (broadcast dense bitmap, map-only) gives the
    identical verdict to bloom_probe (the join path) on every probe —
    including false positives."""
    from etl_spark_spark.operators.bloom import bloom_probe_inline

    m, k = 256, 3
    members = [f"m{i}" for i in range(30)]
    probes = members[:5] + [f"q{i}" for i in range(40)]
    bloom = bloom_build(_hist(spark, members), "k", m_bits=m, k=k)
    join_v = {
        r["k"]: r["bloom_hit"]
        for r in bloom_probe(
            _hist(spark, probes), bloom, "k", m_bits=m, k=k
        ).collect()
    }
    inline_v = {
        r["k"]: r["bloom_hit"]
        for r in bloom_probe_inline(
            _hist(spark, probes), bloom, "k", m_bits=m, k=k
        ).collect()
    }
    assert inline_v == join_v


def test_inline_probe_size_guard(spark):
    from etl_spark_spark.operators.bloom import bloom_probe_inline
    import pytest

    bloom = bloom_build(_hist(spark, ["x"]), "k", m_bits=64, k=2)
    with pytest.raises(ValueError):
        bloom_probe_inline(
            _hist(spark, ["x"]), bloom, "k", m_bits=1 << 30, k=2
        )


def test_probe_keyed_on_value_not_row_id(spark):
    """Regression (ADVICE r10): bloom_probe must stay correct when the
    probe df contains a shuffle (reduce-side row order is
    nondeterministic across re-evaluations, so a monotonic row id is
    not a safe regroup key). Verdicts are now keyed on the key VALUE:
    duplicate keys get identical verdicts, NULL keys verdict false, and
    extra caller columns survive."""
    m, k = 512, 4
    members = [f"m{i}" for i in range(25)]
    bloom = bloom_build(_hist(spark, members), "k", m_bits=m, k=k)
    raw = spark.createDataFrame(
        [("m1", 1), ("m1", 2), ("q-new", 3), (None, 4), ("m2", 5)],
        "k string, tag int",
    )
    # force a shuffle upstream of the probe (the hazard scenario)
    shuffled = raw.repartition(8, "tag")
    rows = {
        r["tag"]: (r["k"], r["bloom_hit"])
        for r in bloom_probe(shuffled, bloom, "k", m_bits=m, k=k).collect()
    }
    assert rows[1] == ("m1", True) and rows[2] == ("m1", True)
    assert rows[5] == ("m2", True)
    assert rows[4] == (None, False)
    assert rows[3][0] == "q-new"  # verdict may be a false positive
    assert set(rows) == {1, 2, 3, 4, 5}  # no dropped/duplicated rows
