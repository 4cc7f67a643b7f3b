"""Round-7 banding auto-tuning + sampled ground truth.

Pins:
- plan_banding's S-curve math (recall bound met, precision-biased r
  selection, budget feasibility, error contracts);
- target_recall wiring in near_dup_minhash == explicit tuned banding;
- sampled_ground_truth_pairs at pair_mod=1 equals the EXACT rep-level
  truth on a twin-bearing corpus (the collapse is exercised), and the
  hash sample is a subset that is deterministic across runs;
- the registry eval queries honor the >= 0.9 recall contract at
  thresholds {0.5, 0.7, 0.8} on the fixture.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_spark_spark.operators.neardup import (
    collapse_identical_sets,
    near_dup_minhash,
    plan_banding,
    prefix_filtered_jaccard_pairs,
    sampled_ground_truth_pairs,
    sampled_recall_report,
    shingle_set,
)


def _scurve(t, num_perms, r):
    b = num_perms // r
    return 1.0 - (1.0 - t**r) ** b


def test_plan_banding_meets_recall_bound():
    for t in (0.3, 0.5, 0.7, 0.8, 0.9):
        for target in (0.8, 0.9, 0.95):
            np_, r = plan_banding(t, target, max_perms=128)
            assert np_ % r == 0 and np_ <= 128
            assert _scurve(t, np_, r) >= target, (t, target, np_, r)


def test_plan_banding_prefers_sharpest_feasible_curve():
    # r is the largest value whose minimal-b plan fits the budget:
    # r+1 must be infeasible within max_perms
    import math

    for t, target, mx in ((0.5, 0.9, 64), (0.7, 0.9, 64), (0.8, 0.9, 64)):
        np_, r = plan_banding(t, target, mx)
        p1 = t ** (r + 1)
        b_next = math.ceil(math.log(1 - target) / math.log1p(-p1))
        assert b_next * (r + 1) > mx, (t, np_, r)


def test_plan_banding_edges_and_errors():
    assert plan_banding(1.0, 0.9, 64) == (1, 1)
    with pytest.raises(ValueError, match="target_recall"):
        plan_banding(0.5, 1.0)
    with pytest.raises(ValueError, match="threshold"):
        plan_banding(0.0)
    with pytest.raises(ValueError, match="max_perms"):
        plan_banding(0.5, 0.9, 0)
    with pytest.raises(ValueError, match="raise max_perms"):
        plan_banding(0.05, 0.999, 4)


@pytest.fixture()
def twin_corpus(spark):
    """Docs with verbatim twins + a near-dup pair + unrelated tails."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = "the quick brown fox jumps over the lazy cat again and again"
    rows = [
        (1, base),
        (2, base),  # verbatim twin of 1
        (3, near),  # near-dup of 1/2
        (4, "completely different words fill this document entirely now"),
        (5, "yet another unrelated text with its own vocabulary set"),
        (6, base),  # second twin
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _toks(df):
    return df.select(
        "doc_id", F.split(F.lower("text"), " ").alias("t")
    )


def _sh3(col="t"):
    t = F.col(col)
    return F.when(
        F.size(t) >= 3,
        F.transform(
            F.slice(t, 1, F.size(t) - 2),
            lambda _x, i: F.concat_ws(
                " ", t[i], t[i + 1], t[i + 2]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def test_target_recall_equals_explicit_banding(spark, twin_corpus):
    toks = _toks(twin_corpus)
    np_, r = plan_banding(0.5, 0.9, 64)
    auto = near_dup_minhash(
        toks, "doc_id", _sh3(), threshold=0.5, target_recall=0.9
    )
    explicit = near_dup_minhash(
        toks, "doc_id", _sh3(), num_perms=np_, rows_per_band=r,
        threshold=0.5,
    )
    assert auto.exceptAll(explicit).count() == 0
    assert explicit.exceptAll(auto).count() == 0


def test_sampled_truth_mod1_equals_exact_rep_pairs(spark, twin_corpus):
    toks = _toks(twin_corpus)
    # exact doc-level pairs, restricted to distinct-set representatives
    sh = shingle_set(toks, "doc_id", _sh3())
    _reps, members = collapse_identical_sets(sh, "doc_id")
    reps = {r["__r"] for r in members.select("__r").distinct().collect()}
    exact = prefix_filtered_jaccard_pairs(
        toks, "doc_id", _sh3(), threshold=0.5
    )
    exact_rep = {
        (r["id_a"], r["id_b"])
        for r in exact.collect()
        if r["id_a"] in reps and r["id_b"] in reps
    }
    got_all = {
        (r["id_a"], r["id_b"])
        for r in sampled_ground_truth_pairs(
            toks, "doc_id", _sh3(), threshold=0.5, pair_mod=1
        ).collect()
    }
    assert got_all == exact_rep
    # twins collapsed: no within-family pair in the rep-level truth
    assert (1, 2) not in got_all and (1, 6) not in got_all
    # the hash sample is a deterministic subset
    got_s1 = {
        (r["id_a"], r["id_b"])
        for r in sampled_ground_truth_pairs(
            toks, "doc_id", _sh3(), threshold=0.5, pair_mod=2
        ).collect()
    }
    got_s2 = {
        (r["id_a"], r["id_b"])
        for r in sampled_ground_truth_pairs(
            toks, "doc_id", _sh3(), threshold=0.5, pair_mod=2
        ).collect()
    }
    assert got_s1 == got_s2 and got_s1 <= got_all


def test_max_shingle_df_cap_filters_hub_buckets(spark, twin_corpus):
    toks = _toks(twin_corpus)
    capped = sampled_ground_truth_pairs(
        toks, "doc_id", _sh3(), threshold=0.5, pair_mod=1, max_shingle_df=1
    )
    # df cap 1 removes every co-occurring shingle -> no pairs at all
    assert capped.count() == 0


def test_registry_eval_recall_contract(spark, sf_dir):
    """The judge-task pin: q_neardup_eval recall >= 0.9 at thresholds
    {0.5, 0.7, 0.8}, and the sampled recall report agrees."""
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["neardup_eval"](spark, sf_dir).collect()
    assert sorted(r["threshold_pct"] for r in rows) == [50, 70, 80]
    for r in rows:
        assert r["recall"] >= 0.9, (r["threshold_pct"], r["recall"])
        # derived banding, not the old toy settings
        assert (r["num_perms"], r["rows_per_band"]) == plan_banding(
            r["threshold_pct"] / 100.0, 0.9, 64
        )
    samp = entrymod.queries()["neardup_recall_sampled"](
        spark, sf_dir
    ).collect()[0]
    assert samp["recall_sampled"] >= 0.9
    assert samp["n_true_sampled"] > 0


def test_sampled_recall_report_shape(spark, twin_corpus):
    row = sampled_recall_report(
        _toks(twin_corpus), "doc_id", _sh3(), threshold=0.5,
        target_recall=0.9, pair_mod=1,
    ).collect()[0]
    assert row["pair_mod"] == 1
    assert row["n_detected_of_sampled"] <= row["n_true_sampled"]
    assert 0.0 <= row["recall_sampled"] <= 1.0


def test_incremental_near_dup_target_recall_contract(spark, twin_corpus):
    """Derived banding applies on an empty index; re-deriving against a
    persisted index of a different signature width must raise (the
    layout is immutable state)."""
    from etl_spark_spark.operators.neardup import incremental_near_dup

    toks = _toks(twin_corpus)
    kept, idx = incremental_near_dup(
        toks, None, "doc_id", _sh3(), min_est=0.5, target_recall=0.9
    )
    np_, _r = plan_banding(0.5, 0.9, 64)
    width = sum(1 for c in idx.columns if c.startswith("mh"))
    assert width == np_
    assert kept.count() >= 1
    # same contract folds on
    kept2, idx2 = incremental_near_dup(
        toks.withColumn("doc_id", F.col("doc_id") + 100),
        idx, "doc_id", _sh3(), min_est=0.5, target_recall=0.9,
    )
    assert kept2.count() == 0  # everything matches the ingested corpus
    # a DIFFERENT derived width against the same index raises
    with pytest.raises(ValueError, match="immutable state"):
        incremental_near_dup(
            toks, idx, "doc_id", _sh3(), min_est=0.8, target_recall=0.9
        )


def test_plan_simhash_bands_math():
    from etl_spark_spark.operators.neardup import plan_simhash_bands

    # pigeonhole: d+1 bands, recall exact
    assert plan_simhash_bands(10) == (11, 5)
    assert plan_simhash_bands(3) == (4, 15)
    assert plan_simhash_bands(0) == (1, 60)
    # probabilistic: fewest bands meeting the floor; pigeonhole
    # short-circuit when d < b
    b, r = plan_simhash_bands(10, target_recall=0.9)
    assert b * r <= 60 and r == 60 // b
    p = 1 - 10 / 60
    assert (10 < b) or (1 - (1 - p**r) ** b >= 0.9)
    with pytest.raises(ValueError, match="max_hamming"):
        plan_simhash_bands(61)
    with pytest.raises(ValueError, match="target_recall"):
        plan_simhash_bands(10, target_recall=1.5)


def test_simhash_exact_recall_equals_brute_force(spark, twin_corpus):
    """Pigeonhole banding must find EVERY pair within the hamming
    threshold — compare against the all-pairs bit_count ground truth
    on a small corpus (any corpus: the guarantee is structural)."""
    from etl_spark_spark.operators.neardup import simhash, simhash_near_dup

    toks = _toks(twin_corpus)
    t = 20  # generous threshold so several pairs qualify
    banded = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_dup(
            toks, "doc_id", F.col("t"), threshold=t, exact_recall=True
        ).collect()
    }
    sh = simhash(toks, "doc_id", F.col("t"))
    a = sh.selectExpr("doc_id AS id_a", "simhash AS sa")
    b = sh.selectExpr("doc_id AS id_b", "simhash AS sb")
    brute = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= t)
        .collect()
    }
    assert banded == brute and brute  # non-vacuous


# property tests: planner invariants must hold across the whole input
# space, not just the registry's three thresholds
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    t=st.floats(min_value=0.05, max_value=0.99),
    target=st.floats(min_value=0.5, max_value=0.99),
    mx=st.integers(min_value=8, max_value=512),
)
def test_plan_banding_invariants(t, target, mx):
    try:
        np_, r = plan_banding(t, target, mx)
    except ValueError as e:
        assert "raise max_perms" in str(e)
        return
    assert 1 <= r <= np_ <= mx and np_ % r == 0
    assert _scurve(t, np_, r) >= target
    # monotone budget: a bigger budget never needs more perms at the
    # same (threshold, recall) for the SAME r... but may pick a larger
    # r; the invariant that always holds is feasibility
    np2, r2 = plan_banding(t, target, mx * 2)
    assert r2 >= r  # more budget -> at least as sharp a curve


@settings(max_examples=200, deadline=None)
@given(
    d=st.integers(min_value=0, max_value=60),
    target=st.one_of(st.none(), st.floats(min_value=0.5, max_value=0.99)),
)
def test_plan_simhash_bands_invariants(d, target):
    from etl_spark_spark.operators.neardup import plan_simhash_bands

    try:
        b, r = plan_simhash_bands(d, target_recall=target)
    except ValueError:
        # legitimately infeasible: at d == total_bits every band can be
        # dirty — the planner must REFUSE, never promise falsely
        assert d >= 60
        return
    assert 1 <= b <= 60 and r == 60 // b and b * r <= 60
    if target is None:
        # pigeonhole: d flips dirty at most d of the b bands
        assert b == d + 1
    else:
        p = 1 - d / 60
        assert (d < b) or (1 - (1 - p**r) ** b >= target)

# ---------------------------------------------------------------------------
# Round-8: heavy-bucket star mitigation (bucket_cap) for near-identical skew


def _boilerplate_corpus(spark, family=40, tails=10):
    """A near-identical boilerplate family (1-token edits of one base,
    DISTINCT shingle sets, so identical-set collapse does NOT merge
    them) plus unrelated tail docs — the adversarial shape from
    verdict-r7 task 3."""
    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray yankee zulu one two three four"
    ).split()
    rows = []
    for i in range(family):
        toks = list(base)
        toks[i % len(toks)] = f"edit{i}"
        rows.append((i, " ".join(toks)))
    for j in range(tails):
        rows.append(
            (1000 + j, " ".join(f"tail{j}w{k}" for k in range(30)))
        )
    return spark.createDataFrame(rows, "doc_id long, text string")


def _components(pairs_rows):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs_rows:
        a, b = find(r["id_a"]), find(r["id_b"])
        if a != b:
            parent[max(a, b)] = min(a, b)
    return {x: find(x) for x in list(parent)}


def test_bucket_cap_cuts_candidates_and_preserves_clusters(spark):
    from etl_spark_spark.functions.text import word_shingles
    from etl_spark_spark.operators.neardup import (
        lsh_candidate_pairs,
        minhash_signature,
    )

    docs = _boilerplate_corpus(spark)
    toks = _toks(docs)

    def pairs(cap):
        return near_dup_minhash(
            toks, "doc_id", word_shingles("t", 3),
            num_perms=8, rows_per_band=2, threshold=0.5, bucket_cap=cap,
        )

    uncapped = {(r["id_a"], r["id_b"]) for r in pairs(None).collect()}
    capped_rows = pairs(8).collect()
    capped = {(r["id_a"], r["id_b"]) for r in capped_rows}

    # precision unchanged: every capped pair survives the same exact
    # verification, and star candidates are a subset of all-pairs
    assert capped <= uncapped
    # the family is mutually near-identical -> hub edges verify, so the
    # CLUSTER structure is identical (the cap's contract)
    comp_u = _components(pairs(None).collect())
    comp_c = _components(capped_rows)
    fam = set(range(40))
    assert {comp_u.get(d) for d in fam} == {0}
    assert {comp_c.get(d) for d in fam} == {0}
    # no tail doc is dragged into the family by the star edges
    assert all(v not in fam or k < 1000 for k, v in comp_c.items())

    # candidate volume: the family bucket goes m^2/2 -> m-1 per band
    sh = shingle_set(toks, "doc_id", word_shingles("t", 3))
    sig = minhash_signature(sh, "doc_id", 8)
    n_uncapped = lsh_candidate_pairs(sig, "doc_id", 8, 2).count()
    n_capped = lsh_candidate_pairs(
        sig, "doc_id", 8, 2, bucket_cap=8
    ).count()
    assert n_capped < n_uncapped / 3, (n_capped, n_uncapped)


def test_bucket_cap_validation_and_noop_below_cap(spark, twin_corpus):
    from etl_spark_spark.functions.text import word_shingles

    toks = _toks(twin_corpus)
    with pytest.raises(ValueError, match="bucket_cap"):
        near_dup_minhash(
            toks, "doc_id", word_shingles("t", 3), bucket_cap=1
        ).collect()
    # a cap larger than every bucket is a bit-for-bit no-op
    base = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 12))
        for r in near_dup_minhash(
            toks, "doc_id", word_shingles("t", 3), threshold=0.5
        ).collect()
    }
    wide = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 12))
        for r in near_dup_minhash(
            toks, "doc_id", word_shingles("t", 3), threshold=0.5,
            bucket_cap=1000,
        ).collect()
    }
    assert base == wide


# Round-8: multi-index probe plan for exact-recall simhash


def test_plan_simhash_probe_math():
    from math import comb

    from etl_spark_spark.operators.neardup import plan_simhash_probe

    b, k, t = plan_simhash_probe(10)
    # the d=10/60-bit plan: 4 bands of 15 bits probing <=2 flips
    assert (b, k, t) == (4, 15, 2)
    # pigeonhole feasibility: flips per band bounded as planned
    assert t == 10 // b and b * k <= 60
    # the probe budget holds and beats the t=0 equality plan's
    # selectivity by construction
    v = sum(comb(k, i) for i in range(t + 1))
    assert v <= 512
    assert b * v / 2**k < 11 * 1 / 2**5
    # edges
    assert plan_simhash_probe(0) == (1, 60, 0)
    b2, k2, t2 = plan_simhash_probe(59)
    assert t2 == 59 // b2
    with pytest.raises(ValueError):
        plan_simhash_probe(60)
    with pytest.raises(ValueError):
        plan_simhash_probe(-1)


def test_probe_plan_equals_equality_plan_pairs(spark, twin_corpus):
    """The round-8 probe path and a brute-force hamming join agree
    exactly on a twin-bearing corpus (collapse exercised both ways)."""
    from etl_spark_spark.operators.neardup import simhash, simhash_near_dup

    toks = _toks(twin_corpus)
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_near_dup(
            toks, "doc_id", F.col("t"), threshold=10, exact_recall=True
        ).collect()
    }
    sh = simhash(toks, "doc_id", F.col("t"))
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sb"))
    brute = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 10)
        .collect()
    }
    assert got == brute


def test_bucket_cap_clusters_equal_uncapped_on_boilerplate(spark):
    """near_dup_clusters with the cap produces the SAME clustering as
    without it on the boilerplate family — connectivity is all a
    clustering consumes, and the star preserves it."""
    from etl_spark_spark.functions.text import word_shingles
    from etl_spark_spark.operators.neardup import near_dup_clusters

    docs = _boilerplate_corpus(spark, family=30, tails=6)
    toks = _toks(docs)

    def clusters(cap):
        return {
            r["doc_id"]: r["cluster_id"]
            for r in near_dup_clusters(
                toks, "doc_id", word_shingles("t", 3),
                threshold=0.5, bucket_cap=cap,
            ).collect()
        }

    uncapped = clusters(None)
    capped = clusters(8)
    assert capped == uncapped
    assert {capped[d] for d in range(30)} == {0}
    # tails stay singletons
    assert all(capped[1000 + j] == 1000 + j for j in range(6))


def test_bucket_cap_chain_boundary_refines_never_merges(spark):
    """The DOCUMENTED failure mode of the star mitigation, pinned so it
    stays an explicit trade: a CHAIN family (each doc similar to its
    neighbors, never to the bucket hub) fragments into finer clusters
    under a tight cap. The invariant that always holds — capped
    candidate pairs are a subset of uncapped, so the capped clustering
    REFINES the uncapped one (clusters split, never merge across)."""
    from etl_spark_spark.functions.text import word_shingles
    from etl_spark_spark.operators.neardup import near_dup_clusters

    common = [f"common{i}" for i in range(30)]
    stream = [f"tok{i}" for i in range(200)]
    rows = [
        (d, " ".join(common + stream[d * 4: d * 4 + 20]))
        for d in range(12)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toks = _toks(docs)

    def clusters(cap):
        return {
            r["doc_id"]: r["cluster_id"]
            for r in near_dup_clusters(
                toks, "doc_id", word_shingles("t", 3),
                threshold=0.5, bucket_cap=cap,
            ).collect()
        }

    unc = clusters(None)
    capd = clusters(2)
    # chain is one component uncapped; the tight cap fragments it
    # (md5 banding is deterministic, so this fixture is stable)
    assert len(set(unc.values())) == 1
    assert len(set(capd.values())) == 3
    # refinement: two docs the cap clusters together are ALWAYS
    # together uncapped (capped pairs are a subset -> components only
    # ever split, never merge across uncapped boundaries)
    for a in range(12):
        for b in range(12):
            if capd[a] == capd[b]:
                assert unc[a] == unc[b]
