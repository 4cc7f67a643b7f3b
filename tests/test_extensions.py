"""Tests for the LLM-data-pipeline extension operators: near-dup
recall, LSH containment vs exact top-k, multimodal plumbing, and the
Structured Streaming path's batch parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_spark_spark.functions.text import tokens, word_shingles
from etl_spark_spark.operators.multimodal import attach_media, extract_features
from etl_spark_spark.operators.neardup import (
    near_dup_minhash,
    ngram_jaccard_pairs,
    simhash,
)
from etl_spark_spark.operators.similarity import cosine_topk, cosine_topk_lsh
from etl_spark_spark.sources import read_events, table
from etl_spark_spark.streaming.stream import (
    run_available_now,
    stream_events_tumbling,
)
from etl_spark_spark.streaming.windows import tumbling_agg


def test_minhash_finds_seeded_near_dups(spark, sf_dir):
    """The fixture seeds high-Jaccard pairs; banded MinHash with
    8 perms / 4 bands must catch every pair the exact all-pairs
    method finds at jaccard >= 0.9 (prob of missing all 4 bands at
    j=0.9 is ~(1-0.81)^4 ~ 0.1%)."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("t"))
    sh = word_shingles("t", 3)
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(toks, "doc_id", sh, threshold=0.9).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in near_dup_minhash(toks, "doc_id", sh, threshold=0.5).collect()
    }
    assert exact, "fixture should contain near-duplicate documents"
    missed = exact - lsh
    assert not missed, f"LSH missed high-jaccard pairs: {missed}"


def test_ngram_jaccard_guards_against_quadratic_blowup(spark, sf_dir):
    """The all-pairs baseline is O(n^2) by design; it must refuse a
    corpus above max_docs with an actionable error, and a raised limit
    must be an explicit opt-in that leaves results unchanged."""
    import pytest

    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("t"))
    with pytest.raises(ValueError, match="O\\(n\\^2\\).*max_docs"):
        ngram_jaccard_pairs(
            toks, "doc_id", word_shingles("t", 3), max_docs=10
        )
    small = ngram_jaccard_pairs(
        toks, "doc_id", word_shingles("t", 3), threshold=0.9
    ).count()
    explicit = ngram_jaccard_pairs(
        toks, "doc_id", word_shingles("t", 3), threshold=0.9,
        max_docs=10_000_000,
    ).count()
    assert small == explicit and small > 0


def test_prefix_filtered_jaccard_equals_brute_force(spark, sf_dir):
    """AllPairs/PPJoin prefix filtering is pruning-only: at every
    threshold the qualifying pair set (and the exact jaccard values)
    must equal the quadratic shingle join's. The brute side runs
    collapse_identical=False so a twin-collapse bug shared by both
    pipelines cannot cancel out."""
    from etl_spark_spark.operators.neardup import prefix_filtered_jaccard_pairs

    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("t"))
    sh = word_shingles("t", 3)
    for t in (0.5, 0.7, 0.9):
        brute = {
            (r.id_a, r.id_b): r.jaccard
            for r in ngram_jaccard_pairs(
                toks, "doc_id", sh, threshold=t, collapse_identical=False
            ).collect()
        }
        pref = {
            (r.id_a, r.id_b): r.jaccard
            for r in prefix_filtered_jaccard_pairs(
                toks, "doc_id", sh, threshold=t
            ).collect()
        }
        assert pref == brute, (
            f"t={t}: missing={set(brute) - set(pref)} "
            f"extra={set(pref) - set(brute)}"
        )
    assert brute, "fixture should contain pairs at jaccard >= 0.9"


def test_prefix_index_role_covers_adversarial_shapes(spark):
    """Round-13 tightened the candidate join to the full AllPairs/PPJoin
    scheme: the SMALLER doc of a pair contributes only its INDEX prefix
    (|x| - ceil(2t/(1+t)|x|) + 1, strictly shorter than the probe
    prefix). Exactness rests on the earliest-common-shingle argument,
    whose edges this corpus is built to hit:

    - equal-size docs (the (n, id) tie-break decides the index role);
    - a pair EXACTLY at the threshold (overlap == ceil bound, so the
      earliest common shingle sits at the last admissible prefix slot);
    - nested sizes at the size-filter boundary (|small| == t*|large|);
    - a qualifying pair whose common shingles are the globally most
      FREQUENT ones (they sort to the prefix ends — the worst case for
      any prefix shortening).
    The qualifying pair set must equal the quadratic join's at every
    threshold."""
    from etl_spark_spark.operators.neardup import (
        ngram_jaccard_pairs,
        prefix_filtered_jaccard_pairs,
    )

    def doc(i, words):
        return (i, words.split())

    # vocabulary letters double as shingles (1-gram shingles below), so
    # set overlaps are controlled exactly; x/y/z are made high-frequency
    # so they land at prefix ENDS in the (df, shingle) global order
    rows = [
        doc(1, "a b c d x y z"),        # 7 tokens
        doc(2, "a b c d x y q"),        # equal size, J = 6/8 = 0.75
        doc(3, "a b x y z"),            # nested in 1: J = 5/7 ~ 0.714
        doc(4, "x y z"),                # tiny, shares only hubs
        doc(5, "p q r s t u v w"),      # disjoint-ish filler
        doc(6, "p q r s t u v x"),      # J(5,6) = 7/9 ~ 0.778
        doc(7, "x y z x y z"),          # dup tokens -> set {x,y,z}
        doc(8, "a b c d"),              # |8|=4 vs |1|=7: size boundary-ish
    ]
    df = spark.createDataFrame(rows, ["doc_id", "t"])
    sh = F.col("t")  # token array AS the shingle array (1-grams)
    for t in (0.4, 0.5, 0.7, 0.75, 0.8):
        brute = {
            (r.id_a, r.id_b): r.jaccard
            for r in ngram_jaccard_pairs(
                df, "doc_id", sh, threshold=t, collapse_identical=False
            ).collect()
        }
        pref = {
            (r.id_a, r.id_b): r.jaccard
            for r in prefix_filtered_jaccard_pairs(
                df, "doc_id", sh, threshold=t
            ).collect()
        }
        assert pref == brute, (
            f"t={t}: missing={set(brute) - set(pref)} "
            f"extra={set(pref) - set(brute)}"
        )


def test_verbatim_collapse_bit_identical_on_twin_corpus(spark, sf_dir):
    """Every pair generator collapses identical shingle sets before its
    candidate/verify machinery (collapse_identical_sets). On a corpus
    where each doc has verbatim twins, each operator's output must be
    BIT-identical to the uncollapsed quadratic formulation — same
    pairs, same values — including the expanded within-family pairs."""
    from etl_spark_spark.operators.neardup import (
        containment_pairs,
        prefix_filtered_jaccard_pairs,
    )

    docs = table(spark, sf_dir, "documents").limit(60)
    # twin each doc 3x under distinct ids: doc_id*10 + replica
    twins = docs.select(
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("rep"),
        "doc_id",
        "text",
    ).select(
        (F.col("doc_id") * 10 + F.col("rep")).alias("doc_id"), "text"
    )
    toks = twins.select("doc_id", tokens("text").alias("t"))
    sh = word_shingles("t", 3)
    brute = {
        (r.id_a, r.id_b): round(r.jaccard, 12)
        for r in ngram_jaccard_pairs(
            toks, "doc_id", sh, threshold=0.5, collapse_identical=False
        ).collect()
    }
    assert brute, "twinned corpus must contain qualifying pairs"
    for op_name, got in (
        (
            "ngram(collapsed)",
            {
                (r.id_a, r.id_b): round(r.jaccard, 12)
                for r in ngram_jaccard_pairs(
                    toks, "doc_id", sh, threshold=0.5
                ).collect()
            },
        ),
        (
            "prefix_filtered",
            {
                (r.id_a, r.id_b): round(r.jaccard, 12)
                for r in prefix_filtered_jaccard_pairs(
                    toks, "doc_id", sh, threshold=0.5
                ).collect()
            },
        ),
    ):
        assert got == brute, (
            f"{op_name}: missing={set(brute) - set(got)} "
            f"extra={set(got) - set(brute)}"
        )
    # LSH pairs: every within-family (twin) pair MUST be present with
    # jaccard exactly 1.0 (identical signatures band together always),
    # and every reported pair must carry the brute-force exact value
    lsh = {
        (r.id_a, r.id_b): round(r.jaccard, 12)
        for r in near_dup_minhash(
            toks, "doc_id", sh, threshold=0.5
        ).collect()
    }
    base_ids = [r.doc_id for r in docs.select("doc_id").collect()]
    for b in base_ids:
        fam = sorted(b * 10 + k for k in range(3))
        for i in range(3):
            for j in range(i + 1, 3):
                assert lsh.get((fam[i], fam[j])) == 1.0
    assert set(lsh) <= set(brute)
    for pair, j in lsh.items():
        assert j == brute[pair]
    # containment: twin pairs are exactly (n, n, n, 1.0)
    cont = containment_pairs(
        toks, "doc_id", sh, threshold=0.7
    ).collect()
    by_pair = {(r.id_a, r.id_b): r for r in cont}
    for b in base_ids:
        fam = sorted(b * 10 + k for k in range(3))
        r = by_pair.get((fam[0], fam[1]))
        assert r is not None and r.containment == 1.0
        assert r.inter == r.n_a == r.n_b and r.inter > 0


def test_position_attribution_conserves_cents(spark, sf_dir):
    """Per conversion, attributed credits must sum EXACTLY to the
    conversion's cents (integer apportionment, no float leakage), the
    first/last touches must carry >= any middle, and a conversion with
    no in-window touch must be absent."""
    from etl_spark_spark.operators.asof import position_attribution
    from etl_spark_spark.sources import read_events
    from pyspark.sql import functions as F

    ev = read_events(spark, sf_dir)
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("conv_id"),
        F.unix_micros("ts").alias("conv_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.unix_micros("ts").alias("touch_us"),
    )
    credits = position_attribution(
        touches, conv, ["user_id"], "touch_id", "touch_us",
        "conv_id", "conv_us", "cents", lookback_us=86_400_000_000,
    )
    per_conv = credits.groupBy("__conv_id").agg(
        F.sum("attributed_cents").alias("got")
    )
    chk = per_conv.join(
        conv, F.col("__conv_id") == F.col("conv_id")
    ).filter(F.col("got") != F.col("cents"))
    assert chk.count() == 0, chk.limit(5).collect()
    assert per_conv.count() > 0
    # U-shape: endpoints >= every middle credit (n >= 3)
    mids = credits.filter(
        (F.col("n") >= 3) & (F.col("rn") > 1) & (F.col("rn") < F.col("n"))
    ).groupBy("__conv_id").agg(F.max("attributed_cents").alias("mid_max"))
    ends = credits.filter(
        (F.col("rn") == 1) | (F.col("rn") == F.col("n"))
    ).groupBy("__conv_id").agg(F.min("attributed_cents").alias("end_min"))
    bad = mids.join(ends, "__conv_id").filter(
        F.col("mid_max") > F.col("end_min")
    )
    assert bad.count() == 0, bad.limit(5).collect()


def test_exact_group_quantiles_brute_force(spark):
    """smallest v with count(x<=v) >= ceil(q*n), per group, vs a
    direct Python computation on tie-heavy data."""
    import math
    import random

    from etl_spark_spark.operators.stats import exact_group_quantiles

    rng = random.Random(11)
    rows = [(rng.choice("XY"), float(rng.randint(0, 20))) for _ in range(500)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r.g: (r.n, r.q25, r.q50, r.q75)
        for r in exact_group_quantiles(df, ["g"], "v").collect()
    }
    for g in "XY":
        vs = sorted(v for gg, v in rows if gg == g)
        n = len(vs)
        want = tuple(vs[math.ceil(q * n) - 1] for q in (0.25, 0.5, 0.75))
        assert got[g] == (n, *want), (g, got[g], want)


def test_ks_two_sample_brute_force(spark):
    """D statistic vs direct CDF-difference computation, including the
    identical-distribution zero case."""
    import random

    from etl_spark_spark.operators.stats import ks_two_sample

    rng = random.Random(13)
    rows = [
        ("A" if rng.random() < 0.5 else "B", rng.randint(0, 30))
        for _ in range(800)
    ]
    df = spark.createDataFrame(rows, "variant string, v long")
    row = ks_two_sample(df, "v", "variant").collect()[0]
    a = sorted(v for t, v in rows if t == "A")
    b = sorted(v for t, v in rows if t == "B")
    grid = sorted({v for _, v in rows})
    want = max(
        abs(
            sum(x <= g for x in a) / len(a)
            - sum(x <= g for x in b) / len(b)
        )
        for g in grid
    )
    assert (row.n_a, row.n_b) == (len(a), len(b))
    assert abs(row.d_stat - want) < 1e-15
    same = spark.createDataFrame(
        [("A", v) for v in range(10)] + [("B", v) for v in range(10)],
        "variant string, v long",
    )
    assert ks_two_sample(same, "v", "variant").collect()[0].d_stat == 0.0


def test_pareto_frontier_equals_brute_force(spark):
    """Distributed sweep == quadratic dominance test, on data dense
    with ties and exact duplicates (the hard cases: same-x groups,
    duplicate frontier points, dominated duplicates)."""
    import random

    from etl_spark_spark.operators.windows import pareto_frontier_2d

    rng = random.Random(7)
    rows = [
        (i, rng.randint(0, 12), float(rng.randint(0, 12)))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id long, x int, y double")
    brute = {
        (i, x, y)
        for (i, x, y) in rows
        if not any(
            qx >= x and qy >= y and (qx > x or qy > y)
            for (_, qx, qy) in rows
        )
    }
    got = {
        (r.id, r.x, r.y) for r in pareto_frontier_2d(df, "x", "y").collect()
    }
    assert got == brute
    # coarse-bucket variant must give the identical frontier
    from pyspark.sql import functions as F

    got_b = {
        (r.id, r.x, r.y)
        for r in pareto_frontier_2d(
            df, "x", "y", bucket_col=F.floor(F.col("x") / 5)
        ).collect()
    }
    assert got_b == brute
    # round-12: a bucket NOT monotone in x raises loudly (the same
    # guard as scalable_running_sum) instead of silently skipping
    # cross-bucket dominance
    import pytest

    with pytest.raises(Exception, match="not monotone"):
        pareto_frontier_2d(
            df, "x", "y", bucket_col=F.col("x") % 3
        ).collect()


def test_triangle_counts_known_graph(spark):
    """K4 plus a pendant vertex: K4 has 4 triangles, each K4 node is in
    exactly 3, the pendant in none. Edges listed in mixed direction
    with a duplicate and a self-loop to exercise canonicalization."""
    from etl_spark_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [
            (1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (4, 2), (3, 4),
            (4, 5), (3, 3),
        ],
        "src int, dst int",
    )
    got = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_simhash_close_for_near_dups(spark, sf_dir):
    """Near-duplicate docs should have near-identical simhashes
    (small hamming distance), unrelated docs mostly should not."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("t"))
    pair = (
        ngram_jaccard_pairs(toks, "doc_id", word_shingles("t", 3), 0.9)
        .limit(1)
        .collect()
    )
    assert pair
    a, b = pair[0].id_a, pair[0].id_b
    sh = {r.doc_id: r.simhash for r in simhash(
        docs.filter(F.col("doc_id").isin(a, b)), "doc_id", tokens("text")
    ).collect()}
    hamming = bin(sh[a] ^ sh[b]).count("1")
    assert hamming <= 10, f"near-dup pair {a},{b} hamming={hamming}"


def test_lsh_topk_contained_in_exact(spark, sf_dir):
    """Every (query, neighbor) the LSH variant returns must appear in
    the exact brute-force ranking with the same cosine score."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in cosine_topk(emb, q, "vec_id", "embedding", k=50).collect()
    }
    approx = cosine_topk_lsh(emb, q, "vec_id", "embedding", dim=64, k=3).collect()
    assert approx, "LSH should return some neighbors"
    for r in approx:
        key = (r.query_id, r.neighbor_id)
        if key in exact:
            assert abs(exact[key] - r.cos_sim) < 1e-12


def test_ivf_topk_contained_in_exact(spark, sf_dir):
    """IVF results must be a subset of the exact ranking with identical
    scores, and with n_probe=n_lists (probe everything) it must equal
    the exact top-k."""
    from etl_spark_spark.operators.similarity import cosine_topk_ivf

    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact_all = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in cosine_topk(emb, q, "vec_id", "embedding", k=500).collect()
    }
    approx = cosine_topk_ivf(emb, q, "vec_id", "embedding", k=3).collect()
    assert approx
    for r in approx:
        assert exact_all[(r.query_id, r.neighbor_id)] == r.cos_sim
    # full probe == exact
    full = cosine_topk_ivf(
        emb, q, "vec_id", "embedding", k=3, n_lists=8, n_probe=8
    ).collect()
    exact3 = cosine_topk(emb, q, "vec_id", "embedding", k=3).collect()
    assert {(r.query_id, r.neighbor_id, r.rank) for r in full} == {
        (r.query_id, r.neighbor_id, r.rank) for r in exact3
    }


def test_lsh_near_dup_contained_bit_exact(spark, sf_dir):
    """Every pair the LSH near-dup emits must appear in the exact
    blocked all-pairs result with a BIT-identical score (same unit-row
    op order), with substantial recall even at the fixture's low pair
    similarities (~0.4-0.5 cosine — near-identical pairs at production
    thresholds collide almost surely)."""
    from etl_spark_spark.operators.similarity import (
        cosine_near_dup_pairs,
        cosine_near_dup_pairs_lsh,
    )

    emb = table(spark, sf_dir, "embeddings")
    exact = {
        (r.id_a, r.id_b): r.cos_sim
        for r in cosine_near_dup_pairs(emb, "vec_id", "embedding", 0.35).collect()
    }
    approx = {
        (r.id_a, r.id_b): r.cos_sim
        for r in cosine_near_dup_pairs_lsh(
            emb, "vec_id", "embedding", 64, 0.35
        ).collect()
    }
    assert approx, "LSH near-dup should find pairs"
    for k, v in approx.items():
        assert k in exact and exact[k] == v, f"pair {k} not bit-contained"
    assert len(approx) >= 0.5 * len(exact)


def test_ivf_recall_on_clustered_data(spark):
    """On data WITH cluster structure the trained quantizer must earn
    high recall at n_probe << n_lists (on uniformly random vectors no
    quantizer beats ~n_probe/n_lists — the fixture embeddings are
    random, so quality is pinned here on planted clusters instead).
    Also exercises multi-partition distributed training."""
    import numpy as np

    from etl_spark_spark.operators.similarity import cosine_topk, cosine_topk_ivf

    rng = np.random.default_rng(7)
    dim, n_clusters, per = 32, 8, 60
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1)[:, None]
    rows = []
    for ci in range(n_clusters):
        pts = centers[ci] + 0.15 * rng.normal(size=(per, dim))
        for j, p in enumerate(pts):
            rows.append((ci * per + j, [float(x) for x in p]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(6)
    q = df.filter(F.col("vec_id") % per == 0)  # one query per cluster
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(df, q, "vec_id", "embedding", k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_ivf(
            df, q, "vec_id", "embedding", k=3, n_lists=16, n_probe=4
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.85, f"clustered-data recall@3 {recall:.2f} < 0.85"


def test_doc_curation_invariants(spark, sf_dir):
    """The curated corpus must satisfy every stage's contract: quality
    and token bounds hold, no surviving near-dup pair, and for each
    removed near-dup pair the LOWER id survived (when it passed the
    earlier gates)."""
    from etl_spark_spark.operators.neardup import ngram_jaccard_pairs
    from etl_spark_spark.pipelines.curation import curate_documents

    docs = table(spark, sf_dir, "documents")
    out = curate_documents(docs, min_quality=0.05, min_tokens=5).collect()
    assert out, "curation should keep something"
    ids = {r.doc_id for r in out}
    for r in out:
        assert r.quality >= 0.05 and r.n_tokens >= 5
    toks = docs.select("doc_id", tokens("text").alias("t"))
    pairs = ngram_jaccard_pairs(
        toks, "doc_id", word_shingles("t", 3), threshold=0.8
    ).collect()
    assert pairs, "fixture has seeded near-dup pairs"
    for p in pairs:
        assert not (p.id_a in ids and p.id_b in ids), (
            f"near-dup pair ({p.id_a},{p.id_b}) both survived"
        )


def test_curation_default_bucket_cap_is_noop_at_organic_rates(
    spark, sf_dir
):
    """The production pair stage ships with bucket_cap=4096 by default;
    at organic duplicate rates every band bucket is far below the cap,
    so the capped pipeline must produce BIT-IDENTICAL output to the
    uncapped one (the star rewrite only engages above the cap). Also
    pins that an engaged tiny cap still keeps the composite's drop-set
    semantics (every kept doc is no pair's id_b)."""
    from etl_spark_spark.pipelines.curation import curate_documents

    docs = table(spark, sf_dir, "documents")
    kw = dict(min_quality=0.05, min_tokens=5, pair_stage="minhash")
    capped = sorted(
        map(tuple, curate_documents(docs, **kw).collect())
    )  # default cap=4096
    uncapped = sorted(
        map(tuple, curate_documents(docs, bucket_cap=None, **kw).collect())
    )
    assert capped == uncapped and capped
    # an engaged tiny cap emits a SUBSET of the uncapped pair set
    # (m-1 star pairs instead of m^2/2), so its drop set can only
    # shrink: the kept corpus is a superset of the default-cap one
    tiny = {
        r.doc_id for r in curate_documents(docs, bucket_cap=2, **kw).collect()
    }
    assert tiny >= {r[0] for r in capped}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pair_stage"):
        curate_documents(docs, pair_stage="bogus")


def test_multimodal_feature_plumbing(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(20)
    media = attach_media(docs, "doc_id", "text", "text/plain")
    assert dict(media.dtypes)["media"] == "binary"
    feats = extract_features(media, fake=True).collect()
    assert len(feats) == 20
    for r in feats:
        assert r.media_type == "text/plain"
        assert len(r.feat) == 8
        assert r.n_bytes > 0 and len(r.checksum) == 32
    # determinism across runs
    feats2 = extract_features(media, fake=True).collect()
    assert sorted(r.checksum for r in feats) == sorted(r.checksum for r in feats2)


def test_sketch_stats_error_bounds(spark, sf_dir):
    """Sketch aggregates must land within documented error of exact:
    HLL++ default rsd=5%; GK percentile within the value spread. The
    raw sketches are checked here against independently computed exact
    aggregates; the registered query emits the same invariants as
    driver-hashable booleans, asserted true below."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F2

    li = table(spark, sf_dir, "lineitem")
    sk = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F2.approx_count_distinct("l_partkey").alias("approx_parts"),
            F2.approx_percentile("l_extendedprice", 0.5).alias("approx_p50"),
        )
        .collect()
    }
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F2.count_distinct("l_partkey").alias("parts"),
            F2.percentile("l_extendedprice", 0.5).alias("p50"),
        )
        .collect()
    }
    for flag, e in exact.items():
        s = sk[flag]
        assert abs(s.approx_parts - e.parts) <= 0.15 * e.parts
        assert abs(s.approx_p50 - e.p50) <= 0.10 * e.p50
    for r in entrymod.q_sketch_stats(spark, sf_dir).collect():
        assert r.distinct_ok and r.p50_ok


def test_group_trend_matches_duckdb_regr(spark, sf_dir):
    """applyInPandas OLS agrees with DuckDB's regr_slope/intercept to
    float tolerance (not bit-exact — different formulas)."""
    import duckdb

    from etl_spark_spark.operators.grouped import fit_group_trend

    ev = read_events(spark, sf_dir).select(
        "user_id", F.unix_micros(F.col("ts")).alias("x"), F.col("value").alias("y")
    )
    got = {
        r.user_id: (r.n, r.slope, r.intercept)
        for r in fit_group_trend(ev, ["user_id"], "x", "y").collect()
    }
    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT user_id, count(*), regr_slope(value, epoch_us(ts)),
               regr_intercept(value, epoch_us(ts))
        FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1
        """
    ).fetchall()
    assert len(got) == len(want) > 0
    for uid, n, slope, icept in want:
        gn, gs, gi = got[uid]
        assert gn == n
        if slope is None:
            assert gs is None
        else:
            assert abs(gs - slope) <= 1e-6 * max(1.0, abs(slope))
            assert abs(gi - icept) <= 1e-6 * max(1.0, abs(icept))


def test_group_trend_exact_accuracy_and_order_invariance(spark, sf_dir):
    """fit_group_trend_exact agrees with DuckDB regr_slope to float
    tolerance AND is bit-identical under arbitrary repartitioning
    (exact integer sufficient statistics are associative)."""
    import duckdb

    from etl_spark_spark.operators.grouped import (
        fit_group_trend_exact,
        fit_group_trend_exact_sql,
    )

    ev = read_events(spark, sf_dir).select(
        "user_id", F.unix_micros(F.col("ts")).alias("x"), F.col("value").alias("y")
    )
    got = {
        r.user_id: (r.n, r.slope, r.intercept)
        for r in fit_group_trend_exact(ev, ["user_id"], "x", "y").collect()
    }
    # bit-identity under a different partitioning / row order
    shuffled = {
        r.user_id: (r.n, r.slope, r.intercept)
        for r in fit_group_trend_exact(
            ev.repartition(7, "x"), ["user_id"], "x", "y"
        ).collect()
    }
    assert got == shuffled
    # the expression-only (zero-Python) variant computes the same bits
    sql_form = {
        r.user_id: (r.n, r.slope, r.intercept)
        for r in fit_group_trend_exact_sql(ev, ["user_id"], "x", "y").collect()
    }
    assert got == sql_form
    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT user_id, count(*), regr_slope(value, epoch_us(ts)),
               regr_intercept(value, epoch_us(ts))
        FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1
        """
    ).fetchall()
    assert len(got) == len(want) > 0
    for uid, n, slope, icept in want:
        gn, gs, gi = got[uid]
        assert gn == n
        if slope is None:
            assert gs is None
        else:
            # y is rounded to cents in the exact path -> looser tolerance
            assert abs(gs - slope) <= 1e-2 * max(1.0, abs(slope))
            assert abs(gi - icept) <= 1e-2 * max(1.0, abs(icept))


def test_streaming_matches_batch(spark, sf_dir):
    """availableNow drain of the streaming tumbling agg equals the
    batch tumbling agg on the same files (stream/batch parity)."""
    stream_rows = {
        (r.window_start, r.event_type, r.n_events)
        for r in run_available_now(
            stream_events_tumbling(spark, sf_dir, glob="events.parquet"),
            query_name="t_stream_parity",
        )
    }
    batch = tumbling_agg(
        read_events(spark, sf_dir),
        "ts",
        "1 hour",
        [F.col("event_type")],
        [F.count("*").alias("n_events")],
    ).collect()
    batch_rows = {(r.window_start, r.event_type, r.n_events) for r in batch}
    assert stream_rows == batch_rows


def test_ivfpq_contained_bit_exact(spark, sf_dir):
    """IVF-PQ results are a subset of the exact ranking with BIT-exact
    scores (the rerank re-scores expression-side), and with full probe
    + a rerank window larger than the corpus it must equal the exact
    top-k (ADC can then only reorder the shortlist, which rerank
    re-sorts exactly)."""
    from etl_spark_spark.operators.similarity import cosine_topk_ivf_pq

    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact_all = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in cosine_topk(emb, q, "vec_id", "embedding", k=500).collect()
    }
    approx = cosine_topk_ivf_pq(
        emb, q, "vec_id", "embedding", dim=64, k=3, n_lists=8, n_probe=2
    ).collect()
    assert approx
    for r in approx:
        assert exact_all[(r.query_id, r.neighbor_id)] == r.cos_sim
    full = cosine_topk_ivf_pq(
        emb, q, "vec_id", "embedding", dim=64, k=3,
        n_lists=8, n_probe=8, rerank=10_000,
    ).collect()
    exact3 = cosine_topk(emb, q, "vec_id", "embedding", k=3).collect()
    assert {(r.query_id, r.neighbor_id, r.rank) for r in full} == {
        (r.query_id, r.neighbor_id, r.rank) for r in exact3
    }


def test_ivfpq_recall_on_clustered_data(spark):
    """Same planted-cluster bar as IVF: the PQ shortlist + exact rerank
    must keep recall despite scoring candidates from int16 codes only."""
    import numpy as np

    from etl_spark_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_ivf_pq,
    )

    rng = np.random.default_rng(11)
    dim, n_clusters, per = 32, 8, 60
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1)[:, None]
    rows = []
    for ci in range(n_clusters):
        pts = centers[ci] + 0.15 * rng.normal(size=(per, dim))
        for j, p in enumerate(pts):
            rows.append((ci * per + j, [float(x) for x in p]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(6)
    q = df.filter(F.col("vec_id") % per == 0)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(df, q, "vec_id", "embedding", k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_ivf_pq(
            df, q, "vec_id", "embedding", dim=dim, k=3,
            n_lists=16, n_probe=4, m_subspaces=8, n_codes=16, rerank=32,
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.85, f"IVF-PQ clustered-data recall@3 {recall:.2f} < 0.85"


def test_ivfpq_int8_rerank_recall_and_score_accuracy(spark):
    """The int8 scalar-quantized rerank must keep planted-cluster
    recall (same 0.85 bar as the float rerank) while moving 1/4 the
    rerank bytes, and its SQ-approximate scores must sit within the
    per-vector quantization error of the exact cosine."""
    import numpy as np

    from etl_spark_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_ivf_pq,
    )

    rng = np.random.default_rng(13)
    dim, n_clusters, per = 32, 8, 60
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1)[:, None]
    rows = []
    for ci in range(n_clusters):
        pts = centers[ci] + 0.15 * rng.normal(size=(per, dim))
        for j, p in enumerate(pts):
            rows.append((ci * per + j, [float(x) for x in p]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(6)
    q = df.filter(F.col("vec_id") % per == 0)
    exact_scores = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in cosine_topk(df, q, "vec_id", "embedding", k=500).collect()
    }
    exact3 = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(df, q, "vec_id", "embedding", k=3).collect()
    }
    approx = cosine_topk_ivf_pq(
        df, q, "vec_id", "embedding", dim=dim, k=3,
        n_lists=16, n_probe=4, m_subspaces=8, n_codes=16, rerank=32,
        rerank_int8=True,
    ).collect()
    got = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact3 & got) / len(exact3)
    assert recall >= 0.85, f"int8-rerank recall@3 {recall:.2f} < 0.85"
    # SQ score error bound: |err| <= sum_i |q_i| * scale/2 with
    # scale <= 1/127 for unit rows -> ||q||_1 / 254; use 2x slack for
    # rounding of the scale itself
    for r in approx:
        err = abs(r.cos_sim - exact_scores[(r.query_id, r.neighbor_id)])
        assert err <= 2.0 * np.sqrt(dim) / 254, (r, err)


def test_ivfpq_rejects_indivisible_dim(spark, sf_dir):
    import pytest

    from etl_spark_spark.operators.similarity import cosine_topk_ivf_pq

    emb = table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError):
        cosine_topk_ivf_pq(
            emb, emb.limit(1), "vec_id", "embedding", dim=64, m_subspaces=7
        )


def test_ivfpq_residual_adc_quality(spark):
    """The ADC shortlist itself must be good, not just rescued by a wide
    rerank: with a TIGHT rerank window (8 for k=5) on planted clusters,
    residual-encoded codes keep recall@5 >= 0.6 (raw-vector codes
    measured 0.475 on this fixture — the residual refinement is what
    buys the margin)."""
    import numpy as np

    from etl_spark_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_ivf_pq,
    )

    rng = np.random.default_rng(3)
    dim, n_clusters, per = 32, 8, 60
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1)[:, None]
    rows = []
    for ci in range(n_clusters):
        pts = centers[ci] + 0.15 * rng.normal(size=(per, dim))
        for j, p in enumerate(pts):
            rows.append((ci * per + j, [float(x) for x in p]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(6)
    q = df.filter(F.col("vec_id") % per == 0)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(df, q, "vec_id", "embedding", k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_ivf_pq(
            df, q, "vec_id", "embedding", dim=dim, k=5,
            n_lists=16, n_probe=6, rerank=8,
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"tight-rerank ADC recall@5 {recall:.3f} < 0.6"


def test_pii_scrub_staged_order(spark):
    """A credit card contains phone-shaped digit runs; the staged
    scrubber must count it once as cc and zero times as phone, and the
    final text must carry only the tags."""
    from etl_spark_spark.functions.scrub import scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail a@b.io from 10.0.0.1 card 4012-8888-8888-1881 ok"),
            (2, "call +55 9999-1234 twice +55 9999-1234"),
            (3, "nothing to redact here"),
        ],
        "id long, txt string",
    )
    out = {r["id"]: r for r in scrub_pii(df, "txt").collect()}
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_cc"], out[1]["n_phone"]) == (1, 1, 1, 0)
    assert out[1]["clean_text"] == "mail <EMAIL> from <IP> card <CC> ok"
    assert out[2]["n_phone"] == 2 and "<PHONE>" in out[2]["clean_text"]
    assert out[3]["clean_text"] == "nothing to redact here"


def test_dup_fraction_edges(spark):
    """Empty array -> 0.0 (not null/NaN); all-same -> (n-1)/n."""
    from etl_spark_spark.functions.text import dup_fraction

    df = spark.createDataFrame(
        [(1, []), (2, ["a", "a", "a", "a"]), (3, ["a", "b"])],
        "id long, arr array<string>",
    )
    got = {r["id"]: r["f"] for r in df.select("id", dup_fraction("arr").alias("f")).collect()}
    assert got == {1: 0.0, 2: 0.75, 3: 0.0}


def test_fuzzy_join_blocking_complete_for_dist1(spark):
    """Edits in the prefix region are caught by the suffix block and
    vice versa; far pairs never match; distance is exact."""
    from etl_spark_spark.operators.fuzzy import fuzzy_join

    clean = spark.createDataFrame(
        [(1, "abcdef1234"), (2, "zzzzzz9999")], "id long, code string"
    )
    dirty = spark.createDataFrame(
        [
            (10, "Xbcdef1234"),  # substitution at pos 1 (prefix block broken)
            (11, "abcdef123X"),  # substitution at pos 10 (suffix block broken)
            (12, "abcdef124"),   # deletion mid-suffix region
            (13, "qqqqqqqqqq"),  # no match
        ],
        "id long, code string",
    )
    clean2 = clean.withColumnsRenamed({"id": "cid", "code": "ccode"})
    pairs = fuzzy_join(dirty, clean2, "id", "code", "cid", "ccode", max_dist=1)
    got = {(r["id"], r["cid"], r["distance"]) for r in pairs.collect()}
    assert got == {(10, 1, 1), (11, 1, 1), (12, 1, 1)}


def test_ivfpq_opq_rotation_improves_tight_shortlist(spark):
    """OPQ (learned orthonormal rotation before the subspace split)
    must beat identity-rotation PQ on CORRELATED residuals: with a
    tight rerank window the ADC shortlist itself has to be right, and
    the rotation decorrelates the subspaces. Also: results stay
    bit-exact contained in the exact ranking (rerank re-scores)."""
    import numpy as np

    from etl_spark_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_ivf_pq,
    )

    rng = np.random.default_rng(11)
    dim, n_clusters, per = 32, 8, 60
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1)[:, None]
    mix = rng.normal(size=(dim, dim)) * 0.5 + np.eye(dim)  # correlated noise
    rows = []
    for ci in range(n_clusters):
        pts = centers[ci] + 0.15 * (rng.normal(size=(per, dim)) @ mix)
        for j, p in enumerate(pts):
            rows.append((ci * per + j, [float(x) for x in p]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(6)
    q = df.filter(F.col("vec_id") % per == 0)
    exact5 = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(df, q, "vec_id", "embedding", k=5).collect()
    }

    def recall(opq_iters):
        got = {
            (r.query_id, r.neighbor_id)
            for r in cosine_topk_ivf_pq(
                df, q, "vec_id", "embedding", dim=dim, k=5,
                n_lists=16, n_probe=4, m_subspaces=8, n_codes=16,
                rerank=8, opq_iters=opq_iters,
            ).collect()
        }
        return len(exact5 & got) / len(exact5)

    base, opq = recall(0), recall(3)
    # everything is deterministic (seeded data, deterministic k-means),
    # so these are exact repeatable numbers, not flaky thresholds
    assert opq > base, f"OPQ must improve the tight shortlist: {opq} vs {base}"
    assert opq >= 0.6, f"OPQ tight-rerank recall@5 {opq:.2f} < 0.6"


def test_semantic_dedup_kmeans_path_on_planted_clusters(spark):
    """The trained-quantizer path of SemDeDup-style dedup: on planted
    clusters, within-cluster scoring with k-means assignment must (a)
    emit only pairs that exact all-pairs also emits, with bit-identical
    cosines, and (b) recover most of the true near-dup pairs — the
    clusters are tight, so same-cluster neighbors land in the same
    k-means cell."""
    import numpy as np

    from etl_spark_spark.operators.similarity import (
        cosine_near_dup_pairs,
        semantic_dedup,
        semantic_dedup_pairs,
    )

    rng = np.random.default_rng(7)
    dim, n_clusters, per = 32, 6, 40
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1)[:, None]
    rows = []
    for ci in range(n_clusters):
        pts = centers[ci] + 0.10 * rng.normal(size=(per, dim))
        for j, p in enumerate(pts):
            rows.append((ci * per + j, [float(x) for x in p]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(6)

    thr = 0.9
    exact = {
        (r.id_a, r.id_b): r.cos_sim
        for r in cosine_near_dup_pairs(
            df, "vec_id", "embedding", threshold=thr
        ).collect()
    }
    got = {
        (r.id_a, r.id_b): r.cos_sim
        for r in semantic_dedup_pairs(
            df, "vec_id", "embedding", threshold=thr, n_clusters=n_clusters
        ).collect()
    }
    assert exact, "fixture must produce true near-dup pairs"
    for pair, sim in got.items():
        assert pair in exact, f"pair {pair} not in exact all-pairs"
        assert sim == exact[pair], f"cosine drifted for {pair}"
    recall = len(got) / len(exact)
    assert recall >= 0.8, f"within-cluster recall {recall:.2f} < 0.8"

    # survivors = corpus minus the higher id of each found pair
    kept = {r.id for r in semantic_dedup(
        df, "vec_id", "embedding", threshold=thr, n_clusters=n_clusters
    ).select(F.col("vec_id").alias("id"), "cluster").collect()}
    dropped = {b for (_, b) in got}
    assert kept == {i for i, _ in rows} - dropped


def test_semantic_dedup_blocking_invariance(spark, sf_dir):
    """n_blocks is a physical layout knob: pair sets and cosines from
    the blocked within-cluster scorer must be identical at any block
    count (including blocks >> cluster sizes)."""
    from etl_spark_spark.operators.similarity import (
        cluster_argmax,
        semantic_dedup_pairs,
    )

    emb = (
        table(spark, sf_dir, "embeddings")
        .withColumn("cluster", cluster_argmax("embedding"))
    )
    runs = [
        {
            (r.cluster, r.id_a, r.id_b): r.cos_sim
            for r in semantic_dedup_pairs(
                emb, "vec_id", "embedding", 0.3,
                cluster_col="cluster", n_blocks=nb,
            ).collect()
        }
        for nb in (1, 3, 8)
    ]
    assert runs[0], "threshold must yield pairs at fixture scale"
    assert runs[0] == runs[1] == runs[2]


def test_quality_model_generalizes_to_heldout_half(spark):
    """The hashed-n-gram logistic model must learn the quality signal
    from one half of a separable corpus and score the OTHER half
    correctly — i.e. it generalizes beyond memorized ids, which is the
    point of replacing the heuristic with a model."""
    from etl_spark_spark.operators.classify import (
        score_quality,
        train_quality_model,
    )

    good = [
        f"the quick brown fox number {i} jumps over the lazy dog and "
        f"runs through the green field toward the river bank today"
        for i in range(60)
    ]
    bad = [" ".join(["zqx"] * 3 + [f"k{i}"] + ["zqx"] * 3) for i in range(60)]
    rows = [(i, t, 1.0) for i, t in enumerate(good)] + [
        (1000 + i, t, 0.0) for i, t in enumerate(bad)
    ]
    df = spark.createDataFrame(rows, "id long, text string, y double").repartition(4)
    train = df.filter(F.col("id") % 2 == 0)
    test = df.filter(F.col("id") % 2 == 1)
    model = train_quality_model(train, "text", "y", n_features=1024)
    scored = score_quality(model, test, "text")
    agree = scored.filter(
        (F.col("quality_pred") == F.col("y"))
    ).count()
    total = test.count()
    assert total > 0
    acc = agree / total
    assert acc >= 0.9, f"held-out accuracy {acc:.2f} < 0.9"


def test_model_quality_filter_smoke(spark, sf_dir):
    """End-to-end weak-label bootstrap on the documents fixture: output
    schema is input + quality_prob/quality_pred, the filter keeps a
    non-trivial middle ground (neither everything nor nothing), and
    kept rows all meet the probability gate."""
    from etl_spark_spark.functions.text import LANG_PROFILES
    from etl_spark_spark.operators.classify import model_quality_filter

    docs = table(spark, sf_dir, "documents")
    kept = model_quality_filter(docs, "text", LANG_PROFILES["en"])
    n, total = kept.count(), docs.count()
    assert 0 < n < total
    assert kept.filter(F.col("quality_prob") < 0.5).count() == 0
    assert set(docs.columns) < set(kept.columns)


def test_incremental_near_dup_equals_one_shot(spark, sf_dir):
    """Folding id-ordered batches through incremental_near_dup must
    drop exactly the ids the one-shot estimator pass drops on the full
    corpus — the batch boundaries are physical, not semantic. Index
    must accumulate every seen signature (kept AND dropped)."""
    from etl_spark_spark.functions.text import tokens, word_shingles
    from etl_spark_spark.operators.neardup import (
        incremental_near_dup,
        near_dup_drop_ids,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    one_shot_drop = {
        r.doc_id
        for r in near_dup_drop_ids(
            docs.select("doc_id", tokens("text").alias("t")),
            "doc_id",
            word_shingles("t", 3),
        ).collect()
    }
    assert one_shot_drop, "fixture must contain near-dups"

    hi = docs.agg(F.max("doc_id")).collect()[0][0]
    bounds = [(0, hi // 3), (hi // 3, 2 * hi // 3), (2 * hi // 3, hi + 1)]
    index = None
    kept_ids: set = set()
    for lo, up in bounds:
        batch = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < up))
        batch = batch.select("doc_id", "text", tokens("text").alias("t"))
        kept, index = incremental_near_dup(
            batch, index, "doc_id", word_shingles("t", 3)
        )
        kept_ids |= {r.doc_id for r in kept.select("doc_id").collect()}
        # the folded index must stay reusable across iterations
        index = index.localCheckpoint()

    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert all_ids - kept_ids == one_shot_drop
    # collapsed-index contract: rep ids come from the corpus, one row
    # per distinct full signature (so the index is duplicate-free and
    # stops growing with the duplicate count)
    idx_rows = index.collect()
    sig_cols = sorted(c for c in index.columns if c.startswith("mh"))
    assert {r.doc_id for r in idx_rows} <= all_ids
    assert len(idx_rows) == len(
        {tuple(r[c] for c in sig_cols) for r in idx_rows}
    )


def test_chunk_by_tokens_edges_and_overlap(spark):
    """Empty docs emit nothing; short docs emit one short chunk;
    consecutive chunks of a long doc overlap by exactly `overlap`
    tokens and reconstruct the original stream; bad overlap raises."""
    import pytest

    from etl_spark_spark.operators.packing import chunk_by_tokens

    rows = [
        (1, [f"w{i}" for i in range(10)]),
        (2, ["a", "b"]),
        (3, []),
    ]
    df = spark.createDataFrame(rows, "id long, t array<string>")
    out = chunk_by_tokens(df, "id", "t", chunk_tokens=4, overlap=1)
    got = {
        (r.id, r.chunk_no): (r.chunk_text, r.n_chunk_tokens)
        for r in out.collect()
    }
    assert {i for i, _ in got} == {1, 2}
    assert got[(2, 0)] == ("a b", 2)
    # starts at 0,3,6,9 -> last chunk is the single trailing token
    assert got[(1, 0)] == ("w0 w1 w2 w3", 4)
    assert got[(1, 1)] == ("w3 w4 w5 w6", 4)
    assert got[(1, 3)] == ("w9", 1)
    # adjacent chunks share exactly `overlap` tokens
    assert got[(1, 0)][0].split()[-1] == got[(1, 1)][0].split()[0]
    with pytest.raises(ValueError):
        chunk_by_tokens(df, "id", "t", chunk_tokens=4, overlap=4)


def test_weighted_sample_domain_and_determinism(spark):
    """Zero/NULL weights never selected; k >= n keeps every positive
    row; a dominant weight is effectively always drawn; two runs return
    identical rows (content-addressed, no RNG)."""
    from etl_spark_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    rows = [(i, 1.0) for i in range(40)] + [(100, 1e7), (101, 0.0), (102, None)]
    df = spark.createDataFrame(rows, "id long, w double").repartition(5)
    got1 = {r.id for r in weighted_sample_without_replacement(df, "id", "w", 5).collect()}
    got2 = {r.id for r in weighted_sample_without_replacement(df, "id", "w", 5).collect()}
    assert got1 == got2
    assert 100 in got1          # weight 1e7 vs 1: inclusion ~certain
    assert 101 not in got1 and 102 not in got1
    everything = {
        r.id for r in weighted_sample_without_replacement(df, "id", "w", 1000).collect()
    }
    assert everything == {i for i in range(40)} | {100}


def test_weighted_sample_plan_is_topk_not_global_sort(spark, sf_dir):
    """The E-S draw must compile to TakeOrderedAndProject (bounded
    per-partition heaps), not a global Sort + Limit."""
    from etl_spark_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    plan = (
        weighted_sample_without_replacement(docs, "doc_id", "n_chars", 50)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_ivfpq_per_list_codebooks_beat_shared_on_anisotropic(spark):
    """Per-list PQ codebooks must beat the shared codebook set when
    residual distributions differ across coarse cells — each cluster
    here is stretched along its own random low-dim subspace, so one
    shared subspace grid wastes codewords. Tight rerank (8 for k=5)
    makes the ADC shortlist itself carry the recall."""
    import numpy as np

    from etl_spark_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_ivf_pq,
    )

    rng = np.random.default_rng(11)
    dim, n_clusters, per = 32, 8, 60
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1)[:, None]
    rows = []
    for ci in range(n_clusters):
        basis = rng.normal(size=(4, dim))
        pts = centers[ci] + 0.25 * rng.normal(size=(per, 4)) @ basis / np.linalg.norm(basis)
        for j, p in enumerate(pts):
            rows.append((ci * per + j, [float(x) for x in p]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(6)
    q = df.filter(df.vec_id % per == 0)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(df, q, "vec_id", "embedding", k=5).collect()
    }

    def recall(per_list):
        got = {
            (r.query_id, r.neighbor_id)
            for r in cosine_topk_ivf_pq(
                df, q, "vec_id", "embedding", dim=dim, k=5,
                n_lists=16, n_probe=6, rerank=8, per_list_books=per_list,
            ).collect()
        }
        return len(exact & got) / len(exact)

    shared, per_list = recall(False), recall(True)
    assert per_list > shared, (
        f"per-list books must improve anisotropic recall: {per_list} vs {shared}"
    )
    assert per_list >= 0.6, f"per-list tight-rerank recall@5 {per_list:.2f} < 0.6"


# module-level synthetic codecs: injected callables must pickle into
# the mapInPandas closure and run on executors (standard UDF rules)
def _codec_decode(payload: bytes, media_type: str) -> list:
    # width != the fake decoder's 8, proving the injected codec ran
    # and the output schema (array<double>) is width-free
    return [float(len(payload)), float(payload[0]) if payload else -1.0]


def _codec_resize(payload: bytes, width: int, height: int) -> bytes:
    return bytes([width % 256, height % 256]) + payload[:4]


def _codec_sample(payload: bytes, n_frames: int) -> list:
    return [payload[i : i + 2] for i in range(min(n_frames, 3))]


def test_multimodal_injected_codecs(spark, sf_dir):
    """Round-10 (VERDICT task 3): the decode/resize/sample stages take
    caller-supplied codecs, so a real PIL/av decoder drops in at
    deployment without touching engine code. Pins the Arrow-batch
    contract with synthetic codecs: per-item call signature, schema
    conformance, distributed execution (module-level pickling)."""
    from etl_spark_spark.operators.multimodal import (
        resize_media,
        sample_frames,
    )

    docs = table(spark, sf_dir, "documents").limit(10)
    media = attach_media(docs, "doc_id", "text", "text/plain").repartition(4)

    feats = extract_features(media, decoder=_codec_decode).collect()
    assert len(feats) == 10
    for r in feats:
        assert len(r.feat) == 2  # injected width, not the fake's 8
        assert r.feat[0] == float(r.n_bytes)

    sized = resize_media(media, 16, 4, resizer=_codec_resize).collect()
    for r in sized:
        assert r.media[:2] == bytes([16, 4])
        assert r.media_size == len(r.media)
        assert (r.width, r.height) == (16, 4)

    frames = sample_frames(media, n_frames=5, sampler=_codec_sample).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.id, []).append(r.frame_no)
    for fnos in by_id.values():
        assert sorted(fnos) == [0, 1, 2]  # sampler returned 3 frames

    # no injection + fake=False still fails loudly (the codec guard)
    import pytest as _pytest

    with _pytest.raises(Exception, match="NotImplementedError|decoding"):
        extract_features(media, fake=False).collect()
