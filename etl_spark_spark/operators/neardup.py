"""Document deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard
(LLM-data-pipeline extension operators; SURVEY.md §7 Phase 3).

Scale design notes (what changes at 100 TB):
- Exact dedup is a fingerprint groupBy — pure hash aggregate, map-side
  partial, no data skew beyond true duplicates.
- MinHash signatures are ONE pass over exploded shingles (a single hash
  aggregate with ``num_perms`` min() columns — no per-permutation scan).
  LSH banding then joins docs only within band buckets, avoiding the
  quadratic all-pairs comparison; the final Jaccard verification joins
  shingle sets only for candidate pairs.
- SimHash is a single aggregate with 60 per-bit sum columns (map-side
  combinable, no explosion per bit), then near-neighbors can be found
  by banding the 60-bit value.
- Hashes are md5-derived everywhere (portable across engines), with
  hex→int64 conversion for bit math; min() over hex strings is an
  order-isomorphic stand-in for min() over the hash integers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint

SIMHASH_BITS = 60  # 15 hex chars of md5 -> fits int64 positive


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group identical (normalized) texts: canonical id = min id.
    Returns (fingerprint, canonical_id, n_copies)."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
    )


def shingle_set(df: DataFrame, id_col: str, shingles_col: Column) -> DataFrame:
    """Explode to distinct (id, shingle) pairs.

    The tokenize/shingle/explode work upstream of the distinct is the
    CPU-heavy part and runs in the INPUT's partitioning — on a
    single-row-group file that is one task (guide §2.5 "unsplittable
    file"), so the whole corpus shingles on one core. ``fan_out`` adds a
    round-robin exchange only when the input plan has fewer partitions
    than the session parallelism (measured 0.99 s -> 0.65 s at sf0.1;
    a no-op exactly when the input is already parallel, i.e. at scale).
    The distinct aggregate downstream is partitioning-independent."""
    from .skew import fan_out

    return (
        fan_out(df)
        .select(F.col(id_col), F.explode(shingles_col).alias("shingle"))
        .distinct()
    )


def minhash_signature(
    shingles: DataFrame, id_col: str, num_perms: int = 8
) -> DataFrame:
    """One row per id with columns mh0..mh{k-1}: the min over the doc's
    shingles of md5 salted per permutation. Single hash aggregate."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{p}~"), F.col("shingle")))).alias(f"mh{p}")
        for p in range(num_perms)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    num_perms: int = 8,
    rows_per_band: int = 2,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Docs sharing any band of their signature -> candidate pairs
    (id_a < id_b). Join happens only within band buckets.

    ``bucket_cap`` is the heavy-bucket mitigation for NEAR-identical
    skew (verdict-r7 task 3): identical-set collapse removes verbatim
    twins, but a corpus-scale cluster of 1-token-edit boilerplate has
    DISTINCT sets with near-identical signatures, so its members land
    in the same band buckets and the within-bucket self-join goes
    quadratic (T docs -> ~T^2/2 candidates per band; measured in
    scripts/bench_neardup_boiler.py). With a cap, any bucket larger
    than ``bucket_cap`` emits STAR pairs instead of all pairs — every
    member paired with the bucket's min id — so its candidate volume
    drops from m^2/2 to m-1 per band.

    Contract change (documented, opt-in): within an over-cap bucket,
    PAIR-level completeness degrades to hub-connectivity — a pair of
    members both similar to each other but NOT to the hub (>= the
    caller's verify threshold) can be missed. CLUSTER-level recall for
    a genuine near-duplicate family is preserved whenever members
    verify against the bucket hub (the 1-token-edit boilerplate case:
    all members are mutually near-identical, so the star edges survive
    exact verification and connected components are unchanged —
    pinned by test and by the neardup_bucket_cap oracle row).
    Precision is untouched: every emitted candidate still passes the
    caller's exact verification. The documented boundary: a
    CHAIN-shaped family (each doc similar only to its neighbors, never
    to the bucket hub) fragments into finer clusters under the cap —
    pinned by test as the explicit trade, not a surprise. At 100 TB,
    reuse one materialized band table (:func:`signature_bands`, the
    persistable layout) rather than recomputing the signature pipeline
    per branch — the capped plan reads the banded side three times
    (small-bucket self-join twice, star once)."""
    bands = []
    for b in range(num_perms // rows_per_band):
        cols = [
            F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)
        ]
        bands.append(
            F.struct(F.lit(b).alias("band"), F.concat_ws("#", *cols).alias("key"))
        )
    exploded = signatures.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("bk")
    ).select(id_col, "bk.band", "bk.key")
    if bucket_cap is not None:
        if bucket_cap < 2:
            raise ValueError(f"bucket_cap must be >= 2, got {bucket_cap}")
        # one shuffle on (band, key): bucket size + hub (min id) as
        # window aggregates — the heavy bucket IS one partition, and
        # counting/min over it is linear
        w = Window.partitionBy("band", "key")
        sized = exploded.select(
            F.col(id_col),
            "band",
            "key",
            F.count("*").over(w).alias("__bsz"),
            F.min(id_col).over(w).alias("__hub"),
        )
        small = sized.filter(F.col("__bsz") <= bucket_cap).drop(
            "__bsz", "__hub"
        )
        a = small.alias("a")
        b = small.alias("b")
        all_pairs = a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        ).select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        star_pairs = (
            sized.filter(
                (F.col("__bsz") > bucket_cap)
                & (F.col(id_col) != F.col("__hub"))
            )
            .select(
                F.col("__hub").alias("id_a"), F.col(id_col).alias("id_b")
            )
        )
        return all_pairs.unionByName(star_pairs).distinct()
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_for_pairs(
    pairs: DataFrame, shingles: DataFrame, id_col: str
) -> DataFrame:
    """Exact Jaccard for candidate pairs. Returns (id_a, id_b,
    jaccard). Pairs with ZERO shingle intersection are emitted with
    jaccard 0.0 (the whole-set join keeps every candidate row) — a
    deliberate contract change from the pre-round-4 shared-shingle
    inner join, which dropped disjoint pairs; filter ``jaccard > 0``
    for the old behavior.

    Scale shape (round-4, replacing the pair-x-shingle join): collapse
    each doc's shingles to ONE row carrying the set as a sorted array,
    then attach both sets to each candidate pair and intersect with
    ``array_intersect`` map-side. Cost is linear in |pairs| + |docs|.
    The previous formulation exploded every pair by its shingles
    before re-aggregating — |pairs| x |shingles/doc| rows (1.3B on the
    100x verbatim-twin replica, where 32.8M candidate pairs x ~40
    shingles each) — and AQE's dynamic broadcast walked the
    well-compressed pair table (two near-sequential long columns)
    under the 64 MB threshold, OOM-ing the driver on the in-memory
    build. The pairs side is hinted ``merge`` so the unbounded table
    is never broadcast regardless of how well it compresses; per-doc
    set arrays are bounded by doc length, so the row width is bounded.
    """
    return pair_set_stats(pairs, shingles, id_col).select(
        "id_a",
        "id_b",
        (
            F.col("__i") / (F.col("__na") + F.col("__nb") - F.col("__i"))
        ).alias("jaccard"),
    )


def pair_set_stats(
    pairs: DataFrame, shingles: DataFrame, id_col: str
) -> DataFrame:
    """Exact per-pair set statistics (id_a, id_b, __i intersection,
    __na, __nb side sizes) for candidate pairs — the shared scale-safe
    core of ``jaccard_for_pairs`` and ``containment_pairs``: collapse
    each doc's shingles to ONE sorted-array row, attach both arrays to
    each pair, intersect map-side with ``array_intersect``. Linear in
    |pairs| + |docs|; all three join sides merge-hinted (candidate and
    set tables compress misleadingly well on duplicate-heavy corpora,
    and AQE's dynamic broadcast must never build either driver-side —
    the 100x-replica OOM documented in ``jaccard_for_pairs``)."""
    sets = shingles.groupBy(id_col).agg(
        F.sort_array(F.collect_set("shingle")).alias("__ss")
    )
    a = sets.select(
        F.col(id_col).alias("id_a"),
        F.col("__ss").alias("__sa"),
        F.size("__ss").alias("__na"),
    )
    b = sets.select(
        F.col(id_col).alias("id_b"),
        F.col("__ss").alias("__sb"),
        F.size("__ss").alias("__nb"),
    )
    inter = F.size(F.array_intersect("__sa", "__sb"))
    return (
        pairs.hint("merge")
        .join(a.hint("merge"), "id_a")
        .join(b.hint("merge"), "id_b")
        .select(
            "id_a",
            "id_b",
            inter.alias("__i"),
            "__na",
            "__nb",
        )
    )


def pair_overlap_counts(
    pairs: DataFrame,
    shingles: DataFrame,
    id_col: str,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Intersection sizes for candidate pairs WITHOUT attaching set
    arrays: join each pair to its a-side postings, keep the rows whose
    shingle fingerprint also appears in the b-side postings, count the
    survivors per pair. Returns (id_a, id_b, *carry_cols, __i).

    Scale shape: the only pair-proportional intermediate is
    |pairs| x |a-side set| NARROW rows (two ids + a 128-bit shingle
    fingerprint ≈ 32 bytes) — vs :func:`pair_set_stats`, which attaches
    two KB-scale sorted arrays to EVERY pair and whose sort spill
    DNF'd the 100x verbatim-twin replica on this box's 73 GB scratch
    (BASELINE.md round-4). Shingles are matched on two independent
    xxhash64 fingerprints (128 bits total, computed map-side, never
    leaving the query): a spurious count needs two DISTINCT shingles
    within one pair's sets to collide on BOTH halves —
    P < |set|^2 / 2^128 per pair, < 1e-22 even at 10^12-shingle corpus
    scale — so the result is exact for every input that fits a real
    cluster, and the sf-scale oracle / brute-force property gates pin
    it bit-for-bit where it is feasible to check.

    All sides merge-hinted: candidate and posting tables compress
    misleadingly well on duplicate-heavy corpora, and AQE's dynamic
    broadcast must never build either driver-side (the measured 100x
    OOM documented in ``jaccard_for_pairs``).

    Inner semantics: pairs with EMPTY intersection do not appear —
    callers thresholding at a similarity > 0 lose nothing.

    PRECONDITION (caller contract): ``pairs`` must be DISTINCT on
    (id_a, id_b) — each duplicate pair row multiplies every matched
    posting and silently over-counts __i. Every in-repo generator
    satisfies this by construction (lsh_candidate_pairs and the
    prefix-filter candidate path both end in .distinct()). The
    operator does NOT re-dedupe defensively: pairs is the
    pair-proportional side (10^8+ rows at corpus scale) and a second
    distinct is a second full shuffle of it for zero information —
    enforce uniqueness where the pairs are born, once.
    """
    f1 = F.xxhash64(F.col("shingle"))
    f2 = F.xxhash64(F.lit("pair-overlap#2"), F.col("shingle"))
    post = shingles.select(
        F.col(id_col), f1.alias("__f1"), f2.alias("__f2")
    )
    a = post.withColumnRenamed(id_col, "id_a")
    b = post.withColumnRenamed(id_col, "id_b")
    return (
        pairs.hint("merge")
        .join(a.hint("merge"), "id_a")
        .join(b.hint("merge"), ["id_b", "__f1", "__f2"])
        .groupBy("id_a", "id_b", *carry_cols)
        .agg(F.count("*").alias("__i"))
    )


def _check_threshold(threshold: float) -> None:
    """Pair-generator similarity thresholds must sit in (0, 1]:
    within-family (identical-set) pairs re-expand with the hardcoded
    constants jaccard/containment = 1.0, which matches the uncollapsed
    computation only when 1.0 itself passes the threshold; and the
    overlap-count verify core drops empty intersections, which is
    lossless only when similarity 0 does not qualify."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")


def collapse_identical_sets(
    sh: DataFrame, id_col: str
) -> tuple[DataFrame, DataFrame]:
    """Verbatim-duplicate collapse shared by every pair generator
    (standard set-similarity-join preprocessing, cf. Vernica et al.
    SIGMOD'10): group docs whose shingle SETS are identical (one linear
    N x payload shuffle on the sorted set) so the expensive candidate /
    verify machinery runs over DISTINCT sets only. Returns

    - ``reps_sh``: (id, shingle) rows for one representative (min id)
      per distinct set — a drop-in replacement for the full shingle
      table in any downstream pipeline, because MinHash signatures,
      prefix orderings, Jaccard and containment are all functions of
      the set alone;
    - ``members``: (__r rep id, __doc member id, __n set size) — the
      expansion table for :func:`expand_collapsed_pairs`.

    Why this matters at scale: T verbatim twins per doc multiply
    candidate pairs by ~T^2/2 in ANY banded/prefix scheme (identical
    sets collide in every band/prefix), and the verify join then moves
    every pair's KB-scale set arrays (measured: the 100x twin replica
    DNF'd this box's 73 GB scratch through the uncollapsed prefix
    join). Collapsed, candidate volume is independent of twin
    multiplicity and the re-expansion is output-linear.

    Bounds caveat (documented trade): the groupBy key is the full
    sorted shingle-set array and ``__members`` materializes every twin
    id in ONE row, so the shuffle payload and the widest row grow with
    set size x twin multiplicity — fine at the audited 100x replica
    scale; for pathological twin counts, group on a set fingerprint
    (with an exactness check) or aggregate member COUNTS instead of
    the id array."""
    fam = (
        sh.groupBy(id_col)
        .agg(F.sort_array(F.collect_set("shingle")).alias("__ss"))
        .groupBy("__ss")
        .agg(
            F.min(id_col).alias("__rep"),
            F.collect_list(id_col).alias("__members"),
        )
    )
    reps_sh = fam.select(
        F.col("__rep").alias(id_col), F.explode("__ss").alias("shingle")
    )
    members = fam.select(
        F.col("__rep").alias("__r"),
        F.explode("__members").alias("__doc"),
        F.size("__ss").alias("__n"),
    )
    return reps_sh, members


def expand_collapsed_pairs(
    rep_pairs: DataFrame,
    members: DataFrame,
    within_values: dict[str, Column],
) -> DataFrame:
    """Expand representative-level pairs back to doc-level pairs,
    output-linearly and with no set arrays attached:

    - CROSS pairs (different sets): every (member of id_a's family) x
      (member of id_b's family), value columns carried through verbatim
      — exact, because every similarity here is a function of the sets;
    - WITHIN pairs (same set): all id-ordered pairs inside each family,
      value columns from ``within_values`` (the identical-set constants:
      jaccard/containment 1.0, intersection = set size ``__n``...).

    Pair ids are re-ordered with least/greatest so the output contract
    (id_a < id_b) matches the uncollapsed computation bit-for-bit."""
    value_cols = [c for c in rep_pairs.columns if c not in ("id_a", "id_b")]
    # merge hints: members is corpus-sized with near-sequential long
    # columns — the lying-compression shape AQE's dynamic broadcast
    # must never build driver-side (same rule as pair_set_stats)
    cross = (
        rep_pairs.hint("merge")
        .join(
            members.select(
                F.col("__r").alias("id_a"), F.col("__doc").alias("__da")
            ).hint("merge"),
            "id_a",
        )
        .join(
            members.select(
                F.col("__r").alias("id_b"), F.col("__doc").alias("__db")
            ).hint("merge"),
            "id_b",
        )
        .select(
            F.least("__da", "__db").alias("id_a"),
            F.greatest("__da", "__db").alias("id_b"),
            *value_cols,
        )
    )
    within = (
        members.select("__r", "__n", F.col("__doc").alias("__da"))
        .join(
            members.select("__r", F.col("__doc").alias("__db")).hint("merge"),
            "__r",
        )
        .filter(F.col("__da") < F.col("__db"))
        .select(
            F.col("__da").alias("id_a"),
            F.col("__db").alias("id_b"),
            *[within_values[c].alias(c) for c in value_cols],
        )
    )
    return cross.unionByName(within)


def plan_banding(
    threshold: float,
    target_recall: float = 0.9,
    max_perms: int = 64,
) -> tuple[int, int]:
    """Derive MinHash-LSH banding ``(num_perms, rows_per_band)`` from a
    (similarity threshold, target recall) contract via the standard
    S-curve: a pair at Jaccard ``t`` sharing at least one of ``b``
    bands of ``r`` rows is a candidate with probability

        P(t) = 1 - (1 - t^r)^b.

    P is increasing in t, so guaranteeing ``P(threshold) >=
    target_recall`` bounds the EXPECTED candidate recall for every
    pair at-or-above the threshold (duplicates at exactly the
    threshold are the worst case; verbatim twins are found with
    probability 1 regardless — identical sets collide in every band).

    Selection: among all (b, r) with b*r <= max_perms meeting the
    recall bound, pick the LARGEST feasible r — a sharper S-curve
    suppresses sub-threshold candidates (precision / wasted verify
    work) at the same recall floor, the right trade because candidate
    verification is the pair-proportional cost at corpus scale. The
    fixed defaults the round-6 queries used (8 perms, 2 rows) sit at
    P(0.5)=0.68: toy-corpus settings this function replaces with a
    derived contract (round-7 judge task 4).

    Returns (num_perms = b*r, rows_per_band = r); signature cost grows
    linearly in num_perms (one min() aggregate column per permutation,
    still a single pass over the shingles)."""
    _check_threshold(threshold)
    if not (0.0 < target_recall < 1.0):
        raise ValueError(
            f"target_recall must be in (0, 1), got {target_recall}"
        )
    if max_perms < 1:
        raise ValueError(f"max_perms must be >= 1, got {max_perms}")
    import math

    for r in range(max_perms, 0, -1):
        p1 = threshold**r
        if p1 >= 1.0:  # threshold == 1.0: any single band suffices
            return (r, r) if r == 1 else (1, 1)
        if p1 <= 0.0:
            continue  # t^r underflowed to 0: no finite b can work
        # minimal b with 1 - (1 - p1)^b >= target_recall; log1p keeps
        # the denominator nonzero when t^r underflows 1-p1 to 1.0
        need = math.log(1.0 - target_recall) / math.log1p(-p1)
        if need > max_perms:  # also guards ceil() overflow on inf
            continue
        b = math.ceil(need)
        if b * r <= max_perms:
            return (b * r, r)
    raise ValueError(
        f"no banding within max_perms={max_perms} reaches recall "
        f"{target_recall} at threshold {threshold} — raise max_perms"
    )


def near_dup_minhash(
    df: DataFrame,
    id_col: str,
    shingles_col: Column,
    num_perms: int = 8,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    target_recall: float | None = None,
    max_perms: int = 64,
    bucket_cap: int | None = None,
) -> DataFrame:
    """End-to-end MinHash-LSH near-duplicate pairs with exact-Jaccard
    verification: (id_a, id_b, jaccard >= threshold).

    Runs signature + banding + verify over DISTINCT shingle sets only
    (see :func:`collapse_identical_sets`): identical sets have identical
    signatures, so they collide in EVERY band and an uncollapsed run
    generates T^2/2 within-family candidates per T verbatim twins.
    Bit-identical to the uncollapsed computation — same-set pairs are
    exactly jaccard 1.0 and always banded candidates. Verification
    computes intersection COUNTS through :func:`pair_overlap_counts`
    plus two narrow size joins (round-5) — no per-pair set arrays,
    same scratch bound as neardup_prefix_jaccard/containment_pairs;
    zero-intersection candidates drop out of the inner overlap join,
    lossless for the validated threshold range (0, 1].

    ``target_recall`` switches banding to the DERIVED contract: the
    passed num_perms/rows_per_band are ignored and
    :func:`plan_banding` sizes them so a pair at exactly ``threshold``
    is a candidate with probability >= target_recall (see its
    docstring for the S-curve and the precision-biased selection).

    ``bucket_cap`` enables the heavy-bucket star mitigation for
    near-identical boilerplate clusters — see
    :func:`lsh_candidate_pairs` for the exact (pair->cluster) contract
    change it buys its m^2 -> m candidate reduction with."""
    _check_threshold(threshold)
    if target_recall is not None:
        num_perms, rows_per_band = plan_banding(
            threshold, target_recall, max_perms
        )
    sh = shingle_set(df, id_col, shingles_col)
    reps_sh, members = collapse_identical_sets(sh, id_col)
    rep_pairs = _minhash_rep_pairs(
        reps_sh, id_col, num_perms, rows_per_band, threshold,
        bucket_cap=bucket_cap,
    )
    return expand_collapsed_pairs(
        rep_pairs, members, {"jaccard": F.lit(1.0)}
    ).filter(F.col("jaccard") >= threshold)


def _minhash_rep_pairs(
    reps_sh: DataFrame,
    id_col: str,
    num_perms: int,
    rows_per_band: int,
    threshold: float,
    sig: DataFrame | None = None,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Shared banded-LSH + exact-verify core over a COLLAPSED shingle
    table: (id_a, id_b, jaccard >= threshold) between distinct-set
    representatives. Verification via pair_overlap_counts + narrow
    size joins — no set arrays (see that function's scale notes).

    ``sig`` lets a caller share ONE precomputed signature table across
    several banding configurations (mh columns beyond num_perms are
    ignored) — multi-threshold evals pay the md5 signature pass once
    instead of per threshold. ``bucket_cap`` passes through to
    :func:`lsh_candidate_pairs` (heavy-bucket star mitigation)."""
    if sig is None:
        sig = minhash_signature(reps_sh, id_col, num_perms)
    cand = lsh_candidate_pairs(
        sig, id_col, num_perms, rows_per_band, bucket_cap=bucket_cap
    )
    sizes = reps_sh.groupBy(id_col).agg(F.count("*").alias("__n_"))
    ov = (
        pair_overlap_counts(cand, reps_sh, id_col)
        .join(
            sizes.select(
                F.col(id_col).alias("id_a"), F.col("__n_").alias("__na")
            ).hint("merge"),
            "id_a",
        )
        .join(
            sizes.select(
                F.col(id_col).alias("id_b"), F.col("__n_").alias("__nb")
            ).hint("merge"),
            "id_b",
        )
    )
    return ov.select(
        "id_a",
        "id_b",
        (
            F.col("__i") / (F.col("__na") + F.col("__nb") - F.col("__i"))
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def _pair_hash(id_a: Column, id_b: Column) -> Column:
    """Deterministic, engine-portable pair hash (md5 hex -> int64, the
    repo's standard cross-engine pattern): identical in Spark and in
    the DuckDB oracle, so hash-based pair sampling is reproducible."""
    key = F.concat(id_a.cast("string"), F.lit("#"), id_b.cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def sampled_ground_truth_pairs(
    df: DataFrame,
    id_col: str,
    shingles_col: Column,
    threshold: float = 0.5,
    pair_mod: int = 4,
    max_shingle_df: int | None = None,
    _reps_sh: DataFrame | None = None,
) -> DataFrame:
    """SCALABLE ground-truth sampling for recall measurement (round-7
    judge task 5): a deterministic 1/``pair_mod`` sample of the exact
    Jaccard >= threshold pairs between DISTINCT shingle sets, without
    ever materializing the full quadratic pair space.

    Why: the exact all-pairs ground truth (prefix_filtered_jaccard_
    pairs / n-gram brute force) is O(n^2) by definition and guarded at
    100k docs, so recall REPORTS could not accompany the engine to
    real corpus sizes. Recall is a ratio — an unbiased estimate over a
    uniform pair sample measures it at any scale.

    Construction (every step linear or sample-proportional):

    1. collapse verbatim twins (:func:`collapse_identical_sets`) — the
       estimator is defined over distinct-set REPRESENTATIVE pairs,
       the only pairs a banded detector can actually miss (identical
       sets collide in every band, recall 1.0 by construction);
    2. inverted index over the collapsed shingles, optionally dropping
       hub shingles with document frequency > ``max_shingle_df`` (a
       pair at Jaccard >= t shares ~t/(1+t) of its shingles, so it is
       lost only if ALL its shared shingles are hubs — at corpus scale
       set the cap >> typical set size and the bias is negligible;
       cap effect is reported by the caller, not hidden);
    3. within-bucket id-ordered pair generation with the hash filter
       ``_pair_hash(id_a, id_b) % pair_mod == 0`` applied IN the join
       stage — candidate rows stream through the filter, so nothing
       pair-proportional is shuffled or stored except the 1/mod
       survivors (uniform over pairs by hash, deterministic, identical
       in the DuckDB oracle);
    4. exact verification of the surviving pairs through the narrow
       overlap-count core (:func:`pair_overlap_counts` + size joins —
       no set arrays).

    Returns rep-level (id_a, id_b, jaccard) for the sampled true
    pairs. Estimated recall of a detector D = |D ∩ sample| /
    |sample|; by uniformity E[estimate] = true rep-pair recall.
    """
    _check_threshold(threshold)
    if pair_mod < 1:
        raise ValueError(f"pair_mod must be >= 1, got {pair_mod}")
    if _reps_sh is not None:
        # caller already materialized the collapsed shingle table
        # (round-12: sampled_recall_report shares ONE checkpointed
        # reps table between the truth and detector sides instead of
        # rebuilding the tokenize+shingle+collapse chain twice)
        reps_sh = _reps_sh
    else:
        sh = shingle_set(df, id_col, shingles_col)
        reps_sh, _members = collapse_identical_sets(sh, id_col)
    if max_shingle_df is not None:
        keep = (
            reps_sh.groupBy("shingle")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_shingle_df)
            .select("shingle")
        )
        post = reps_sh.join(keep.hint("merge"), "shingle")
    else:
        # round-8: generate candidates from PREFIX postings only (the
        # AllPairs rule already carried by prefix_filtered_jaccard_
        # pairs): under a global rarity order, J(x,y) >= t implies the
        # two prefixes of length n - ceil(t*n) + 1 intersect, so the
        # sample is IDENTICAL to the full-posting join while the
        # frequent shingles that make the bucket join quadratic
        # (sum df^2) never generate candidates. Only the uncapped path
        # — max_shingle_df has its own documented posting semantics.
        sizes_ = reps_sh.groupBy(id_col).agg(F.count("*").alias("__n"))
        freq = reps_sh.groupBy("shingle").agg(F.count("*").alias("__df"))
        w = Window.partitionBy(id_col).orderBy("__df", "shingle")
        post = (
            reps_sh.join(freq, "shingle")
            .withColumn("__pos", F.row_number().over(w))
            .join(sizes_, id_col)
            .filter(
                F.col("__pos")
                <= F.col("__n")
                - F.ceil(F.lit(threshold) * F.col("__n") - F.lit(1e-9))
                + F.lit(1)
            )
            .select(id_col, "shingle")
        )
    a = post.select(F.col(id_col).alias("id_a"), "shingle")
    b = post.select(F.col(id_col).alias("id_b"), "shingle")
    sampled = (
        a.hint("merge")
        .join(
            b.hint("merge"),
            ["shingle"],
        )
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.pmod(
                    _pair_hash(F.col("id_a"), F.col("id_b")),
                    F.lit(pair_mod),
                )
                == 0
            )
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sizes = reps_sh.groupBy(id_col).agg(F.count("*").alias("__n_"))
    ov = (
        pair_overlap_counts(sampled, reps_sh, id_col)
        .join(
            sizes.select(
                F.col(id_col).alias("id_a"), F.col("__n_").alias("__na")
            ).hint("merge"),
            "id_a",
        )
        .join(
            sizes.select(
                F.col(id_col).alias("id_b"), F.col("__n_").alias("__nb")
            ).hint("merge"),
            "id_b",
        )
    )
    return ov.select(
        "id_a",
        "id_b",
        (
            F.col("__i") / (F.col("__na") + F.col("__nb") - F.col("__i"))
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def sampled_recall_report(
    df: DataFrame,
    id_col: str,
    shingles_col: Column,
    threshold: float = 0.5,
    target_recall: float = 0.9,
    pair_mod: int = 4,
    max_perms: int = 64,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """One-row recall report whose ground-truth side is the SAMPLED
    estimator (scales past the exact-eval O(n^2) guard): the banded
    detector's rep-level pairs at auto-tuned banding
    (:func:`plan_banding`) are checked against the sampled true pairs.
    Columns: (num_perms, rows_per_band, pair_mod, n_true_sampled,
    n_detected_of_sampled, recall_sampled). recall_sampled is an
    unbiased estimate of the detector's rep-pair recall at
    ``threshold`` (see :func:`sampled_ground_truth_pairs`)."""
    num_perms, rows_per_band = plan_banding(
        threshold, target_recall, max_perms
    )
    # ONE tokenize+shingle+collapse chain, materialized once and shared
    # by the truth and detector sides (round-12, guide §2.4: both sides
    # previously re-derived the identical chain from the raw corpus)
    sh = shingle_set(df, id_col, shingles_col)
    reps_sh, _members = collapse_identical_sets(sh, id_col)
    reps_sh = reps_sh.localCheckpoint()
    truth = sampled_ground_truth_pairs(
        df,
        id_col,
        shingles_col,
        threshold=threshold,
        pair_mod=pair_mod,
        max_shingle_df=max_shingle_df,
        _reps_sh=reps_sh,
    ).select("id_a", "id_b")
    detected = _minhash_rep_pairs(
        reps_sh, id_col, num_perms, rows_per_band, threshold
    ).select("id_a", "id_b")
    hit = truth.join(detected, ["id_a", "id_b"])
    return (
        truth.agg(F.count("*").alias("n_true_sampled"))
        .crossJoin(hit.agg(F.count("*").alias("n_detected_of_sampled")))
        .select(
            F.lit(num_perms).cast("long").alias("num_perms"),
            F.lit(rows_per_band).cast("long").alias("rows_per_band"),
            F.lit(pair_mod).cast("long").alias("pair_mod"),
            F.col("n_true_sampled").cast("long"),
            F.col("n_detected_of_sampled").cast("long"),
            (
                F.col("n_detected_of_sampled").cast("double")
                / F.col("n_true_sampled").cast("double")
            ).alias("recall_sampled"),
        )
    )


def near_dup_clusters(
    df: DataFrame,
    id_col: str,
    shingles_col: Column,
    num_perms: int = 8,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    max_rounds: int = 25,
    target_recall: float | None = None,
    max_perms: int = 64,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Near-duplicate CLUSTERS (doc_id id_col, cluster_id = component
    min id) from the banded MinHash pair pipeline — every doc in the
    input appears, singletons as their own cluster. That includes
    docs whose shingle array is EMPTY (fewer tokens than the shingle
    width): shingle_set/explode drops them from the pair pipeline, so
    the tail left-join below re-attaches the full input id set and
    coalesces them to self-clusters — callers get the documented
    total contract without compensating.

    The decisive scale property (round-5): connected components run at
    DISTINCT-SET level, never over expanded doc pairs. Verbatim twins
    make the doc-level edge list quadratic in duplicate multiplicity
    (the 100x replica's 27.31M doc pairs = 54.6M directed edges
    starved an 8 GB executor inside label propagation), but every twin
    shares its representative's component by construction, so the
    component graph only needs the ~diversity-sized rep pairs; members
    then inherit labels through ONE join. The doc-level cluster_id
    equals the rep-level one because each family's rep IS its min id
    (collapse_identical_sets) — so this is bit-identical to clustering
    the expanded pair set, at a 10^4x smaller iteration size on
    twin-heavy corpora.

    ``target_recall`` derives the banding from the (threshold, recall)
    contract exactly as in :func:`near_dup_minhash`.

    ``bucket_cap`` is the NATURAL home of the heavy-bucket star
    mitigation (see :func:`lsh_candidate_pairs`): clustering consumes
    only CONNECTIVITY, and the star keeps every over-cap bucket
    connected through its hub — so a corpus-scale near-identical
    boilerplate family still collapses to one cluster while the edge
    list stays linear in the family instead of quadratic (its pairwise
    completeness loss is invisible to connected components whenever
    members verify against the hub; measured + pinned round-8)."""
    from .graph import connected_components

    _check_threshold(threshold)
    if target_recall is not None:
        num_perms, rows_per_band = plan_banding(
            threshold, target_recall, max_perms
        )
    sh = shingle_set(df, id_col, shingles_col)
    reps_sh, members = collapse_identical_sets(sh, id_col)
    rep_pairs = _minhash_rep_pairs(
        reps_sh, id_col, num_perms, rows_per_band, threshold,
        bucket_cap=bucket_cap,
    ).select("id_a", "id_b")
    comps = connected_components(
        rep_pairs, "id_a", "id_b", max_rounds=max_rounds
    )
    clustered = (
        members.join(comps, members["__r"] == comps["node"], "left")
        .select(
            F.col("__doc").alias(id_col),
            F.coalesce("cluster_id", F.col("__r")).alias("cluster_id"),
        )
    )
    return (
        df.select(id_col)
        .join(clustered, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        )
    )


def signature_bands(
    signatures: DataFrame,
    id_col: str,
    num_perms: int = 8,
    rows_per_band: int = 2,
) -> DataFrame:
    """Explode minhash signatures to their LSH band table
    (id, band, key). This is the persistable dedup-index layout: write
    it bucketed by ``key`` and batch-vs-index candidate joins become
    shuffle-free on the index side."""
    bands = []
    for b in range(num_perms // rows_per_band):
        cols = [
            F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)
        ]
        bands.append(
            F.struct(F.lit(b).alias("band"), F.concat_ws("#", *cols).alias("key"))
        )
    return signatures.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("bk")
    ).select(id_col, "bk.band", "bk.key")


def est_jaccard_for_pairs(
    pairs: DataFrame,
    signatures: DataFrame,
    id_col: str,
    num_perms: int = 8,
) -> DataFrame:
    """MinHash-ESTIMATED Jaccard for candidate pairs: the fraction of
    agreeing signature components (the standard unbiased estimator).
    Unlike ``jaccard_for_pairs`` this needs only the k-component
    signatures, not the shingle sets — which is what makes a compact
    persistent dedup index possible. Returns (id_a, id_b, est_jaccard)."""
    sig_a = signatures.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"mh{p}").alias(f"a{p}") for p in range(num_perms)],
    )
    sig_b = signatures.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"mh{p}").alias(f"b{p}") for p in range(num_perms)],
    )
    agree = sum(
        F.when(F.col(f"a{p}") == F.col(f"b{p}"), 1).otherwise(0)
        for p in range(num_perms)
    )
    # same never-broadcast rule as jaccard_for_pairs, on ALL THREE
    # unbounded sides: the pair table AND both corpus-sized signature
    # tables (verbatim-duplicate replicas repeat each md5 component
    # ~N_twin times, so the sig shuffle compresses far below its
    # in-memory size and AQE's dynamic broadcast would build it
    # driver-side)
    return (
        pairs.hint("merge")
        .join(sig_a.hint("merge"), "id_a")
        .join(sig_b.hint("merge"), "id_b")
        .select(
            "id_a",
            "id_b",
            (agree.cast("double") / num_perms).alias("est_jaccard"),
        )
    )


def incremental_near_dup(
    batch: DataFrame,
    index_signatures: DataFrame | None,
    id_col: str,
    shingles_col: Column,
    num_perms: int = 8,
    rows_per_band: int = 2,
    min_est: float = 0.5,
    target_recall: float | None = None,
    max_perms: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """Incremental near-duplicate filtering of a new batch against the
    corpus already ingested — the ongoing-crawl pattern, where one-shot
    corpus-wide dedup would reprocess 100 TB for every day's arrivals.

    The persistent state is the minhash signature table of every
    document EVER SEEN (kept or dropped — a batch doc that matches an
    already-dropped earlier doc must still be dropped, exactly like the
    one-shot pass would have), COLLAPSED to one min-id representative
    per distinct full signature: identical signatures band and
    estimate identically, so the rep evicts exactly what any member
    would, and the index stops growing with the duplicate count. A batch doc is dropped when any band of
    its signature collides with (a) an index doc or (b) a lower-id doc
    of the same batch, and the signature-agreement estimate reaches
    ``min_est``.

    Determinism contract: signatures are md5-derived pure functions, so
    folding batches through this operator drops EXACTLY the ids the
    one-shot estimator pass (``near_dup_drop_ids``) drops on the full
    corpus, whatever the batch boundaries — pinned by a property test.
    Precondition for that equivalence: ids are assigned in ingestion
    order (every batch's ids exceed all index ids), which makes
    "earlier doc wins" mean the same thing in both formulations; with
    out-of-order ids the incremental pass still drops the batch-side
    doc (the index is immutable history), which is the operationally
    correct choice even though the one-shot pass would have kept it.
    Returns (kept_batch, updated_index_signatures).

    Scale model per batch: signature build is one hash-aggregate over
    the batch only; the candidate join touches index rows only in
    colliding band buckets (persist the index bucketed by band key to
    make that side shuffle-free); verification joins move only
    candidate pairs. Nothing ever rescans the historical corpus text.

    ``target_recall`` derives (num_perms, rows_per_band) from the
    (min_est, target_recall) contract via :func:`plan_banding` — BUT
    only on an empty index: the signature layout is persistent state,
    so a fold that changes perm count mid-stream cannot band new
    signatures against old ones. Re-deriving against an existing index
    whose width differs raises; re-ingest to change the contract.
    """
    if not 0.0 < min_est <= 1.0:
        raise ValueError(f"min_est must be in (0, 1], got {min_est}")
    if target_recall is not None:
        num_perms, rows_per_band = plan_banding(
            min_est, target_recall, max_perms
        )
        if index_signatures is not None:
            index_width = sum(
                1 for c in index_signatures.columns if c.startswith("mh")
            )
            if index_width != num_perms:
                raise ValueError(
                    f"derived banding wants {num_perms} perms but the "
                    f"persistent index carries {index_width} — the "
                    "signature layout is immutable state; re-ingest to "
                    "change the (threshold, recall) contract"
                )
    sh = shingle_set(batch, id_col, shingles_col)
    batch_sig = minhash_signature(sh, id_col, num_perms)
    sigcols = [f"mh{p}" for p in range(num_perms)]

    # Exact-signature pre-collapse: docs sharing a FULL signature
    # estimate Jaccard 1.0 >= any valid threshold, so every non-minimal
    # one is dropped unconditionally and only one representative per
    # signature enters the banding stage. Decision-invariant (identical
    # signatures produce identical bands and identical estimates), but
    # it keeps band buckets sparse when ingestion is duplicate-heavy —
    # the measured adversarial case (verbatim 10x replication) went
    # quadratic in bucket density without it.
    reps = batch_sig.groupBy(*sigcols).agg(F.min(id_col).alias(id_col))
    dup_drop = batch_sig.join(reps, [*sigcols, id_col], "left_anti").select(
        F.col(id_col)
    )

    within = lsh_candidate_pairs(reps, id_col, num_perms, rows_per_band)
    if index_signatures is not None:
        # the index is maintained signature-collapsed (see the update
        # step below), so it is used directly — no per-fold re-collapse
        # of the whole history (the cost BASELINE.md flagged on the
        # adversarial 10x replica). An externally-built uncollapsed
        # bootstrap index is still CORRECT here (extra identical-
        # signature rows only add redundant candidate pairs that
        # estimate identically), just less efficient until the first
        # returned index replaces it.
        idx_reps = index_signatures
        rep_bands = signature_bands(reps, id_col, num_perms, rows_per_band)
        idx_bands = signature_bands(idx_reps, id_col, num_perms, rows_per_band)
        cross = (
            idx_bands.withColumnRenamed(id_col, "id_a")
            .join(
                rep_bands.withColumnRenamed(id_col, "id_b"),
                ["band", "key"],
            )
            # self-pair guard: ids are global, so an index row carrying
            # a batch doc's own id IS that doc (e.g. a replayed batch
            # whose crashed attempt already wrote signatures) — it must
            # not evict itself
            .filter(F.col("id_a") != F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        cand = within.unionByName(cross)
        est_sig = idx_reps.unionByName(reps)
        # update step: the index stays collapsed to ONE min-id row per
        # distinct full signature. Identical signatures band and
        # estimate identically, so the representative is a perfect
        # stand-in for every member as a future evictor — the
        # queryable signature SET is unchanged while the index (and
        # every later fold's join input) stops growing with the
        # duplicate count. Decision-invariance vs the one-shot pass is
        # pinned by the fold-equivalence property test.
        all_sig = (
            index_signatures.unionByName(batch_sig)
            .groupBy(*sigcols)
            .agg(F.min(id_col).alias(id_col))
            .select(id_col, *sigcols)
        )
    else:
        cand = within
        est_sig = reps
        all_sig = batch_sig.groupBy(*sigcols).agg(
            F.min(id_col).alias(id_col)
        ).select(id_col, *sigcols)
    est = est_jaccard_for_pairs(cand, est_sig, id_col, num_perms)
    drop = (
        est.filter(F.col("est_jaccard") >= min_est)
        .select(F.col("id_b").alias(id_col))
        .unionByName(dup_drop)
        .distinct()
    )
    kept = batch.join(drop, id_col, "left_anti")
    return kept, all_sig


def near_dup_drop_ids(
    df: DataFrame,
    id_col: str,
    shingles_col: Column,
    num_perms: int = 8,
    rows_per_band: int = 2,
    min_est: float = 0.5,
) -> DataFrame:
    """One-shot reference form of the estimator-based dedup decision:
    the ids that would be dropped (every pair's higher id) running
    MinHash-LSH + signature-agreement over the whole corpus at once.
    ``incremental_near_dup`` folded over any batching of the same
    corpus must drop exactly this set."""
    sh = shingle_set(df, id_col, shingles_col)
    sig = minhash_signature(sh, id_col, num_perms)
    cand = lsh_candidate_pairs(sig, id_col, num_perms, rows_per_band)
    est = est_jaccard_for_pairs(cand, sig, id_col, num_perms)
    return (
        est.filter(F.col("est_jaccard") >= min_est)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    shingles_col: Column,
    threshold: float = 0.8,
    max_docs: int | None = 100_000,
    collapse_identical: bool = True,
) -> DataFrame:
    """Ground-truth all-pairs n-gram Jaccard via shingle equi-join
    (quadratic in docs sharing a shingle — the baseline MinHash-LSH
    approximates; keep for verification / small corpora).

    Guarded BY DESIGN against accidental large-corpus use: raises
    ``ValueError`` when the corpus exceeds ``max_docs``. The probe is
    limit-bounded (stops counting at max_docs + 1, so the small-corpus
    case never pays a full count) but DOES execute the input lineage
    once at call time — callers composing this over an expensive
    upstream pipeline on a corpus they already bound can pass
    ``max_docs=None`` to skip the probe (an auditable opt-out). For
    big corpora use ``near_dup_minhash`` / ``lsh_candidate_pairs`` +
    ``jaccard_for_pairs``, which compute the same exact Jaccard but
    only for banded candidate pairs.

    ``collapse_identical=True`` (default) runs the quadratic shingle
    join over DISTINCT shingle sets only and expands pairs back
    output-linearly (see :func:`collapse_identical_sets`) — bit-
    identical results, immune to verbatim-twin blowup. Pass ``False``
    to pin the raw formulation in tests (so a collapse bug cannot
    cancel out when two collapsed operators are compared)."""
    _check_threshold(threshold)
    if max_docs is not None:
        probe = df.select(id_col).distinct().limit(max_docs + 1).count()
        if probe > max_docs:
            raise ValueError(
                f"ngram_jaccard_pairs is O(n^2): corpus exceeds "
                f"max_docs={max_docs}. Use near_dup_minhash (banded LSH "
                "+ exact verify) for large corpora, or pass a larger "
                "max_docs (or None) to opt in explicitly."
            )
    sh = shingle_set(df, id_col, shingles_col)
    if collapse_identical:
        sh, mem = collapse_identical_sets(sh, id_col)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    a = sh.withColumnsRenamed({id_col: "id_a"})
    b = sh.withColumnsRenamed({id_col: "id_b"})
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    pairs = (
        inter.join(sizes.withColumnsRenamed({id_col: "id_a", "n": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({id_col: "id_b", "n": "n_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter")
                / (F.col("n_a") + F.col("n_b") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    if not collapse_identical:
        return pairs
    return expand_collapsed_pairs(pairs, mem, {"jaccard": F.lit(1.0)})


def prefix_filtered_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    shingles_col: Column,
    threshold: float = 0.8,
    _collapsed: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering (the
    AllPairs / PPJoin candidate rule of Bayardo et al., WWW'07 /
    Xiao et al., WWW'08) — same result set as ``ngram_jaccard_pairs``
    at the same threshold, but sub-quadratic candidate generation.

    Order each document's shingles by ascending global document
    frequency (ties broken by the shingle string, so the total order is
    deterministic and engine-independent). If ``J(x, y) >= t`` then
    ``|x ∩ y| >= ceil(t·|x|)``, so the first ``|x| - ceil(t·|x|) + 1``
    shingles of x (its *prefix*) must intersect y's prefix — joining
    only on prefix shingles finds every qualifying pair. A size filter
    (``t·max(|x|,|y|) <= min(|x|,|y|)``, implied by J >= t) prunes
    further before the exact verification join. Verification computes
    intersection COUNTS through :func:`pair_overlap_counts` (narrow
    candidate x posting rows) — never by attaching both sorted set
    arrays per pair, whose |pairs| x KB footprint DNF'd the 100x
    verbatim-twin replica on 73 GB of scratch (BASELINE.md round-4);
    jaccard = i / (n_a + n_b - i) needs only the counts.

    Scale design: the equi-join key set is only the PREFIX shingles —
    the rarest per doc — so the frequent shingles that make the naive
    shingle join quadratic (every stopword trigram joins all its docs
    pairwise) sit at the end of the ordering and never generate
    candidates. Document frequencies are one hash aggregate; the
    per-doc ordering is a window partitioned by doc (bounded groups);
    verification touches shingle sets only for surviving candidates.
    Returns (id_a, id_b, jaccard) with jaccard >= threshold, exact.

    The whole prefix/positional/verify pipeline runs over DISTINCT
    shingle sets only (see :func:`collapse_identical_sets` for why —
    verbatim twins would otherwise multiply candidates by ~T^2/2 and
    drag KB-scale set arrays through the verify join); set-level pairs
    expand back to doc pairs output-linearly. Same-set pairs are
    exactly jaccard = 1.0 (n/n), bit-identical to the uncollapsed
    computation.
    """
    _check_threshold(threshold)
    if _collapsed is not None:
        # round-12: callers that already materialized the collapsed
        # shingle table (q_neardup_eval checkpoints it for the
        # signature side too) pass it in instead of this operator
        # re-deriving the identical tokenize+shingle+collapse chain
        sh, mem = _collapsed
    else:
        sh_docs = shingle_set(df, id_col, shingles_col)
        sh, mem = collapse_identical_sets(sh_docs, id_col)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df_"))
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("df_", "shingle")
    # TWO prefix lengths per doc (round-13, the full AllPairs/PPJoin
    # prefix scheme — previously both join sides used the probe
    # prefix):
    #   probe prefix  |x| - ceil(t*|x|) + 1        (as before)
    #   index prefix  |x| - ceil(2t/(1+t)*|x|) + 1 (STRICTLY SHORTER)
    # For a qualifying pair J(x,y) >= t with |y| <= |x| (ties by id),
    # overlap O >= ceil(t/(1+t)(|x|+|y|)) >= ceil(2t/(1+t)|y|) and
    # O >= ceil(t|x|) (using |y| >= t|x| from the size filter). The
    # EARLIEST common shingle in the global (df_, shingle) order sits
    # at position <= |z| - O + 1 in each doc z (at least O-1 common
    # shingles follow it), i.e. within the INDEX prefix of the smaller
    # doc AND the PROBE prefix of the larger — so joining only
    # indexPrefix(smaller) x probePrefix(larger) still finds every
    # qualifying pair, with ~1/3 fewer posting rows on the index side
    # at t=0.5 (the candidate join is this operator's dominant cost).
    # The 1e-9 slack errs toward LONGER prefixes (candidate superset —
    # safe, the verify join restores exactness).
    pos = (
        sh.join(freq, "shingle")
        .withColumn("pos", F.row_number().over(w))
        .join(sizes, id_col)
        .filter(
            F.col("pos")
            <= F.col("n")
            - F.ceil(F.lit(threshold) * F.col("n") - F.lit(1e-9))
            + F.lit(1)
        )
        .select(
            id_col,
            "shingle",
            "n",
            "pos",
            (
                F.col("pos")
                <= F.col("n")
                - F.ceil(
                    F.lit(2.0 * threshold / (1.0 + threshold)) * F.col("n")
                    - F.lit(1e-9)
                )
                + F.lit(1)
            ).alias("__in_idx"),
        )
    )
    # index role = the SMALLER doc of the pair (ties by id): short prefix
    idx = pos.filter(F.col("__in_idx")).withColumnsRenamed(
        {id_col: "id_i", "n": "n_i", "pos": "pos_i"}
    ).select("shingle", "id_i", "n_i", "pos_i")
    # probe role = the LARGER doc: full probe prefix
    prb = pos.withColumnsRenamed(
        {id_col: "id_p", "n": "n_p", "pos": "pos_p"}
    ).select("shingle", "id_p", "n_p", "pos_p")
    # J >= t  <=>  inter >= t/(1+t) * (n_i + n_p)  (the PPJoin overlap
    # requirement alpha); slack errs toward keeping — verify decides
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("n_i") + F.col("n_p"))
        - F.lit(1e-9)
    )
    # merge hints: prefix tables are corpus-sized and carry verbatim-
    # duplicated shingle strings on twin-heavy corpora — the lying-
    # compression case AQE's dynamic broadcast must not fall for
    cand = (
        idx.hint("merge")
        .join(prb.hint("merge"), "shingle")
        # size-role ordering: the index side is the smaller doc (ties
        # broken by id) — each unordered pair is considered in exactly
        # one role assignment
        .filter(
            (F.col("n_i") < F.col("n_p"))
            | ((F.col("n_i") == F.col("n_p")) & (F.col("id_i") < F.col("id_p")))
        )
        # size/length filter: J >= t  =>  t * max <= min (max = n_p)
        .filter(
            F.lit(threshold) * F.col("n_p") - F.lit(1e-9) <= F.col("n_i")
        )
        # PPJoin positional filter (Xiao et al., WWW'08): everything at
        # or after the matched prefix position is the most that can
        # still overlap — 1 + min(n_i - pos_i, n_p - pos_p) — so pairs
        # whose shared shingle sits too LATE in either prefix can never
        # reach alpha and are pruned before the expensive verify join
        # (measured 96.2M -> far fewer candidates on the 30x twin
        # replica; exact-safe, the kept set is still a superset of all
        # qualifying pairs)
        .filter(
            F.lit(1)
            + F.least(
                F.col("n_i") - F.col("pos_i"), F.col("n_p") - F.col("pos_p")
            )
            >= alpha
        )
        # normalize roles back to the (id_a < id_b) pair identity the
        # verify join and every consumer key on; n follows its id
        # (n is a function of the id, so carrying both through the
        # distinct costs no cardinality and saves the size re-join)
        .select(
            F.least("id_i", "id_p").alias("id_a"),
            F.greatest("id_i", "id_p").alias("id_b"),
            F.when(F.col("id_i") < F.col("id_p"), F.col("n_i"))
            .otherwise(F.col("n_p"))
            .alias("n_a"),
            F.when(F.col("id_i") < F.col("id_p"), F.col("n_p"))
            .otherwise(F.col("n_i"))
            .alias("n_b"),
        )
        .distinct()
    )
    ov = pair_overlap_counts(cand, sh, id_col, carry_cols=("n_a", "n_b"))
    rep_pairs = ov.select(
        "id_a",
        "id_b",
        (
            F.col("__i") / (F.col("n_a") + F.col("n_b") - F.col("__i"))
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)
    return expand_collapsed_pairs(rep_pairs, mem, {"jaccard": F.lit(1.0)})


def plan_simhash_bands(
    max_hamming: int,
    total_bits: int = SIMHASH_BITS,
    target_recall: float | None = None,
) -> tuple[int, int]:
    """Derive SimHash banding ``(num_bands, band_bits)`` from a hamming
    threshold — the simhash counterpart of :func:`plan_banding`.

    Default (``target_recall=None``) is the EXACT pigeonhole plan:
    ``max_hamming + 1`` bands. A pair within hamming d flips at most d
    bands, so with d+1 disjoint bands at least one band is untouched
    and the pair is ALWAYS a candidate — recall 1.0 guaranteed, no
    probability involved (the classical 'hamming <= k needs k+1
    blocks' trick). The cost is shorter band keys (total_bits // b
    bits), i.e. more candidates per bucket — precision paid for
    certain recall, with verification still the cheap bit_count on
    values already carried.

    With ``target_recall`` set, picks the FEWEST bands whose
    approximate recall at exactly ``max_hamming`` flips meets the
    target — recall(d) ≈ 1-(1-(1-d/total)^r)^b with r = total//b
    (independent-flip approximation; the pigeonhole bound d < b
    short-circuits to exact 1.0). Fewer bands → longer keys → fewer
    spurious candidates, the right trade when the corpus tolerates
    bounded misses."""
    if not 0 <= max_hamming <= total_bits:
        raise ValueError(
            f"max_hamming must be in [0, {total_bits}], got {max_hamming}"
        )
    if target_recall is None:
        # the guarantee needs d+1 DISJOINT bands: at d == total_bits
        # every bit may differ, every band is dirty, and NO banding
        # has any recall — refuse rather than promise falsely
        if max_hamming >= total_bits:
            raise ValueError(
                f"cannot guarantee recall at hamming {max_hamming} with "
                f"{total_bits} bits — needs {max_hamming + 1} non-empty "
                "bands"
            )
        b = max_hamming + 1
        r = total_bits // b
        return (b, r)
    if not (0.0 < target_recall < 1.0):
        raise ValueError(
            f"target_recall must be in (0, 1) or None, got {target_recall}"
        )
    p_bit = 1.0 - max_hamming / total_bits
    for b in range(1, total_bits + 1):
        r = total_bits // b
        if r < 1:
            break
        if max_hamming < b:  # pigeonhole: exact recall 1.0
            return (b, r)
        recall = 1.0 - (1.0 - p_bit**r) ** b
        if recall >= target_recall:
            return (b, r)
    raise ValueError(
        f"no banding of {total_bits} bits reaches recall "
        f"{target_recall} at hamming {max_hamming}"
    )


def plan_simhash_probe(
    max_hamming: int,
    total_bits: int = SIMHASH_BITS,
    max_variants: int = 512,
) -> tuple[int, int, int]:
    """Plan the EXACT-recall simhash candidate index as (num_bands,
    band_bits, probe_flips) for the multi-index probe join (Manku et
    al.'s simhash dedup shape): split the fingerprint into ``b`` bands
    of ``k`` bits; a pair within hamming ``d`` overall has SOME band
    with at most ``t = floor(d/b)`` flipped bits (pigeonhole), so
    probing every key within hamming ``t`` of a doc's band key —
    ``v = sum_{i<=t} C(k, i)`` enumerated XOR masks — finds every
    qualifying pair with CERTAINTY, no probability involved.

    This generalizes the b = d+1 / t = 0 equality plan
    (:func:`plan_simhash_bands`): spending ``v`` probe rows per band
    buys ``k``-bit keys instead of ``total//(d+1)``-bit ones, and
    candidate selectivity improves roughly as ``b*v / 2^k``. For
    d=10 over 60 bits: the t=0 plan is 11 bands of 5 bits (any-band
    collision odds ~11/32 ~ 0.34 between UNRELATED values); the chosen
    t=2 plan is 4 bands of 15 bits probing 121 masks (odds
    ~484/32768 ~ 0.015) — ~23x fewer spurious candidates for a
    484-rows/doc narrow explode (measured: the registry's exact query
    dropped 16.2 -> ~4 s single-warm at sf0.1, BASELINE.md round-8).

    Selection: among band counts 1..d+1 whose variant count fits
    ``max_variants`` (probe-volume budget), minimize the selectivity
    ``b * v / 2^k``. b = d+1 (t=0, v=1) is always feasible, so the
    planner never fails for d < total_bits."""
    if not 0 <= max_hamming < total_bits:
        raise ValueError(
            f"max_hamming must be in [0, {total_bits}), got {max_hamming}"
        )
    if max_variants < 1:
        raise ValueError(f"max_variants must be >= 1, got {max_variants}")
    from math import comb

    best: tuple[float, int, int, int] | None = None
    for b in range(1, max_hamming + 2):
        k = total_bits // b
        if k < 1:
            break
        t = max_hamming // b
        v = sum(comb(k, i) for i in range(min(t, k) + 1))
        if v > max_variants:
            continue
        sel = b * v / float(1 << k)
        if best is None or sel < best[0]:
            best = (sel, b, k, t)
    assert best is not None  # b = d+1 always fits (v = 1)
    return best[1], best[2], best[3]


def simhash_near_dup(
    df: DataFrame,
    id_col: str,
    tokens_col: Column,
    num_bands: int = 4,
    band_bits: int = 15,
    threshold: int = 10,
    target_recall: float | None = None,
    exact_recall: bool = False,
) -> DataFrame:
    """SimHash near-duplicate pairs: band the simhash, bucket DISTINCT
    simhash values by band value, generate candidate pairs INSIDE each
    bucket from a sorted collect_list (higher-order pair expansion),
    verify hamming, then expand value-level pairs back to doc pairs
    output-linearly.

    The distinct-value collapse (round-5, same preprocessing insight
    as :func:`collapse_identical_sets`) is what makes this survive
    duplicate-heavy corpora: docs with identical simhash collide in
    EVERY band, so bucketing RAW docs makes the per-bucket pair array
    — materialized as ONE row by the higher-order expansion — grow
    quadratically with duplicate multiplicity. Measured at the 100x
    verbatim-twin replica: the hottest bucket held 26,900 docs =
    2.87B candidate pairs, a single 361M-struct array row, instant
    8 GB heap death. Over distinct values the bucket width is bounded
    by the corpus's simhash DIVERSITY (which replication does not
    grow); identical-value pairs re-enter as hamming-0 expansions
    through :func:`expand_collapsed_pairs` (a merge-hinted join — no
    member arrays attached to pairs), and every doc pair inherits its
    value pair's hamming unchanged, so the result is bit-identical to
    the uncollapsed form.

    One simhash computation, one distinct-value aggregate, one bucket
    shuffle over values. Returns (id_a, id_b, hamming) with
    id_a < id_b.

    Banding contract (round-7, mirroring the MinHash tuner):
    ``exact_recall=True`` routes to the multi-index PROBE plan —
    recall 1.0 GUARANTEED at ``threshold`` by the same pigeonhole
    argument but with wide band keys + enumerated <=t-flip probe
    masks instead of narrow-key equality (see
    :func:`plan_simhash_probe`; round-8, replacing the 11x5-bit
    equality plan whose 5-bit keys made ~34% of unrelated value pairs
    candidates); ``target_recall`` derives the fewest bands meeting
    that probabilistic floor. Either overrides the hand-picked
    defaults."""
    if not 0 <= threshold <= SIMHASH_BITS:
        raise ValueError(
            f"hamming threshold must be in [0, {SIMHASH_BITS}], got {threshold}"
        )
    if exact_recall:
        return _simhash_near_dup_probe(df, id_col, tokens_col, threshold)
    if target_recall is not None:
        num_bands, band_bits = plan_simhash_bands(
            threshold, target_recall=target_recall
        )
    from pyspark.sql import Window

    sh_docs = simhash(df, id_col, tokens_col)
    # ONE shuffle for the whole collapse: a min-id window over the
    # simhash partition tags every doc with its family representative
    # (no collect_list, so no row widens with twin multiplicity; no
    # rep re-join, which would shuffle the doc set a second time).
    # Value groups are duplicate families — bounded like any groupBy
    # on the same key would be.
    tagged = sh_docs.withColumn(
        "__rep", F.min(id_col).over(Window.partitionBy("simhash"))
    )
    members = tagged.select(
        F.col("__rep").alias("__r"),
        F.col(id_col).alias("__doc"),
        F.lit(1).alias("__n"),
    )
    sh = tagged.filter(F.col(id_col) == F.col("__rep")).select(
        F.col(id_col), "simhash"
    )
    mask = (1 << band_bits) - 1
    bands = sh.select(
        F.col(id_col).alias("__id"),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), band_bits * b)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(num_bands)
                ]
            )
        ).alias("bk"),
    ).select("__id", "simhash", "bk.band", "bk.key")
    buckets = (
        bands.groupBy("band", "key")
        .agg(F.array_sort(F.collect_list(F.struct("__id", "simhash"))).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(ds, (x, i) -> "
                "transform(slice(ds, i + 2, size(ds) - i - 1), y -> "
                "struct(x.__id AS id_a, y.__id AS id_b, "
                "x.simhash AS sh_a, y.simhash AS sh_b))))"
            )
        ).alias("p")
    ).select("p.*")
    # Filter BEFORE distinct: hamming is a function of the pair, so the
    # result is identical, but far-apart candidate pairs are dropped
    # map-side instead of shuffling into the dedup exchange. The
    # distinct runs at VALUE level (bounded by simhash diversity);
    # doc-level pairs from the expansion are unique by construction
    # (member sets are disjoint across values), so no corpus-sized
    # dedup shuffle exists anywhere.
    rep_pairs = (
        pairs.select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= threshold)
        .distinct()
    )
    return expand_collapsed_pairs(
        rep_pairs, members, {"hamming": F.lit(0)}
    )


def _simhash_near_dup_probe(
    df: DataFrame,
    id_col: str,
    tokens_col: Column,
    threshold: int,
) -> DataFrame:
    """EXACT-recall simhash near-dup via the multi-index probe join
    (the plan :func:`plan_simhash_probe` derives): distinct simhash
    values post each band's ``k``-bit key once; every value also
    PROBES all keys within hamming ``t = floor(threshold/num_bands)``
    of its own (the enumerated XOR masks, a narrow
    ``num_bands x sum C(k,<=t)`` explode); an equi-join on
    (band, key) generates candidates; ``bit_count`` verifies.

    Recall 1.0 proof (pigeonhole, no probability): a qualifying pair
    flips <= threshold bits total, so some band flipped <= t — the XOR
    of that band's two keys is one of the enumerated masks, hence one
    side's probe hits the other side's post exactly. Compared with the
    round-7 equality plan (threshold+1 bands of total//(threshold+1)
    bits), the keys are ~3x wider, so unrelated-value collisions drop
    by orders of magnitude (d=10/60 bits: any-band collision odds
    0.34 -> 0.015) and the candidate join never materializes per-bucket
    pair arrays at all. Verbatim/same-simhash docs are collapsed to one
    representative first and re-expanded output-linearly, exactly as in
    :func:`simhash_near_dup`. Both join sides merge-hinted: the posting
    tables are corpus-sized near-sequential longs that compress
    misleadingly well (the AQE dynamic-broadcast hazard documented in
    ``jaccard_for_pairs``)."""
    from itertools import combinations

    num_bands, band_bits, flips = plan_simhash_probe(threshold)
    sh_docs = simhash(df, id_col, tokens_col)
    tagged = sh_docs.withColumn(
        "__rep", F.min(id_col).over(Window.partitionBy("simhash"))
    )
    members = tagged.select(
        F.col("__rep").alias("__r"),
        F.col(id_col).alias("__doc"),
        F.lit(1).alias("__n"),
    )
    sh = tagged.filter(F.col(id_col) == F.col("__rep")).select(
        F.col(id_col), "simhash"
    )

    mask = (1 << band_bits) - 1
    posts = sh.select(
        F.col(id_col).alias("__pid"),
        F.col("simhash").alias("__psh"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), band_bits * b)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(num_bands)
                ]
            )
        ).alias("bk"),
    ).select("__pid", "__psh", "bk.band", "bk.key")

    xor_masks = [0]
    for i in range(1, flips + 1):
        for pos in combinations(range(band_bits), i):
            xor_masks.append(sum(1 << p for p in pos))
    mlit = F.array(*[F.lit(m).cast("long") for m in xor_masks])
    probes = posts.select(
        F.col("__pid").alias("__qid"),
        F.col("__psh").alias("__qsh"),
        "band",
        F.explode(
            F.transform(mlit, lambda m: F.col("key").bitwiseXOR(m))
        ).alias("key"),
    )
    rep_pairs = (
        probes.hint("merge")
        .join(posts.hint("merge"), ["band", "key"])
        .filter(F.col("__qid") < F.col("__pid"))
        .select(
            F.col("__qid").alias("id_a"),
            F.col("__pid").alias("id_b"),
            F.bit_count(
                F.col("__qsh").bitwiseXOR(F.col("__psh"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= threshold)
        .distinct()
    )
    return expand_collapsed_pairs(rep_pairs, members, {"hamming": F.lit(0)})


def simhash(
    df: DataFrame, id_col: str, tokens_col: Column, bits: int = SIMHASH_BITS
) -> DataFrame:
    """Per-document SimHash over the token multiset.

    Token hash = first 15 md5 hex chars as int64 (60 usable bits). For
    each bit j, ±1 is summed across the document's tokens; bit j of the
    simhash is set iff the sum is positive.

    Computed entirely per-row with higher-order functions: the hashed
    token array is materialized once (one md5 per token), then a SINGLE
    fold with an array-of-``bits`` accumulator sums all per-bit ±1
    contributions in one pass (zip_with against a literal powers-of-two
    array). NO explode, NO groupBy, NO shuffle — each document is
    independent, so this scales embarrassingly across executors (the
    earlier explode+60-sum-aggregate formulation shuffled |tokens|
    rows, measured ~2x slower at sf0.1; the earlier 60-separate-folds
    formulation re-scanned the token array per bit and compiled a huge
    whole-stage-codegen unit — ~30 s cold at sf0.1 once banding
    multiplied it).
    Returns (id, simhash int64).
    """
    from .skew import fan_out

    hashed = F.transform(
        tokens_col,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
    )
    # "embarrassingly parallel" is only true when the scan has enough
    # splits: a single-row-group file is ONE task, so the per-token md5
    # + fold pins one core (guide §2.5). fan_out round-robins only when
    # the input parallelism is below the session default — a no-op at
    # real scale, a measured multi-x win at fixture scale.
    base = fan_out(df).select(F.col(id_col), hashed.alias("__hs"))

    lzero = F.lit(0).cast("long")
    pows = F.array(*[F.lit(1 << j).cast("long") for j in range(bits)])
    bitsums = F.aggregate(
        F.col("__hs"),
        F.array_repeat(lzero, bits),
        lambda acc, h: F.zip_with(
            acc,
            pows,
            lambda a, p: a
            + F.when(h.bitwiseAND(p) != lzero, F.lit(1).cast("long")).otherwise(
                F.lit(-1).cast("long")
            ),
        ),
    )
    value = F.aggregate(
        F.zip_with(bitsums, pows, lambda s, p: F.when(s > 0, p).otherwise(lzero)),
        lzero,
        lambda acc, x: acc + x,
    )
    return base.select(F.col(id_col), value.alias("simhash"))


def contamination_scores(
    corpus_shingles: DataFrame,
    eval_shingles: DataFrame,
    id_col: str,
    bloom_bits: int | None = None,
    bloom_k: int = 4,
) -> DataFrame:
    """Benchmark decontamination: for each corpus doc, the fraction of
    its distinct shingles that appear in ANY eval-set doc.

    Inputs are (id, shingle) pair tables from ``shingle_set``. Returns
    (id, n_shingles, n_hits, contamination) — one row per corpus doc
    that has at least one shingle; train docs scoring above a threshold
    get dropped by the caller before pretraining so the benchmark can't
    leak into the training set.

    Scale shape: the eval shingle set is deduped then joined to the
    corpus pairs on the shingle hash — an equi-join that AQE broadcasts
    whenever the benchmark side is small (it always is: benchmarks are
    MBs, corpora are TBs), so the corpus is scanned once with no
    all-pairs blowup; the per-doc ratio is then one hash aggregate.

    ``bloom_bits``: when the eval side is NOT broadcast-small
    (multi-benchmark suites: 10^9 distinct shingles), pass a filter
    size and the corpus rows are pre-screened through a Bloom filter
    built on the eval shingles before the exact join — the bitmap is
    bloom_bits/63 words however large the eval strings are, and only
    bloom-surviving corpus rows (true hits + the eps false-positive
    sliver) enter the shuffle join. Bloom filters have NO false
    negatives, so the result is bit-identical to the unfiltered path —
    the registered query q:doc_decontaminate_bloom pins that equality
    against the exact oracle every round.
    """
    eval_set = eval_shingles.select("shingle").distinct()
    sizes = corpus_shingles.groupBy(id_col).agg(
        F.count("*").alias("n_shingles")
    )
    probe_side = corpus_shingles
    if bloom_bits is not None:
        from .bloom import bloom_build, bloom_probe_inline

        bloom = bloom_build(
            eval_set, "shingle", m_bits=bloom_bits, k=bloom_k
        )
        probe_side = bloom_probe_inline(
            corpus_shingles, bloom, "shingle", m_bits=bloom_bits, k=bloom_k
        ).filter(F.col("bloom_hit")).drop("bloom_hit")
    hits = (
        probe_side.join(eval_set, "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        sizes.join(hits, id_col, "left")
        .withColumn("n_hits", F.coalesce("n_hits", F.lit(0)))
        .withColumn("contamination", F.col("n_hits") / F.col("n_shingles"))
    )


def duplicate_span_stats(
    docs: DataFrame,
    id_col: str,
    shingles_col: Column,
    min_docs: int = 2,
) -> DataFrame:
    """Substring-level duplication audit (the scalable stand-in for
    suffix-array substring dedup a la "Deduplicating Training Data
    Makes Language Models Better": exact long-span matches, found by
    hashing fixed-length token windows instead of building a suffix
    array).

    For every document: how many distinct spans (token n-gram windows
    from ``shingles_col``) it contains, and what fraction of them also
    appear in at least ``min_docs - 1`` OTHER documents — the signal
    used to strip boilerplate passages and templated spam before
    training.

    Scale shape: spans travel as md5 digests (fixed 32 bytes, never the
    raw text), one distinct per doc, one hash aggregate per span
    keyed by digest (uniform keys — no skew), one semi-style join
    back. Wide corpora shuffle only (digest, id) pairs.

    Returns (id_col, n_spans, n_shared, shared_frac) — docs shorter
    than the window size report 0 spans and 0.0 fraction.
    """
    spans = (
        docs.select(F.col(id_col), F.explode_outer(shingles_col).alias("__s"))
        .select(id_col, F.md5("__s").alias("__h"))
        .distinct()
    )
    df_counts = (
        spans.groupBy("__h")
        .agg(F.countDistinct(id_col).alias("__df"))
        .filter(F.col("__df") >= min_docs)
    )
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.col("__h")).alias("n_spans")
    )
    shared = (
        spans.join(df_counts, "__h")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        per_doc.join(shared, id_col, "left")
        .withColumn("n_shared", F.coalesce("n_shared", F.lit(0)))
        .withColumn(
            "shared_frac",
            F.when(
                F.col("n_spans") > 0,
                F.col("n_shared").cast("double")
                / F.col("n_spans").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    shingles_col: Column,
    num_perms: int = 8,
    rows_per_band: int = 2,
    threshold: float = 0.7,
) -> DataFrame:
    """Near-CONTAINMENT pairs: |A ∩ B| / min(|A|, |B|) >= threshold —
    the "one document is mostly quoted inside the other" signal that
    symmetric Jaccard misses entirely (a paragraph fully embedded in a
    book has tiny Jaccard but containment 1.0). Candidates come from
    the same banded MinHash index as near_dup_minhash (min-wise hashing
    is still sensitive to the smaller side's shingles), verified with
    exact intersection COUNTS via :func:`pair_overlap_counts` (round-5
    — the narrow candidate x posting core that closed
    neardup_prefix_jaccard's 100x scratch DNF; the prior formulations
    either exploded |pairs| x |shingles/doc| rows or attached both
    KB-scale set arrays to every pair). Candidates/verification run
    over DISTINCT shingle sets only (see :func:`collapse_identical_sets`;
    same-set pairs are exactly inter = n_a = n_b, containment 1.0).
    Returns (id_a, id_b, inter, n_a, n_b, containment) with
    id_a < id_b. Candidate pairs with EMPTY intersection never reach
    the output (the overlap core's inner semantics) — lossless for
    any threshold in (0, 1], which is validated."""
    _check_threshold(threshold)
    sh = shingle_set(df, id_col, shingles_col)
    reps_sh, members = collapse_identical_sets(sh, id_col)
    sig = minhash_signature(reps_sh, id_col, num_perms)
    cand = lsh_candidate_pairs(sig, id_col, num_perms, rows_per_band)
    sizes = reps_sh.groupBy(id_col).agg(F.count("*").alias("__n_"))
    ov = (
        pair_overlap_counts(cand, reps_sh, id_col)
        .join(
            sizes.select(
                F.col(id_col).alias("id_a"), F.col("__n_").alias("__na")
            ).hint("merge"),
            "id_a",
        )
        .join(
            sizes.select(
                F.col(id_col).alias("id_b"), F.col("__n_").alias("__nb")
            ).hint("merge"),
            "id_b",
        )
    )
    # long casts keep the pre-refactor schema (count(*)-typed columns)
    out = ov.select(
        "id_a",
        "id_b",
        F.col("__i").cast("long").alias("inter"),
        F.col("__na").cast("long").alias("n_a"),
        F.col("__nb").cast("long").alias("n_b"),
        (
            F.col("__i").cast("double")
            / F.least("__na", "__nb").cast("double")
        ).alias("containment"),
    )
    rep_pairs = out.filter(F.col("containment") >= threshold)
    nn = F.col("__n").cast("long")
    return expand_collapsed_pairs(
        rep_pairs,
        members,
        {
            "inter": nn,
            "n_a": nn,
            "n_b": nn,
            "containment": F.lit(1.0),
        },
    )


def strip_duplicate_spans(
    docs: DataFrame,
    id_col: str,
    tokens_col: Column,
    span_n: int = 8,
    min_docs: int = 2,
    scope: str = "cross-doc",
) -> DataFrame:
    """Exact-substring span REMOVAL — the edit counterpart of
    :func:`duplicate_span_stats` (which only audits): every ``span_n``
    consecutive-token window occurring in >= ``min_docs`` distinct
    documents is owned by the minimum-id document containing it; every
    OTHER document drops the tokens that window covers. This is the
    distributed stand-in for suffix-array exact-substring dedup
    ("Deduplicating Training Data Makes Language Models Better",
    Lee et al. 2022): boilerplate passages, templated spam, and
    verbatim quotations survive in exactly one place in the corpus.

    Semantics (deterministic under any partitioning): token position
    ``p`` of document ``d`` is removed iff SOME duplicated window
    covering ``p`` exists in ``d`` and that occurrence is not the
    window's kept one. Overlapping duplicated windows union their
    coverage. Documents shorter than ``span_n`` tokens are untouched.
    ``scope`` picks which occurrences are kept:

    - ``'cross-doc'`` (default): a window is duplicated iff it appears
      in >= ``min_docs`` DISTINCT documents; the minimum-id document
      owns it and keeps EVERY occurrence (intra-doc repeats of a
      cross-doc window survive in the owner; windows repeated only
      within one document are not duplicated at all). The
      conservative production setting: never edits a document that
      originated a passage.
    - ``'first-occurrence'``: full Lee-et-al ExactSubstr semantics —
      a window with >= 2 occurrences TOTAL (intra- or cross-document)
      keeps only its lexicographically first occurrence
      (min (doc id, start position)); every other occurrence is
      covered, including repeats inside the owner and windows
      repeated only within one document. ``min_docs`` is ignored.

    Scale shape: windows travel as md5 digests + int positions, never
    text; one hash-aggregate per digest (uniform keys), one join back
    on digest, and the coverage explode is ``span_n`` x the number of
    duplicated NON-OWNED window instances — output-bounded, no
    quadratic anywhere. The rebuild is a JVM higher-order filter over
    the original token array (no Python, no re-tokenization).

    Returns (id_col, n_tokens, n_removed, text_clean) where
    ``text_clean`` is the surviving tokens joined by single spaces.
    """
    if span_n < 1:
        raise ValueError(f"span_n must be >= 1, got {span_n}")
    if scope not in ("cross-doc", "first-occurrence"):
        raise ValueError(
            f"scope must be 'cross-doc' or 'first-occurrence', got {scope!r}"
        )
    if scope == "cross-doc" and min_docs < 2:
        raise ValueError(
            f"min_docs must be >= 2 (a span duplicated across at least "
            f"two documents), got {min_docs}"
        )
    base = docs.select(F.col(id_col), tokens_col.alias("__t"))
    spans = base.select(
        id_col,
        F.posexplode(
            F.expr(
                f"CASE WHEN size(__t) >= {span_n} THEN "
                f"transform(sequence(1, size(__t) - {span_n} + 1), "
                f"i -> md5(array_join(slice(__t, i, {span_n}), ' '))) "
                "ELSE array() END"
            )
        ).alias("__p0", "__h"),
    ).select(id_col, (F.col("__p0") + 1).alias("__start"), "__h")
    if scope == "first-occurrence":
        # keep only the lexicographically first (doc id, start)
        # occurrence of any window with >= 2 TOTAL occurrences;
        # min(struct) is order-independent, so still deterministic
        first = (
            spans.groupBy("__h")
            .agg(
                F.count("*").alias("__n_occ"),
                F.min(
                    F.struct(
                        F.col(id_col).alias("i"),
                        F.col("__start").alias("s"),
                    )
                ).alias("__first"),
            )
            .filter(F.col("__n_occ") >= 2)
            .select("__h", "__first")
        )
        doomed = spans.join(first, "__h").filter(
            (F.col(id_col) != F.col("__first.i"))
            | (F.col("__start") != F.col("__first.s"))
        )
    else:
        dup = (
            spans.groupBy("__h")
            .agg(
                F.countDistinct(id_col).alias("__df"),
                F.min(id_col).alias("__owner"),
            )
            .filter(F.col("__df") >= min_docs)
            .select("__h", "__owner")
        )
        doomed = spans.join(dup, "__h").filter(
            F.col(id_col) != F.col("__owner")
        )
    covered = (
        doomed
        .select(
            id_col,
            F.explode(
                F.sequence(
                    F.col("__start"),
                    F.col("__start") + F.lit(span_n - 1),
                )
            ).alias("__pos"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("__pos").alias("__cov"))
    )
    return (
        base.join(covered, id_col, "left")
        .withColumn(
            "__cov", F.coalesce("__cov", F.expr("array()"))
        )
        .withColumn(
            "__clean",
            F.expr(
                "filter(transform(__t, (x, i) -> "
                "IF(array_contains(__cov, i + 1), NULL, x)), "
                "x -> x IS NOT NULL)"
            ),
        )
        .select(
            F.col(id_col),
            F.size("__t").cast("long").alias("n_tokens"),
            (F.size("__t") - F.size("__clean")).cast("long").alias(
                "n_removed"
            ),
            F.array_join("__clean", " ").alias("text_clean"),
        )
    )
