"""Semantics pins for strip_duplicate_spans — exact-substring span
REMOVAL (the edit counterpart of duplicate_span_stats' audit):

- the minimum-id owner of a duplicated window keeps every occurrence;
- non-owners drop exactly the covered tokens (context survives);
- windows crossing a repeat boundary exist in one doc only -> kept;
- a window repeated only WITHIN one document is not duplicated;
- docs shorter than span_n are untouched;
- deterministic under repartitioning;
- parameter validation is loud.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_spark_spark.operators.neardup import strip_duplicate_spans

BOILER = "the quick brown fox jumps over the lazy dog tonight"  # 10 toks


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = strip_duplicate_spans(
        df, "doc_id", F.split("text", " "), **kw
    )
    return {r.doc_id: r for r in out.collect()}


def test_owner_keeps_others_strip_context_survives(spark):
    got = _run(
        spark,
        [
            (1, BOILER + " alpha beta gamma"),
            (2, "intro words here " + BOILER + " tail end"),
            (3, "totally unrelated text with no shared spans at all ok"),
            (4, "short doc"),
        ],
        span_n=8,
    )
    assert got[1].n_removed == 0  # min-id owner untouched
    assert got[1].text_clean == BOILER + " alpha beta gamma"
    assert got[2].n_removed == 10  # exactly the boilerplate tokens
    assert got[2].text_clean == "intro words here tail end"
    assert got[3].n_removed == 0
    assert got[4].n_removed == 0 and got[4].n_tokens == 2  # < span_n


def test_within_doc_repeat_is_not_duplicated_but_cross_doc_is(spark):
    # doc 5 repeats the boilerplate twice; with an OWNER doc present,
    # both copies are covered; windows crossing the repeat boundary
    # exist only in doc 5 (df=1) and do not extend coverage
    got = _run(
        spark,
        [(1, BOILER), (5, BOILER + " " + BOILER)],
        span_n=8,
    )
    assert got[1].n_removed == 0
    assert got[5].n_removed == 20 and got[5].text_clean == ""
    # alone (no second doc), the intra-doc repeat is NOT duplicated:
    # df counts distinct docs
    solo = _run(spark, [(5, BOILER + " " + BOILER)], span_n=8)
    assert solo[5].n_removed == 0


def test_overlapping_windows_union_coverage(spark):
    # two docs share an 11-token run -> 4 overlapping 8-windows in the
    # non-owner; coverage is their union (11 tokens), not 4*8
    run = BOILER + " again"  # 11 tokens
    got = _run(
        spark,
        [(1, run + " xx yy"), (2, "zz " + run + " ww")],
        span_n=8,
    )
    assert got[2].n_removed == 11
    assert got[2].text_clean == "zz ww"


def test_deterministic_under_repartition(spark):
    rows = [
        (i, f"prefix{i} " + BOILER + f" suffix{i}") for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(
        map(
            tuple,
            strip_duplicate_spans(
                df, "doc_id", F.split("text", " "), span_n=8
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            strip_duplicate_spans(
                df.repartition(13, "doc_id"),
                "doc_id",
                F.split("text", " "),
                span_n=8,
            ).collect(),
        )
    )
    assert a == b
    # every non-owner lost exactly the 10 boilerplate tokens
    by_id = dict((r[0], r) for r in a)
    assert by_id[0][2] == 0
    for i in range(1, 20):
        assert by_id[i][2] == 10


def test_first_occurrence_scope_scrubs_intra_doc_repeats(spark):
    """scope='first-occurrence' (full Lee-et-al ExactSubstr): only the
    lexicographically first (doc, position) occurrence of a repeated
    window survives — including repeats INSIDE one document, which the
    cross-doc scope deliberately keeps."""
    doc = "solo " + BOILER.replace("tonight", "nightly")
    rows = [(9, doc + " " + BOILER.replace("tonight", "nightly"))]
    cross = _run(spark, rows, span_n=8)
    assert cross[9].n_removed == 0  # intra-doc only: cross-doc keeps
    first = _run(spark, rows, span_n=8, scope="first-occurrence")
    assert first[9].n_removed == 10  # exactly the second copy
    assert first[9].text_clean == doc
    # cross-doc case: the owner's own repeat is ALSO scrubbed under
    # first-occurrence (kept under cross-doc)
    rows2 = [(1, BOILER), (5, BOILER + " " + BOILER)]
    fo = _run(spark, rows2, span_n=8, scope="first-occurrence")
    assert fo[1].n_removed == 0 and fo[5].n_removed == 20


def test_param_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="span_n"):
        strip_duplicate_spans(df, "doc_id", F.split("text", " "), span_n=0)
    with pytest.raises(ValueError, match="min_docs"):
        strip_duplicate_spans(
            df, "doc_id", F.split("text", " "), min_docs=1
        )
    with pytest.raises(ValueError, match="scope"):
        strip_duplicate_spans(
            df, "doc_id", F.split("text", " "), scope="bogus"
        )
    # min_docs is ignored (not validated) under first-occurrence scope
    strip_duplicate_spans(
        df, "doc_id", F.split("text", " "),
        min_docs=1, scope="first-occurrence",
    )
