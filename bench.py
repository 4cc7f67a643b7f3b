"""Benchmark harness: runs every headline query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full execution, no
write cost, nothing collected to the driver). One warmup of the smallest
query amortizes JVM/codegen startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from etl_spark_spark.session import get_spark  # noqa: E402


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# the round-1 query set, frozen: summing warm times over exactly these
# names gives a number comparable across rounds even as the query set
# grows (BASELINE.md round-1 closing total was measured over these 46)
R1_QUERIES = frozenset(
    """superdesconto allocation pricing_summary dedup_latest_part
    top_orders_per_customer customers_without_orders orders_enriched
    normalize_keys monthly_orders_1995 events_by_type doc_text_stats
    doc_lang_id doc_exact_dedup neardup_minhash neardup_ngram_jaccard
    doc_simhash emb_cosine_topk emb_cosine_topk_lsh emb_cosine_topk_ivf
    events_tumbling events_time_rollup events_sessionize
    multimodal_features custkeys_both_years custkeys_only_1995
    rollup_losses supplier_share_expr events_props_map events_sliding
    emb_near_dup global_top_orders doc_fingerprints shipping_priority
    local_supplier_volume dedup_any_count nation_reconcile sql_frontend
    user_value_trend orders_profile above_avg_orders emb_stats
    price_quantiles purchase_last_click neardup_simhash sketch_stats
    error_context_views""".split()
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="etl-spark-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()
    # warmup: JVM + codegen + parquet footer caches
    _force(queries["normalize_keys"](spark, sf_dir))

    timings: dict[str, float] = {}
    warm: dict[str, float] = {}

    def _line(partial: bool) -> str:
        doc = {
            "metric": "total_query_wall_sec",
            "value": round(sum(timings.values()), 3),
            "unit": "sec",
            "queries": timings,
            "queries_warm": warm,
            "total_warm_sec": round(sum(warm.values()), 3),
            "r1_subset_warm_sec": round(
                sum(v for k, v in warm.items() if k in R1_QUERIES), 3
            ),
            "n_queries": len(timings),
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        }
        if partial:
            doc["partial"] = True
        return json.dumps(doc)

    def _compact_line(partial: bool) -> str:
        """A <=1800-char JSON line that survives a tail-window capture:
        headline totals plus as many per-query warm timings as fit,
        slowest first. The FULL per-query detail is the preceding
        stdout line and bench_full.json — this line exists because a
        capture that keeps only the last ~2000 chars of stdout would
        otherwise see a head-truncated (unparseable) full line."""
        doc = {
            "metric": "total_query_wall_sec",
            "value": round(sum(timings.values()), 3),
            "unit": "sec",
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "n_queries": len(timings),
            "total_warm_sec": round(sum(warm.values()), 3),
            "r1_subset_warm_sec": round(
                sum(v for k, v in warm.items() if k in R1_QUERIES), 3
            ),
            "full_detail": "bench_full.json",
            "queries": {},
        }
        if partial:
            doc["partial"] = True
        budget = 1800
        base = len(json.dumps(doc))
        shown: dict[str, float] = {}
        for k, v in sorted(warm.items(), key=lambda kv: -kv[1]):
            entry = len(json.dumps({k: v})) + 1
            if base + entry > budget:
                break
            shown[k] = v
            base += entry
        doc["queries"] = shown
        doc["n_queries_shown"] = len(shown)
        return json.dumps(doc)

    def _dump(partial: bool) -> None:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_full.json"),
            "w",
        ) as f:
            f.write(_line(partial) + "\n")

    for i, (name, fn) in enumerate(queries.items()):
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
        # second run: plan/codegen compiled — the steady-state number a
        # long-lived cluster sees
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        warm[name] = round(time.perf_counter() - t0, 3)
        if (i + 1) % 25 == 0:
            # timeout insurance: a killed run still leaves a valid
            # (explicitly partial, tail-window-sized) JSON line as its
            # last stdout line, and the full detail on disk
            _dump(partial=True)
            print(_line(partial=True), flush=True)
            print(_compact_line(partial=True), flush=True)

    _dump(partial=False)
    print(_line(partial=False), flush=True)
    print(_compact_line(partial=False), flush=True)


if __name__ == "__main__":
    main()
