"""Benchmark harness: runs every headline query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full execution, no
write cost, nothing collected to the driver). One warmup of the smallest
query amortizes JVM/codegen startup out of the numbers.

Noise protocol (round 6): single warm runs on this box jitter up to
±30% (occasionally 3x) per query, which round-over-round reads as fake
regressions. ``--median3`` runs each query cold + THREE warm passes and
reports the per-query MEDIAN warm time; ``--top20`` restricts the run
to the 20 most expensive queries by the previous full run's warm cost
(bench_full.json), so the stable protocol stays cheap enough to run
every round. The no-flag default is byte-compatible with what the
round driver expects.

Drift canaries (round 11): cross-ROUND comparisons also suffer HOST
drift (round 10 read 1.23x slower uniformly — a box state change, not
a regression — and proving that burned a judge session). ``--median3``
therefore ends by re-running three fixed canary queries each in a
FRESH subprocess + fresh SparkSession (cold JVM, no 217-query session
state) and records their median warm times under ``canary_solo`` in
bench_median3.json. To compare rounds, divide each round's totals by
its canary ratio first: canaries are frozen queries whose plans are
pinned byte-stable, so any canary movement IS host drift.
``--solo-canary NAME`` is the internal child-process mode.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
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
# the drift canaries: frozen queries with byte-stable pinned plans,
# spanning the three engine regimes (codegen join-agg / Arrow pandas
# blocks / sketch array folds) — movement here is host drift by
# construction, so round-over-round totals are compared canary-ratio-
# normalized (BASELINE.md "Round-11 drift canaries")
CANARY_QUERIES = ("superdesconto", "semantic_dedup", "hll_source_overlap")

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
    ap = argparse.ArgumentParser(description="engine benchmark")
    ap.add_argument(
        "--median3",
        action="store_true",
        help="3 warm passes per query, report the median (noise protocol)",
    )
    ap.add_argument(
        "--top20",
        action="store_true",
        help="only the 20 most expensive queries by the last full run's "
        "warm cost (bench_full.json)",
    )
    ap.add_argument(
        "--solo-canary",
        metavar="NAME",
        help="internal: run ONE query (cold + 3 warm) in this fresh "
        "process and print a one-line JSON {name, cold, warm_median}",
    )
    args = ap.parse_args()
    n_warm_runs = 3 if args.median3 else 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="etl-spark-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    if args.solo_canary:
        fn = entrymod.queries()[args.solo_canary]
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        cold = round(time.perf_counter() - t0, 3)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            runs.append(round(time.perf_counter() - t0, 3))
        print(
            json.dumps(
                {
                    "name": args.solo_canary,
                    "cold": cold,
                    "warm_median": round(statistics.median(runs), 3),
                    "warm_runs": runs,
                }
            ),
            flush=True,
        )
        return

    queries = entrymod.queries()
    if args.top20:
        full = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bench_full.json"
        )
        if not os.path.exists(full):
            raise SystemExit(
                "--top20 needs a prior full-registry run: "
                f"{full} is missing — run `python bench.py` (no flags) "
                "once to record the full warm baseline first"
            )
        with open(full) as f:
            prev_warm = json.load(f)["queries_warm"]
        picked = sorted(queries, key=lambda n: -prev_warm.get(n, 0.0))[:20]
        queries = {n: queries[n] for n in picked}
    # warmup: JVM + codegen + parquet footer caches
    _force(entrymod.queries()["normalize_keys"](spark, sf_dir))

    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    canary_solo: dict[str, dict] = {}

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
        if canary_solo:
            doc["canary_solo"] = canary_solo
        if args.median3 or args.top20:
            doc["protocol"] = {
                "median3": args.median3,
                "top20": args.top20,
                "warm_runs": warm_runs,
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
            "full_detail": (
                "bench_median3.json"
                if (args.median3 or args.top20)
                else "bench_full.json"
            ),
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
        # protocol runs must not clobber bench_full.json — it is the
        # full-registry warm baseline that --top20 selection and
        # scripts/audit_replica_registry.py read
        out = (
            "bench_median3.json"
            if (args.median3 or args.top20)
            else "bench_full.json"
        )
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), out),
            "w",
        ) as f:
            f.write(_line(partial) + "\n")

    warm_runs: dict[str, list[float]] = {}
    for i, (name, fn) in enumerate(queries.items()):
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
        # warm run(s): plan/codegen compiled — the steady-state number a
        # long-lived cluster sees; --median3 takes the median of three
        runs = []
        for _ in range(n_warm_runs):
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            runs.append(round(time.perf_counter() - t0, 3))
        warm_runs[name] = runs
        warm[name] = round(statistics.median(runs), 3)
        if (i + 1) % 25 == 0:
            # timeout insurance: a killed run still leaves a valid
            # (explicitly partial, tail-window-sized) JSON line as its
            # last stdout line, and the full detail on disk
            _dump(partial=True)
            print(_line(partial=True), flush=True)
            print(_compact_line(partial=True), flush=True)

    if args.median3:
        # drift canaries: each in a FRESH process/JVM so the number is
        # free of in-session state (GC/JIT/codegen-cache drift) — the
        # cross-round normalizer (module docstring)
        import subprocess

        for name in CANARY_QUERIES:
            try:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--solo-canary", name],
                    capture_output=True,
                    text=True,
                    timeout=600,
                    env=os.environ,
                )
                line = out.stdout.strip().splitlines()[-1]
                canary_solo[name] = json.loads(line)
            except Exception as ex:  # canary failure must not kill bench
                canary_solo[name] = {"error": str(ex)[:200]}

    _dump(partial=False)
    print(_line(partial=False), flush=True)
    print(_compact_line(partial=False), flush=True)


if __name__ == "__main__":
    main()
