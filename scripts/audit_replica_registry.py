"""Full-registry replica audit: run EVERY registered query against an
Nx consistent-key replica (see make_tpch_replica.py) in one tuned
session, per-query try/except, and report wall time + the ratio vs the
1x warm timings recorded in bench_full.json.

The flagship/pair-generator queries already have dedicated 100x audits
(BASELINE.md); this sweep is the completeness pass — the statement it
buys is "no query anywhere in the registry goes super-linear or breaks
at 10x", including the ~150 queries nobody hand-picked for auditing.

Usage: python scripts/audit_replica_registry.py [replica_dir] [out_json]
           [--top N] [query ...]
Default: the full registry. ``--top N`` selects the N most expensive
queries by 1x warm cost (the round-5 heavy-composite 100x pass);
explicit names select exactly those. Queries run in ascending 1x-warm
order so a late crash loses only the already-audited prefix (results
are flushed after every query).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from etl_spark_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("replica_dir", nargs="?", default="/tmp/replica_rel10x")
    ap.add_argument(
        "out_json", nargs="?", default="/tmp/replica_registry_audit.json"
    )
    ap.add_argument(
        "--top", type=int, default=None, metavar="N",
        help="audit only the N most expensive queries by 1x warm cost",
    )
    ap.add_argument(
        "names", nargs="*", help="explicit query names (exactly these)"
    )
    ns = ap.parse_args()
    if ns.top is not None and ns.top <= 0:
        ap.error(f"--top must be positive, got {ns.top}")
    replica_dir = ns.replica_dir
    out_path = ns.out_json
    with open("bench_full.json") as f:
        warm_1x = json.load(f)["queries_warm"]

    spark = get_spark(app_name="replica-registry-audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    if ns.top is not None:
        picked = sorted(queries, key=lambda n: -warm_1x.get(n, 0.0))
        queries = {n: queries[n] for n in picked[: ns.top]}
    elif ns.names:
        unknown = [n for n in ns.names if n not in queries]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
        queries = {n: queries[n] for n in ns.names}
    order = sorted(queries, key=lambda n: warm_1x.get(n, 0.0))

    results: dict[str, dict] = {}
    for i, name in enumerate(order):
        t0 = time.perf_counter()
        try:
            queries[name](spark, replica_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            sec = round(time.perf_counter() - t0, 2)
            base = warm_1x.get(name)
            results[name] = {
                "sec": sec,
                "sec_1x_warm": base,
                "ratio": round(sec / base, 1) if base else None,
            }
            print(
                f"[{i + 1}/{len(order)}] OK   {name}: {sec}s "
                f"(1x {base}s, ratio {results[name]['ratio']}x)",
                flush=True,
            )
        except Exception:
            sec = round(time.perf_counter() - t0, 2)
            results[name] = {
                "sec": sec,
                "error": traceback.format_exc(limit=3).splitlines()[-1],
            }
            print(f"[{i + 1}/{len(order)}] FAIL {name}: {results[name]['error']}", flush=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)

    ok = [r for r in results.values() if "error" not in r]
    errs = {n: r["error"] for n, r in results.items() if "error" in r}
    print(
        json.dumps(
            {
                "replica_dir": replica_dir,
                "n_queries": len(results),
                "n_ok": len(ok),
                "total_sec": round(sum(r["sec"] for r in results.values()), 1),
                "worst_ratios": dict(
                    sorted(
                        ((n, r["ratio"]) for n, r in results.items() if r.get("ratio")),
                        key=lambda kv: -kv[1],
                    )[:15]
                ),
                "errors": errs,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
