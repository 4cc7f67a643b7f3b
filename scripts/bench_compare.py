"""Canary-normalized bench comparison — the round-11 adjudication
protocol as ONE command (VERDICT r11 task 6).

Usage: python scripts/bench_compare.py OLD.json NEW.json [--top N]

Accepts any mix of the repo's bench artifacts:
  - driver rounds (BENCH_r*.json: {"parsed": {...}} wrapping the
    compact line, per-query map = slowest-55 warm walls),
  - builder runs (bench_full.json / bench_median3.json: the full line,
    queries_warm per-query map, canary_solo when --median3 ran).

Why normalization: round 10 burned a judge session proving a uniform
1.23x total "regression" was host drift (byte-stable plans, solo
spot-checks). Since round 11 three frozen DRIFT CANARIES (superdesconto,
semantic_dedup, hll_source_overlap — queries whose code and plans never
change) are re-measured each round; the median new/old canary ratio IS
the host-drift factor, so:

  normalized_total_ratio = (new_total / canary_ratio) / old_total
  per-query normalized ratio = (new_q / old_q) / canary_ratio

and only per-query outliers ABOVE the normalized line are real
regressions worth a plan diff. Fresh-subprocess canary_solo medians are
used when both files carry them (immune to in-process warm-state
drift); otherwise the canaries' in-run warm walls.

Prints a human table plus one machine-readable JSON line.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys

CANARIES = ("superdesconto", "semantic_dedup", "hll_source_overlap")


def load(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    if "parsed" in doc and isinstance(doc["parsed"], dict):
        doc = doc["parsed"]  # driver BENCH_r*.json wrapper
    qmap = doc.get("queries_warm") or doc.get("queries") or {}
    return {
        "total_warm": doc.get("total_warm_sec"),
        "r1_subset": doc.get("r1_subset_warm_sec"),
        "n_queries": doc.get("n_queries"),
        "queries": dict(qmap),
        "canary_solo": {
            k: v.get("warm_median")
            for k, v in (doc.get("canary_solo") or {}).items()
            if isinstance(v, dict) and v.get("warm_median")
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=10)
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)

    solo = bool(old["canary_solo"]) and bool(new["canary_solo"])
    src_old = old["canary_solo"] if solo else old["queries"]
    src_new = new["canary_solo"] if solo else new["queries"]
    ratios = {
        c: src_new[c] / src_old[c]
        for c in CANARIES
        if src_old.get(c) and src_new.get(c)
    }
    if not ratios:
        sys.exit(
            "no shared canary measurements between the two files — "
            "cannot normalize (need at least one of "
            f"{CANARIES} in both)"
        )
    canary_ratio = statistics.median(ratios.values())
    print(f"canary source: {'solo (fresh-subprocess medians)' if solo else 'in-run warm walls'}")
    for c, r in sorted(ratios.items()):
        print(f"  {c}: {src_old[c]:.3f}s -> {src_new[c]:.3f}s  ({r:.3f}x)")
    print(f"canary ratio (median, = host-drift factor): {canary_ratio:.3f}x")

    for label, key in (("total_warm", "total_warm"), ("r1_subset", "r1_subset")):
        a, b = old.get(key), new.get(key)
        if a and b:
            print(
                f"{label}: {a:.1f}s -> {b:.1f}s  raw {b / a:.3f}x, "
                f"normalized {(b / canary_ratio) / a:.3f}x"
            )

    shared = sorted(set(old["queries"]) & set(new["queries"]))
    per = {
        q: (new["queries"][q] / old["queries"][q]) / canary_ratio
        for q in shared
        if old["queries"][q]
    }
    worst = sorted(per.items(), key=lambda kv: -kv[1])[: args.top]
    print(
        f"\ntop {len(worst)} normalized per-query ratios over the "
        f"{len(per)} shared queries (>=1.3x after normalization is a "
        "real-regression candidate — diff its plan):"
    )
    for q, r in worst:
        flag = "  <-- investigate" if r >= 1.3 else ""
        print(
            f"  {q}: {old['queries'][q]:.2f}s -> {new['queries'][q]:.2f}s"
            f"  norm {r:.3f}x{flag}"
        )
    doc = {
        "canary_ratio": round(canary_ratio, 4),
        "canary_ratios": {k: round(v, 4) for k, v in ratios.items()},
        "canary_source": "solo" if solo else "warm",
        "normalized_total_ratio": (
            round((new["total_warm"] / canary_ratio) / old["total_warm"], 4)
            if old.get("total_warm") and new.get("total_warm")
            else None
        ),
        "n_shared_queries": len(per),
        "n_normalized_regressions_1p3": sum(1 for r in per.values() if r >= 1.3),
        "worst": [
            {"query": q, "normalized_ratio": round(r, 4)} for q, r in worst[:5]
        ],
    }
    print("\n" + json.dumps(doc))


if __name__ == "__main__":
    main()
