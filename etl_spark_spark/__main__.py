"""Command-line runner — the engine's analog of the reference's
``__main__`` job driver (reference etl_job.py:117-130, which parses a
date window and dispatches the pipeline). Here the dispatch surface is
the full registered query catalog:

    python -m etl_spark_spark list
    python -m etl_spark_spark run <query> [--sf-dir DIR] [--limit N]
    python -m etl_spark_spark explain <query> [--sf-dir DIR]
    python -m etl_spark_spark oracle <query>

``run`` prints the result (first ``--limit`` rows, default 20);
``explain`` prints the formatted physical plan (the thing to read
before running anything at 100 TB); ``oracle`` prints the query's
ANSI-SQL twin. The query registry lives in ``__spark_entry__.py`` at
the repo root — the same contract the correctness driver consumes.
"""

from __future__ import annotations

import argparse
import os
import sys


def _entry():
    sys.path.insert(0, os.getcwd())
    try:
        import __spark_entry__ as entrymod
    except ImportError:
        sys.exit(
            "cannot import __spark_entry__.py — run from the repo root "
            "(the query registry lives there)"
        )
    return entrymod


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="etl_spark_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered queries")
    for c in ("run", "explain", "oracle"):
        sp = sub.add_parser(c)
        sp.add_argument("query")
        if c != "oracle":
            sp.add_argument(
                "--sf-dir",
                default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
            )
        if c == "run":
            sp.add_argument("--limit", type=int, default=20)
    args = p.parse_args(argv)

    entrymod = _entry()
    queries = entrymod.queries()

    if args.cmd == "list":
        oracles = entrymod.oracle_sql()
        for name in sorted(queries):
            mark = "oracle" if name in oracles else "rows-only"
            print(f"{name:32s} [{mark}]")
        return 0

    if args.query not in queries:
        sys.exit(f"unknown query {args.query!r} — see `list`")

    if args.cmd == "oracle":
        sql = entrymod.oracle_sql().get(args.query)
        if sql is None:
            sys.exit(f"{args.query} has no SQL oracle")
        print(sql.strip())
        return 0

    from .session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    df = queries[args.query](spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=False)
        print(f"({df.count()} rows total)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
