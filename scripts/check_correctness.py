"""Local mirror of the driver's CORRECTNESS gate.

Runs every registered query from ``__spark_entry__.queries()`` next to its
``oracle_sql()`` DuckDB statement at sf0.01 (the driver's scale factor) and
prints one line per query: OK / MISMATCH / ERROR, plus a summary.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry  # noqa: E402
from tests.oracle_utils import assert_oracle_match  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from etl_spark_spark.session import get_spark

    spark = get_spark(app_name="check-correctness")
    queries = entry.queries()
    oracles = entry.oracle_sql()

    bad: list[str] = []
    t_all = time.time()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sql = oracles.get(name)
            if sql is None:
                n = queries[name](spark, sf_dir).count()
                print(f"ROWS-ONLY {name}: {n} rows ({time.time()-t0:.1f}s)")
                continue
            assert_oracle_match(spark, sf_dir, fn, sql)
            print(f"OK        {name} ({time.time()-t0:.1f}s)")
        except AssertionError as e:
            bad.append(name)
            print(f"MISMATCH  {name}: {str(e)[:300]}")
        except Exception:
            bad.append(name)
            print(f"ERROR     {name}:")
            traceback.print_exc(limit=4)
    print(
        f"\n{len(queries) - len(bad)}/{len(queries)} green "
        f"in {time.time()-t_all:.0f}s; failing: {bad}"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
