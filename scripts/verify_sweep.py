"""Inline verify sweep per .claude/skills/verify: bare session, sf0.01,
full queries() vs oracle_sql() differential. Exit 1 on any mismatch."""
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

spark = SparkSession.builder.master("local[8]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e  # noqa: E402
from oracle_utils import assert_oracle_match  # noqa: E402

rows = len(e.entry(spark).collect())
print("entry rows:", rows, flush=True)
assert rows >= 0

SF = "/root/testdata/sf0.01"
qs = e.queries()
os_ = e.oracle_sql()
only = set(sys.argv[1:])
fail = []
t0 = time.time()
for i, (name, fn) in enumerate(sorted(qs.items())):
    if only and name not in only:
        continue
    sql = os_.get(name)
    if sql is None:
        try:
            n = fn(spark, SF).count()
            print(f"[{i}] {name}: rows-only {n}", flush=True)
        except Exception as ex:
            fail.append((name, str(ex)[:200]))
            print(f"[{i}] {name}: ERR {ex}", flush=True)
        continue
    try:
        assert_oracle_match(spark, SF, fn, sql)
        print(f"[{i}] {name}: OK", flush=True)
    except Exception as ex:
        fail.append((name, str(ex)[:300]))
        print(f"[{i}] {name}: FAIL {str(ex)[:300]}", flush=True)
print(f"swept {len(qs) if not only else len(only)} in {time.time()-t0:.0f}s; failures: {len(fail)}")
for n, m in fail:
    print("FAIL", n, m)
sys.exit(1 if fail else 0)
