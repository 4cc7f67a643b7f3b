"""Regenerate the plan-audit data behind PLANS.md.

Usage: python scripts/audit_plans.py [query ...]
Prints per-query operator counts, PushedFilters and ReadSchema widths at
$SPARK_GRAFT_SF_DIR (default sf0.1). Run after any plan-affecting change
and update PLANS.md if the shape moved.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from etl_spark_spark.plans import explain_str  # noqa: E402
from etl_spark_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "superdesconto",
    "allocation",
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "neardup_minhash",
    "doc_simhash",
    "emb_cosine_topk",
    "events_tumbling",
    "monthly_orders_1995",
    # round-2 additions
    "order_priority_counts",
    "min_cost_supplier",
    "revenue_cube",
    "priority_return_pivot",
    "corr_exact",
    "emb_near_dup_lsh",
    "doc_curation",
    "user_value_trend",
    "doc_stratified_sample",
    "doc_source_cap",
    "vocab_topk",
    "doc_decontaminate",
    "doc_split_counts",
    "doc_pack",
    "doc_top_terms",
    "customer_spend_deciles",
    "neardup_clusters",
    "doc_training_prep",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or DEFAULT
    spark = get_spark(app_name="audit-plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    for name in names:
        plan = explain_str(queries[name](spark, sf_dir))
        ops = Counter(re.findall(r"\(\d+\) ([A-Za-z]+)", plan))
        pushed = [
            p for p in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if p.strip()
        ]
        widths = [
            len(s.split(",")) for s in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        ]
        print(f"### {name}")
        print("ops:", dict(ops))
        print("pushed:", pushed)
        print("read_cols:", widths)
        print()


if __name__ == "__main__":
    main()
