from .dedup import dedup_any, dedup_latest
from .joins import broadcast_join, join_expr
from .reconcile import allocate_proportional, reconcile_full_outer
from .setops import union_by_name, union_strict
from .windows import partitioned_sum, top_k_per_group, top_one_per_group_agg

__all__ = [
    "dedup_any",
    "dedup_latest",
    "top_k_per_group",
    "top_one_per_group_agg",
    "partitioned_sum",
    "broadcast_join",
    "join_expr",
    "union_strict",
    "union_by_name",
    "reconcile_full_outer",
    "allocate_proportional",
]
