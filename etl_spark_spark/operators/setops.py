"""Set operations (SURVEY.md §2.7).

- ``union_strict`` — positional UNION ALL with a schema-compatibility
  check. The reference's positional unions (utils_superdesconto.py:94-95,
  utils_ressarcimento.py:181) silently depend on a rename contract
  aligning columns (§4 hazard 5); we fail fast if names/arity differ.
- ``union_by_name`` — name-based union with optional null-widening
  (utils_ressarcimento.py:259-267).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_strict(*dfs: DataFrame) -> DataFrame:
    """UNION ALL by position, verifying column names align first."""
    first = dfs[0].columns
    for d in dfs[1:]:
        if d.columns != first:
            raise ValueError(
                f"union_strict: column mismatch {first} vs {d.columns}; "
                "rename to a canonical layout first or use union_by_name"
            )
    return reduce(DataFrame.union, dfs)


def union_by_name(*dfs: DataFrame, allow_missing: bool = True) -> DataFrame:
    """UNION ALL by column name; missing columns become NULL when
    ``allow_missing`` (schema widening)."""
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing), dfs
    )


def intersect_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """INTERSECT ALL (bag semantics). Not used by the reference —
    added for set-op completeness (SURVEY.md §2.7 notes the gap)."""
    return a.intersectAll(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """EXCEPT ALL (bag semantics)."""
    return a.exceptAll(b)
