"""Johnson-Lindenstrauss random projection for embedding columns.

The 100 TB problem: shrink a wide embedding column (cost of every
downstream shuffle, index, and ANN probe scales with dimension) while
approximately preserving pairwise distances. The JL lemma guarantees
that a random +-1 projection (Achlioptas 2001 — database-friendly: no
Gaussians, just signs) to k = O(log n / eps^2) dims distorts any
pairwise distance by at most (1 +- eps) with high probability.

Engine design: the sign matrix is DERIVED, not stored — entry (j, i)
is the parity of md5("jl{j}~{i}"), so any engine (and the ANSI-SQL
oracle) regenerates the identical matrix from the two integers alone;
a checkpoint or a second cluster can re-project new rows with nothing
to ship. Components are fixed-point-quantized once (round(x * scale),
the same rung-1 idiom as embedding_covariance), after which every
projected coordinate is an exact int64 dot product — bit-identical
under any partitioning, hashable cross-engine.

Scale shape: MAP-ONLY. No shuffle, no join, no driver state — each row
folds its own array against k literal sign vectors inside codegen
(zip_with + aggregate). The d x k sign literals live in the plan, not
in data.

Reference scope: no projection ops in the etl-spark reference; §7
LLM-pipeline extension feeding the ANN/semantic-dedup family
(operators/similarity.py).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def jl_signs(dim: int, out_dim: int) -> list[list[int]]:
    """The +-1 sign matrix, row j = the j-th output coordinate's
    signs: +1 where md5("jl{j}~{i}") has even low byte, else -1.
    Deterministic across processes, engines, and versions (md5 of a
    fixed ASCII string)."""
    return [
        [
            1
            if hashlib.md5(f"jl{j}~{i}".encode()).digest()[-1] % 2 == 0
            else -1
            for i in range(dim)
        ]
        for j in range(out_dim)
    ]


def jl_project(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    out_dim: int,
    dim: int | None = None,
    scale: int = 10**6,
) -> DataFrame:
    """Project ``vec_col`` (array<float|double>) to ``out_dim`` exact
    int64 coordinates p0..p{k-1} (fixed-point: divide by ``scale`` for
    raw units; distances scale by scale^2). ``dim`` defaults to the
    array length of the first row (one-row driver fetch, same idiom as
    the IVF index builders).

    Rows whose vector length differs from ``dim`` FAIL LOUDLY
    (raise_error) rather than silently yielding NULL coordinates —
    zip_with pads short arrays with NULL and NULL poisons the integer
    fold, a corruption that would otherwise surface only as quietly
    wrong distances downstream. A NULL vector gets its own distinct
    error message (size(NULL) is NULL, so it would otherwise fall into
    the length-mismatch branch and misdiagnose the cause). The SQL
    mirror errors identically in both cases."""
    if out_dim <= 0:
        raise ValueError(f"out_dim must be positive, got {out_dim}")
    if dim is None:
        dim = emb.select(F.size(vec_col).alias("d")).first()["d"]
    # NOT fanned out (round-13): round-12 added a fan_out here on a
    # 0.88x same-session A/B, but the driver's cold protocol measured
    # emb_jl_projection at 0.71 (2.38 s -> 3.37 s) — the integer folds
    # are too light per row to buy back the raw-vector exchange
    # (VERDICT r12 task 2).
    signs = jl_signs(dim, out_dim)
    q = emb.select(
        F.col(id_col),
        F.when(
            F.col(vec_col).isNull(),
            F.raise_error(
                F.concat(
                    F.lit(f"jl_project: NULL vector at {id_col}="),
                    F.col(id_col).cast("string"),
                )
            ),
        )
        .when(
            F.size(F.col(vec_col)) == F.lit(int(dim)),
            F.transform(
                F.col(vec_col),
                lambda x: F.round(x.cast("double") * F.lit(scale)).cast(
                    "long"
                ),
            ),
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"jl_project: vector length != dim={int(dim)} at "
                        f"{id_col}="
                    ),
                    F.col(id_col).cast("string"),
                )
            )
        )
        .alias("__q"),
    )
    cols = [
        F.aggregate(
            F.zip_with(
                F.col("__q"),
                F.array(*[F.lit(s).cast("long") for s in signs[j]]),
                lambda qv, s: qv * s,
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias(f"p{j}")
        for j in range(out_dim)
    ]
    return q.select(id_col, *cols)


def jl_project_sql(
    table: str,
    id_col: str,
    vec_col: str,
    out_dim: int,
    dim: int,
    scale: int = 10**6,
) -> str:
    """DuckDB mirror of :func:`jl_project`: the same sign literals
    (regenerated by jl_signs), the same quantize-then-integer-sum
    arithmetic, and the same loud failures — a distinct message for a
    NULL vector, another for a wrong-length one (error(); DuckDB
    list_sum would otherwise skip the NULLs and return a partial sum
    where Spark returns NULL — a silent divergence). list_sum over
    BIGINTs can widen to HUGEINT — cast back so pandas renders
    integers, not floats."""
    signs = jl_signs(dim, out_dim)
    q = (
        f"CASE WHEN {vec_col} IS NULL THEN "
        f"error('jl_project: NULL vector at ' "
        f"|| CAST({id_col} AS VARCHAR)) "
        f"WHEN len({vec_col}) = {dim} THEN "
        f"list_transform({vec_col}, x -> "
        f"CAST(round(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) "
        f"ELSE error('jl_project: vector length != dim={dim} at ' "
        f"|| CAST({id_col} AS VARCHAR)) END"
    )
    cols = ",\n       ".join(
        "CAST(list_sum(list_transform(range(1, {d} + 1), "
        "i -> q[i] * ([{s}]::BIGINT[])[i])) AS BIGINT) AS p{j}".format(
            d=dim, s=",".join(str(v) for v in signs[j]), j=j
        )
        for j in range(out_dim)
    )
    return f"""
WITH q AS (
  SELECT {id_col}, {q} AS q FROM {table}
)
SELECT {id_col},
       {cols}
FROM q
"""
