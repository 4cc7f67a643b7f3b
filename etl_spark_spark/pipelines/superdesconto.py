"""Flagship composite: the reference's superdesconto shape over fixtures.

Reference pipeline (utils_superdesconto.py:88-99 + etl_job.py:28-56):
two POS feeds → canonical rename → positional union → ranking window
keeps the best-discounted sale per barcode label → joins product and
authorization dimensions → aliased projection.

Fixture mapping (FIXTURES.md §B): `lineitem` split on `l_linestatus`
plays the two feeds; `etiqueta` is the zero-padded part key; `part` and
`supplier` play the dimensions.

Scale shape: one shuffle (window partition on etiqueta) + two broadcast
hash joins of bounded dimensions — the fact table is never shuffled for
the joins. Ordering includes a unique tiebreaker so results are
deterministic under any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.normalize import etiqueta
from ..operators.joins import broadcast_join
from ..operators.setops import union_strict
from ..operators.windows import top_one_per_group_agg
from ..sources import read_date_range, table

import datetime as dt  # noqa: F401  (used in the signature annotation)

CANONICAL = [
    "filial",
    "cod_prod",
    "periodo",
    "etiqueta",
    "perc_dsc_cupom",
    "venda",
    "venda_desconto",
    "src_ordem",
    "src_linha",
]


def _feed(lineitem: DataFrame, status: str) -> DataFrame:
    """One POS feed: filter + canonical projection/rename (P1/P4/P8)."""
    return lineitem.filter(F.col("l_linestatus") == status).select(
        F.col("l_suppkey").alias("filial"),
        F.col("l_partkey").alias("cod_prod"),
        F.col("l_shipdate").cast("date").cast("string").alias("periodo"),
        etiqueta("l_partkey").alias("etiqueta"),
        F.col("l_discount").alias("perc_dsc_cupom"),
        F.col("l_extendedprice").alias("venda"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "venda_desconto"
        ),
        F.col("l_orderkey").alias("src_ordem"),
        F.col("l_linenumber").alias("src_linha"),
    )


def best_sale_transform(
    lineitem: DataFrame, part: DataFrame, supplier: DataFrame
) -> DataFrame:
    """The superdesconto TRANSFORM over an already-scanned feed — the
    piece the reference re-runs every day on that day's files
    (utils_superdesconto.py:88-99): two-feed split + canonical rename
    + union, best-discounted sale per label, dimension joins. Factored
    out of :func:`best_sale_pipeline` so the production daily loop
    (incremental stats-index-pruned read → transform → versioned
    MERGE) can feed it a pruned scan instead of a full table read."""
    cupom = union_strict(_feed(lineitem, "O"), _feed(lineitem, "F"))
    # top-1 per label as a max_by hash aggregate: map-side partial agg means
    # only ~one row per key per mapper is shuffled, vs a ranking window
    # shuffling+sorting the whole fact (same result; see top_k_per_group).
    best = top_one_per_group_agg(
        cupom,
        keys=["etiqueta"],
        order_struct=F.struct(
            F.col("venda_desconto"),
            (-F.col("src_ordem")).alias("nord"),
            (-F.col("src_linha")).alias("nlin"),
        ),
    )
    joined = broadcast_join(best, part, F.col("cod_prod") == F.col("p_partkey"))
    joined = broadcast_join(joined, supplier, F.col("filial") == F.col("s_suppkey"))
    return joined.select(
        "etiqueta",
        "filial",
        "cod_prod",
        "periodo",
        "venda",
        "venda_desconto",
        "perc_dsc_cupom",
        F.col("p_name").alias("produto_nome"),
        F.col("p_brand").alias("produto_marca"),
        F.col("p_retailprice").alias("preco_tabela"),
        F.col("s_name").alias("fornecedor_nome"),
    )


def best_sale_pipeline(
    spark: SparkSession,
    sf_dir: str,
    start: "dt.date | None" = None,
    end: "dt.date | None" = None,
) -> DataFrame:
    """Optionally windowed to [start, end] on the sale date BEFORE the
    ranking — the reference's incremental runs enumerate only the
    window's daily files (utils_superdesconto.py:62-66), so 'best sale
    per label' means best WITHIN the window; the range predicate here
    pushes down to the scan the same way."""
    lineitem = table(spark, sf_dir, "lineitem")
    if start is not None and end is not None:
        lineitem = read_date_range(lineitem, "l_shipdate", start, end)
    part = table(
        spark, sf_dir, "part", columns=["p_partkey", "p_name", "p_brand", "p_retailprice"]
    )
    supplier = table(spark, sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    return best_sale_transform(lineitem, part, supplier)
