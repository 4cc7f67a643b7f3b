"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship composite (the reference's
superdesconto shape: union -> window top-1 -> broadcast joins) at
sf0.001. ``queries()`` exposes one named query per implemented operator
family from SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-equivalent
ANSI SQL for each. Column names/aliases match pairwise; money sums use
integer-cents fixed-point (etl_spark_spark.functions.money) so values
are bit-identical regardless of execution order/parallelism.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark_spark.functions.money import money_sum, money_sum_sql
from etl_spark_spark.functions.normalize import (
    _ACCENTS_DST,
    _ACCENTS_SRC,
    cnpj_normalize,
    etiqueta,
    strip_normalize,
    upper_trim,
)
from etl_spark_spark.operators.dedup import dedup_latest
from etl_spark_spark.operators.windows import top_k_per_group
from etl_spark_spark.pipelines.ressarcimento import allocation_pipeline
from etl_spark_spark.pipelines.superdesconto import best_sale_pipeline
from etl_spark_spark.sources import read_events, table, year_range_filter

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return best_sale_pipeline(spark, SF_SMOKE)


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: grouped sums/averages with computed measures
    (SURVEY.md A1-A4; reference utils_ressarcimento.py:114-126)."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity").alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(charge).alias("sum_charge"),
            (money_sum("l_quantity") / F.count("*")).alias("avg_qty"),
            (money_sum("l_extendedprice") / F.count("*")).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


def q_dedup_latest_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keep-latest dedup (fixes SURVEY.md §4 hazard 1;
    reference's intent at utils_ressarcimento.py:54-55,145-146)."""
    li = table(spark, sf_dir, "lineitem")
    latest = dedup_latest(
        li,
        keys=["l_partkey"],
        order_by=[
            F.col("l_shipdate").desc(),
            F.col("l_orderkey").desc(),
            F.col("l_linenumber").desc(),
        ],
    )
    return latest.select(
        "l_partkey",
        F.col("l_shipdate").cast("date").cast("string").alias("last_ship_date"),
        F.col("l_orderkey").alias("last_orderkey"),
        F.col("l_extendedprice").alias("last_price"),
    )


def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-k per group (W1 generalized to k=3)."""
    orders = table(spark, sf_dir, "orders")
    return top_k_per_group(
        orders,
        partition_by=["o_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
        rank_col="rank_in_cust",
        keep_rank=True,
    ).select("o_custkey", "o_orderkey", "o_totalprice", "rank_in_cust")


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (J6; reference utils_ressarcimento.py:260,266):
    customers with no orders in 1995 (scoped to a year so the result is
    non-trivially non-empty at every sf)."""
    customer = table(spark, sf_dir, "customer")
    orders = year_range_filter(
        table(spark, sf_dir, "orders", columns=["o_custkey", "o_orderdate"]),
        "o_orderdate",
        1995,
    )
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


def q_orders_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join + coalesce null-default + IN-list and NOT NULL filters
    (J5, F5, P11, P12)."""
    orders = table(spark, sf_dir, "orders")
    customer = table(
        spark, sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment"]
    )
    return (
        orders.filter(F.col("o_orderstatus").isin("O", "F"))
        .filter(F.col("o_orderpriority").isNotNull())
        .join(customer, F.col("o_custkey") == F.col("c_custkey"), "left")
        .select(
            "o_orderkey",
            "o_custkey",
            F.coalesce(F.col("c_name"), F.lit("UNKNOWN")).alias("cust_name"),
            F.coalesce(F.col("c_mktsegment"), F.lit("NONE")).alias("segment"),
            "o_totalprice",
        )
    )


def q_normalize_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expression-builder normalization library (F1-F4), never UDFs."""
    part = table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        etiqueta("p_partkey").alias("etiqueta"),
        strip_normalize("p_name").alias("nome_norm"),
        cnpj_normalize("p_type").alias("tipo_norm"),
        upper_trim("p_brand").alias("marca_norm"),
    )


def q_monthly_orders_1995(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year filter rewritten as a pushdown-friendly range predicate
    (SURVEY.md §4) + date_trunc month rollup (F10/F11, A1)."""
    orders = table(spark, sf_dir, "orders")
    return (
        year_range_filter(orders, "o_orderdate", 1995)
        .groupBy(
            F.date_trunc("month", F.col("o_orderdate"))
            .cast("date")
            .cast("string")
            .alias("mes")
        )
        .agg(
            money_sum("o_totalprice").alias("total_mes"),
            F.count("*").alias("num_pedidos"),
        )
    )


def q_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON props extraction + IN-list filter + grouped sums over the
    incremental-feed analog (extension surface, SURVEY.md §7)."""
    events = read_events(spark, sf_dir, with_ts=False)
    return (
        events.filter(F.col("event_type").isin("click", "view", "purchase"))
        .filter(F.col("props").isNotNull())
        .withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            money_sum("value").alias("sum_value"),
        )
    )


def q_superdesconto(spark: SparkSession, sf_dir: str) -> DataFrame:
    return best_sale_pipeline(spark, sf_dir)


def q_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return allocation_pipeline(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "superdesconto": q_superdesconto,
        "allocation": q_allocation,
        "pricing_summary": q_pricing_summary,
        "dedup_latest_part": q_dedup_latest_part,
        "top_orders_per_customer": q_top_orders_per_customer,
        "customers_without_orders": q_customers_without_orders,
        "orders_enriched": q_orders_enriched,
        "normalize_keys": q_normalize_keys,
        "monthly_orders_1995": q_monthly_orders_1995,
        "events_by_type": q_events_by_type,
    }


# --------------------------------------------------------------------------
# oracles (DuckDB ANSI SQL)
# --------------------------------------------------------------------------

_FEED_SQL = """
    SELECT l_suppkey AS filial,
           l_partkey AS cod_prod,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS periodo,
           lpad(trim(CAST(l_partkey AS VARCHAR)), 30, '0') AS etiqueta,
           l_discount AS perc_dsc_cupom,
           l_extendedprice AS venda,
           l_extendedprice * (1 - l_discount) AS venda_desconto,
           l_orderkey AS src_ordem,
           l_linenumber AS src_linha
    FROM lineitem WHERE l_linestatus = '{st}'
"""

_SUPERDESCONTO_SQL = f"""
WITH cupom AS ({_FEED_SQL.format(st="O")} UNION ALL {_FEED_SQL.format(st="F")}),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY etiqueta
        ORDER BY venda_desconto DESC, src_ordem, src_linha
    ) AS rn
    FROM cupom
)
SELECT r.etiqueta, r.filial, r.cod_prod, r.periodo, r.venda,
       r.venda_desconto, r.perc_dsc_cupom,
       p.p_name AS produto_nome, p.p_brand AS produto_marca,
       p.p_retailprice AS preco_tabela, s.s_name AS fornecedor_nome
FROM ranked r
JOIN part p ON r.cod_prod = p.p_partkey
JOIN supplier s ON r.filial = s.s_suppkey
WHERE r.rn = 1
"""

_ALLOCATION_SQL = """
WITH losses AS (
    SELECT s_nationkey AS nation_key, l_suppkey AS supp_key,
           sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS perdas_cents
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY 1, 2
),
losses_w AS (
    SELECT *, sum(perdas_cents) OVER (PARTITION BY nation_key) AS grupo_perda_cents
    FROM losses
),
credits AS (
    SELECT nation_key, sum(credito_cents) AS credito_cents FROM (
        SELECT c_nationkey AS nation_key,
               sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS credito_cents
        FROM customer WHERE c_acctbal > 0 GROUP BY 1
        UNION ALL
        SELECT s_nationkey AS nation_key,
               sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS credito_cents
        FROM supplier WHERE s_acctbal > 0 GROUP BY 1
    ) u GROUP BY 1
),
combined AS (
    SELECT l.nation_key, l.supp_key, l.perdas_cents, l.grupo_perda_cents,
           c.credito_cents
    FROM losses_w l JOIN credits c ON l.nation_key = c.nation_key
    UNION ALL
    SELECT l.nation_key, l.supp_key, l.perdas_cents, l.grupo_perda_cents,
           NULL AS credito_cents
    FROM losses_w l
    WHERE NOT EXISTS (SELECT 1 FROM credits c WHERE c.nation_key = l.nation_key)
    UNION ALL
    SELECT c.nation_key, NULL AS supp_key, NULL AS perdas_cents,
           NULL AS grupo_perda_cents, c.credito_cents
    FROM credits c
    WHERE NOT EXISTS (SELECT 1 FROM losses_w l WHERE l.nation_key = c.nation_key)
)
SELECT nation_key, supp_key,
       coalesce(perdas_cents / 100.0, 0.0) AS perdas,
       coalesce(grupo_perda_cents / 100.0, 0.0) AS grupo_perda,
       coalesce(credito_cents / 100.0, 0.0) AS credito,
       coalesce(perdas_cents / nullif(grupo_perda_cents, 0) * (credito_cents / 100.0),
                credito_cents / 100.0, 0.0) AS rateio
FROM combined
"""

_PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {money_sum_sql("l_quantity")} AS sum_qty,
       {money_sum_sql("l_extendedprice")} AS sum_base_price,
       {money_sum_sql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
       {money_sum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
       {money_sum_sql("l_quantity")} / count(*) AS avg_qty,
       {money_sum_sql("l_extendedprice")} / count(*) AS avg_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

_DEDUP_LATEST_SQL = """
SELECT l_partkey,
       CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS last_ship_date,
       l_orderkey AS last_orderkey,
       l_extendedprice AS last_price
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY l_partkey
        ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC
    ) AS rn
    FROM lineitem
) t WHERE rn = 1
"""

_TOP_ORDERS_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rank_in_cust FROM (
    SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
    ) AS rank_in_cust
    FROM orders
) t WHERE rank_in_cust <= 3
"""

_CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
)
"""

_ORDERS_ENRICHED_SQL = """
SELECT o_orderkey, o_custkey,
       coalesce(c_name, 'UNKNOWN') AS cust_name,
       coalesce(c_mktsegment, 'NONE') AS segment,
       o_totalprice
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
WHERE o_orderstatus IN ('O', 'F') AND o_orderpriority IS NOT NULL
"""

_NORMALIZE_KEYS_SQL = f"""
SELECT p_partkey,
       lpad(trim(CAST(p_partkey AS VARCHAR)), 30, '0') AS etiqueta,
       upper(regexp_replace(
           translate(trim(p_name), '{_ACCENTS_SRC}', '{_ACCENTS_DST}'),
           ' +', ' ', 'g')) AS nome_norm,
       lpad(regexp_replace(trim(CAST(p_type AS VARCHAR)),
                           '[^0-9a-zA-Z]', '', 'g'), 15, '0') AS tipo_norm,
       upper(trim(p_brand)) AS marca_norm
FROM part
"""

_MONTHLY_ORDERS_SQL = f"""
SELECT CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS mes,
       {money_sum_sql("o_totalprice")} AS total_mes,
       count(*) AS num_pedidos
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
GROUP BY 1
"""

_EVENTS_BY_TYPE_SQL = f"""
SELECT event_type,
       count(*) AS n_events,
       sum(CAST(props->>'$.k' AS INTEGER)) AS sum_k,
       {money_sum_sql("value")} AS sum_value
FROM events
WHERE event_type IN ('click', 'view', 'purchase') AND props IS NOT NULL
GROUP BY event_type
"""


def oracle_sql() -> dict[str, str]:
    return {
        "superdesconto": _SUPERDESCONTO_SQL,
        "allocation": _ALLOCATION_SQL,
        "pricing_summary": _PRICING_SUMMARY_SQL,
        "dedup_latest_part": _DEDUP_LATEST_SQL,
        "top_orders_per_customer": _TOP_ORDERS_SQL,
        "customers_without_orders": _CUSTOMERS_WITHOUT_ORDERS_SQL,
        "orders_enriched": _ORDERS_ENRICHED_SQL,
        "normalize_keys": _NORMALIZE_KEYS_SQL,
        "monthly_orders_1995": _MONTHLY_ORDERS_SQL,
        "events_by_type": _EVENTS_BY_TYPE_SQL,
    }
