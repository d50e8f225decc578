"""General relational capability demos over the TPC-H-ish testdata
tables — evidence that the engine harness (Catalyst plans + DuckDB
oracle parity discipline) extends beyond the fulltext core.

Float determinism trick: aggregate DOUBLE measures as DECIMAL(18,4)
(exact, order-independent addition in both engines), cast the final
result back to DOUBLE — bit-identical without any fold ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import round_sql

_DSUM = "CAST(sum(CAST({x} AS DECIMAL(18,4))) AS DOUBLE)"


def tpch_q1_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-summary style aggregate over lineitem (TPC-H Q1 shape,
    no date filter param)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(_DSUM.format(x="l_quantity")).alias("sum_qty"),
            F.expr(_DSUM.format(x="l_extendedprice")).alias("sum_base_price"),
            F.expr(
                _DSUM.format(x="l_extendedprice * (1 - l_discount)")
            ).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .withColumn("avg_qty", F.expr(round_sql("sum_qty / count_order", 6)))
    )


def tpch_q1_like_sql(table: str = "lineitem") -> str:
    return f"""
SELECT l_returnflag, l_linestatus,
       {_DSUM.format(x="l_quantity")} AS sum_qty,
       {_DSUM.format(x="l_extendedprice")} AS sum_base_price,
       {_DSUM.format(x="l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
       count(*)::BIGINT AS count_order,
       {round_sql(_DSUM.format(x="l_quantity") + " / count(*)", 6)} AS avg_qty
FROM {table}
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join: lineitem ⋈ orders ⋈ customer ⋈ nation → revenue per
    nation (broadcast dims, shuffle fact join)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.expr(_DSUM.format(x="l_extendedprice * (1 - l_discount)")).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def revenue_by_nation_sql(sf_prefix: str = "") -> str:
    return f"""
SELECT n_name,
       {_DSUM.format(x="l_extendedprice * (1 - l_discount)")} AS revenue,
       count(*)::BIGINT AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


def brand_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14/Q2-flavored: revenue + avg supplier balance per part brand —
    exercises the part and supplier dims (broadcast) against the
    lineitem fact, with a selective pushed-down filter on p_size."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet").filter(F.col("p_size") <= 25)
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("p_brand")
        .agg(
            F.expr(_DSUM.format(x="l_extendedprice * (1 - l_discount)")).alias("revenue"),
            F.expr(_DSUM.format(x="s_acctbal")).alias("sum_acctbal"),
            F.count("*").alias("n_items"),
        )
        .withColumn("avg_acctbal", F.expr(round_sql("sum_acctbal / n_items", 6)))
        .select("p_brand", "revenue", "n_items", "avg_acctbal")
    )


def brand_supplier_revenue_sql() -> str:
    return f"""
SELECT p_brand,
       {_DSUM.format(x="l_extendedprice * (1 - l_discount)")} AS revenue,
       count(*)::BIGINT AS n_items,
       {round_sql(_DSUM.format(x="s_acctbal") + " / count(*)", 6)} AS avg_acctbal
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE p_size <= 25
GROUP BY p_brand ORDER BY p_brand
"""


def events_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling daily window over the events table (batch form of the
    streaming windowed count): (day, event_type, n, sum_value)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            F.date_format(F.col("ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.expr(_DSUM.format(x="value")).alias("sum_value"),
        )
    )


def events_daily_counts_sql(table: str = "events") -> str:
    return f"""
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       count(*)::BIGINT AS n,
       {_DSUM.format(x="value")} AS sum_value
FROM {table}
GROUP BY 1, 2 ORDER BY 1, 2
"""
