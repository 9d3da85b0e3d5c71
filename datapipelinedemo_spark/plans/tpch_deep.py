"""Deeper TPC-H-shaped relational coverage (Q7/Q8/Q10/Q14/Q15/Q17).

The testdata schema is a trimmed TPC-H (no partsupp table; lineitem
lacks shipmode/commitdate/receiptdate), so the queries keep each
original's PLAN SHAPE — multi-nation join trees, conditional-share
aggregates, correlated per-group thresholds, having-on-max — with
predicates adapted to the columns that exist. Money sums go through
the fixed-point accumulator (functions.stable) so both engines agree
bit-for-bit; see plans/relational.py for the convention.

Scale notes: dimension tables (nation/region/filtered part/supplier)
broadcast; the only shuffles are fact-side groupBys on their natural
keys. Q17's per-part average is a partial-agg groupBy on l_partkey —
NOT a correlated re-scan — then one broadcast join back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datapipelinedemo_spark.functions.stable import dec_sum
from datapipelinedemo_spark.plans.catalog import register
from datapipelinedemo_spark.plans.relational import _dsum
from datapipelinedemo_spark.tables import table

_REV = "l_extendedprice * (1 - l_discount)"


def _rev_col():
    """Built lazily — Column construction needs a live SparkContext."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# --------------------------------------------------------------------------
# Q7: volume of trade between two nations, by direction and year
# --------------------------------------------------------------------------
@register(
    "q7_nation_trade_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           {_dsum(_REV, 'revenue')}
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                         AND TIMESTAMP '1997-12-31'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    orders = table(spark, sf_dir, "orders")
    supp = table(spark, sf_dir, "supplier")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"),
        F.col("n_name").alias("cust_nation"),
    )
    df = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return df.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("long").alias("l_year"),
    ).agg(dec_sum(_rev_col(), "revenue"))


# --------------------------------------------------------------------------
# Q8: national market share inside a region for one part type
# --------------------------------------------------------------------------
@register(
    "q8_market_share",
    oracle=f"""
    WITH flows AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               n2.n_name AS supp_nation,
               CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 10000.0
                    + 0.5) AS BIGINT) AS v
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                              AND TIMESTAMP '1997-12-31'
    )
    SELECT o_year,
           round((CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN v
                          ELSE 0 END) AS DOUBLE) / 10000.0)
                 / (CAST(SUM(v) AS BIGINT) / 10000.0), 6) AS mkt_share
    FROM flows GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of EUROPE's ECONOMY-part revenue supplied by NATION_3,
    per order year. Numerator and denominator are fixed-point sums, so
    the final division is one deterministic double op."""
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nk"),
        F.col("n_name").alias("supp_nation"),
    )
    v = F.floor(_rev_col() * F.lit(10000.0) + F.lit(0.5)).cast("long")
    flows = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(
            F.broadcast(region), F.col("c_rk") == F.col("r_regionkey")
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            "supp_nation",
            v.alias("v"),
        )
    )
    agg = flows.groupBy("o_year").agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("v")).otherwise(0)).alias("num"),
        F.sum("v").alias("den"),
    )
    return agg.select(
        "o_year",
        F.round(
            (F.col("num").cast("double") / F.lit(10000.0))
            / (F.col("den").cast("double") / F.lit(10000.0)),
            6,
        ).alias("mkt_share"),
    )


# --------------------------------------------------------------------------
# Q10: returned-item revenue per customer (top 20)
# --------------------------------------------------------------------------
@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {_dsum(_REV, 'revenue')},
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-04-01"))
    )
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dec_sum(_rev_col(), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q14: promo revenue share in one month
# --------------------------------------------------------------------------
@register(
    "q14_promo_revenue",
    oracle="""
    WITH t AS (
        SELECT CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 10000.0
                    + 0.5) AS BIGINT) AS v,
               p_type
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate < TIMESTAMP '1997-10-01'
    )
    SELECT round(100.0 * (CAST(SUM(CASE WHEN p_type = 'PROMO' THEN v
                               ELSE 0 END) AS DOUBLE) / 10000.0)
                 / (CAST(SUM(v) AS BIGINT) / 10000.0), 6) AS promo_revenue
    FROM t
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01"))
        & (F.col("l_shipdate") < _ts("1997-10-01"))
    )
    part = table(spark, sf_dir, "part")
    v = F.floor(_rev_col() * F.lit(10000.0) + F.lit(0.5)).cast("long")
    t = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        v.alias("v"), "p_type"
    )
    agg = t.agg(
        F.sum(
            F.when(F.col("p_type") == "PROMO", F.col("v")).otherwise(0)
        ).alias("num"),
        F.sum("v").alias("den"),
    )
    return agg.select(
        F.round(
            F.lit(100.0)
            * (F.col("num").cast("double") / F.lit(10000.0))
            / (F.col("den").cast("double") / F.lit(10000.0)),
            6,
        ).alias("promo_revenue")
    )


# --------------------------------------------------------------------------
# Q15: top supplier(s) by quarterly revenue (having-on-max shape)
# --------------------------------------------------------------------------
@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, {_dsum(_REV, 'total_revenue')}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The revenue totals are fixed-point-exact, so 'equals the max' is
    a deterministic comparison in both engines (raw double sums would
    make this query engine-dependent). Max via a broadcast 1-row
    scalar aggregate, not a driver collect — and not an empty-window
    max-over-all, which would funnel the unbounded supplier grain
    through one task (VERDICT r11 #3's partitionless-window class)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dec_sum(_rev_col(), "total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("__mx"))
    top = revenue.crossJoin(F.broadcast(mx)).filter(
        F.col("total_revenue") == F.col("__mx")
    )
    supp = table(spark, sf_dir, "supplier")
    return top.join(
        F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey")
    ).select("s_suppkey", "s_name", "total_revenue")


# --------------------------------------------------------------------------
# NTILE decile binning (feature bucketization): each order's value
# decile within its priority class — one window shuffle on the
# partition key, the standard quantile-binning featurizer.
# --------------------------------------------------------------------------
@register(
    "order_value_deciles",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(NTILE(10) OVER (PARTITION BY o_orderpriority
                ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS decile
    FROM orders
    """,
)
def order_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic: the NTILE order includes the unique key as
    tie-break, otherwise equal prices straddling a bucket edge land in
    engine-dependent deciles."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(10).over(w).cast("long").alias("decile"),
    )


# --------------------------------------------------------------------------
# Q17: revenue from small-quantity orders of one brand's parts
# --------------------------------------------------------------------------
@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH avgq AS (
        SELECT l_partkey AS pk,
               CAST(SUM(CAST(FLOOR(l_quantity * 10000.0 + 0.5) AS BIGINT))
                    AS DOUBLE) / (COUNT(l_quantity) * 10000.0) AS aq
        FROM lineitem GROUP BY l_partkey
    )
    SELECT round((CAST(SUM(CAST(FLOOR(l_extendedprice * 10000.0 + 0.5)
                     AS BIGINT)) AS BIGINT) / 10000.0) / 7.0, 6)
               AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN avgq ON pk = l_partkey
    WHERE p_brand = 'Brand#15' AND l_quantity < 0.2 * aq
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part average quantity as a partial-agg groupBy (the classic
    decorrelation of Q17's subquery), fixed-point so the 0.2·avg
    threshold is the same double in both engines."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#15"
    )
    avgq = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.sum(
                F.floor(F.col("l_quantity") * F.lit(10000.0) + F.lit(0.5)).cast("long")
            ).cast("double")
            / (F.count("l_quantity").cast("double") * F.lit(10000.0))
        ).alias("aq")
    )
    picked = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avgq, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("aq"))
    )
    total = picked.agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * F.lit(10000.0) + F.lit(0.5)).cast("long")
        ).alias("s")
    )
    return total.select(
        F.round(
            (F.col("s").cast("double") / F.lit(10000.0)) / F.lit(7.0), 6
        ).alias("avg_yearly")
    )
