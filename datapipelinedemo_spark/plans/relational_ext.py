"""Extended relational surface: outer joins, HAVING, IN / NOT-IN and
scalar subqueries, correlated-average filters, multi-predicate
pushdown — the rest of the classic analytic query shapes (TPC-H
Q4/Q13/Q16/Q18/Q19/Q22 analogs on the driver testdata schema).

Determinism notes: every cross-row average that feeds a FILTER
boundary is computed with the fixed-point snap (``functions.stable``)
so both engines agree on the exact threshold; money sums use _dsum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datapipelinedemo_spark.functions.stable import dec_sum
from datapipelinedemo_spark.plans.catalog import register
from datapipelinedemo_spark.plans.relational import _dsum
from datapipelinedemo_spark.tables import table


# --------------------------------------------------------------------------
# Q4 shape — EXISTS subquery: priorities of orders with late lineitems
# --------------------------------------------------------------------------
@register(
    "q4_priority_with_late_items",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL '60 days')
    GROUP BY o_orderpriority
    """,
)
def q4_priority_with_late_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


# --------------------------------------------------------------------------
# Q13 shape — LEFT OUTER JOIN + two-level aggregation (distribution of
# customers by order count, zero-order customers included)
# --------------------------------------------------------------------------
@register(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
        GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# Q16 shape — NOT IN subquery + multi-key distinct aggregate
# --------------------------------------------------------------------------
@register(
    "q16_parts_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'BRAND_0'
      AND p_size IN (5, 10, 15, 20, 25)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "BRAND_0") & F.col("p_size").isin(5, 10, 15, 20, 25)
    )
    bad_supp = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        li.join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q18 shape — HAVING on a grouped sum + IN-subquery join back
# --------------------------------------------------------------------------
@register(
    "q18_large_quantity_orders",
    oracle=f"""
    SELECT c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           {_dsum('l_quantity', 'total_qty', 2)}
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) > 15000
    )
    GROUP BY c_custkey, o_orderkey, o_orderdate
    """,
)
def q18_large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(
                F.floor(F.col("l_quantity") * 100.0 + 0.5).cast("long")
            ).alias("q100")
        )
        .filter(F.col("q100") > 15000)
        .select("l_orderkey")
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return (
        li.join(F.broadcast(big), "l_orderkey", "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .agg(dec_sum("l_quantity", "total_qty", 2))
    )


# --------------------------------------------------------------------------
# Q19 shape — disjunction of conjunctions (pushdown-hostile predicate)
# --------------------------------------------------------------------------
@register(
    "q19_bracketed_revenue",
    oracle=f"""
    SELECT {_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           COUNT(*) AS matched_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'BRAND_1' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 15)
       OR (p_brand = 'BRAND_2' AND p_size BETWEEN 5 AND 20
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'BRAND_3' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    def bracket(brand, smin, smax, qmin, qmax):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(smin, smax)
            & F.col("l_quantity").between(qmin, qmax)
        )
    j = j.filter(
        bracket("BRAND_1", 1, 10, 1, 15)
        | bracket("BRAND_2", 5, 20, 10, 30)
        | bracket("BRAND_3", 10, 30, 20, 50)
    )
    return j.agg(
        dec_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
        ),
        F.count(F.lit(1)).alias("matched_lines"),
    )


# --------------------------------------------------------------------------
# Q22 shape — scalar-subquery threshold + anti join. The average that
# feeds the filter boundary is fixed-point-snapped so both engines cut
# at exactly the same value.
# --------------------------------------------------------------------------
@register(
    "q22_idle_rich_customers",
    oracle="""
    WITH thr AS (
        SELECT CAST(SUM(CAST(FLOOR(c_acctbal * 10000.0 + 0.5) AS BIGINT))
                    AS DOUBLE) / (COUNT(*) * 10000.0) AS avg_bal
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment, COUNT(*) AS numcust,
           CAST(SUM(CAST(FLOOR(c.c_acctbal * 10000.0 + 0.5) AS BIGINT))
                AS DOUBLE) / 10000.0 AS totacctbal
    FROM customer c, thr
    WHERE c.c_acctbal > thr.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_mktsegment
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    thr = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(
                    F.floor(F.col("c_acctbal") * 10000.0 + 0.5).cast("long")
                ).cast("double")
                / (F.count(F.lit(1)) * 10000.0)
            ).alias("avg_bal")
        )
    )
    rich = cust.crossJoin(F.broadcast(thr)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        dec_sum("c_acctbal", "totacctbal"),
    )


# --------------------------------------------------------------------------
# Correlated-average filter: orders 1.5x above their customer's mean
# --------------------------------------------------------------------------
@register(
    "orders_above_customer_average",
    oracle="""
    WITH avgs AS (
        SELECT o_custkey,
               CAST(SUM(CAST(FLOOR(o_totalprice * 10000.0 + 0.5) AS BIGINT))
                    AS DOUBLE) / (COUNT(*) * 10000.0) AS cust_avg
        FROM orders GROUP BY o_custkey
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o JOIN avgs a ON o.o_custkey = a.o_custkey
    WHERE o.o_totalprice > 1.5 * a.cust_avg
    """,
)
def orders_above_customer_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    snapped = F.sum(
        F.floor(F.col("o_totalprice") * 10000.0 + 0.5).cast("long")
    ).over(w).cast("double") / (F.count(F.lit(1)).over(w) * 10000.0)
    return (
        orders.withColumn("cust_avg", snapped)
        .filter(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# Q6 shape via the SQL interface (the reference has no SQL surface at
# all; Spark gives it for free over registered views)
# --------------------------------------------------------------------------
@register(
    "q6_forecast_revenue_sql",
    oracle="""
    SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 10000.0 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
           COUNT(*) AS matched
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expressed through ``spark.sql`` over a registered view — the SQL
    entry point into the same Catalyst plans the DataFrame API builds."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 10000.0 + 0.5)
                             AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
               COUNT(*) AS matched
        FROM lineitem_v
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """
    )


# --------------------------------------------------------------------------
# Exact percentiles (both engines: sort + linear interpolation)
# --------------------------------------------------------------------------
@register(
    "value_percentiles_per_type",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.75), 6) AS p75,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def value_percentiles_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.75)), 6).alias("p75"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# Window-function depth: running totals, moving averages, lag deltas
# --------------------------------------------------------------------------
@register(
    "running_total_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
    FROM orders
    """,
)
def running_total_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(cents).over(w).alias("running_cents"),
    )


@register(
    "moving_avg_daily_revenue",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS cents
        FROM orders GROUP BY 1
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(cents AS BIGINT) AS day_cents,
           round(CAST(AVG(cents) OVER (ORDER BY d
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE), 4)
               AS avg7_cents
    FROM daily
    """,
)
def moving_avg_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average over exact integer day-cents; the AVG of
    BIGINTs divides identically in both engines (sum exact, count
    identical)."""
    orders = table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
        ).alias("cents")
    )
    w = Window.orderBy("d").rowsBetween(-6, 0)
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("cents").alias("day_cents"),
        F.round(F.avg("cents").over(w), 4).alias("avg7_cents"),
    )


@register(
    "order_gap_days_lag",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(coalesce(date_diff('day',
                LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey),
                o_orderdate), -1) AS BIGINT) AS gap_days
    FROM orders
    """,
)
def order_gap_days_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days since the customer's previous order (−1 for the first) —
    LAG + datediff."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    prev = F.lag("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.coalesce(
            F.datediff(F.to_date("o_orderdate"), F.to_date(prev)),
            F.lit(-1),
        ).cast("long").alias("gap_days"),
    )


# --------------------------------------------------------------------------
# Range/interval join (reference gap §2.7): purchases attributed to the
# user's signup windows (ts ∈ [signup, signup+6h)). Spark side uses the
# bucketed-equi-join pattern (operators/rangejoin.py); the oracle is
# the plain inequality join.
# --------------------------------------------------------------------------
@register(
    "range_join_purchase_attribution",
    oracle="""
    WITH sg AS (
        SELECT user_id, ts AS s, ts + INTERVAL '6 hours' AS e,
               event_id AS signup_id
        FROM events WHERE event_type = 'signup'
    ), pu AS (
        SELECT user_id, ts, event_id AS purchase_id
        FROM events WHERE event_type = 'purchase'
    )
    SELECT pu.purchase_id, sg.signup_id,
           strftime(pu.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
    FROM pu JOIN sg
      ON pu.user_id = sg.user_id AND sg.s <= pu.ts AND pu.ts < sg.e
    """,
)
def range_join_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datapipelinedemo_spark.operators.rangejoin import interval_join_bucketed

    ev = table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("su_user"),
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 6 HOURS")).alias("e"),
        F.col("event_id").alias("signup_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    joined = interval_join_bucketed(
        purchases,
        signups,
        left_key="user_id",
        right_key="su_user",
        left_ts="ts",
        right_start="s",
        right_end="e",
        bucket_seconds=3600,
    )
    return joined.select(
        "purchase_id",
        "signup_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
    )


# --------------------------------------------------------------------------
# Column statistics with order-independent variance (snapped-moment
# formula — identical arithmetic both engines)
# --------------------------------------------------------------------------
@register(
    "events_value_stats",
    oracle="""
    WITH s AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                   / 10000.0 AS s1,
               CAST(SUM(CAST(FLOOR(value * value * 10000.0 + 0.5) AS BIGINT))
                   AS DOUBLE) / 10000.0 AS s2,
               MIN(value) AS min_v, MAX(value) AS max_v
        FROM events GROUP BY event_type
    )
    SELECT event_type, n, min_v, max_v,
           round(s1 / n, 6) AS mean_v,
           round((s2 - s1 * s1 / n) / (n - 1), 6) AS var_v
    FROM s
    """,
)
def events_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    s1 = (
        F.sum(F.floor(F.col("value") * 10000.0 + 0.5).cast("long")).cast("double")
        / 10000.0
    )
    s2 = (
        F.sum(
            F.floor(F.col("value") * F.col("value") * 10000.0 + 0.5).cast("long")
        ).cast("double")
        / 10000.0
    )
    n = F.count(F.lit(1))
    agg = ev.groupBy("event_type").agg(
        n.alias("n"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
        s1.alias("s1"),
        s2.alias("s2"),
    )
    return agg.select(
        "event_type",
        "n",
        "min_v",
        "max_v",
        F.round(F.col("s1") / F.col("n"), 6).alias("mean_v"),
        F.round(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1),
            6,
        ).alias("var_v"),
    )


# --------------------------------------------------------------------------
# Full analytic-ranking profile: rank / dense_rank / percent_rank /
# cume_dist / ntile on one deterministic ordering.
# --------------------------------------------------------------------------
@register(
    "order_rank_profile",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(rnk AS BIGINT) AS rnk,
           CAST(drnk AS BIGINT) AS drnk,
           round(pr, 6) AS pct_rank,
           round(cd, 6) AS cume,
           CAST(q AS BIGINT) AS quartile
    FROM (
        SELECT o_orderkey, o_orderpriority,
               RANK() OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk,
               PERCENT_RANK() OVER w AS pr,
               CUME_DIST() OVER w AS cd,
               NTILE(4) OVER w AS q
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey)
    )
    """,
)
def order_rank_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The five SQL ranking functions over one window, per order
    priority. The ORDER BY carries the unique o_orderkey tie-break:
    percent_rank/cume_dist are tie-insensitive, but NTILE assigns by
    ROW POSITION — without a total order the quartile of tied prices
    would be engine- and partitioning-dependent. percent_rank and
    cume_dist are exact rationals of window counts, so round(.,6) is
    pure presentation. One shuffle on the partition key; each
    partition sorts once and feeds all five functions.
    """
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


# --------------------------------------------------------------------------
# Revenue concentration: Gini coefficient over per-customer revenue.
# --------------------------------------------------------------------------
@register(
    "customer_revenue_gini",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS r2
        FROM orders GROUP BY 1
    ),
    ranked AS (
        SELECT r2,
               ROW_NUMBER() OVER (ORDER BY r2, o_custkey) AS i
        FROM rev
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(r2) AS BIGINT) AS s,
               CAST(SUM(i * r2) AS BIGINT) AS w
        FROM ranked
    )
    SELECT n AS n_customers,
           round(CAST(s AS DOUBLE) / 100.0, 6) AS total_revenue,
           round(2.0 * CAST(w AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
                 - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6)
               AS gini
    FROM agg
    """,
)
def customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across customers
    (0 = perfectly even, -> 1 = one whale): the classic inequality /
    concentration KPI, via the rank formulation
    G = 2*sum(i*y_i)/(n*sum(y)) - (n+1)/n over ascending revenue.

    VERDICT r11 #3: the original form ranked with
    ``row_number().over(Window.orderBy(...))`` — a partitionless
    window that funnels the full CUSTOMER grain (unbounded: grows
    with the corpus) through ONE task. Σ i·y_i only needs rank
    ALGEBRA, not materialized ranks, so both gini entries now share
    the histogram + bucketed two-pass prefix-sum plan (see
    ``_gini_histogram_frame`` — no SinglePartition window/sort
    anywhere; explain-audit asserts this for the whole catalog).
    Hash-identical answer: equal revenues share a rank-sum
    independent of tie order."""
    return _gini_histogram_frame(spark, sf_dir)


@register(
    "customer_revenue_gini_histogram",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS r2
        FROM orders GROUP BY 1
    ),
    ranked AS (
        SELECT r2,
               ROW_NUMBER() OVER (ORDER BY r2, o_custkey) AS i
        FROM rev
    ),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(r2) AS BIGINT) AS s,
               CAST(SUM(i * r2) AS BIGINT) AS w
        FROM ranked
    )
    SELECT n AS n_customers,
           round(CAST(s AS DOUBLE) / 100.0, 6) AS total_revenue,
           round(2.0 * CAST(w AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
                 - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6)
               AS gini
    FROM agg
    """,
)
def customer_revenue_gini_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The histogram/prefix-sum gini under its original catalog name;
    since r12 ``customer_revenue_gini`` shares this exact plan (the
    window form it was the scale-safe twin of is gone — VERDICT r11
    #3), so the pair is plan-identical and both stay certified."""
    return _gini_histogram_frame(spark, sf_dir)


def _gini_histogram_frame(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Gini via rank algebra on the VALUE histogram — the form that
    survives 10^9 customers: group revenues to distinct cent values
    (count c per value v — one ordinary shuffle), then the exclusive
    prefix count m_v via the bucketed two-pass prefix sum
    (operators/prefix.py — no SinglePartition stage, explain-audit
    asserted). The ranks a value occupies are m_v+1 .. m_v+c_v, whose
    sum is c_v·m_v + c_v(c_v+1)/2, so
    Σ_i i·y_i = Σ_v v·(c_v·m_v + c_v(c_v+1) div 2) — exact BIGINT,
    tie-order-free by construction (equal values share the rank-sum
    whatever order a sort would have given them)."""
    from datapipelinedemo_spark.operators.prefix import (
        bucketed_prefix_sum,
    )

    o = table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
        )
        .cast("long")
        .alias("r2")
    )
    hist = rev.groupBy("r2").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    pre = bucketed_prefix_sum(hist, "r2", "c", out_col="m")
    # w in DECIMAL(38,0): r2 (~1e9 cents) x rank offsets (~1e18 at 1e9
    # customers) overflows BIGINT long before the advertised scale
    # (ADVICE r9); per-row product <= ~1.5e27 and the sum <= ~1.5e36,
    # both inside decimal(38,0). The inner rank-sum stays BIGINT:
    # c*m <= 1e18 and c(c+1)/2 <= 5e17 at n = 1e9.
    agg = pre.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("r2") * F.col("c")).cast("long").alias("s"),
        F.sum(
            F.col("r2").cast("decimal(38,0)")
            * (
                F.col("c") * F.col("m")
                + F.expr("(c * (c + 1)) div 2")
            ).cast("decimal(38,0)")
        ).alias("w"),
    )
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    wd = F.col("w").cast("double")
    return agg.select(
        F.col("n").alias("n_customers"),
        F.round(sd / 100.0, 6).alias("total_revenue"),
        F.round(
            2.0 * wd / (nd * sd) - (nd + 1.0) / nd, 6
        ).alias("gini"),
    )


# --------------------------------------------------------------------------
# Year-over-year growth on the monthly revenue series.
# --------------------------------------------------------------------------
@register(
    "monthly_revenue_yoy",
    oracle="""
    WITH m AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
               CAST(month(o_orderdate) AS BIGINT) AS mo,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS r2
        FROM orders GROUP BY 1, 2
    )
    SELECT CAST(cur.y AS VARCHAR) || '-' || CAST(cur.mo AS VARCHAR) AS month,
           round(CAST(cur.r2 AS DOUBLE) / 100.0, 6) AS revenue,
           round(CAST(cur.r2 - prev.r2 AS DOUBLE)
                 / CAST(prev.r2 AS DOUBLE), 6) AS yoy_growth
    FROM m cur LEFT JOIN m prev
      ON prev.y = cur.y - 1 AND prev.mo = cur.mo
    """,
)
def monthly_revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with year-over-year growth, computed by a
    self-join on (year-1, month) rather than lag(12) — gaps in the
    month series can't silently misalign the comparison. The joined
    frame is month-grain (dozens of rows); growth is one double
    division of exact cent totals. Null growth = no same-month prior
    year.
    """
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("mo"),
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
        )
        .cast("long")
        .alias("r2")
    )
    cur = m.alias("cur")
    prev = m.select(
        (F.col("y") + 1).alias("py"),
        F.col("mo").alias("pmo"),
        F.col("r2").alias("pr2"),
    ).alias("prev")
    j = cur.join(
        prev,
        (F.col("cur.y") == F.col("py")) & (F.col("cur.mo") == F.col("pmo")),
        "left",
    )
    return j.select(
        F.concat(
            F.col("cur.y").cast("string"),
            F.lit("-"),
            F.col("cur.mo").cast("string"),
        ).alias("month"),
        F.round(F.col("cur.r2").cast("double") / 100.0, 6).alias("revenue"),
        F.round(
            (F.col("cur.r2") - F.col("pr2")).cast("double")
            / F.col("pr2").cast("double"),
            6,
        ).alias("yoy_growth"),
    )
