"""The six remaining TPC-H query shapes (Q2/Q9/Q11/Q12/Q20/Q21).

With these, every one of the 22 TPC-H plan shapes is covered by the
catalog (the other 16 live in plans/relational.py, relational_ext.py
and tpch_deep.py). As in tpch_deep.py, the testdata schema is a
trimmed TPC-H — no partsupp, no l_shipmode/l_commitdate/l_receiptdate
— so each query keeps the ORIGINAL's plan shape (correlated-min
supplier selection, profit join tree, group-share HAVING, CASE-sum by
class, nested-aggregate semi-join, exists/not-exists wait detection)
with predicates adapted to the columns that exist:

- Q2's ps_supplycost → MIN(l_extendedprice / l_quantity) observed per
  (part, supplier): a per-row IEEE division and an order-independent
  MIN, so both engines agree bit-for-bit.
- Q9's ps_supplycost → 0.5 * p_retailprice as the unit-cost proxy.
- Q11's ps_availqty value share → lineitem revenue share, compared on
  the fixed-point BIGINT grid (exact integer compare, no FP drift).
- Q12's l_shipmode → l_returnflag as the class column; lateness is
  l_shipdate > o_orderdate + 60 days (no receipt/commit dates).
- Q20's availqty > half of shipped → supplier shipped > 30% of the
  part's 1996 total (exact scaled-BIGINT compare).
- Q21's receipt>commit lateness → l_shipdate > o_orderdate + 90 days;
  the exists/not-exists pair collapses into one per-order aggregate
  (COUNT DISTINCT suppliers / late suppliers) — one shuffle, no
  correlated re-scans.

Scale notes: every dimension side (supplier⋈nation⋈region, filtered
part) is broadcast; the fact-side shuffles are the natural groupBys on
(l_partkey[, l_suppkey]) or l_orderkey. Q11's global total is a
1-row broadcast cross join, not a driver collect. Q21 is ONE
aggregation over the order key — the textbook form's three scans of
lineitem (self-exists twice) fuse into a single pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datapipelinedemo_spark.functions.stable import _scaled, dec_sum
from datapipelinedemo_spark.plans.catalog import register
from datapipelinedemo_spark.plans.relational import _dsum
from datapipelinedemo_spark.tables import table

_SCALED_REV = "CAST(FLOOR((l_extendedprice*(1-l_discount))*1e4+0.5) AS BIGINT)"


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# --------------------------------------------------------------------------
# Q2: minimum-cost supplier per part (correlated-min shape)
# --------------------------------------------------------------------------
@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               MIN(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY 1, 2
    ),
    eu AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    ranked AS (
        SELECT s_acctbal, s_name, n_name, pk, s_suppkey, unit_cost,
               MIN(unit_cost) OVER (PARTITION BY pk) AS best
        FROM cost JOIN eu ON sk = s_suppkey
    )
    SELECT s_acctbal, s_name, n_name, pk AS p_partkey, s_suppkey,
           p_name, unit_cost AS min_unit_cost
    FROM ranked JOIN part ON pk = p_partkey
    WHERE unit_cost = best AND p_type = 'ECONOMY' AND p_size < 15
    ORDER BY s_acctbal DESC, p_partkey, s_suppkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: per-part correlated MIN over qualifying suppliers.

    The observed unit price MIN(l_extendedprice/l_quantity) stands in
    for ps_supplycost. The per-part minimum is a window MIN over the
    (part, supplier) aggregate — one shuffle keyed on l_partkey — and
    the equality filter keeps exactly the argmin rows (ties keep both,
    same in both engines). Dimensions broadcast.
    """
    li = table(spark, sf_dir, "lineitem")
    cost = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))

    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "ECONOMY") & (F.col("p_size") < 15)
    )
    ranked = cost.join(F.broadcast(eu), cost.sk == eu.s_suppkey).withColumn(
        "best", F.min("unit_cost").over(Window.partitionBy("pk"))
    )
    return (
        ranked.filter(F.col("unit_cost") == F.col("best"))
        .join(F.broadcast(part), ranked.pk == part.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("pk").alias("p_partkey"),
            "s_suppkey",
            "p_name",
            F.col("unit_cost").alias("min_unit_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_suppkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q9: product-type profit by nation and year
# --------------------------------------------------------------------------
@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           {_dsum('l_extendedprice*(1-l_discount) - 0.5*p_retailprice*l_quantity',
                  'sum_profit')}
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: five-table join tree, profit aggregate by (nation, year).

    0.5*p_retailprice proxies ps_supplycost (no partsupp table). The
    filtered part and the supplier⋈nation dimensions broadcast; orders
    joins on the fact's order key; the single shuffle is the final
    groupBy. Profit is a per-row IEEE expression fed to the fixed-point
    accumulator.
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    orders = table(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.5
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dec_sum(profit, "sum_profit"))
    )


# --------------------------------------------------------------------------
# Q11: important parts by revenue share (group-share HAVING shape)
# --------------------------------------------------------------------------
@register(
    "q11_important_parts",
    oracle=f"""
    WITH pv AS (
        SELECT l_partkey AS pk,
               CAST(SUM({_SCALED_REV}) AS BIGINT) AS v_scaled
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        GROUP BY 1
    )
    SELECT pk AS p_partkey, CAST(v_scaled AS DOUBLE) / 1e4 AS part_value
    FROM pv, (SELECT CAST(SUM(v_scaled) AS BIGINT) AS tot,
                     CAST(COUNT(*) AS BIGINT) AS n_parts FROM pv) t
    WHERE CAST(v_scaled AS HUGEINT) * n_parts > 2 * CAST(tot AS HUGEINT)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: per-group value vs a fraction of the global total.

    ps_supplycost*ps_availqty becomes lineitem revenue from the chosen
    nations' suppliers. TPC-H divides Q11's share threshold by SF so
    the result stays non-degenerate at every scale; the data-derived
    equivalent used here — keep parts whose value exceeds 2× the mean
    per-part value (v·n_parts > 2·tot) — needs no SF parameter and
    selects a stable fraction of parts at any volume. Both sides of
    the compare live on the 10^-4 fixed-point grid widened to 128-bit
    (Spark DECIMAL(38,0), DuckDB HUGEINT), so the threshold compare is
    EXACT at any scale — no cross-engine FP drift, no 64-bit overflow.
    The total is a 1-row aggregate broadcast back via cross join (no
    driver collect).
    """
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pv = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.sum(_scaled(rev, 4)).alias("v_scaled"))
    )
    total = pv.agg(
        F.sum("v_scaled").alias("tot"), F.count(F.lit(1)).alias("n_parts")
    )
    wide = "decimal(38,0)"
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(
            F.col("v_scaled").cast(wide) * F.col("n_parts")
            > F.lit(2).cast(wide) * F.col("tot")
        )
        .select(
            F.col("pk").alias("p_partkey"),
            (F.col("v_scaled").cast("double") / 1e4).alias("part_value"),
        )
    )


# --------------------------------------------------------------------------
# Q12: late shipments split by priority class (CASE-sum shape)
# --------------------------------------------------------------------------
@register(
    "q12_late_shipment_priority",
    oracle="""
    SELECT l_returnflag AS ship_group,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY ship_group
    """,
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: lateness filter + conditional counts per class.

    l_returnflag stands in for l_shipmode and ship-after-order+60d for
    receipt-after-commit (columns the trimmed schema lacks). One
    equi-join on the order key, one groupBy on a 3-value column; both
    CASE-sums are map-side partial aggregates.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_returnflag").alias("ship_group"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q20: suppliers shipping an outsized share of a part (nested-agg semi-join)
# --------------------------------------------------------------------------
@register(
    "q20_part_share_suppliers",
    oracle="""
    WITH sq AS (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               CAST(SUM(CAST(FLOOR(l_quantity * 1e2 + 0.5) AS BIGINT))
                    AS BIGINT) AS q
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1, 2
    ),
    pt AS (SELECT pk, CAST(SUM(q) AS BIGINT) AS tot FROM sq GROUP BY 1)
    SELECT DISTINCT s_suppkey, s_name, n_name
    FROM sq
    JOIN pt USING (pk)
    JOIN supplier ON sk = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE q * 10 > tot * 3
      AND n_name IN ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3',
                     'NATION_4')
    """,
)
def q20_part_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: semi-join on a nested aggregate threshold.

    ps_availqty > 50% of shipped becomes: the supplier shipped > 30%
    of the part's total 1996 quantity. Quantities snap to the 10^-2
    BIGINT grid so the share compare (q*10 > tot*3) is exact integer
    math. Two shuffles, both keyed on l_partkey (AQE coalesces the
    second — the per-part total reuses the (part, supplier) partial).
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    sq = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.sum(_scaled("l_quantity", 2)).alias("q"))
    pt = sq.groupBy("pk").agg(F.sum("q").alias("tot"))
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(
            "NATION_0", "NATION_1", "NATION_2", "NATION_3", "NATION_4"
        )
    )
    return (
        sq.join(pt, "pk")
        .filter(F.col("q") * 10 > F.col("tot") * 3)
        .join(F.broadcast(supp), F.col("sk") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
    )


# --------------------------------------------------------------------------
# Q21: suppliers who alone held up multi-supplier orders
# --------------------------------------------------------------------------
@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH po AS (
        SELECT l_orderkey AS ok,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT CASE
                   WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                   THEN l_suppkey END) AS n_late,
               MIN(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                        THEN l_suppkey END) AS late_sk
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY 1
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM po JOIN supplier ON late_sk = s_suppkey
    WHERE n_supp > 1 AND n_late = 1
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: the exists / not-exists pair as ONE per-order aggregate.

    The textbook Q21 scans lineitem three times (l1, exists l2, not
    exists l3). Per order, "some other supplier shipped on time" +
    "no other supplier was late" is equivalent to: >1 distinct
    suppliers AND exactly 1 distinct late supplier — so one groupBy
    on l_orderkey computes everything, and MIN(late supplier) is
    well-defined because there is exactly one. Lateness is
    ship > order date + 90d (no receipt/commit columns).
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    po = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_orderkey").alias("ok"))
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
            F.min(F.when(late, F.col("l_suppkey"))).alias("late_sk"),
        )
    )
    supp = table(spark, sf_dir, "supplier")
    return (
        po.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(supp), po.late_sk == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )
