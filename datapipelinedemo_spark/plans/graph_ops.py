"""Iterative graph analytics: weighted PageRank over the
customer↔supplier trade graph, with EXACT cross-engine parity.

Iterative algorithms are usually written off as "close enough" for
oracle checking because floating-point mass flows in engine-specific
orders. Here every quantity lives on an integer grid instead: ranks
are millionths (BIGINT), per-edge contributions and the damping step
use floor division — deterministic in any engine — so a DuckDB twin
with K unrolled CTE stages hash-matches bit-for-bit.

Scale shape: each iteration is one shuffle keyed on the source node
(join ranks→edges) plus one partial-agg groupBy on the destination;
K iterations = K passes, the same plan GraphX/Pregel would schedule.
The rank and out-weight frames stay partitioned by node key across
iterations (AQE reuses the exchange). The only driver-side value is
the 1-row node count (a plan constant — the IVF-centroid precedent);
K is a fixed small constant (power iteration converges geometrically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipelinedemo_spark.plans.catalog import register
from datapipelinedemo_spark.tables import table

_SCALE = 1_000_000  # rank grid: millionths
_K = 3  # unrolled power iterations
_DAMP_NUM, _DAMP_DEN = 85, 100  # damping 0.85 as a ratio


def _pagerank_oracle(k: int) -> str:
    """DuckDB twin: k unrolled iteration stages of the same integer
    arithmetic (floor division everywhere)."""
    stages = []
    for i in range(1, k + 1):
        prev = f"r{i - 1}"
        stages.append(
            f"""
    c{i} AS (
        SELECT s.v AS u,
               CAST(SUM(({prev}.r * s.w) // ow.W) AS BIGINT) AS S
        FROM sym s
        JOIN {prev} ON s.u = {prev}.u
        JOIN outw ow ON s.u = ow.u
        GROUP BY 1
    ),
    r{i} AS (
        SELECT nodes.u,
               ((({_SCALE} // n.n) * {100 - _DAMP_NUM}) // 100)
                   + ({_DAMP_NUM} * COALESCE(c{i}.S, 0)) // {_DAMP_DEN} AS r
        FROM nodes LEFT JOIN c{i} ON nodes.u = c{i}.u, n
    )"""
        )
    return f"""
    WITH edges AS (
        SELECT 'c:' || CAST(o_custkey AS VARCHAR) AS u,
               's:' || CAST(l_suppkey AS VARCHAR) AS v,
               CAST(COUNT(*) AS BIGINT) AS w
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    ),
    sym AS (
        SELECT u, v, w FROM edges
        UNION ALL
        SELECT v AS u, u AS v, w FROM edges
    ),
    outw AS (SELECT u, CAST(SUM(w) AS BIGINT) AS W FROM sym GROUP BY 1),
    nodes AS (SELECT u FROM outw),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    r0 AS (SELECT u, CAST({_SCALE} // n.n AS BIGINT) AS r FROM nodes, n),
    {','.join(stages)}
    SELECT u AS node, CAST(r AS DOUBLE) / {_SCALE} AS pagerank
    FROM r{k}
    """


@register("pagerank_trade_graph", oracle=_pagerank_oracle(_K))
def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (damping 0.85, 3 power iterations) over the
    symmetrized customer↔supplier graph, edge weight = lineitem count.

    All arithmetic on the millionth-grid with floor division, so the
    unrolled DuckDB twin matches exactly; the double presented at the
    end is one exact-input IEEE division per row.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    # group on the integer keys (small fixed-width shuffle payload,
    # map-side combine on ints). r16: node ids stay ONE BIGINT through
    # every iteration — customer custkey·2, supplier suppkey·2+1 (the
    # key spaces are disjoint by parity, exactly like the 'c:'/'s:'
    # prefixes) — so the K iterations' joins and partial aggs hash and
    # shuffle 8-byte longs instead of formatted strings (guide §2.3
    # "narrower types"); the string labels are formatted ONCE at the
    # final projection, per node. Same graph, same weights, same
    # integer arithmetic → identical output rows.
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .select(
            (F.col("o_custkey") * 2).cast("long").alias("u"),
            (F.col("l_suppkey") * 2 + 1).cast("long").alias("v"),
            "w",
        )
    )
    sym = edges.unionAll(
        edges.select(
            F.col("v").alias("u"), F.col("u").alias("v"), F.col("w")
        )
    )
    # the edge frame and out-weights feed every iteration — cache both
    # (outw is re-joined every iteration; uncached it would replay
    # its groupBy against the edge cache each time)
    sym = sym.persist()
    outw = sym.groupBy("u").agg(F.sum("w").alias("ow_total")).persist()
    nodes = outw.select("u")
    # The node count is a 1-row scalar — collect it once as a plan
    # constant (the IVF-centroid precedent). The previous
    # crossJoin(broadcast(n)) form cost one EAGER broadcast job per
    # consumer (4 of them), each re-deriving the whole edge chain
    # before any cache had materialized: 25s -> 4s at sf0.1. The
    # count() action also materializes the sym/outw caches up front.
    n_val = outw.count()
    base = ((_SCALE // n_val) * (100 - _DAMP_NUM)) // 100
    ranks = nodes.select(
        "u", F.lit(_SCALE // n_val).cast("long").alias("r")
    )
    for _ in range(_K):
        # ranks and out-weights are both node-keyed: join them first
        # (node-sized x node-sized, AQE-broadcast) so the 1.1M-row
        # edge frame is joined ONCE per iteration, not twice.
        rw = ranks.join(outw, "u")
        contrib = (
            sym.join(rw, "u")
            .groupBy(F.col("v").alias("u"))
            .agg(F.sum(F.expr("(r * w) div ow_total")).alias("S"))
        )
        ranks = nodes.join(contrib, "u", "left").select(
            "u",
            F.expr(
                f"{base}L"
                f" + ({_DAMP_NUM} * COALESCE(S, 0)) div {_DAMP_DEN}"
            ).alias("r"),
        )
    return ranks.select(
        F.when(
            F.col("u") % 2 == 0,
            F.concat(F.lit("c:"), F.expr("u div 2").cast("string")),
        )
        .otherwise(
            F.concat(F.lit("s:"), F.expr("u div 2").cast("string"))
        )
        .alias("node"),
        (F.col("r").cast("double") / _SCALE).alias("pagerank"),
    )
