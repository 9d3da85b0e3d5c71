"""SQ8 (scalar int8) quantized serving — the recall companion of
``embedding_int8_quantize`` (plans/corpus_ops.py), completing the
quantized-serving recall story beside PQ (`pq_recall_at_10`),
Matryoshka (`matryoshka_recall_by_dim`) and binary signatures
(`hamming_recall_by_depth`): PQ compresses 64× with codebooks, SQ8 4×
with per-dimension affine codes, and the question a vector store asks
is the same — what does the compression cost at k=10.

Serving is ASYMMETRIC (the production form: queries stay float, only
the stored corpus is quantized): cosine(query_float,
dequantize(corpus_codes)), computed as the same strict left fold in
double as every other cosine in the repo, so the DuckDB oracle replays
it bit-for-bit. Reconstruction ``mn_i + code_i·sc_i`` is exact IEEE
per element (codes ≤ 255 widen exactly).

Scale shape: the per-dimension (mn, sc) stats are one 2×d-array row
BROADCAST to the scan (the r7 lesson — never d literals in the plan);
dequantization is in-row; the top-k serving plan is the certified
brute-force shape (queries broadcast, corpus never shuffles). At
100 TB the corpus side reads d bytes/vector instead of 8d — the 4×
(vs float64; 4× vs float32 on disk) scan cut this family exists for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipelinedemo_spark.operators import similarity as SIM
from datapipelinedemo_spark.plans.catalog import register
from datapipelinedemo_spark.plans.llm_ops import (
    TOPK_QUERY_MOD,
    topk_scored_cte,
)
from datapipelinedemo_spark.tables import table

_SQ8_K = 10


def _sq8_reconstructed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, embedding): the corpus after a quantize→dequantize
    round trip under the certified per-dim affine uint8 codes."""
    emb = table(spark, sf_dir, "embeddings")
    per_dim = (
        emb.select(F.posexplode("embedding").alias("i", "x"))
        .groupBy("i")
        .agg(
            F.min(F.col("x").cast("double")).alias("mn"),
            F.max(F.col("x").cast("double")).alias("mx"),
        )
    )
    by_i = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("i"),
                F.col("mn"),
                ((F.col("mx") - F.col("mn")) / 255.0).alias("sc"),
            )
        )
    )
    stats_row = per_dim.agg(
        F.transform(by_i, lambda s: s["mn"]).alias("__mns"),
        F.transform(by_i, lambda s: s["sc"]).alias("__scs"),
    )
    rec = F.expr(
        """
        transform(arrays_zip(embedding, sequence(1, size(embedding))), z ->
          element_at(__mns, int(z['1']))
          + (CASE WHEN element_at(__scs, int(z['1'])) > 0d
                  THEN floor((cast(z.embedding as double)
                              - element_at(__mns, int(z['1'])))
                             / element_at(__scs, int(z['1'])) + 0.5d)
                  ELSE 0d END)
            * element_at(__scs, int(z['1'])))
        """
    )
    return emb.crossJoin(F.broadcast(stats_row)).select(
        "vec_id", rec.alias("embedding")
    )


# DuckDB mirror: the certified quantize CTE shape + reconstruction,
# then the standard scored/ranked tail with the corpus side swapped
# for the reconstructed vectors (queries stay float).
_SQ8_REC_CTE = """
    ex AS (
        SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ),
    st AS (
        SELECT i, MIN(CAST(x AS DOUBLE)) AS mn,
               (MAX(CAST(x AS DOUBLE)) - MIN(CAST(x AS DOUBLE))) / 255.0
                   AS sc
        FROM ex GROUP BY 1
    ),
    rec AS (
        SELECT vec_id,
               list(mn + (CASE WHEN sc > 0
                               THEN FLOOR((CAST(x AS DOUBLE) - mn) / sc
                                          + 0.5)
                               ELSE 0 END) * sc
                    ORDER BY i) AS rv
        FROM ex JOIN st USING (i) GROUP BY vec_id
    )"""

_SQ8_DOT = (
    "list_reduce(list_prepend(0.0::DOUBLE,"
    " [CAST(q.embedding[i] AS DOUBLE) * c.rv[i]"
    "  for i in generate_series(1, 64)]), (x, y) -> x + y)"
)
_SQ8_QNRM = (
    "sqrt(list_reduce(list_prepend(0.0::DOUBLE,"
    " [CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)"
    "  for i in generate_series(1, 64)]), (x, y) -> x + y))"
)
_SQ8_CNRM = (
    "sqrt(list_reduce(list_prepend(0.0::DOUBLE,"
    " [c.rv[i] * c.rv[i] for i in generate_series(1, 64)]),"
    " (x, y) -> x + y))"
)

_SQ8_RANKED = f"""
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {_SQ8_DOT} / ({_SQ8_QNRM} * {_SQ8_CNRM}) AS cs,
           ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_SQ8_DOT} / ({_SQ8_QNRM} * {_SQ8_CNRM}) DESC,
                        c.vec_id
           ) AS rnk
    FROM embeddings q JOIN rec c ON q.vec_id <> c.vec_id
    WHERE q.vec_id % {TOPK_QUERY_MOD} = 0
"""


@register(
    "similarity_topk_int8",
    oracle=f"""
    WITH {_SQ8_REC_CTE}
    SELECT query_id, neighbor_id, round(cs, 6) AS cos_sim,
           CAST(rnk AS BIGINT) AS rank
    FROM ({_SQ8_RANKED}) WHERE rnk <= {_SQ8_K}
    """,
)
def similarity_topk_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric SQ8 serving (module banner): exact top-10 per query
    under cosine(float query, dequantized corpus)."""
    corpus = _sq8_reconstructed(spark, sf_dir)
    queries = table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % TOPK_QUERY_MOD == 0
    )
    topk = SIM.cosine_topk_bruteforce(
        corpus, queries, "vec_id", "embedding", k=_SQ8_K
    )
    return topk.select(
        "query_id",
        "neighbor_id",
        F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("long").alias("rank"),
    )


@register(
    "int8_recall_at_10",
    oracle=topk_scored_cte()
    + f""", {_SQ8_REC_CTE},
    gt AS (
        SELECT query_id, neighbor_id
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cs DESC, neighbor_id) AS rnk
              FROM scored)
        WHERE rnk <= {_SQ8_K}
    ),
    a AS (SELECT query_id, neighbor_id
          FROM ({_SQ8_RANKED}) WHERE rnk <= {_SQ8_K})
    SELECT CAST(COUNT(DISTINCT a.query_id) AS BIGINT) AS n_queries,
           round(CAST(SUM(CASE WHEN g.neighbor_id IS NOT NULL
                      THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
               AS recall_at_10
    FROM a LEFT JOIN gt g
      ON g.query_id = a.query_id AND g.neighbor_id = a.neighbor_id
    """,
)
def int8_recall_at_10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of SQ8 serving against the exact float top-10 — the
    measured cost of the 4× compression at this corpus's geometry
    (per-dim affine codes keep ranking almost intact on spread-out
    dimensions; the number says whether "almost" holds HERE). A
    measurement query — excluded from exponent tables by the standing
    fixed-fraction-query rationale."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % TOPK_QUERY_MOD == 0)
    gt = SIM.cosine_topk_bruteforce(
        emb, queries, "vec_id", "embedding", k=_SQ8_K
    ).select("query_id", "neighbor_id")
    a = similarity_topk_int8(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    return (
        a.join(
            gt.withColumn("hit", F.lit(1)),
            ["query_id", "neighbor_id"],
            "left",
        )
        .agg(
            F.countDistinct("query_id").cast("long").alias("n_queries"),
            F.round(
                F.sum(
                    F.when(F.col("hit").isNotNull(), 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("recall_at_10"),
        )
        .select("n_queries", "recall_at_10")
    )
