"""Similarity search over embedding columns (array<float>).

Two paths:

- ``cosine_topk_bruteforce`` — exact: broadcast the (small) query set
  against the corpus, score with a pure-expression dot product, keep
  top-k per query via window. At 100 TB the corpus side stays
  partitioned and never shuffles: the join is broadcast, the only
  shuffle is the final per-query top-k (tiny).
- ``cosine_topk_lsh`` — approximate scale path: random-hyperplane LSH
  signs bucket the corpus; each query probes only its bucket. Same
  deterministic md5-derived hyperplanes in both engines.

Dot products fold left-to-right over the array with double math, so
Spark and DuckDB produce bit-identical scores (both read the same
float32 parquet values).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: str, b: str) -> Column:
    """Σ a[i]·b[i] as a strict left fold in double precision."""
    return F.expr(
        f"aggregate(zip_with({a}, {b},"
        f" (x, y) -> cast(x as double) * cast(y as double)),"
        f" 0.0D, (acc, v) -> acc + v)"
    )


def norm(a: str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: str, b: str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    ``queries`` must be small (it is broadcast); the corpus is scanned
    once with no shuffle. Ties broken by neighbor id for determinism.
    Self-matches (same id) are excluded.
    """
    # norms are computed once per vector (not per pair): same arithmetic
    # as cosine(), just hoisted — dot/(na*nb) is bit-identical.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(vec_col).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(vec_col).alias("cn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    threshold: float = 0.98,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b) above a
    threshold. ``block_col`` bounds the quadratic blow-up (pairs are
    only formed inside a block — at scale use an LSH bucket instead of
    a semantic label)."""
    cols = [
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        norm(vec_col).alias("nrm"),
    ]
    if block_col:
        cols.append(F.col(block_col).alias("blk"))
    base = df.select(*cols)
    a, b = base.alias("a"), base.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    pairs = a.join(b, cond).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        (dot("a.v", "b.v") / (F.col("a.nrm") * F.col("b.nrm"))).alias("cos_sim"),
    )
    return pairs.filter(F.col("cos_sim") >= threshold)


def hyperplane_signs(vec_col: str, planes: int = 16, dim: int = 64) -> Column:
    """Random-hyperplane LSH bucket id: bit p = sign(Σ_i v[i]·w_pi)
    with deterministic pseudo-weights w_pi ∈ {-1, +1} derived from
    md5(p, i) — reproducible in any engine, no stored model."""
    h = "cast(conv(substring(md5(concat(cast(p as string), '_', cast(i as string))), 1, 8), 16, 10) as bigint)"
    return F.expr(
        f"aggregate(transform(sequence(0, {planes - 1}), p ->"
        f" if(aggregate(zip_with({vec_col}, sequence(0, {dim - 1}),"
        f"      (x, i) -> cast(x as double) * if({h} % 2 = 0, 1.0D, -1.0D)),"
        f"    0.0D, (acc, v) -> acc + v) >= 0.0D, shiftleft(1L, p), 0L)),"
        f" 0L, (acc, x) -> acc + x)"
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's hyperplane
    bucket are scored. Recall < 1 by design; the 100 TB path (bucket
    count scales with corpus size, probe multiple buckets for recall).
    """
    sig = hyperplane_signs(vec_col, planes, dim)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(vec_col).alias("qn"),
        sig.alias("bkt"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(vec_col).alias("cn"),
        sig.alias("bkt"),
    )
    scored = (
        c.join(F.broadcast(q), ["bkt"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
