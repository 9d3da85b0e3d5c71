"""Data SELECTION for LM training — DSIR importance weighting.

DSIR (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling"): score every raw-corpus document by how much
more likely its hashed n-gram features are under a TARGET-domain
bag-of-ngrams model than under the raw-corpus model, then resample
with probability ∝ the importance weight. It is the standard
scalable answer to "give me more documents that look like my target
domain" — the selection sibling of the dedup/quality/contamination
operators in this catalog.

Model per the paper: features are word-bigram hashes bucketed into B
buckets; each side (target p, raw q) is a unigram model over buckets
with add-1 smoothing; a document's log importance weight is
Σ_grams [ln p(bucket) − ln q(bucket)], counted with multiplicity.

Exactness strategy (the ``unigram_perplexity_scores`` precedent): the
per-BUCKET log ratio snaps to a 1e-6 integer grid BEFORE the per-doc
sum, so aggregation is exact BIGINT math and the engines agree
regardless of gram order. The resampling step derandomizes the
paper's Gumbel-top-k: g = −ln(−ln(u)) with u drawn from a keyed md5
bucket of the doc id (the Efraimidis–Spirakis derandomization used by
``weighted_sample_by_length``), also snapped to the 1e-6 grid, so the
selected set is deterministic across engines, runs and partitionings.

Scale shape (100 TB): both bucket-count model frames are B rows —
plan constants that BROADCAST to the scoring join; the corpus sees
one tokenize/explode pass and ONE partial-agg groupBy(doc_id). The
target slice is typically tiny (a benchmark/domain sample); its
count pass is proportional to the target, not the corpus. Gumbel
top-k is per-partition TopK + single merge — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipelinedemo_spark.memo import FrameMemo, table_stamp
from datapipelinedemo_spark.plans.catalog import register
from datapipelinedemo_spark.plans.corpus_ops import _TOKS, _grams_sql
from datapipelinedemo_spark.session import session_key
from datapipelinedemo_spark.tables import table

_B = 4096            # feature-hash buckets (paper uses 10^4-ish)
_N = 2               # word-bigram features
_TARGET_SOURCES = ("src0", "src1")  # the "domain we want more of"
_RESAMPLE_K = 100

# 60-bit md5 prefix → bucket, identical in both engines (the repo's
# standard cross-engine hash: conv/base-16 in Spark, '0x' cast in
# DuckDB — same value, see operators/dedup.py shingle hashing).
_BUCKET_SQL = (
    f"CAST('0x' || substring(md5(gram), 1, 15) AS BIGINT) % {_B}"
)


def _bucket_col(gram_col: str) -> F.Column:
    return F.expr(
        f"cast(conv(substring(md5({gram_col}), 1, 15), 16, 10)"
        f" as bigint) % {_B}"
    )


_TGT_PRED = "source IN ('" + "', '".join(_TARGET_SOURCES) + "')"

# CTE chain ending in ``lr`` = (bucket, lr6): the 1e-6-grid log ratio
# of the add-1-smoothed target/raw bucket models, and ``docg`` =
# (doc_id, bucket) per raw-doc gram occurrence.
_DSIR_CTE = f"""
    WITH tok AS (
        SELECT doc_id, {_TGT_PRED} AS is_tgt, {_TOKS} AS t FROM documents
    ),
    g AS (SELECT doc_id, is_tgt, unnest({_grams_sql(_N)}) AS gram FROM tok),
    gb AS (SELECT doc_id, is_tgt, {_BUCKET_SQL} AS bucket FROM g),
    cp AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS c FROM gb
           WHERE is_tgt GROUP BY 1),
    cq AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS c FROM gb
           WHERE NOT is_tgt GROUP BY 1),
    tot AS (
        SELECT (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM cp) AS np,
               (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM cq) AS nq
    ),
    lr AS (
        SELECT COALESCE(cp.bucket, cq.bucket) AS bucket,
               CAST(FLOOR((ln((COALESCE(cp.c, 0) + 1.0) / (tot.np + {_B}))
                           - ln((COALESCE(cq.c, 0) + 1.0) / (tot.nq + {_B})))
                          * 1e6 + 0.5) AS BIGINT) AS lr6
        FROM cp FULL JOIN cq ON cq.bucket = cp.bucket, tot
    ),
    docg AS (SELECT doc_id, bucket FROM gb WHERE NOT is_tgt)
"""


# The weight frame feeds BOTH catalog queries (weights listing and
# resampling); memoized persisted like the shared LSH candidate frame
# (_LSH_CAND_MEMO, plans/llm_ops.py) so a certification/bench round
# running both pays the corpus passes once.
_DSIR_W_MEMO = FrameMemo()


def _dsir_weight6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_grams, w6) for every raw (non-target) doc: the
    exact-integer 1e-6-grid log importance weight. Memo key carries
    the documents.parquet source stamp (memo.py) so a regenerated
    corpus rebuilds the weights instead of serving the old ones."""
    return _DSIR_W_MEMO.get_or_build(
        spark,
        (sf_dir, table_stamp(sf_dir, "documents")),
        lambda: _dsir_weight6_build(spark, sf_dir).persist(),
    )


def _dsir_weight6_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datapipelinedemo_spark.functions.text import tokenize
    from datapipelinedemo_spark.operators.decontamination import (
        ngrams_of_tokens,
    )

    docs = table(spark, sf_dir, "documents")
    # tokenize into a REAL column before ngrams_of_tokens — feeding
    # the tokenize expression in directly would be inlined into the
    # per-position gram lambda and re-tokenize each doc ~once per
    # gram (the documented anti-pattern on ngrams_of_tokens; the
    # decontamination callers use this same two-step shape)
    gb = (
        docs.select(
            "doc_id",
            F.col("source").isin(*_TARGET_SOURCES).alias("is_tgt"),
            tokenize("text").alias("__toks"),
        )
        .select(
            "doc_id",
            "is_tgt",
            F.explode(ngrams_of_tokens("__toks", _N)).alias("gram"),
        )
        .select("doc_id", "is_tgt", _bucket_col("gram").alias("bucket"))
    )
    # BOTH bucket models in ONE corpus pass (conditional partial-agg
    # counts), then pin the B-row result: it feeds three consumers
    # (the two totals and the log-ratio frame) and Catalyst has no
    # cross-branch subtree sharing — without the pin the full
    # tokenize/explode/md5 lineage would re-run per consumer.
    # B rows is corpus-INdependent, the sanctioned localCheckpoint
    # case (never pin corpus-sized frames).
    model = (
        gb.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("is_tgt"), 1).otherwise(0))
            .cast("long")
            .alias("cp"),
            F.sum(F.when(~F.col("is_tgt"), 1).otherwise(0))
            .cast("long")
            .alias("cq"),
        )
        .localCheckpoint(eager=False)
    )
    tot = model.agg(
        F.sum("cp").cast("long").alias("np"),
        F.sum("cq").cast("long").alias("nq"),
    )
    lr = model.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.floor(
            (
                F.log(
                    (F.col("cp") + F.lit(1.0))
                    / (F.col("np") + F.lit(float(_B)))
                )
                - F.log(
                    (F.col("cq") + F.lit(1.0))
                    / (F.col("nq") + F.lit(float(_B)))
                )
            )
            * 1e6
            + F.lit(0.5)
        )
        .cast("long")
        .alias("lr6"),
    )
    return (
        gb.filter("NOT is_tgt")
        .join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum("lr6").cast("long").alias("w6"),
        )
    )


@register(
    "dsir_importance_weights",
    oracle=_DSIR_CTE
    + """
    SELECT docg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           round(CAST(SUM(lr.lr6) AS DOUBLE) / 1e6, 6) AS log_weight
    FROM docg JOIN lr ON lr.bucket = docg.bucket
    GROUP BY 1
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR log importance weight per raw-corpus document (target
    domain = sources {src0, src1}): Σ over the doc's hashed word
    bigrams of the smoothed target/raw bucket log ratio. Positive →
    looks more like the target domain than the average raw doc.

    See the module docstring for the paper, the exact-integer grid
    strategy, and the broadcast-model scale shape.
    """
    w = _dsir_weight6(spark, sf_dir)
    return w.select(
        "doc_id",
        "n_grams",
        F.round(F.col("w6").cast("double") / 1e6, 6).alias("log_weight"),
    )


@register(
    "dsir_resample_topk",
    oracle=_DSIR_CTE
    + f"""
    , w AS (
        SELECT docg.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(lr.lr6) AS BIGINT) AS w6
        FROM docg JOIN lr ON lr.bucket = docg.bucket
        GROUP BY 1
    ),
    keyed AS (
        SELECT doc_id, n_grams,
               CAST(FLOOR(CAST(w6 AS DOUBLE) / n_grams) AS BIGINT)
               + CAST(FLOOR(-ln(-ln(
                     (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                          || '#dsir'), 1, 15) AS BIGINT) % 10000 + 1)
                     / 10001.0)) * 1e6 + 0.5) AS BIGINT) AS key6
        FROM w
    )
    SELECT doc_id, n_grams,
           round(CAST(key6 AS DOUBLE) / 1e6, 6) AS gumbel_key
    FROM keyed
    ORDER BY key6 DESC, doc_id
    LIMIT {_RESAMPLE_K}
    """,
)
def dsir_resample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resampling half of DSIR, derandomized: Gumbel-top-k over
    the per-gram-normalized importance weight. key = w̄ + g where w̄
    is the doc's mean bucket log ratio (integer floor on the 1e-6
    grid — length-fair, so long docs don't win on gram count alone)
    and g = −ln(−ln(u)) is Gumbel noise with u drawn from a keyed md5
    bucket of the doc id — sampling ∝ exp(w̄) in expectation, yet
    bit-deterministic (the ``weighted_sample_by_length``
    derandomization precedent). Exact BIGINT key compare; ties break
    on doc_id; top-k is per-partition TopK + one merge.
    """
    w = _dsir_weight6(spark, sf_dir)
    u = (
        F.expr(
            "cast(conv(substring(md5(concat(cast(doc_id as string),"
            " '#dsir')), 1, 15), 16, 10) as bigint) % 10000"
        )
        + 1
    ).cast("double") / 10001.0
    keyed = w.select(
        "doc_id",
        "n_grams",
        (
            F.floor(F.col("w6") / F.col("n_grams")).cast("long")
            + F.floor(-F.log(-F.log(u)) * 1e6 + F.lit(0.5)).cast("long")
        ).alias("key6"),
    )
    return (
        keyed.orderBy(F.desc("key6"), F.asc("doc_id"))
        .limit(_RESAMPLE_K)
        .select(
            "doc_id",
            "n_grams",
            F.round(F.col("key6").cast("double") / 1e6, 6).alias(
                "gumbel_key"
            ),
        )
    )


# --------------------------------------------------------------------------
# CCNet-style per-language perplexity buckets (Wenzek et al. 2020)
# --------------------------------------------------------------------------
# CCNet's quality split: score every document with an LM, then cut each
# LANGUAGE's distribution into head / middle / tail terciles — "head"
# is the lowest-perplexity (cleanest) third, the slice most pipelines
# keep for pre-training. Here the scorer is the corpus-trained unigram
# LM already used by unigram_perplexity_scores (per-term -ln p snapped
# to the 1e-6 grid, so per-doc sums are exact BIGINT and the mean is
# an exact FLOOR on the same grid — cross-engine total order with the
# doc_id tiebreak).

_CCNET_NLL_CTE = f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    tc AS (SELECT doc_id, unnest(t) AS term FROM tok),
    vocab AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM tc GROUP BY 1
    ),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM vocab),
    nll AS (
        SELECT term,
               CAST(FLOOR(-ln(CAST(c AS DOUBLE) / total) * 1e6 + 0.5)
                    AS BIGINT) AS nll6
        FROM vocab, n
    ),
    dnll AS (
        SELECT tc.doc_id,
               CAST(FLOOR(CAST(SUM(nll.nll6) AS DOUBLE) / COUNT(*))
                    AS BIGINT) AS mnll6
        FROM tc JOIN nll ON nll.term = tc.term
        GROUP BY 1
    )
"""


@register(
    "ccnet_perplexity_buckets",
    oracle=_CCNET_NLL_CTE
    + """
    SELECT d.lang, dnll.doc_id,
           round(CAST(dnll.mnll6 AS DOUBLE) / 1e6, 6) AS mean_nll,
           CASE NTILE(3) OVER (PARTITION BY d.lang
                               ORDER BY dnll.mnll6, dnll.doc_id)
                WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM dnll JOIN documents d ON d.doc_id = dnll.doc_id
    """,
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail terciles of unigram-LM mean NLL within
    each language — ``head`` = the cleanest (lowest-perplexity) third
    of that language's documents.

    Exactness: the per-doc mean NLL is an exact integer on the 1e-6
    grid (FLOOR of the exact BIGINT sum / count), and the tercile
    order is total (mnll6, doc_id), so NTILE agrees bit-for-bit
    across engines.

    Scale shape: the vocabulary scoring join is the
    ``unigram_perplexity_scores`` plan (one explode, one vocab join,
    one partial-agg groupBy). The tercile split here is window NTILE
    per language — exact, but a per-language sort whose parallelism
    is bounded by |languages|; at 100 TB CCNet itself cuts on
    QUANTILE THRESHOLDS, and that is the production path: compute
    per-lang tercile boundaries (``percentile_approx`` or an exact
    two-pass count/rank), broadcast the |langs|×2 threshold table,
    and assign each doc by comparison — no global sort, identical
    output up to threshold precision. The catalog pins the exact
    NTILE form because the oracle must be bit-deterministic.
    """
    from pyspark.sql import Window

    from datapipelinedemo_spark.functions.text import tokenize

    docs = table(spark, sf_dir, "documents")
    tc = docs.select("doc_id", F.explode(tokenize("text")).alias("term"))
    vocab = tc.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    n = vocab.agg(F.sum("c").alias("total"))
    nll = vocab.crossJoin(F.broadcast(n)).select(
        "term",
        F.floor(
            -F.log(F.col("c").cast("double") / F.col("total")) * 1e6
            + F.lit(0.5)
        )
        .cast("long")
        .alias("nll6"),
    )
    dnll = (
        tc.join(nll, "term")
        .groupBy("doc_id")
        .agg(
            F.floor(
                F.sum("nll6").cast("double") / F.count(F.lit(1))
            )
            .cast("long")
            .alias("mnll6")
        )
    )
    w = Window.partitionBy("lang").orderBy("mnll6", "doc_id")
    return (
        dnll.join(docs.select("doc_id", "lang"), "doc_id")
        .withColumn("__t", F.ntile(3).over(w))
        .select(
            "lang",
            "doc_id",
            F.round(F.col("mnll6").cast("double") / 1e6, 6).alias(
                "mean_nll"
            ),
            F.when(F.col("__t") == 1, "head")
            .when(F.col("__t") == 2, "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
    )


# --------------------------------------------------------------------------
# Hard-negative mining for retrieval training data
# --------------------------------------------------------------------------
# The standard contrastive-training data shape (DPR / Contriever /
# sentence-transformers): for each query example, the most similar
# corpus items that are NOT duplicates of it — similar enough to be
# hard, dissimilar enough to be true negatives. Operationally this is
# top-k cosine with the similarity capped BELOW the near-dup
# threshold, so the mined negatives compose exactly with
# embedding_neardup_pairs' dup definition: anything the dedup op
# would flag is excluded here by construction. The threshold
# (llm_ops.NEARDUP_TAU), the query set (llm_ops.TOPK_QUERY_MOD) and
# the scored CTE (llm_ops.topk_scored_cte) are SHARED definitions
# with the dedup and similarity_topk queries — duplicated literals
# would let the dup boundary or the query set silently drift while
# every query still passed its own oracle (round-7 review finding).
_HN_K = 5


def _hn_oracle() -> str:
    from datapipelinedemo_spark.plans.llm_ops import (
        NEARDUP_TAU,
        topk_scored_cte,
    )

    return (
        topk_scored_cte()
        + f"""
    SELECT query_id, neighbor_id, round(cs, 6) AS cos_sim,
           CAST(rnk AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cs DESC, neighbor_id) AS rnk
          FROM scored WHERE cs < {NEARDUP_TAU})
    WHERE rnk <= {_HN_K}
    """
    )


@register("hard_negative_mining", oracle=_hn_oracle())
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 hard negatives per query vector (every 50th vec_id, the
    similarity_topk query set): exact cosine ranking restricted to
    cos < 0.3 — nearest NON-duplicate neighbors.

    Plan shape = ``cosine_topk_bruteforce`` with the ``max_sim`` cap:
    queries broadcast, corpus scanned once, per-partition TopK; the
    cap is a scan-side filter, so at 100 TB the ranked set shrinks
    BEFORE the TopK state, and the LSH/IVF corpus indexes remain the
    drop-in scale path (same operator contract as similarity_topk_*).
    """
    from datapipelinedemo_spark.operators import similarity as SIM
    from datapipelinedemo_spark.plans.llm_ops import (
        NEARDUP_TAU,
        TOPK_QUERY_MOD,
    )

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % TOPK_QUERY_MOD == 0)
    topk = SIM.cosine_topk_bruteforce(
        emb, queries, "vec_id", "embedding", k=_HN_K, max_sim=NEARDUP_TAU
    )
    return topk.select(
        "query_id",
        "neighbor_id",
        F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("long").alias("rank"),
    )
