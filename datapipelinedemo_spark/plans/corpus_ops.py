"""Corpus-analytics batch 2: decontamination, TF-IDF keyword
extraction, and behavioral analytics (weekly cohort retention, a
time-bounded conversion funnel).

Same conventions as plans/llm_ops.py: every query is a pure
DataFrame/Catalyst expression plan with a DuckDB oracle twin;
doubles that cross an aggregation go through the fixed-point grid
(functions/stable.py) or are presentation-rounded (round6) when the
value is genuinely continuous.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from datapipelinedemo_spark.pin import pin

from datapipelinedemo_spark.functions.stable import round6
from datapipelinedemo_spark.memo import FrameMemo, table_stamp
from datapipelinedemo_spark.operators.decontamination import (
    contamination_counts,
)
from datapipelinedemo_spark.plans.catalog import register
from datapipelinedemo_spark.tables import table

# Tokenizer twin of functions.text.tokenize for DuckDB oracles.
_TOKS = r"list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')"


def _grams_sql(n: int) -> str:
    """DuckDB twin of operators.decontamination.word_ngrams."""
    return f"""
        CASE WHEN len(t) >= {n}
             THEN list_transform(generate_series(1, len(t) - {n - 1}),
                                 i -> array_to_string(t[i:i+{n - 1}], ' '))
             ELSE [] END
    """


# --------------------------------------------------------------------------
# Benchmark decontamination (word n-gram overlap with an eval split)
# --------------------------------------------------------------------------
# The eval "benchmark" is a deterministic 2% slice of the corpus
# (doc_id % 50 = 0) — stand-in for a real benchmark table. n=4 at test
# scale so the synthetic word-soup corpus produces a non-trivial
# overlap set; production text uses the customary n=13 (the operator
# is parameterized, the plan identical).
@register(
    "decontamination_overlap",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    g AS (SELECT doc_id, {_grams_sql(4)} AS gs FROM tok),
    eg AS (SELECT DISTINCT unnest(gs) AS gram FROM g WHERE doc_id % 50 = 0),
    tg AS (SELECT doc_id, unnest(list_distinct(gs)) AS gram
           FROM g WHERE doc_id % 50 <> 0)
    SELECT tg.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_grams
    FROM tg JOIN eg USING (gram)
    GROUP BY 1
    """,
)
def decontamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs sharing ≥1 word 4-gram with the eval slice.

    The eval gram set is broadcast; the corpus side's only shuffle is
    the final per-doc count (map-side partial first). See
    operators/decontamination.py for the 100 TB shape discussion.
    """
    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    return contamination_counts(train, bench, "doc_id", "text", n=4)


# --------------------------------------------------------------------------
# Bloom-filter decontamination (membership without any corpus shuffle)
# --------------------------------------------------------------------------
_BLOOM_M = 1 << 16
_BLOOM_WORDS_MEMO: dict[tuple, list[int]] = {}


def _bloom_pos_sql(src: str, col: str, sub_from: int) -> str:
    return (
        f"SELECT CAST('0x' || substring(md5({col}), {sub_from}, 15)"
        f" AS BIGINT) % {_BLOOM_M} AS p FROM {src}"
    )


# CTE chain ending in ``hit`` = one row per (train doc, member gram);
# shared by the bloom_decontamination oracle and the composed
# training_corpus_pipeline_v2 oracle (plans/dedup_ext.py).
_BLOOM_CORE = f"""
    tok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    g AS (SELECT doc_id, {_grams_sql(4)} AS gs FROM tok),
    eg AS (SELECT DISTINCT unnest(gs) AS gram FROM g WHERE doc_id % 50 = 0),
    ep AS (
        SELECT DISTINCT p FROM (
            {_bloom_pos_sql('eg', 'gram', 1)}
            UNION ALL
            {_bloom_pos_sql('eg', 'gram', 17)}
        )
    ),
    w AS (
        SELECT p // 32 AS wi,
               bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS wv
        FROM ep GROUP BY 1
    ),
    tg AS (SELECT doc_id, unnest(list_distinct(gs)) AS gram
           FROM g WHERE doc_id % 50 <> 0),
    tp AS (
        SELECT doc_id,
               CAST('0x' || substring(h, 1, 15) AS BIGINT)
                   % {_BLOOM_M} AS p1,
               CAST('0x' || substring(h, 17, 15) AS BIGINT)
                   % {_BLOOM_M} AS p2
        FROM (SELECT doc_id, md5(gram) AS h FROM tg)
    ),
    hit AS (
        SELECT doc_id FROM tp
        JOIN w w1 ON w1.wi = p1 // 32
        JOIN w w2 ON w2.wi = p2 // 32
        WHERE ((w1.wv >> CAST(p1 % 32 AS INT)) & 1) = 1
          AND ((w2.wv >> CAST(p2 % 32 AS INT)) & 1) = 1
    )"""


@register(
    "bloom_decontamination",
    oracle="WITH "
    + _BLOOM_CORE
    + """
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS bloom_hits
    FROM hit GROUP BY 1
    """,
)
def bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`decontamination_overlap` with the benchmark side folded into a
    deterministic 65536-bit Bloom filter (2 md5-derived hashes): the
    corpus side has ZERO shuffles — membership is an in-row
    expression against a constant-folded bitmap literal, so at 100 TB
    every training partition is scanned exactly once with no
    exchange, however large the benchmark gram set grows. The oracle
    rebuilds the identical bitmap relationally, so the hash compare
    covers false positives too (same bits -> same member set in both
    engines). See ``operators.decontamination.bloom_contamination_counts``
    for sizing and the bloom-then-exact-verify pattern.
    """
    from datapipelinedemo_spark.operators.decontamination import (
        bloom_contamination_counts,
    )

    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    words = _bloom_bitmap(spark, sf_dir)
    return bloom_contamination_counts(
        train, bench, "doc_id", "text", n=4, m_bits=_BLOOM_M, words=words
    )


@register(
    "ngram_novelty_rate",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    g AS (SELECT doc_id, {_grams_sql(4)} AS gs FROM tok),
    eg AS (
        SELECT gram,
               MAX(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) AS in_b,
               MAX(CASE WHEN doc_id % 10 <> 0 THEN 1 ELSE 0 END) AS in_c
        FROM (SELECT doc_id, unnest(list_distinct(gs)) AS gram FROM g) x
        GROUP BY 1
    )
    SELECT CAST(SUM(in_b) AS BIGINT) AS n_batch_grams,
           CAST(SUM(in_c) AS BIGINT) AS n_corpus_grams,
           CAST(SUM(CASE WHEN in_b = 1 AND in_c = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_novel_grams,
           round(CAST(SUM(CASE WHEN in_b = 1 AND in_c = 0
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(in_b) AS DOUBLE), 6) AS novelty_rate
    FROM eg
    """,
)
def ngram_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOVELTY of an arriving crawl batch (``doc_id % 10 == 0``)
    against the existing corpus: the fraction of the batch's distinct
    word 4-grams never seen before — the number a data-acquisition
    loop watches to decide whether another crawl of the same sources
    still buys new training mass (near-zero novelty = stop crawling,
    start deduplicating).

    Plan shape: ONE pass — every (gram, side) membership collapses in
    a single partial-agg groupBy on the gram (max() combines
    map-side), then a single-row aggregate; no anti-join, no second
    derivation of the gram explode's lineage, nothing broadcast. The
    same counts a two-sided distinct + left_anti plan needs two
    corpus-sized builds for."""
    from datapipelinedemo_spark.operators.decontamination import (
        ngrams_of_tokens,
    )
    from datapipelinedemo_spark.functions.text import tokenize

    docs = table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", tokenize("text").alias("__toks")
    ).select(
        (F.col("doc_id") % 10 == 0).cast("int").alias("is_b"),
        F.explode(F.array_distinct(ngrams_of_tokens("__toks", 4))).alias(
            "gram"
        ),
    )
    eg = grams.groupBy("gram").agg(
        F.max("is_b").alias("in_b"),
        F.max(1 - F.col("is_b")).alias("in_c"),
    )
    novel = (F.col("in_b") == 1) & (F.col("in_c") == 0)
    return eg.agg(
        F.sum("in_b").cast("long").alias("n_batch_grams"),
        F.sum("in_c").cast("long").alias("n_corpus_grams"),
        F.sum(F.when(novel, 1).otherwise(0)).cast("long").alias(
            "n_novel_grams"
        ),
        F.round(
            F.sum(F.when(novel, 1).otherwise(0)).cast("double")
            / F.sum("in_b").cast("double"),
            6,
        ).alias("novelty_rate"),
    )


def _bloom_bitmap(spark: SparkSession, sf_dir: str) -> list[int]:
    """The benchmark Bloom bitmap for ``sf_dir`` — a deterministic
    plan constant per (corpus generation, n, m), memoized like the
    pivot labels / corpus counts so repeated calls skip the two
    benchmark-side build jobs. The key carries the source file's
    (mtime_ns, size) like the on-disk index tags, so a regenerated
    corpus in a long-lived process rebuilds instead of serving a
    stale bitmap."""
    from datapipelinedemo_spark.operators.decontamination import bloom_words

    src = os.stat(os.path.join(sf_dir, "documents.parquet"))
    key = (sf_dir, src.st_mtime_ns, src.st_size, 4, _BLOOM_M)
    words = _BLOOM_WORDS_MEMO.get(key)
    if words is None:
        bench = table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 50 == 0
        )
        words = bloom_words(bench, "text", 4, _BLOOM_M)
        _BLOOM_WORDS_MEMO[key] = words
    return words


@register(
    "bloom_fpr_calibration",
    oracle="WITH "
    + _BLOOM_CORE
    + f"""
    , tpg AS (
        SELECT doc_id, gram,
               CAST('0x' || substring(md5(gram), 1, 15) AS BIGINT)
                   % {_BLOOM_M} AS p1,
               CAST('0x' || substring(md5(gram), 17, 15) AS BIGINT)
                   % {_BLOOM_M} AS p2
        FROM tg
    ),
    pr AS (
        SELECT t.doc_id, t.gram,
               CASE WHEN ((w1.wv >> CAST(t.p1 % 32 AS INT)) & 1) = 1
                     AND ((w2.wv >> CAST(t.p2 % 32 AS INT)) & 1) = 1
                    THEN 1 ELSE 0 END AS bloom_hit
        FROM tpg t
        LEFT JOIN w w1 ON w1.wi = t.p1 // 32
        LEFT JOIN w w2 ON w2.wi = t.p2 // 32
    ),
    tr AS (
        SELECT pr.doc_id, pr.bloom_hit,
               CASE WHEN eg.gram IS NOT NULL THEN 1 ELSE 0 END AS member
        FROM pr LEFT JOIN eg ON eg.gram = pr.gram
    ),
    bc AS (SELECT CAST(SUM(bit_count(wv)) AS BIGINT) AS bits_set FROM w)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM eg) AS n_eval_grams,
           (SELECT bits_set FROM bc) AS bits_set,
           round(CAST((SELECT bits_set FROM bc) AS DOUBLE)
                 / {_BLOOM_M}, 6) AS fill_ratio,
           CAST(COUNT(*) AS BIGINT) AS probes,
           CAST(SUM(bloom_hit) AS BIGINT) AS bloom_hits,
           CAST(SUM(member) AS BIGINT) AS true_hits,
           CAST(SUM(bloom_hit) - SUM(member) AS BIGINT)
               AS false_positives,
           round(CAST(SUM(bloom_hit) - SUM(member) AS DOUBLE)
                 / (COUNT(*) - SUM(member)), 6) AS measured_fpr,
           round(CAST((SELECT bits_set FROM bc)
                      * (SELECT bits_set FROM bc) AS DOUBLE)
                 / {_BLOOM_M * _BLOOM_M}, 6) AS predicted_fpr
    FROM tr
    """,
)
def bloom_fpr_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FALSE-POSITIVE calibration for the Bloom decontamination gate:
    every (train doc, distinct gram) probe is scored by BOTH the
    bitmap and exact membership, yielding the measured FPR on
    true-negative probes next to the k=2 independence prediction
    (fill_ratio²) — the table that says whether the 65536-bit sizing
    is honest before anyone trusts `bloom_hits` as a screen (the
    bloom-then-exact-verify pattern, measured instead of assumed).

    Exactness: every count is an exact BIGINT; the three ratios are
    ONE division (or one multiply + division by a power of two) of
    exactly-representable integers, mirrored in both engines — the
    bitmap popcount is the same constant on both sides because the
    bitmap build is deterministic (md5-derived positions).

    Plan shape: the corpus side probes the bitmap in-row (zero
    corpus shuffles, the certified bloom path) and LEFT-joins the
    broadcast eval gram set for ground truth — the exact-verify join
    this calibration exists to justify skipping; one single-row
    aggregate ends the plan. Bloom has no false negatives, so
    ``member = 1 ⇒ bloom_hit = 1`` and false_positives is a plain
    difference."""
    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    words = _bloom_bitmap(spark, sf_dir)
    bits_set = sum(bin(w & 0xFFFFFFFF).count("1") for w in words)

    from datapipelinedemo_spark.operators.decontamination import (
        ngrams_of_tokens,
    )
    from datapipelinedemo_spark.functions.text import tokenize

    bench_grams = (
        bench.select(tokenize("text").alias("__toks"))
        .select(F.explode(ngrams_of_tokens("__toks", 4)).alias("gram"))
        .distinct()
    )
    tg = train.select(
        "doc_id", tokenize("text").alias("__toks")
    ).select(
        "doc_id",
        F.explode(F.array_distinct(ngrams_of_tokens("__toks", 4))).alias(
            "gram"
        ),
    )
    wlit = "array(" + ",".join(f"{w}L" for w in words) + ")"
    probe = (
        "(shiftright(element_at(__W, cast(__p{i} div 32 as int) + 1),"
        " cast(__p{i} % 32 as int)) & 1) = 1"
    )
    pr = (
        tg.select("doc_id", "gram", F.expr("md5(gram)").alias("__h"))
        .select(
            "doc_id",
            "gram",
            F.expr(
                f"cast(conv(substring(__h, 1, 15), 16, 10) as bigint)"
                f" % {_BLOOM_M}"
            ).alias("__p1"),
            F.expr(
                f"cast(conv(substring(__h, 17, 15), 16, 10) as bigint)"
                f" % {_BLOOM_M}"
            ).alias("__p2"),
        )
        .withColumn("__W", F.expr(wlit))
        .select(
            "doc_id",
            "gram",
            F.when(
                F.expr(f"{probe.format(i=1)} and {probe.format(i=2)}"), 1
            )
            .otherwise(0)
            .alias("bloom_hit"),
        )
    )
    tr = pr.join(
        F.broadcast(bench_grams.withColumn("__m", F.lit(1))),
        "gram",
        "left",
    ).select(
        "bloom_hit",
        F.when(F.col("__m").isNotNull(), 1).otherwise(0).alias("member"),
    )
    n_eval = bench_grams.agg(
        F.count(F.lit(1)).cast("long").alias("n_eval_grams")
    )
    agg = tr.agg(
        F.count(F.lit(1)).cast("long").alias("probes"),
        F.sum("bloom_hit").cast("long").alias("bloom_hits"),
        F.sum("member").cast("long").alias("true_hits"),
    )
    return (
        agg.crossJoin(F.broadcast(n_eval))
        .select(
            "n_eval_grams",
            F.lit(bits_set).cast("long").alias("bits_set"),
            F.expr(
                f"round(cast({bits_set}L as double) / {_BLOOM_M}, 6)"
            ).alias("fill_ratio"),
            "probes",
            "bloom_hits",
            "true_hits",
            (F.col("bloom_hits") - F.col("true_hits"))
            .cast("long")
            .alias("false_positives"),
            F.round(
                (F.col("bloom_hits") - F.col("true_hits")).cast("double")
                / (F.col("probes") - F.col("true_hits")),
                6,
            ).alias("measured_fpr"),
            F.expr(
                f"round(cast({bits_set}L * {bits_set}L as double)"
                f" / {_BLOOM_M * _BLOOM_M}, 6)"
            ).alias("predicted_fpr"),
        )
    )


# --------------------------------------------------------------------------
# TF-IDF keyword extraction: top-3 terms per document
# --------------------------------------------------------------------------
@register(
    "tfidf_top_terms",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    tc AS (
        SELECT doc_id, unnest(t) AS term FROM tok
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tc GROUP BY 1, 2
    ),
    df AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
        SELECT doc_id, tf.term AS term,
               tf * (ln((1.0 + n_docs) / (1.0 + df)) + 1.0) AS tfidf,
               ROW_NUMBER() OVER (
                   PARTITION BY doc_id
                   ORDER BY tf * (ln((1.0 + n_docs) / (1.0 + df)) + 1.0)
                            DESC, tf.term) AS rank
        FROM tf, df AS d, n
        WHERE tf.term = d.term
    )
    SELECT doc_id, term, round(tfidf, 6) AS tfidf, CAST(rank AS BIGINT) AS rank
    FROM scored WHERE rank <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 terms per document by smoothed TF-IDF (sklearn's
    ``ln((1+N)/(1+df)) + 1`` idf).

    Plan: one explode + two partial-agg groupBys (term counts, then
    document frequency), the global N as a 1-row broadcast cross join,
    and a per-doc window top-k. The df table is small (vocabulary
    sized) → broadcast back onto term counts; the corpus-side shuffles
    are keyed on (doc_id, term) and doc_id only. The raw double score
    orders the window (cross-engine ulp noise can't flip an order
    unless two DISTINCT products land within ~1e-15 relative — ties
    that matter are exact-equal and broken by term); round6 is
    presentation-only.
    """
    docs = table(spark, sf_dir, "documents")
    from datapipelinedemo_spark.functions.text import tokenize

    tc = docs.select(
        "doc_id", F.explode(tokenize("text")).alias("term")
    )
    tf = tc.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (
                F.log(
                    (1.0 + F.col("n_docs")) / (1.0 + F.col("df"))
                )
                + F.lit(1.0)
            ),
        )
        .withColumn(
            "rank",
            F.row_number()
            .over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("tfidf").desc(), F.col("term")
                )
            )
            .cast("long"),
        )
    )
    return scored.filter(F.col("rank") <= 3).select(
        "doc_id", "term", round6("tfidf", "tfidf"), "rank"
    )


# --------------------------------------------------------------------------
# Weekly cohort retention over the events stream
# --------------------------------------------------------------------------
@register(
    "cohort_retention_weekly",
    oracle="""
    WITH e AS (
        SELECT user_id, date_trunc('week', ts) AS w,
               MIN(date_trunc('week', ts)) OVER (PARTITION BY user_id)
                   AS cohort_w
        FROM events
    )
    SELECT strftime(cohort_w, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', cohort_w, w) / 7 AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM e
    GROUP BY 1, 2
    """,
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort matrix: users grouped by first-seen week, counted
    in each subsequent week they were active.

    The per-user first week is a window MIN keyed on user_id (one
    shuffle); the cohort count is a distinct-agg on the (cohort,
    offset) pair. Both Mondays are exact week-truncations so the /7 is
    exact integer math. At 100× the user-window shuffle is the natural
    partitioning; no driver-side state.
    """
    ev = table(spark, sf_dir, "events")
    w = F.date_trunc("week", F.col("ts"))
    e = ev.select(
        "user_id",
        w.alias("w"),
        F.min(w).over(Window.partitionBy("user_id")).alias("cohort_w"),
    )
    return (
        e.groupBy(
            F.date_format("cohort_w", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("w", "cohort_w") / 7).cast("long").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# --------------------------------------------------------------------------
# Time-bounded conversion funnel: view → click → purchase within 1 h
# --------------------------------------------------------------------------
@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
        SELECT e.user_id, MIN(ts) AS t2
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE event_type = 'click'
          AND ts > t1 AND ts <= t1 + INTERVAL 1 HOUR
        GROUP BY 1
    ),
    p AS (
        SELECT e.user_id, MIN(ts) AS t3
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE event_type = 'purchase'
          AND ts > t2 AND ts <= t2 + INTERVAL 1 HOUR
        GROUP BY 1
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_view_click,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_full_funnel
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-sequence funnel with a 1-hour conversion window per step:
    first view, then first click within an hour of it, then a purchase
    within an hour of that.

    Three conditional-min aggregations, each keyed on user_id — AQE
    reuses the partitioning across the chain, so at scale this is one
    logical repartition of the event stream by user. The final counts
    are 1-row aggregates cross-joined (no collect).
    """
    ev = table(spark, sf_dir, "events")
    # stage frames are per-user minima (one row per funnel survivor);
    # pinned because each feeds BOTH the next stage and the final
    # report join, and Catalyst would re-derive the whole prefix per
    # consumer (no cross-branch subtree sharing)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .transform(pin)  # narrow-pin: 16 B/row (user_id, min ts)
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .transform(pin)  # narrow-pin: 16 B/row (user_id, min ts)
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    # one left-join chain instead of three independent count jobs —
    # with v/c pinned above, each funnel stage is computed once
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count("t1").cast("long").alias("n_view"),
            F.count("t2").cast("long").alias("n_view_click"),
            F.count("t3").cast("long").alias("n_full_funnel"),
        )
    )


# --------------------------------------------------------------------------
# Domain mixing: sample the corpus to TARGET domain proportions
# --------------------------------------------------------------------------
# Three synthetic "domains" partition the 20 sources; targets are
# 60/30/10 over a 200-row budget. web is under-represented relative
# to its target → rate caps at keep-all; code is over-represented →
# heavy downsample. All threshold math is exact integer arithmetic.
_MIX_CASE = """
    CASE WHEN source IN ('src0', 'src1', 'src2', 'src3') THEN 'web'
         WHEN source IN ('src4', 'src5', 'src6', 'src7', 'src8', 'src9')
              THEN 'books'
         ELSE 'code' END
"""


@register(
    "domain_mix_sample",
    oracle=f"""
    WITH lab AS (
        SELECT doc_id, {_MIX_CASE} AS mix_group FROM documents
    ),
    cnt AS (
        SELECT mix_group, CAST(COUNT(*) AS BIGINT) AS n
        FROM lab GROUP BY 1
    ),
    wts AS (
        SELECT * FROM (VALUES ('web', 6000), ('books', 3000),
                              ('code', 1000)) AS v(mix_group, bp)
    ),
    thr AS (
        SELECT cnt.mix_group,
               LEAST(10000, ((200 * bp) // 10000) * 10000 // n) AS t
        FROM cnt JOIN wts USING (mix_group)
    )
    SELECT doc_id, lab.mix_group AS mix_group
    FROM lab JOIN thr ON lab.mix_group = thr.mix_group
    WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '#mix0'),
               1, 15) AS BIGINT) % 10000 < t
    """,
)
def domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix the corpus to target web/books/code proportions (60/30/10
    of a 200-doc budget) with data-driven deterministic rates — see
    ``operators.sampling.target_mix_sample`` for the threshold math
    and the 100 TB plan shape (broadcast thresholds, narrow filter).
    """
    from datapipelinedemo_spark.operators.sampling import target_mix_sample

    docs = table(spark, sf_dir, "documents").withColumn(
        "mix_group",
        F.when(
            F.col("source").isin("src0", "src1", "src2", "src3"), "web"
        )
        .when(
            F.col("source").isin(
                "src4", "src5", "src6", "src7", "src8", "src9"
            ),
            "books",
        )
        .otherwise("code"),
    )
    return target_mix_sample(
        docs, "doc_id", "mix_group", {"web": 6000, "books": 3000, "code": 1000},
        budget=200,
    ).select("doc_id", "mix_group")


# --------------------------------------------------------------------------
# Deterministic train/val/test split (the corpus-build final step)
# --------------------------------------------------------------------------
@register(
    "train_val_test_split",
    oracle="""
    WITH b AS (
        SELECT source,
               CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '#split0'),
                    1, 15) AS BIGINT) % 10000 AS bucket
        FROM documents
    )
    SELECT source,
           CASE WHEN bucket < 9000 THEN 'train'
                WHEN bucket < 9500 THEN 'val'
                ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM b GROUP BY 1, 2
    """,
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 split assignment keyed on the document id hash — stable
    across runs, partitionings, engines, and CORPUS GROWTH (a doc's
    split never changes when new docs arrive, unlike rand() or
    row_number splits). Per-source counts audit stratification drift.
    The assignment itself is a narrow expression; this query is the
    audit aggregate over it.
    """
    from datapipelinedemo_spark.operators.sampling import DENOM, _bucket

    docs = table(spark, sf_dir, "documents")
    bucket = _bucket(F.col("doc_id"), "split0")
    split = (
        F.when(bucket < int(0.90 * DENOM), "train")
        .when(bucket < int(0.95 * DENOM), "val")
        .otherwise("test")
    )
    return (
        docs.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


# --------------------------------------------------------------------------
# Exact-k per stratum (deterministic "reservoir"): eval-set builder
# --------------------------------------------------------------------------
@register(
    "exact_k_per_language",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY CAST('0x' || substring(
                       md5(CAST(doc_id AS VARCHAR) || '#k0'), 1, 15)
                       AS BIGINT), doc_id) AS rn
        FROM documents
    )
    SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= 20
    """,
)
def exact_k_per_language(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY k=20 docs per language (or all, for smaller strata) —
    rate-based sampling can't hit exact counts; ordering each stratum
    by a keyed hash and keeping row_number ≤ k is the deterministic
    reservoir equivalent. One shuffle on the stratum key; at 100 TB
    replace the full sort with a per-partition top-k (the window's
    rank filter already lets Spark push a WindowGroupLimit).
    """
    from datapipelinedemo_spark.functions.stable import md5_long

    docs = table(spark, sf_dir, "documents")
    h = md5_long(F.concat(F.col("doc_id").cast("string"), F.lit("#k0")))
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    return (
        docs.select(
            "doc_id",
            "lang",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 20)
    )


# --------------------------------------------------------------------------
# Embedding hygiene report (run before any index build)
# --------------------------------------------------------------------------
@register(
    "embedding_hygiene_report",
    oracle="""
    WITH v AS (
        SELECT vec_id, CAST(len(embedding) AS BIGINT) AS d,
               list_reduce(list_prepend(0.0::DOUBLE,
                 [CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                  for x in embedding]), (a, b) -> a + b) AS ss
        FROM embeddings
    ),
    n AS (
        SELECT d, ss,
               CAST(FLOOR(sqrt(ss) * 1000000 + 0.5) AS BIGINT) AS norm6
        FROM v
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(MIN(d) AS BIGINT) AS min_dim,
           CAST(MAX(d) AS BIGINT) AS max_dim,
           CAST(SUM(CASE WHEN ss = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS zero_vectors,
           round(CAST(SUM(norm6) AS DOUBLE)
                 / (1000000.0 * COUNT(*)), 6) AS mean_norm,
           round(CAST(MIN(norm6) AS DOUBLE) / 1000000.0, 6) AS min_norm,
           round(CAST(MAX(norm6) AS DOUBLE) / 1000000.0, 6) AS max_norm
    FROM n
    """,
)
def embedding_hygiene_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-index sanity row for the embedding column: dimension
    consistency (min_dim = max_dim or every downstream dot product is
    wrong), zero vectors (cosine is undefined on them — they must be
    dropped or the ANN serving path divides by zero), and the norm
    distribution (un-normalized corpora make inner-product and cosine
    ranking disagree; this row is how that's caught before an index
    is built on the wrong metric).

    Exactness: sum-of-squares is the certified left-fold idiom
    (identical order both engines), each norm snaps to the 1e-6 grid
    through ONE mirrored sqrt/floor expression, and all aggregates
    are exact BIGINTs with single-division readouts. One in-row
    projection + one single-row aggregate — no shuffle of vectors."""
    emb = table(spark, sf_dir, "embeddings")
    v = emb.select(
        F.size("embedding").cast("long").alias("d"),
        F.expr(
            "aggregate(embedding, cast(0.0 as double),"
            " (acc, x) -> acc + cast(x as double) * cast(x as double))"
        ).alias("ss"),
    ).select(
        "d",
        "ss",
        F.expr(
            "cast(floor(sqrt(ss) * 1000000 + 0.5) as bigint)"
        ).alias("norm6"),
    )
    n = F.count(F.lit(1))
    return v.agg(
        n.cast("long").alias("n_vecs"),
        F.min("d").cast("long").alias("min_dim"),
        F.max("d").cast("long").alias("max_dim"),
        F.sum(F.when(F.col("ss") == 0, 1).otherwise(0))
        .cast("long")
        .alias("zero_vectors"),
        F.round(
            F.sum("norm6").cast("double") / (1e6 * n), 6
        ).alias("mean_norm"),
        F.round(F.min("norm6").cast("double") / 1e6, 6).alias("min_norm"),
        F.round(F.max("norm6").cast("double") / 1e6, 6).alias("max_norm"),
    )


# --------------------------------------------------------------------------
# Embedding int8 quantization (vector-store compression)
# --------------------------------------------------------------------------
@register(
    "embedding_int8_quantize",
    oracle="""
    WITH ex AS (
        SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ),
    st AS (
        SELECT i, MIN(CAST(x AS DOUBLE)) AS mn, MAX(CAST(x AS DOUBLE)) AS mx
        FROM ex GROUP BY 1
    ),
    q AS (
        SELECT vec_id, i,
               CASE WHEN mx > mn
                    THEN CAST(FLOOR((CAST(x AS DOUBLE) - mn)
                                    / ((mx - mn) / 255.0) + 0.5) AS BIGINT)
                    ELSE 0 END AS qv,
               mn, (mx - mn) / 255.0 AS sc, CAST(x AS DOUBLE) AS xd
        FROM ex JOIN st USING (i)
    )
    SELECT vec_id,
           array_to_string(list(qv ORDER BY i), ',') AS q_csv,
           round(MAX(ABS(xd - (mn + qv * sc))), 6) AS max_err
    FROM q GROUP BY vec_id
    """,
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension min/max (asymmetric) uint8 quantization of the
    embedding column — the standard 4× storage compression before a
    vector index. Returns the quantized codes and each vector's max
    reconstruction error.

    The d-entry per-dimension stats stay JVM-side as a 1-row frame of
    two d-length arrays, BROADCAST to the quantize pass (a broadcast
    nested-loop join of one row — no corpus shuffle). The historic
    form collected them and re-emitted ``F.array(*[F.lit(...)])`` —
    at d=4096 that is an 8k-literal expression tree per query, pure
    plan-size/codegen bloat (VERDICT r7 "What's wrong" #2); the
    explain audit now asserts no dim-proportional literals survive.
    Stats and codes are exact across engines: float32 inputs widen
    exactly to double, min/max are order-free, and the affine code is
    identical IEEE ops with floor(+0.5) rounding.
    """
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
    q = F.expr(
        f"""
        transform(arrays_zip(embedding, sequence(1, size(embedding))), z ->
          CASE WHEN element_at(__scs, int(z['1'])) > 0d
               THEN cast(floor((cast(z.embedding as double)
                                - element_at(__mns, int(z['1'])))
                               / element_at(__scs, int(z['1'])) + 0.5d)
                    as bigint)
               ELSE 0L END)
        """
    )
    with_q = emb.crossJoin(F.broadcast(stats_row)).withColumn("__q", q)
    err = F.expr(
        """
        aggregate(
          arrays_zip(embedding, __q, sequence(1, size(embedding))),
          0d,
          (acc, z) -> greatest(acc,
            abs(cast(z.embedding as double)
                - (element_at(__mns, int(z['2']))
                   + z.__q * element_at(__scs, int(z['2']))))))
        """
    )
    return with_q.select(
        "vec_id",
        F.array_join(F.col("__q"), ",").alias("q_csv"),
        F.round(err, 6).alias("max_err"),
    )


# --------------------------------------------------------------------------
# Clean-corpus accounting after decontamination (composed)
# --------------------------------------------------------------------------
@register(
    "clean_corpus_after_decontamination",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    g AS (SELECT doc_id, {_grams_sql(4)} AS gs FROM tok),
    eg AS (SELECT DISTINCT unnest(gs) AS gram FROM g WHERE doc_id % 50 = 0),
    tg AS (SELECT doc_id, unnest(list_distinct(gs)) AS gram
           FROM g WHERE doc_id % 50 <> 0),
    bad AS (SELECT DISTINCT tg.doc_id FROM tg JOIN eg USING (gram))
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs_clean,
           CAST(SUM(d.n_chars) AS BIGINT) AS chars_clean
    FROM documents d
    LEFT JOIN bad ON d.doc_id = bad.doc_id
    WHERE d.doc_id % 50 <> 0 AND bad.doc_id IS NULL
    GROUP BY 1
    """,
)
def clean_corpus_after_decontamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The decontamination flags applied: contaminated docs anti-joined
    out of the training split, clean per-source volumes reported — the
    composition a corpus build actually ships. The flag set is a
    corpus-FRACTION (however small the rate, it grows with the
    corpus), so no broadcast hint: a plain shuffle anti-join that AQE
    demotes to broadcast only when the flag set is measured small at
    runtime (r16 — the r15 ``F.broadcast(bad)`` hint was the exact
    distinct-on-id shape the tightened gate now flags).
    """
    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    bad = contamination_counts(train, bench, "doc_id", "text", n=4).select(
        "doc_id"
    )
    return (
        train.join(bad, "doc_id", "left_anti")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs_clean"),
            F.sum("n_chars").cast("long").alias("chars_clean"),
        )
    )


# --------------------------------------------------------------------------
# Last-touch attribution: purchases credited to the latest prior view
# --------------------------------------------------------------------------
@register(
    "last_touch_attribution",
    oracle="""
    WITH v AS (
        SELECT user_id, MAX(event_id) AS view_event, ts AS view_ts
        FROM events WHERE event_type = 'view'
        GROUP BY user_id, ts
    ),
    p AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE event_type = 'purchase'
    )
    SELECT p.event_id AS purchase_id,
           v.view_event AS attributed_view,
           strftime(v.view_ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
           CAST(FLOOR(p.value * 1e4 + 0.5) AS BIGINT) AS value_scaled
    FROM p ASOF JOIN v
      ON p.user_id = v.user_id AND v.view_ts <= p.ts
    WHERE p.ts - v.view_ts <= INTERVAL 1 HOUR
    """,
)
def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style last-touch attribution: each purchase credits
    the user's most recent view no older than one hour. Reuses the
    as-of backward join (fan-out + per-purchase window top-1), then
    the tolerance filter; the right side is pre-deduped per (user, ts)
    because the as-of winner must be unique (DuckDB ASOF has the same
    requirement).
    """
    from datapipelinedemo_spark.operators.asof import asof_join_backward

    ev = table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event"))
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
            "view_event",
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "ts",
        "value",
    )
    j = asof_join_backward(
        purchases,
        views,
        left_key="user_id",
        right_key="v_user",
        left_ts="ts",
        right_ts="view_ts",
        left_id="purchase_id",
    )
    return j.filter(
        # exact-microsecond tolerance: truncating to seconds would
        # disagree with the oracle's INTERVAL compare at the boundary
        F.unix_micros("ts") - F.unix_micros("view_ts") <= 3_600_000_000
    ).select(
        "purchase_id",
        F.col("view_event").alias("attributed_view"),
        F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        F.floor(F.col("value") * 1e4 + F.lit(0.5))
        .cast("long")
        .alias("value_scaled"),
    )


# --------------------------------------------------------------------------
# Fixed-window repacking across document boundaries (GPT-style)
# --------------------------------------------------------------------------
_REPACK_ORACLE = """
    WITH tok AS (
        SELECT doc_id,
               list_append(list_filter(string_split_regex(lower(text), '\\s+'),
                                       t -> t <> ''), '<eos>') AS t
        FROM documents
    ),
    offs AS (
        SELECT doc_id, t,
               COALESCE(SUM(len(t)) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS off
        FROM tok
    ),
    flat AS (
        SELECT off + generate_subscripts(t, 1) - 1 AS gidx,
               unnest(t) AS tok
        FROM offs
    )
    SELECT CAST(gidx // 50 AS BIGINT) AS window_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST('0x' || substring(md5(string_agg(tok, ' ' ORDER BY gidx)),
                1, 15) AS BIGINT) AS window_hash
    FROM flat GROUP BY 1
    """


@register("fixed_window_repack", oracle=_REPACK_ORACLE)
def fixed_window_repack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LM-training repack: concatenate all documents (ordered by
    doc_id, ``<eos>``-terminated) into one token stream and cut it
    into EXACT 50-token windows that cross document boundaries — the
    complement of ``pack_documents_bins`` (which keeps documents
    intact).

    Since r12 this entry shares ``fixed_window_repack_offsets``'s
    two-pass partition-offset plan: the document grain is UNBOUNDED
    (grows with the corpus), so the original
    ``sum().over(Window.orderBy("doc_id"))`` prefix sum — one task
    holding every document row — was exactly the partitionless-window
    class VERDICT r11 #3 bans; the catalog-wide explain-audit
    assertion now keeps it out. Same result, same oracle, both
    entries stay certified.
    """
    return fixed_window_repack_offsets(spark, sf_dir)


def _repack_cut_fragments(frags: DataFrame) -> DataFrame:
    """(w0, g0, cnt, frag) per-document window FRAGMENTS → 50-token
    windows with order-exact hashes. r16: the shuffle key and payload
    changed grain — the old form exploded every token into a
    (gidx, tok) struct and shuffled the whole token stream row-per-
    token into the window groupBy; a window is at most 50 tokens, so
    each document contributes ≤ ⌈n/50⌉+1 pre-joined STRING fragments
    instead of n struct rows (~50× fewer shuffle rows, same bytes of
    text, one in-row array_join each). Window text = fragments joined
    in g0 (global-offset) order — identical to the per-token join, so
    hashes are bit-equal (pytest pins the twin equality)."""
    grouped = frags.groupBy("w0").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.array_join(
            F.expr(
                "transform(array_sort(collect_list(struct(g0, frag))),"
                " s -> s.frag)"
            ),
            " ",
        ).alias("joined"),
    )
    from datapipelinedemo_spark.functions.stable import md5_long

    return grouped.select(
        (F.col("w0") / 50).cast("long").alias("window_id"),
        "n_tokens",
        md5_long("joined").alias("window_hash"),
    )


@register("fixed_window_repack_offsets", oracle=_REPACK_ORACLE)
def fixed_window_repack_offsets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``fixed_window_repack`` without the single-partition global
    window — the form that survives 10B documents. Same result, same
    oracle (hash-equal twin, pinned in tests/test_corpus_ops.py).

    Two-pass partition offsets: documents are bucketed by doc_id
    range (boundaries = approximate doc_id quantiles, collected once
    and embedded as plan constants — correctness never depends on the
    split being balanced, only on buckets being doc_id-ordered); pass
    one partial-aggs per-bucket token sums (|buckets| rows collected,
    cumulated on the driver); pass two broadcast-joins the offsets
    back and runs the prefix sum as a window PARTITIONED by bucket —
    every stage is parallel in |buckets|, no unpartitioned WindowExec
    anywhere in the plan (explain-audit-asserted)."""
    from datapipelinedemo_spark.functions.text import tokenize
    from datapipelinedemo_spark.operators.prefix import bucketed_prefix_sum

    docs = table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        F.concat(tokenize("text"), F.array(F.lit("<eos>"))).alias("t"),
    ).withColumn("n", F.size("t"))
    # per-doc window FRAGMENTS instead of per-token rows (see
    # _repack_cut_fragments): a doc spanning global offsets
    # [off, off+n) intersects windows ⌊off/50⌋..⌊(off+n-1)/50⌋; emit
    # each intersection as one pre-joined string slice
    frags = (
        bucketed_prefix_sum(sized, "doc_id", "n", out_col="off")
        .select(
            F.explode(
                F.expr(
                    """transform(
                  sequence(off div 50, (off + n - 1) div 50),
                  w -> named_struct(
                    'w0', w * 50L,
                    'g0', greatest(w * 50L, off),
                    'cnt', least((w + 1) * 50L, off + n)
                           - greatest(w * 50L, off),
                    'frag', array_join(slice(t,
                       cast(greatest(w * 50L, off) - off + 1 as int),
                       cast(least((w + 1) * 50L, off + n)
                            - greatest(w * 50L, off) as int)), ' ')))"""
                )
            ).alias("f")
        )
        .select("f.w0", "f.g0", "f.cnt", "f.frag")
    )
    return _repack_cut_fragments(frags)


# --------------------------------------------------------------------------
# The tokenize-once corpus frame, shared by every LM chain
# --------------------------------------------------------------------------
_TOK_MEMO = FrameMemo()


def tokenized_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, t): the corpus tokenized ONCE per (session,
    corpus version), persisted — the frame the unigram and bigram LM
    chains (and their composers: CCNet buckets, DSIR, DoReMi,
    training_corpus_pipeline_v3) all scan from. Without it each chain
    re-derives scan+tokenize per consumer branch — Catalyst has no
    cross-branch subtree sharing, and doremi_domain_weights alone paid
    ~20 corpus scans / 42 shuffles (r11 residual; the shingle-frame
    memo precedent). Persist is best-effort: evicted blocks recompute
    from lineage, so at 100 TB this degrades to the old plan, never
    fails."""
    from datapipelinedemo_spark.functions.text import tokenize

    def _build() -> DataFrame:
        return (
            table(spark, sf_dir, "documents")
            .select("doc_id", "source", tokenize("text").alias("t"))
            .persist()
        )

    return _TOK_MEMO.get_or_build(
        spark,
        ("tokenized_documents", sf_dir, table_stamp(sf_dir, "documents")),
        _build,
    )


# --------------------------------------------------------------------------
# Unigram-LM perplexity scoring (the classic corpus-quality filter)
# --------------------------------------------------------------------------
@register(
    "unigram_perplexity_scores",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    tc AS (SELECT doc_id, unnest(t) AS term FROM tok),
    vocab AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM tc GROUP BY 1
    ),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM vocab),
    nll AS (
        -- per-term negative log prob snapped to a 1e-6 grid so the
        -- per-doc sum is EXACT integer arithmetic
        SELECT term,
               CAST(FLOOR(-ln(CAST(c AS DOUBLE) / total) * 1e6 + 0.5)
                    AS BIGINT) AS nll6
        FROM vocab, n
    )
    SELECT tc.doc_id AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           round(CAST(SUM(nll6) AS DOUBLE) / 1e6 / COUNT(*), 6)
               AS mean_nll
    FROM tc JOIN nll ON tc.term = nll.term
    GROUP BY 1
    """,
)
def unigram_perplexity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean negative log-likelihood under a unigram LM
    trained on the corpus itself — the classic perplexity-style
    quality filter (docs full of rare tokens score high and get
    culled; ln(perplexity) = mean_nll).

    The vocabulary with per-term -ln p is vocabulary-sized →
    broadcast; each per-term value snaps to a 1e-6 BIGINT grid BEFORE
    the per-doc sum, so the aggregation is exact integer math and the
    engines agree regardless of token order (a raw double Σln would
    drift by summation order). Corpus-side plan: one explode, one
    scoring join (no broadcast hint — the vocabulary grows ~sqrt of
    corpus size by Heaps' law, so AQE broadcasts while it fits and
    degrades to a shuffle join on `term` past the threshold), one
    partial-agg groupBy. Tokens come from the shared
    ``tokenized_documents`` memo (tokenize once per session/corpus).
    """
    tc = tokenized_documents(spark, sf_dir).select(
        "doc_id", F.explode("t").alias("term")
    )
    # r16 note: pinning vocab (2 consumers) was tried and REVERTED —
    # the vocab shuffle re-run is cheaper than a checkpoint barrier at
    # bench scale (0.67 s → 1.27 s pinned).
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
    return (
        # no broadcast hint — see docstring (Heaps'-law vocab growth)
        tc.join(nll, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(
                F.sum("nll6").cast("double") / 1e6 / F.count(F.lit(1)), 6
            ).alias("mean_nll"),
        )
    )


# --------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis, derandomized)
# --------------------------------------------------------------------------
@register(
    "weighted_sample_by_length",
    oracle="""
    SELECT doc_id, n_chars,
           round(ln((CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                        || '#ws0'), 1, 15) AS BIGINT) % 10000 + 1)
                    / 10000.0) / n_chars, 10) AS es_key
    FROM documents
    ORDER BY es_key DESC, doc_id
    LIMIT 100
    """,
)
def weighted_sample_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 docs sampled WITHOUT replacement with probability ∝ length
    (the weighted complement of the uniform hash samplers): the
    Efraimidis–Spirakis reservoir key ``ln(u)/w`` with u derived from
    the keyed md5 bucket instead of rand() — deterministic across
    engines, runs, and partitionings. Top-k by key is a per-partition
    TopK + single merge (no global sort of the corpus); the full
    ORDER BY + unique tie-break makes the LIMIT reproducible.
    """
    from datapipelinedemo_spark.operators.sampling import DENOM, _bucket

    docs = table(spark, sf_dir, "documents")
    u = (_bucket(F.col("doc_id"), "ws0") + 1).cast("double") / DENOM
    key = F.round(F.log(u) / F.col("n_chars"), 10)
    return (
        docs.select("doc_id", "n_chars", key.alias("es_key"))
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(100)
    )


# --------------------------------------------------------------------------
# First-touch attribution (the discovery-credit twin of last-touch)
# --------------------------------------------------------------------------
@register(
    "first_touch_attribution",
    oracle="""
    WITH v AS (
        SELECT user_id, MAX(event_id) AS view_event, ts AS view_ts
        FROM events WHERE event_type = 'view'
        GROUP BY user_id, ts
    ),
    p AS (
        SELECT DISTINCT event_id, user_id, ts, value FROM events
        WHERE event_type = 'purchase'
    ),
    j AS (
        SELECT p.event_id AS purchase_id, v.view_event, v.view_ts,
               p.value,
               ROW_NUMBER() OVER (PARTITION BY p.event_id, p.user_id,
                                               p.ts, p.value
                                  ORDER BY v.view_ts ASC) AS rn
        FROM p JOIN v
          ON v.user_id = p.user_id
         AND v.view_ts <= p.ts
         AND p.ts - v.view_ts <= INTERVAL 1 HOUR
    )
    SELECT purchase_id, view_event AS attributed_view,
           strftime(view_ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
           CAST(FLOOR(value * 1e4 + 0.5) AS BIGINT) AS value_scaled
    FROM j WHERE rn = 1
    """,
)
def first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: each purchase credits the EARLIEST
    view inside the 1-hour lookback — the discovery-credit model next
    to ``last_touch_attribution``'s closer-credit model (same window,
    opposite endpoint; marketing teams run both and compare).

    The window bound goes INTO the join condition, so the per-purchase
    fan-out is capped by views-per-user-hour before the rank — the
    range-join analog of the as-of backward plan, one shuffle per
    side. Views are pre-deduped per (user, ts) exactly like the
    last-touch query, making the earliest-view winner unique.
    """
    ev = table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event"))
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
            "view_event",
        )
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "value")
        .distinct()
    )
    j = purchases.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("ts"))
        & (
            F.unix_micros("ts") - F.unix_micros("view_ts")
            <= 3_600_000_000
        ),
    )
    w = W.partitionBy("event_id", "user_id", "ts", "value").orderBy(
        F.asc("view_ts")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("view_event").alias("attributed_view"),
            F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias(
                "view_ts"
            ),
            F.floor(F.col("value") * 1e4 + 0.5)
            .cast("long")
            .alias("value_scaled"),
        )
    )


# --------------------------------------------------------------------------
# Interpolated bigram-LM perplexity — the stronger LM quality filter
# (unigram_perplexity_scores' big sibling): per-doc mean NLL under
# p(w2|w1) = 0.7·c(w1,w2)/c(w1·) + 0.3·c(w2)/N, trained on the corpus.
# --------------------------------------------------------------------------
@register(
    "bigram_perplexity_scores",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    g AS (
        SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
        FROM tok WHERE len(t) >= 2
    ),
    occ AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM g),
    bc AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_xy
        FROM occ GROUP BY 1, 2
    ),
    ctx AS (
        SELECT w1, CAST(SUM(c_xy) AS BIGINT) AS c1 FROM bc GROUP BY 1
    ),
    uc AS (
        SELECT w2, CAST(SUM(c_xy) AS BIGINT) AS cu FROM bc GROUP BY 1
    ),
    n AS (SELECT CAST(SUM(cu) AS BIGINT) AS total FROM uc),
    nll AS (
        SELECT bc.w1, bc.w2,
               CAST(FLOOR(-ln(CAST(CAST(7 AS HUGEINT) * c_xy * total
                                   + CAST(3 AS HUGEINT) * cu * c1 AS DOUBLE)
                              / CAST(CAST(10 AS HUGEINT) * c1 * total
                                     AS DOUBLE))
                          * 1e6 + 0.5) AS BIGINT) AS nll6
        FROM bc
        JOIN ctx ON bc.w1 = ctx.w1
        JOIN uc ON bc.w2 = uc.w2
        CROSS JOIN n
    )
    SELECT occ.doc_id AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST((2 * SUM(nll6) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
               AS mean_nll_micro
    FROM occ JOIN nll ON occ.w1 = nll.w1 AND occ.w2 = nll.w2
    GROUP BY 1
    """,
)
def bigram_perplexity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean NLL under an interpolated bigram LM trained
    on the corpus (λ=0.7 bigram, 0.3 backoff) — scores only positions
    2..n (docs with <2 tokens emit no row); the unigram variant covers
    position-independent scoring. The backoff distribution is the w2
    CONTINUATION count (the bigram table's right marginal, as in
    Kneser-Ney-style backoff), so every model table is a rollup of the
    single bigram-count frame and the corpus is tokenized once.

    Same exactness strategy as unigram_perplexity_scores: the per-
    BIGRAM-TYPE NLL is one double expression over exact integer counts,
    mirrored operation-for-operation in the oracle, snapped to a 1e-6
    BIGINT grid BEFORE the per-doc sum — so the aggregation is exact
    integer math, order-independent across engines. Plan: bigram
    occurrences explode once; the bigram-type NLL table is vocab²-
    bounded post-shuffle, and the scoring join carries NO broadcast
    hint: bigram-type tables grow ~with corpus size (Heaps' law), so a
    forced broadcast would OOM at 100 TB — AQE broadcasts it at test
    scale from its runtime size estimate and degrades to a shuffle
    join keyed on (w1, w2) when it outgrows the threshold; the context
    totals and N are partial-agg rollups of the type table, never a
    second corpus pass. Tokens come from the shared
    ``tokenized_documents`` memo (tokenize once per session/corpus).
    """
    tok = tokenized_documents(spark, sf_dir).select("doc_id", "t")
    occ = (
        tok.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(element_at(t, i) AS w1,"
                    "             element_at(t, i + 1) AS w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )
    bc = occ.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c_xy")
    )
    # all model tables are marginals of the bigram-type frame — the
    # backoff unigram is the w2 CONTINUATION count, so every table is
    # a rollup of bc. bc is vocab²-bounded (corpus-independent), so
    # pin it once: Catalyst has no cross-branch subtree sharing, and
    # without this each of the three consumers re-derives the corpus
    # scan + count shuffle (measured: 10 scans → 2, the occ minimum).
    bc = bc.transform(pin)  # pin-bounded: vocab^2 bigram-type grain
    ctx = bc.groupBy("w1").agg(F.sum("c_xy").cast("long").alias("c1"))
    uc = bc.groupBy("w2").agg(F.sum("c_xy").cast("long").alias("cu"))
    n = uc.agg(F.sum("cu").alias("total"))
    nll = (
        bc.join(ctx, "w1")
        .join(uc, "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            # DECIMAL(38,0) accumulators (HUGEINT in the oracle): the
            # c_xy·total products wrap int64 past ~1e10 bigram tokens,
            # well inside 100 TB corpus range (ADVICE r5). Exact until
            # the single cast to double that feeds ln().
            F.floor(
                -F.log(
                    (
                        F.lit(7)
                        * F.col("c_xy").cast("decimal(38,0)")
                        * F.col("total")
                        + F.lit(3)
                        * F.col("cu").cast("decimal(38,0)")
                        * F.col("c1")
                    ).cast("double")
                    / (
                        F.lit(10)
                        * F.col("c1").cast("decimal(38,0)")
                        * F.col("total")
                    ).cast("double")
                )
                * 1e6
                + F.lit(0.5)
            )
            .cast("long")
            .alias("nll6"),
        )
    )
    return (
        # no broadcast hint: AQE picks broadcast while nll fits and
        # falls back to shuffle when the bigram vocabulary outgrows it
        occ.join(nll, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            # half-up mean on the micro grid as EXACT integer division
            # ((2s+n) div 2n) — a double mean rounded to 6dp can land
            # exactly on a .5 micro boundary and split across engines
            F.expr(
                "(2 * sum(nll6) + count(1)) div (2 * count(1))"
            )
            .cast("long")
            .alias("mean_nll_micro"),
        )
    )


# --------------------------------------------------------------------------
# Text normalization (the pass before dedup): URL/e-mail stripping,
# case folding, whitespace collapse — emitted as a compact
# hash+length+changed summary so the full normalized corpus never has
# to travel through the compare.
# --------------------------------------------------------------------------
@register(
    "normalized_documents",
    oracle="""
    WITH n AS (
        SELECT doc_id, text,
               trim(regexp_replace(
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(lower(text),
                               'https?://[^\\s]+', ' ', 'g'),
                           '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}',
                           ' ', 'g'),
                       '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f]',
                       '', 'g'),
                   '\\s+', ' ', 'g')) AS norm
        FROM documents
    )
    SELECT doc_id,
           md5(norm) AS norm_hash,
           CAST(length(norm) AS BIGINT) AS n_chars_norm,
           norm <> text AS changed
    FROM n
    """,
)
def normalized_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc normalization summary (functions/text.py::
    normalize_for_dedup): md5 of the normalized text (the key exact-dedup
    would group on), its length, and whether normalization changed
    the doc. In-row expression chain — no shuffle at any scale; the
    oracle recomputes the identical regex chain so the hashes match
    byte-for-byte.
    """
    from datapipelinedemo_spark.functions.text import normalize_for_dedup

    docs = table(spark, sf_dir, "documents")
    norm = normalize_for_dedup("text")
    return docs.select(
        "doc_id",
        F.md5(norm).alias("norm_hash"),
        F.length(norm).cast("long").alias("n_chars_norm"),
        (norm != F.col("text")).alias("changed"),
    )
