"""Gopher-style document quality gates (Rae et al. 2021, §A1.1):
the rule battery a web-scale training pipeline runs BEFORE the
expensive filters — cheap in-row signals (word count, mean word
length, symbol ratio, alphabetic-word fraction, stopword presence)
plus the repetition signals already certified in
``doc_repetition_stats``, each exposed as a flag column so the keep
decision is auditable per rule, then composed into a per-language
corpus report.

Thresholds: the rule SET is Gopher's; the numbers are calibrated to
this synthetic corpus family so the battery is non-vacuous (word
count 30..90 splits ~70/30, stopwords >= 2 splits ~78/22,
max-word-frac <= 0.11 splits ~75/25, top-bigram-frac <= 0.05 splits
~80/20). The symbol and alphabetic rules pass every synthetic doc
(no '#'/ellipsis tokens, latin-script vocabulary in every lang
label) — kept anyway because the battery's SHAPE is the operator:
on real web text they are among the highest-yield rules, and the
plan cost of a vacuous in-row flag is nil.

Scale shape: the quality battery is ONE documents scan with in-row
expressions only (no shuffle, whole-stage codegen); the repetition
flags reuse ``doc_repetition_stats``'s explode-once + two-partial-agg
plan; the corpus report is one doc-grain join of the two flag frames
+ a per-language partial agg. Nothing here exceeds the cost class of
a single corpus pass at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipelinedemo_spark.functions import text as TX
from datapipelinedemo_spark.plans import llm_ops  # registers doc_repetition_stats
from datapipelinedemo_spark.plans.catalog import ORACLES, register
from datapipelinedemo_spark.tables import table

_TOK = r"list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')"

_GQ_MIN_WORDS, _GQ_MAX_WORDS = 30, 90
_GQ_MIN_MWL, _GQ_MAX_MWL = 3.0, 10.0
_GQ_MAX_SYMBOL_FRAC = 0.1
_GQ_MIN_ALPHA_FRAC = 0.8
_GQ_MIN_STOPWORDS = 2

_GR_MAX_WORD_FRAC = 0.11
_GR_MAX_BIGRAM_FRAC = 0.05
_GR_MAX_DUPTRI_FRAC = 0.05

_EN_STOP = TX.LANG_PROFILES["en"]
_EN_STOP_SQL = ",".join(f"'{w}'" for w in _EN_STOP)

_GQ_SIGNALS_SQL = f"""
    WITH t AS (SELECT doc_id, lang, {_TOK} AS toks FROM documents),
    q AS (
        SELECT doc_id, lang,
               CAST(len(toks) AS BIGINT) AS n_words,
               CASE WHEN len(toks) = 0 THEN 0.0::DOUBLE
                    ELSE CAST(list_reduce(list_prepend(0::BIGINT,
                         list_transform(toks, w -> length(w))),
                         (a, b) -> a + b) AS DOUBLE) / len(toks)
                    END AS mwl,
               CASE WHEN len(toks) = 0 THEN 0.0::DOUBLE
                    ELSE CAST(len(list_filter(toks,
                         w -> regexp_matches(w, '[#…]'))) AS DOUBLE)
                         / len(toks) END AS syf,
               CASE WHEN len(toks) = 0 THEN 0.0::DOUBLE
                    ELSE CAST(len(list_filter(toks,
                         w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
                         / len(toks) END AS alf,
               CAST(len(list_filter(toks,
                    w -> w IN ({_EN_STOP_SQL}))) AS BIGINT)
                   AS n_stopwords
        FROM t
    ),
    gq AS (
        SELECT *,
               CAST(CASE WHEN n_words BETWEEN {_GQ_MIN_WORDS} AND
                    {_GQ_MAX_WORDS} THEN 1 ELSE 0 END AS BIGINT)
                   AS ok_words,
               CAST(CASE WHEN mwl >= {_GQ_MIN_MWL} AND
                    mwl <= {_GQ_MAX_MWL} THEN 1 ELSE 0 END AS BIGINT)
                   AS ok_word_len,
               CAST(CASE WHEN syf <= {_GQ_MAX_SYMBOL_FRAC}
                    THEN 1 ELSE 0 END AS BIGINT) AS ok_symbols,
               CAST(CASE WHEN alf >= {_GQ_MIN_ALPHA_FRAC}
                    THEN 1 ELSE 0 END AS BIGINT) AS ok_alpha,
               CAST(CASE WHEN n_stopwords >= {_GQ_MIN_STOPWORDS}
                    THEN 1 ELSE 0 END AS BIGINT) AS ok_stopwords
        FROM q
    )
"""

_GQ_KEPT_SQL = (
    "ok_words * ok_word_len * ok_symbols * ok_alpha * ok_stopwords"
)


def _gq_signal_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, n_words, mwl, syf, alf, n_stopwords, ok_*):
    the in-row rule battery — one scan, no shuffle."""
    return gq_battery(table(spark, sf_dir, "documents"))


def gq_battery(docs: DataFrame) -> DataFrame:
    """The rule battery as a pure frame transform — in-row expressions
    only (no shuffle, no state), so the SAME code object runs on a
    batch scan and on a Structured Streaming source in append mode
    (``streaming_quality_admission`` / its pytest stream drive)."""
    toks = TX.tokenize("text")
    return gq_battery_from_toks(
        docs.select("doc_id", "lang", toks.alias("t"))
    )


def gq_battery_from_toks(t: DataFrame) -> DataFrame:
    """``gq_battery`` over an already-tokenized (doc_id, lang, t)
    frame — split out (r16) so the fused Gopher corpus report can run
    the battery AND the repetition signals off ONE tokenize, in one
    scan."""
    frac = lambda hits: F.when(  # noqa: E731
        F.size("t") == 0, F.lit(0.0)
    ).otherwise(hits.cast("double") / F.size("t"))
    q = t.select(
        "*",
        F.size("t").cast("long").alias("n_words"),
        F.when(F.size("t") == 0, F.lit(0.0))
        .otherwise(TX.mean_token_length(F.col("t")))
        .alias("mwl"),
        frac(
            F.size(F.filter(F.col("t"), lambda w: w.rlike("[#…]")))
        ).alias("syf"),
        frac(
            F.size(F.filter(F.col("t"), lambda w: w.rlike("[a-z]")))
        ).alias("alf"),
        F.size(F.filter(F.col("t"), lambda w: w.isin(*_EN_STOP)))
        .cast("long")
        .alias("n_stopwords"),
    )
    flag = lambda c: c.cast("int").cast("long")  # noqa: E731
    return q.select(
        "*",
        flag(
            F.col("n_words").between(_GQ_MIN_WORDS, _GQ_MAX_WORDS)
        ).alias("ok_words"),
        flag(
            (F.col("mwl") >= _GQ_MIN_MWL) & (F.col("mwl") <= _GQ_MAX_MWL)
        ).alias("ok_word_len"),
        flag(F.col("syf") <= _GQ_MAX_SYMBOL_FRAC).alias("ok_symbols"),
        flag(F.col("alf") >= _GQ_MIN_ALPHA_FRAC).alias("ok_alpha"),
        flag(F.col("n_stopwords") >= _GQ_MIN_STOPWORDS).alias(
            "ok_stopwords"
        ),
    )


@register(
    "gopher_quality_flags",
    oracle=_GQ_SIGNALS_SQL
    + f"""
    SELECT doc_id, n_words,
           round(mwl, 6) AS mean_word_len,
           round(syf, 6) AS symbol_word_frac,
           round(alf, 6) AS alpha_word_frac,
           n_stopwords,
           ok_words, ok_word_len, ok_symbols, ok_alpha, ok_stopwords,
           CAST({_GQ_KEPT_SQL} AS BIGINT) AS kept
    FROM gq
    """,
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher rule battery (module banner): every rule a
    separate 0/1 column so a pipeline audit can attribute every drop to
    the rule that fired; ``kept`` is their conjunction. Flags are
    computed on the RAW doubles, the reported signal columns rounded
    to 6 — so threshold comparisons never see rounding."""
    return _gq_flags_select(_gq_signal_frame(spark, sf_dir))


def _gq_flags_select(q: DataFrame) -> DataFrame:
    return q.select(
        "doc_id",
        "n_words",
        F.round("mwl", 6).alias("mean_word_len"),
        F.round("syf", 6).alias("symbol_word_frac"),
        F.round("alf", 6).alias("alpha_word_frac"),
        "n_stopwords",
        "ok_words",
        "ok_word_len",
        "ok_symbols",
        "ok_alpha",
        "ok_stopwords",
        (
            F.col("ok_words")
            * F.col("ok_word_len")
            * F.col("ok_symbols")
            * F.col("ok_alpha")
            * F.col("ok_stopwords")
        )
        .cast("long")
        .alias("kept"),
    )


def _rep_oracle() -> str:
    return ORACLES["doc_repetition_stats"]


@register(
    "gopher_repetition_flags",
    oracle=f"""
    SELECT doc_id,
           CAST(COALESCE(max_word_frac <= {_GR_MAX_WORD_FRAC}, TRUE)
                AS BIGINT) AS ok_word_rep,
           CAST(COALESCE(top_bigram_frac <= {_GR_MAX_BIGRAM_FRAC}, TRUE)
                AS BIGINT) AS ok_bigram_rep,
           CAST(COALESCE(dup_trigram_frac <= {_GR_MAX_DUPTRI_FRAC}, TRUE)
                AS BIGINT) AS ok_trigram_rep,
           CAST(COALESCE(max_word_frac <= {_GR_MAX_WORD_FRAC}, TRUE)
                AND COALESCE(top_bigram_frac <= {_GR_MAX_BIGRAM_FRAC},
                             TRUE)
                AND COALESCE(dup_trigram_frac <= {_GR_MAX_DUPTRI_FRAC},
                             TRUE) AS BIGINT) AS kept
    FROM ({_rep_oracle()}) r
    """,
)
def gopher_repetition_flags(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Gopher repetition gates over the certified
    ``doc_repetition_stats`` signals (llm_ops.py — explode n-grams
    once, two partial-agg shuffles). A doc too short to have the
    n-gram (null signal) PASSES that gate — the length floor lives in
    the quality battery, not here (same null policy as the oracle's
    COALESCE)."""
    rep = llm_ops.doc_repetition_stats(spark, sf_dir)
    gate = lambda c, thr: F.coalesce(  # noqa: E731
        (c <= thr).cast("int"), F.lit(1)
    ).cast("long")
    return rep.select(
        "doc_id",
        gate(F.col("max_word_frac"), _GR_MAX_WORD_FRAC).alias(
            "ok_word_rep"
        ),
        gate(F.col("top_bigram_frac"), _GR_MAX_BIGRAM_FRAC).alias(
            "ok_bigram_rep"
        ),
        gate(F.col("dup_trigram_frac"), _GR_MAX_DUPTRI_FRAC).alias(
            "ok_trigram_rep"
        ),
        (
            gate(F.col("max_word_frac"), _GR_MAX_WORD_FRAC)
            * gate(F.col("top_bigram_frac"), _GR_MAX_BIGRAM_FRAC)
            * gate(F.col("dup_trigram_frac"), _GR_MAX_DUPTRI_FRAC)
        )
        .cast("long")
        .alias("kept"),
    )


@register(
    "gopher_kept_corpus",
    oracle=_GQ_SIGNALS_SQL
    + f"""
    , rep AS (
        SELECT doc_id,
               COALESCE(max_word_frac <= {_GR_MAX_WORD_FRAC}, TRUE)
               AND COALESCE(top_bigram_frac <= {_GR_MAX_BIGRAM_FRAC},
                            TRUE)
               AND COALESCE(dup_trigram_frac <= {_GR_MAX_DUPTRI_FRAC},
                            TRUE) AS rep_kept
        FROM ({_rep_oracle()}) r
    )
    SELECT gq.lang AS lang,
           CAST(COUNT(*) AS BIGINT) AS docs_total,
           CAST(SUM(CASE WHEN {_GQ_KEPT_SQL} = 1 AND rep.rep_kept
                    THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
           CAST(SUM(CASE WHEN {_GQ_KEPT_SQL} = 1 AND rep.rep_kept
                    THEN gq.n_words ELSE 0 END) AS BIGINT)
               AS kept_words,
           round(CAST(SUM(CASE WHEN {_GQ_KEPT_SQL} = 1 AND rep.rep_kept
                    THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
               AS keep_rate
    FROM gq JOIN rep ON rep.doc_id = gq.doc_id
    GROUP BY gq.lang
    """,
)
def gopher_kept_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline report row: per-language doc/word survival under
    the FULL Gopher battery (quality ∧ repetition) — what a filtering
    run publishes before anyone trains on the output.

    r16: both flag families are in-row per-document signals (the
    repetition stats lost their explode/shuffle form this round), so
    the doc-grain join of two frames that each re-scanned documents is
    gone — ONE scan computes battery + repetition flags side by side,
    then a per-language partial agg. Plan: scan → project → one
    exchange (was 10)."""
    from datapipelinedemo_spark.functions.text import tokenize
    from datapipelinedemo_spark.plans.llm_ops import (
        rep_signal_base,
        rep_signal_columns,
    )

    docs = table(spark, sf_dir, "documents")
    # ADVICE r16: the oracle's `gq JOIN rep` is an INNER join and rep
    # (the doc_repetition_stats subquery) emits no row for a doc whose
    # tokenization is empty — such docs must not count in docs_total /
    # keep_rate. The fused single-scan form mirrors that with the same
    # size filter doc_repetition_stats applies (no-op on this corpus).
    toks = docs.select(
        "doc_id", "lang", tokenize("text").alias("t")
    ).filter(F.size("t") > 0)
    base = gq_battery_from_toks(rep_signal_base(toks))
    # rep_signal_columns()[0] is rep's n_words (null on empty docs) —
    # the battery's n_words (0 on empty docs, what the oracle's
    # kept_words sums) is already in ``base``; keep only the fracs
    withrep = base.select("*", *rep_signal_columns()[1:])
    gate = lambda c, thr: F.coalesce(  # noqa: E731
        (c <= thr).cast("int"), F.lit(1)
    ).cast("long")
    j = withrep.select(
        "lang",
        F.col("n_words"),
        (
            F.col("ok_words")
            * F.col("ok_word_len")
            * F.col("ok_symbols")
            * F.col("ok_alpha")
            * F.col("ok_stopwords")
        ).alias("q_kept"),
        (
            gate(F.col("max_word_frac"), _GR_MAX_WORD_FRAC)
            * gate(F.col("top_bigram_frac"), _GR_MAX_BIGRAM_FRAC)
            * gate(F.col("dup_trigram_frac"), _GR_MAX_DUPTRI_FRAC)
        ).alias("rep_kept"),
    )
    kept = (F.col("q_kept") * F.col("rep_kept")) == 1
    return j.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("docs_total"),
        F.sum(F.when(kept, 1).otherwise(0))
        .cast("long")
        .alias("docs_kept"),
        F.sum(F.when(kept, F.col("n_words")).otherwise(0))
        .cast("long")
        .alias("kept_words"),
        F.round(
            F.sum(F.when(kept, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("keep_rate"),
    )


@register(
    "streaming_quality_admission",
    oracle=_GQ_SIGNALS_SQL.replace(
        "FROM documents", "FROM documents WHERE doc_id % 10 = 0"
    )
    + f"""
    SELECT doc_id, n_words, n_stopwords,
           ok_words, ok_word_len, ok_symbols, ok_alpha, ok_stopwords,
           CAST({_GQ_KEPT_SQL} AS BIGINT) AS kept
    FROM gq
    """,
)
def streaming_quality_admission(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BATCH TWIN of the admission-time quality screen: the arriving
    batch (the ``doc_id % 10 == 0`` slice, the streaming family's
    convention) through the Gopher rule battery. Unlike the dedup
    screens this one is STATELESS — pure in-row expressions — so the
    stream drive needs no foreachBatch, no stored index, no state
    store: ``gq_battery`` runs directly on a ``readStream`` source in
    append mode (pytest pins streamed == twin over 2 real
    micro-batches). The cheapest class of streaming operator, and the
    gate a production ingest runs FIRST, before any hash or index is
    consulted."""
    docs = table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 == 0
    )
    return gq_battery(docs).select(
        "doc_id",
        "n_words",
        "n_stopwords",
        "ok_words",
        "ok_word_len",
        "ok_symbols",
        "ok_alpha",
        "ok_stopwords",
        (
            F.col("ok_words")
            * F.col("ok_word_len")
            * F.col("ok_symbols")
            * F.col("ok_alpha")
            * F.col("ok_stopwords")
        )
        .cast("long")
        .alias("kept"),
    )
