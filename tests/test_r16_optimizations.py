"""Focused pins for the r16 optimization rewrites: each changed
operator internal is asserted equal to its pre-rewrite formulation on
real testdata (the DuckDB oracle separately pins the full semantics;
these tests pin the EQUIVALENCE ARGUMENT each rewrite rests on, so a
future edit that breaks the argument fails fast in pytest)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipelinedemo_spark.tables import table


def test_rep_stats_inrow_equals_exploded_groupby(spark, sf_dir):
    """doc_repetition_stats' sorted run-length fold == the exploded
    (doc_id, n, gram) groupBy it replaced (max count = longest equal
    run; duplicated mass = Σ runs>1)."""
    from datapipelinedemo_spark.functions import text as TX
    from datapipelinedemo_spark.plans.llm_ops import doc_repetition_stats

    new = doc_repetition_stats(spark, sf_dir)
    # the pre-r16 exploded formulation, rebuilt verbatim
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", TX.tokenize("text").alias("t"))

    def _tag(n):
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    tagged = F.concat(
        *[F.transform(TX.ngrams(F.col("t"), n), _tag(n)) for n in (1, 2, 3)]
    )
    grams = toks.select("doc_id", F.explode(tagged).alias("x")).select(
        "doc_id", F.col("x.n").alias("n"), F.col("x.gram").alias("gram")
    )
    per_gram = grams.groupBy("doc_id", "n", "gram").count()
    per_n = per_gram.groupBy("doc_id", "n").agg(
        F.max("count").alias("mx"),
        F.sum("count").alias("tot"),
        F.sum(
            F.when(F.col("count") > 1, F.col("count")).otherwise(0)
        ).alias("dup"),
    )
    frac = lambda num: F.round(  # noqa: E731
        num.cast("double") / F.col("tot"), 6
    )
    old = per_n.groupBy("doc_id").agg(
        F.max(F.when(F.col("n") == 1, F.col("tot"))).alias("n_words"),
        F.max(F.when(F.col("n") == 1, frac(F.col("mx")))).alias(
            "max_word_frac"
        ),
        F.max(F.when(F.col("n") == 2, frac(F.col("mx")))).alias(
            "top_bigram_frac"
        ),
        F.max(F.when(F.col("n") == 3, frac(F.col("dup")))).alias(
            "dup_trigram_frac"
        ),
    )
    a = sorted(map(tuple, new.collect()))
    b = sorted(map(tuple, old.collect()))
    assert a == b and len(a) > 0
    # and the rewrite's point: ZERO exchanges in the new plan
    from tools.explain_audit import plan_string

    assert "Exchange" not in plan_string(new)


def test_cms_build_weighted_equals_stream(spark, sf_dir):
    """cms_build from (key, count) with weight_col == cms_build from
    the raw occurrence stream — cell for cell."""
    from datapipelinedemo_spark.functions import text as TX
    from datapipelinedemo_spark.operators.sketch import cms_build

    docs = table(spark, sf_dir, "documents").limit(200)
    tokens = docs.select(F.explode(TX.tokenize("text")).alias("token"))
    exact = tokens.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    a = sorted(
        map(tuple, cms_build(tokens, "token", d=4, w=256).collect())
    )
    b = sorted(
        map(
            tuple,
            cms_build(exact, "token", d=4, w=256, weight_col="c").collect(),
        )
    )
    assert a == b and len(a) > 0


def test_ewma_inrow_fold_equals_python_replay(spark, sf_dir):
    """user_value_ewma's in-row aggregate == the per-user Python fold
    it replaced (identical IEEE operation order, bround == round)."""
    from datapipelinedemo_spark.plans.catalog import QUERIES

    got = {
        r.user_id: (r.ewma, r.n_events)
        for r in QUERIES["user_value_ewma"](spark, sf_dir).collect()
    }
    ev = (
        table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(got) == len(by_user) > 0
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        s = None
        for r in rows:
            s = float(r.value) if s is None else 0.9 * s + 0.1 * float(r.value)
        assert got[uid] == (round(s, 6), len(rows)), uid


def test_ivfpq_probe_rank_filter_recovers_each_nprobe(spark, sf_dir):
    """The nprobe-sweep restructure's premise: the deepest ADC frame
    filtered to probe_rn <= p is row-identical to the ADC computed at
    nprobe=p (candidate sets are nested because each vector lives in
    exactly one coarse list)."""
    from datapipelinedemo_spark.plans.ml_ops import _ivfpq_adc

    deep = (
        _ivfpq_adc(spark, sf_dir, nprobe=4, with_probe_rank=True)
        .collect()
    )
    for p in (1, 2):
        want = sorted(
            (r.query_id, r.neighbor_id, r.adc_sq_dist)
            for r in _ivfpq_adc(spark, sf_dir, nprobe=p).collect()
        )
        got = sorted(
            (r.query_id, r.neighbor_id, r.adc_sq_dist)
            for r in deep
            if r.probe_rn <= p
        )
        assert got == want and len(want) > 0


def test_repack_fragments_equal_per_token_cut(spark, sf_dir):
    """fixed_window_repack's fragment shuffle == the per-token
    (gidx, tok) groupBy it replaced, window for window."""
    from datapipelinedemo_spark.functions.stable import md5_long
    from datapipelinedemo_spark.functions.text import tokenize
    from datapipelinedemo_spark.operators.prefix import bucketed_prefix_sum
    from datapipelinedemo_spark.plans.corpus_ops import (
        fixed_window_repack_offsets,
    )

    new = sorted(
        map(tuple, fixed_window_repack_offsets(spark, sf_dir).collect())
    )
    docs = table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        F.concat(tokenize("text"), F.array(F.lit("<eos>"))).alias("t"),
    ).withColumn("n", F.size("t"))
    flat = (
        bucketed_prefix_sum(sized, "doc_id", "n", out_col="off")
        .select(F.posexplode("t").alias("i", "tok"), F.col("off"))
        .select((F.col("off") + F.col("i")).alias("gidx"), "tok")
    )
    grouped = flat.groupBy(
        (F.col("gidx") - F.pmod("gidx", F.lit(50))).alias("w0")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.array_join(
            F.expr(
                "transform(array_sort(collect_list(struct(gidx, tok))),"
                " s -> s.tok)"
            ),
            " ",
        ).alias("joined"),
    )
    old = sorted(
        map(
            tuple,
            grouped.select(
                (F.col("w0") / 50).cast("long").alias("window_id"),
                "n_tokens",
                md5_long("joined").alias("window_hash"),
            ).collect(),
        )
    )
    assert new == old and len(new) > 0
