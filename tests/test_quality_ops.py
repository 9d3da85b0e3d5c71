"""Gopher rule battery (plans/quality_ops.py): each rule fires on a
planted violating document and only that rule's flag drops; the
composed corpus report is consistent with the two flag frames."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _write_docs(tmp_path, texts):
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["s"] * len(texts),
                "n_chars": [len(t) for t in texts],
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def test_each_quality_rule_fires_alone(spark, tmp_path):
    from datapipelinedemo_spark.plans.quality_ops import (
        gopher_quality_flags,
    )

    # a clean doc template: 40 varied words incl. >=2 stopwords
    clean = "the and " + " ".join(f"word{i}" for i in range(38))
    texts = [
        clean,                                     # 0: passes everything
        "the and tiny",                            # 1: too few words
        "the and " + " ".join(["x"] * 38),         # 2: mean word len < 3
        "the and " + " ".join(f"w#{i}" for i in range(38)),  # 3: symbols
        " ".join(f"word{i}" for i in range(40)),   # 4: no stopwords
    ]
    sf = _write_docs(tmp_path, texts)
    rows = {
        r.doc_id: r for r in gopher_quality_flags(spark, sf).collect()
    }
    assert rows[0].kept == 1
    assert (rows[1].ok_words, rows[1].kept) == (0, 0)
    assert (rows[2].ok_word_len, rows[2].kept) == (0, 0)
    assert (rows[3].ok_symbols, rows[3].kept) == (0, 0)
    assert (rows[4].ok_stopwords, rows[4].kept) == (0, 0)
    # each violator fails ONLY its own rule (word-count stays in range
    # for 2..4 by construction)
    for d in (2, 3, 4):
        assert rows[d].ok_words == 1
    assert rows[1].ok_word_len == 1 and rows[1].ok_stopwords == 1


def test_repetition_rules_and_null_policy(spark, tmp_path):
    from datapipelinedemo_spark.plans.quality_ops import (
        gopher_repetition_flags,
    )

    texts = [
        " ".join(f"w{i}" for i in range(50)),      # 0: no repetition
        "spam " * 20 + " ".join(f"w{i}" for i in range(30)),  # 1: one word dominates
        "a b " * 25,                                # 2: one bigram dominates
        "only",                                     # 3: 1 token -> null bi/tri
    ]
    sf = _write_docs(tmp_path, [t.strip() for t in texts])
    rows = {
        r.doc_id: r
        for r in gopher_repetition_flags(spark, sf).collect()
    }
    assert rows[0].kept == 1
    assert rows[1].ok_word_rep == 0 and rows[1].kept == 0
    assert rows[2].ok_bigram_rep == 0 and rows[2].kept == 0
    # too short for bigrams/trigrams: those gates PASS (null policy);
    # a 1-token doc trivially fails word-rep (frac 1.0)
    assert rows[3].ok_bigram_rep == 1 and rows[3].ok_trigram_rep == 1
    assert rows[3].ok_word_rep == 0


def test_kept_corpus_consistent_with_flags(spark, sf_dir):
    from datapipelinedemo_spark.plans.quality_ops import (
        gopher_kept_corpus,
        gopher_quality_flags,
        gopher_repetition_flags,
    )

    q = gopher_quality_flags(spark, sf_dir).select(
        "doc_id", F.col("kept").alias("qk"), "n_words"
    )
    r = gopher_repetition_flags(spark, sf_dir).select(
        "doc_id", F.col("kept").alias("rk")
    )
    both = q.join(r, "doc_id")
    want_kept = both.filter(
        (F.col("qk") == 1) & (F.col("rk") == 1)
    ).count()
    total = both.count()
    rep = gopher_kept_corpus(spark, sf_dir).agg(
        F.sum("docs_total").alias("t"), F.sum("docs_kept").alias("k")
    ).collect()[0]
    assert (rep.t, rep.k) == (total, want_kept)
    # the battery is non-vacuous on the synthetic corpus: it drops a
    # real fraction and keeps a real fraction
    assert 0 < want_kept < total


def test_quality_admission_streams_natively(spark, sf_dir, tmp_path):
    """The battery is stateless in-row, so it rides Structured
    Streaming DIRECTLY (append mode, no foreachBatch, no state): the
    same gq_battery transform over a real 2-micro-batch stream of the
    admission slice equals the certified batch twin."""
    import uuid

    from datapipelinedemo_spark.plans.quality_ops import (
        gq_battery,
        streaming_quality_admission,
    )
    from datapipelinedemo_spark.tables import table

    want = {
        tuple(r) for r in streaming_quality_admission(
            spark, sf_dir
        ).collect()
    }
    assert want

    src = str(tmp_path / "docs_stream")
    (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text", "lang", "source")
        .repartition(2)
        .write.mode("overwrite")
        .parquet(src)
    )
    docs = (
        spark.readStream.schema(
            "doc_id bigint, text string, lang string, source string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    flags = gq_battery(docs).select(
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
    qname = f"gqadm_{uuid.uuid4().hex}"
    q = (
        flags.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        got = {tuple(r) for r in spark.table(qname).collect()}
        n_batches = len(
            [p for p in q.recentProgress if p["numInputRows"] > 0]
        )
    finally:
        q.stop()
        spark.catalog.dropTempView(qname)
    assert n_batches == 2
    assert got == want


def test_c4_page_filters_each_rule_fires_alone(spark):
    """Planted docs make each C4 rule fire in isolation; a clean doc
    with 3 sentences passes everything."""
    rows = [
        (0, "Good first one. A second sentence! A third one?"),
        (1, "Too few sentences here."),
        (2, "One. Two. Three. But it has code { inside }."),
        (3, "One. Two. Three. Classic Lorem Ipsum filler text."),
        (4, "One. Two. Three. Please enable JavaScript to continue."),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from datapipelinedemo_spark.plans.llm_ops import c4_page_filter_frame

    out = {r.doc_id: r for r in c4_page_filter_frame(docs).collect()}
    assert out[0].kept == 1 and out[0].n_sentences == 3
    assert out[1].kept == 0 and out[1].ok_sentences == 0
    assert (out[1].ok_no_brace, out[1].ok_no_lorem, out[1].ok_no_js) == (1, 1, 1)
    assert out[2].kept == 0 and out[2].ok_no_brace == 0 and out[2].ok_sentences == 1
    assert out[3].kept == 0 and out[3].ok_no_lorem == 0
    assert out[4].kept == 0 and out[4].ok_no_js == 0


def test_c4_page_filters_vacuous_on_synthetic_corpus_is_recorded(spark, sf_dir):
    """On the punctuation-free word-soup corpus the sentence floor
    drops every doc and the content rules never fire — the documented
    vacuous-but-shape status (same as the Gopher symbol/alpha rules)."""
    from pyspark.sql import functions as F

    from datapipelinedemo_spark.plans.catalog import QUERIES

    agg = (
        QUERIES["c4_page_filters"](spark, sf_dir)
        .agg(
            F.sum("kept").alias("k"),
            F.sum("ok_no_brace").alias("b"),
            F.sum("ok_no_lorem").alias("l"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    assert agg.k == 0  # sentence floor drops all word-soup docs
    assert agg.b == agg.n and agg.l == agg.n  # content rules pass all
