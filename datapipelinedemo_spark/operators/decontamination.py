"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard LLM training-data hygiene step (GPT-3 appendix C / Llama
style): any training document containing an n-gram (n≈13 words) that
also occurs in an evaluation benchmark is flagged (dropped or
bucketed for dedicated review) so downstream eval numbers aren't
inflated by memorized test data.

Scale shape: the benchmark side is always tiny relative to a 100 TB
training corpus — a few million grams at most — so its DISTINCT gram
set is broadcast and the training side never shuffles: tokenize →
in-row gram expression → explode → broadcast-hash semi/inner join →
partial-agg count per doc. Zero wide exchanges of corpus data; the
only shuffle is the final per-doc count, keyed on the training doc id
(and Catalyst's partial aggregation makes that count map-side first).

For cross-engine oracle parity grams are joined as plain strings; in
production hash them (``xxhash64``) to shrink the broadcast and the
join keys — the plumbing is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datapipelinedemo_spark.functions.text import tokenize


def ngrams_of_tokens(tokens_col, n: int) -> Column:
    """Array of space-joined ``n``-grams over an ALREADY-MATERIALIZED
    token-array column.

    Takes a column (not an inline tokenize expression) deliberately:
    Catalyst inlines nested expressions into higher-order-function
    lambdas, so ``slice(tokenize(text), i, n)`` re-tokenizes the text
    once per gram position (~60× per doc). Tokenize into a real
    column first, then call this on that column.

    Documents shorter than ``n`` tokens yield an empty array —
    ``sequence`` would otherwise count DOWNWARD (Spark auto-steps -1),
    so the guard is load-bearing.
    """
    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def word_ngrams(text_col, n: int) -> Column:
    """Inline tokenize + n-grams, for short texts / tests. Prefer
    tokenizing into a column and ``ngrams_of_tokens`` on hot paths —
    see that function's inlining note."""
    return ngrams_of_tokens(tokenize(text_col), n)


def contamination_counts(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
) -> DataFrame:
    """Per contaminated training doc: how many DISTINCT of its n-grams
    occur anywhere in the benchmark set.

    Returns ``(id_col, n_shared_grams)`` — only docs with ≥1 shared
    gram appear; left-anti join this back onto ``train`` to get the
    clean corpus.
    """
    bench_grams = (
        bench.select(tokenize(text_col).alias("__toks"))
        .select(F.explode(ngrams_of_tokens("__toks", n)).alias("gram"))
        .distinct()
    )
    train_grams = train.select(
        F.col(id_col), tokenize(text_col).alias("__toks")
    ).select(
        F.col(id_col),
        F.explode(F.array_distinct(ngrams_of_tokens("__toks", n))).alias(
            "gram"
        ),
    )
    return (
        train_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_grams"))
    )
