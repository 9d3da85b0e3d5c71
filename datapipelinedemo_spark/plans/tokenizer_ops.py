"""Distributed BPE tokenizer training (Sennrich et al. 2016).

The tokenizer-training step of an LLM data pipeline, Spark-first:

- **One corpus-scale pass, ever.** Classic BPE trains on the *word
  frequency histogram*, not the corpus: tokenize → explode → one
  hash-groupBy gives ``(word, count)``. At 100 TB the histogram is
  vocabulary-sized (Heaps' law: tens of millions of rows, not
  billions), so every training iteration after that first pass runs
  on a frame ~5 orders of magnitude smaller than the corpus.
- **Iterations are declarative.** Each round: adjacent-symbol pair
  counts (in-row pair expression → partial-agg sum), pick the argmax
  pair (a 1-row collect — a plan constant in the IVF-centroid sense),
  apply the merge with a single in-row ``aggregate`` fold per word.
  No Python UDFs, no RDDs; word arrays are ≤ 25 symbols so the fold
  is bounded codegen work.
- **Greedy merge semantics, exactly.** A merge (a, b) is applied
  left-to-right, non-overlapping, against the *pre-merge* symbol
  sequence — the fold consumes position i+1 when i merges and keeps
  scanning at i+2, which is the reference BPE behavior
  (``tests/test_bpe.py`` pins equivalence against a pure-Python
  reimplementation).

The DuckDB oracle replays the same training run without recursion:
greedy non-overlap is window-expressible because two *consecutive*
positions can both start the pair (a, b) only when a == b (sym[i]=a,
sym[i+1]=b=a, sym[i+2]=b); islands of consecutive matches therefore
merge at even offsets only — a gaps-and-islands computation, unrolled
once per training step with the step's argmax pair read via scalar
subqueries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datapipelinedemo_spark.functions.text import tokenize
from datapipelinedemo_spark.plans.catalog import register
from datapipelinedemo_spark.tables import table

MAX_WORD_CHARS = 24  # scale hygiene: bounds the symbol fold + explode
N_MERGES = 4

# DuckDB twin of functions.text.tokenize (documented on that function)
_TOK_SQL = (
    r"list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')"
)

_WORDS_CTE = f"""
    WITH words AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS wcnt
        FROM (SELECT unnest({_TOK_SQL}) AS word FROM documents)
        WHERE length(word) <= {MAX_WORD_CHARS}
        GROUP BY word
    ), cur0 AS (
        SELECT word, wcnt,
               [substring(word, i, 1)
                for i in generate_series(1, length(word))] || ['</w>'] AS syms
        FROM words
    )
"""


def _pair_cte(s: int) -> str:
    """ex{s}/pc{s}: adjacent-pair counts over cur{s-1} (zipped unnest
    of the two shifted slices — DuckDB zips parallel unnests)."""
    return f"""
    , ex{s} AS (
        SELECT wcnt,
               unnest(list_slice(syms, 1, len(syms) - 1)) AS lhs,
               unnest(list_slice(syms, 2, len(syms))) AS rhs
        FROM cur{s - 1}
    ), pc{s} AS (
        SELECT lhs, rhs, CAST(SUM(wcnt) AS BIGINT) AS pair_count
        FROM ex{s} GROUP BY lhs, rhs
    ), top{s} AS (
        SELECT lhs, rhs, pair_count FROM pc{s}
        ORDER BY pair_count DESC, lhs, rhs LIMIT 1
    )
"""


def _apply_cte(s: int) -> str:
    """cur{s}: cur{s-1} with top{s}'s pair merged greedily (windowed
    gaps-and-islands; see module docstring for why this is exact)."""
    a, b = f"(SELECT lhs FROM top{s})", f"(SELECT rhs FROM top{s})"
    return f"""
    , pos{s} AS (
        SELECT word, wcnt,
               unnest(generate_series(1, len(syms))) AS i,
               unnest(syms) AS s
        FROM cur{s - 1}
    ), m{s} AS (
        SELECT word, wcnt, i, s,
               CASE WHEN s = {a}
                     AND lead(s) OVER (PARTITION BY word ORDER BY i) = {b}
                    THEN 1 ELSE 0 END AS mt
        FROM pos{s}
    ), isl{s} AS (
        SELECT *, CASE WHEN mt = 1 THEN
            i - ROW_NUMBER() OVER (PARTITION BY word, mt ORDER BY i)
        END AS isl FROM m{s}
    ), mg{s} AS (
        SELECT *, CASE WHEN mt = 1 AND
            (ROW_NUMBER() OVER (PARTITION BY word, isl ORDER BY i) - 1) % 2 = 0
            THEN 1 ELSE 0 END AS mrg
        FROM isl{s}
    ), out{s} AS (
        SELECT word, wcnt, i,
               CASE WHEN mrg = 1 THEN {a} || {b}
                    WHEN lag(mrg) OVER (PARTITION BY word ORDER BY i) = 1
                    THEN NULL
                    ELSE s END AS s2
        FROM mg{s}
    ), cur{s} AS (
        SELECT word, wcnt,
               list(s2 ORDER BY i) FILTER (WHERE s2 IS NOT NULL) AS syms
        FROM out{s} GROUP BY word, wcnt
    )
"""


def _merges_oracle() -> str:
    parts = [_WORDS_CTE]
    for s in range(1, N_MERGES + 1):
        parts.append(_pair_cte(s))
        if s < N_MERGES:
            parts.append(_apply_cte(s))
    finals = " UNION ALL ".join(
        f"SELECT CAST({s} AS INTEGER) AS step, lhs, rhs,"
        f" lhs || rhs AS merged, pair_count FROM top{s}"
        for s in range(1, N_MERGES + 1)
    )
    return "".join(parts) + finals


_SYMS_EXPR = (
    "concat(transform(sequence(1, length(word)), i -> substring(word, i, 1)),"
    " array('</w>'))"
)

_PAIRS_EXPR = (
    "transform(sequence(1, size(syms) - 1),"
    " i -> named_struct('lhs', element_at(syms, i),"
    "                   'rhs', element_at(syms, i + 1)))"
)


def _word_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, wcnt, syms) — the ONLY corpus-scale pass of the whole
    training run (tokenize + explode + one partial-agg groupBy)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokenize("text")).alias("word"))
        .filter(F.length("word") <= MAX_WORD_CHARS)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcnt"))
        .withColumn("syms", F.expr(_SYMS_EXPR))
    )


def _pair_counts(cur: DataFrame) -> DataFrame:
    return (
        cur.select("wcnt", F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("wcnt").alias("pair_count"))
    )


def _sql_lit(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def apply_merge(cur: DataFrame, lhs: str, rhs: str) -> DataFrame:
    """One in-row greedy fold per word: scan the PRE-merge symbol
    array left-to-right; at a match emit lhs||rhs and consume the
    next position; non-overlapping by construction. Pure codegen —
    arrays are ≤ MAX_WORD_CHARS+1 symbols."""
    a, b, ab = _sql_lit(lhs), _sql_lit(rhs), _sql_lit(lhs + rhs)
    fold = f"""
    aggregate(
      sequence(1, size(syms)),
      named_struct('out', cast(array() as array<string>), 'skip', false),
      (acc, i) -> case
        when acc.skip then named_struct('out', acc.out, 'skip', false)
        when i < size(syms) and element_at(syms, i) = {a}
             and element_at(syms, i + 1) = {b}
          then named_struct('out', concat(acc.out, array({ab})),
                            'skip', true)
        else named_struct('out',
                          concat(acc.out, array(element_at(syms, i))),
                          'skip', false)
      end,
      acc -> acc.out)
    """
    return cur.withColumn("syms", F.expr(fold))


def train_bpe(
    spark: SparkSession, words: DataFrame, n_merges: int = N_MERGES
) -> list[tuple[int, str, str, str, int]]:
    """Run ``n_merges`` BPE iterations over a (word, wcnt, syms)
    histogram; returns [(step, lhs, rhs, merged, pair_count)].

    Each step's argmax is a 1-row collect (deterministic tie-break:
    count DESC, then binary string order on the pair) — the next
    step's plan embeds it as a constant, exactly like the IVF
    centroid frames. Intermediates are persisted per step and
    unpersisted before return; nothing leaks past the call."""
    merges: list[tuple[int, str, str, str, int]] = []
    cur = words.persist()
    pinned = [cur]
    try:
        for step in range(1, n_merges + 1):
            top = (
                _pair_counts(cur)
                .orderBy(
                    F.col("pair_count").desc(), F.col("lhs"), F.col("rhs")
                )
                .limit(1)
                .collect()
            )
            if not top:
                break
            r = top[0]
            merges.append(
                (step, r.lhs, r.rhs, r.lhs + r.rhs, int(r.pair_count))
            )
            if step < n_merges:
                cur = apply_merge(cur, r.lhs, r.rhs).persist()
                pinned.append(cur)
    finally:
        for fr in pinned:
            fr.unpersist()
    return merges


@register(
    "bpe_pair_counts",
    oracle=_WORDS_CTE
    + _pair_cte(1)
    + """
    SELECT lhs, rhs, pair_count,
           CAST(ROW_NUMBER() OVER (ORDER BY pair_count DESC, lhs, rhs)
                AS BIGINT) AS rnk
    FROM pc1
    ORDER BY pair_count DESC, lhs, rhs LIMIT 20
    """,
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-1 BPE statistics: top-20 adjacent symbol pairs by
    corpus-weighted count, with a deterministic rank. The top-k is a
    TakeOrderedAndProject (per-partition heads merged on the driver);
    only the 20 surviving rows pass through the rank window."""
    pc = _pair_counts(_word_histogram(spark, sf_dir))
    top = pc.orderBy(
        F.col("pair_count").desc(), F.col("lhs"), F.col("rhs")
    ).limit(20)  # TakeOrderedAndProject: per-partition top-k + merge
    w = Window.orderBy(F.col("pair_count").desc(), F.col("lhs"), F.col("rhs"))
    # the rank window runs AFTER the limit — single-partition over
    # exactly 20 rows, never over the pair table
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))


@register("bpe_train_merges", oracle=_merges_oracle())
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four BPE training iterations over the documents corpus:
    (step, lhs, rhs, merged, pair_count) — the learned merge table, in
    order. One corpus pass builds the word histogram; every iteration
    after that is vocab-sized (see module docstring)."""
    merges = train_bpe(spark, _word_histogram(spark, sf_dir), N_MERGES)
    return spark.createDataFrame(
        merges,
        "step int, lhs string, rhs string, merged string, pair_count bigint",
    )
