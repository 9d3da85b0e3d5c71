"""Analytics batch 3: sketch-exact cardinality (deterministic
HyperLogLog), language statistics (bigram collocations / PMI), user
behavior modeling (Markov transitions, point-in-time state joins),
text retrieval (BM25), and information-theoretic quality scoring
(character entropy).

Same conventions as the other plan modules: pure DataFrame/Catalyst
plans with DuckDB oracle twins; every double that crosses an
aggregation is snapped to a 1e-6 integer grid first (the
``unigram_perplexity_scores`` pattern) so both engines sum exact
integers and only present a double at the end.

The HyperLogLog here is *deterministic*: registers are built from the
same md5-derived 60-bit hash in both engines, and the harmonic-mean
denominator is an EXACT integer (sum of ``1 << (53 - M[j])``), so the
estimate is bit-reproducible — the sketch quality of HLL with the
testability of exact SQL. Reference parity: the reference engine has
no sketches at all (SURVEY.md §2.7); this is the scale-path addition
for 100 TB distinct counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from datapipelinedemo_spark.pin import pin

from datapipelinedemo_spark.functions.stable import md5_long
from datapipelinedemo_spark.functions.text import tokenize
from datapipelinedemo_spark.plans.catalog import register
from datapipelinedemo_spark.tables import table

# DuckDB tokenizer twin (same as corpus_ops._TOKS).
_TOKS = r"list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')"

# ---------------------------------------------------------------------------
# Deterministic HyperLogLog: m=256 registers over a 60-bit md5 hash.
# j = h % 256, w = h div 256 (52 bits), rho = leading-zero rank of w.
# Z is kept as the exact BIGINT  sum(1 << (53 - M[j]))  (= 2^53 * sum 2^-M),
# so  E_raw = alpha * m^2 * 2^53 / Z  involves exactly ONE double division.
# Small-range correction (linear counting) when E_raw <= 2.5m and V > 0.
# ---------------------------------------------------------------------------
_HLL_M = 256
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 256.0)
# alpha * m^2 * 2^53 as one literal so both engines divide the same constant.
_HLL_C = _HLL_ALPHA * 65536.0 * 9007199254740992.0
_HLL_SMALL = 2.5 * 256.0  # linear-counting threshold


@register(
    "hll_distinct_users",
    oracle=f"""
    WITH hh AS (
        SELECT event_type,
               CAST('0x' || substring(md5(CAST(user_id AS VARCHAR) || '#hll'),
                                      1, 15) AS BIGINT) AS hv
        FROM events
    ),
    present AS (
        SELECT event_type, hv % 256 AS j,
               MAX(CASE WHEN hv // 256 = 0 THEN 53
                        ELSE 53 - length(bin(hv // 256)) END) AS m
        FROM hh GROUP BY 1, 2
    ),
    grid AS (
        SELECT t.event_type, g.j
        FROM (SELECT DISTINCT event_type FROM events) t,
             (SELECT unnest(generate_series(0, 255)) AS j) g
    ),
    regs AS (
        SELECT grid.event_type, COALESCE(present.m, 0) AS m
        FROM grid LEFT JOIN present
          ON present.event_type = grid.event_type AND present.j = grid.j
    ),
    agg AS (
        SELECT event_type,
               CAST(SUM(CAST(1 AS BIGINT) << CAST(53 - m AS INT))
                    AS BIGINT) AS zsum,
               CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS v
        FROM regs GROUP BY 1
    ),
    exact AS (
        SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS ed
        FROM events GROUP BY 1
    )
    SELECT a.event_type AS event_type,
           round(CASE WHEN ({_HLL_C!r} / CAST(a.zsum AS DOUBLE))
                           <= {_HLL_SMALL!r} AND a.v > 0
                      THEN 256.0 * ln(256.0 / CAST(a.v AS DOUBLE))
                      ELSE {_HLL_C!r} / CAST(a.zsum AS DOUBLE) END, 6)
               AS hll_estimate,
           a.v AS empty_registers,
           e.ed AS exact_distinct
    FROM agg a JOIN exact e ON e.event_type = a.event_type
    """,
)
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user cardinality via a deterministic
    HyperLogLog (m=256), next to the exact count for error audit.

    Scale story: the register build is ONE partial-aggregable groupBy
    on (event_type, register) — max() combines map-side, so 100 TB of
    events reduce to |types| * 256 rows before the shuffle; the exact
    countDistinct next to it is the expensive full-shuffle path the
    sketch replaces in production. Registers are filled against a
    crossJoin grid of |types| * 256 rows (driver-free, broadcast).
    The estimate's denominator is an exact BIGINT (sum of powers of
    two), so both engines agree bit-for-bit; the only doubles are one
    division and (in the small-range branch) one ln of an exact
    rational, both presentation-rounded to 1e-6.
    """
    ev = table(spark, sf_dir, "events")
    hh = ev.select(
        "event_type",
        md5_long(
            F.concat(F.col("user_id").cast("string"), F.lit("#hll"))
        ).alias("hv"),
    )
    r = hh.select(
        "event_type",
        F.expr("hv % 256").alias("j"),
        F.expr("hv div 256").alias("w"),
    )
    present = (
        r.select(
            "event_type",
            "j",
            F.when(F.col("w") == 0, F.lit(53))
            .otherwise(F.lit(53) - F.length(F.bin("w")))
            .alias("rho"),
        )
        .groupBy("event_type", "j")
        .agg(F.max("rho").alias("m"))
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(
        spark.range(256).select(F.col("id").alias("j"))
    )
    regs = grid.join(present, ["event_type", "j"], "left").select(
        "event_type", F.coalesce("m", F.lit(0)).alias("m")
    )
    agg = regs.groupBy("event_type").agg(
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - m AS INT))")
        ).alias("zsum"),
        F.sum(F.when(F.col("m") == 0, 1).otherwise(0))
        .cast("long")
        .alias("v"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("ed")
    )
    e_raw = F.lit(_HLL_C) / F.col("zsum").cast("double")
    return (
        agg.join(exact, "event_type")
        .select(
            "event_type",
            F.round(
                F.when(
                    (e_raw <= F.lit(_HLL_SMALL)) & (F.col("v") > 0),
                    F.lit(256.0)
                    * F.log(F.lit(256.0) / F.col("v").cast("double")),
                ).otherwise(e_raw),
                6,
            ).alias("hll_estimate"),
            F.col("v").alias("empty_registers"),
            F.col("ed").alias("exact_distinct"),
        )
    )


# ---------------------------------------------------------------------------
# Bigram collocations: counts, conditional probability, PMI.
# ---------------------------------------------------------------------------
@register(
    "bigram_collocations",
    oracle=f"""
    WITH tok AS (SELECT {_TOKS} AS t FROM documents),
    g AS (
        SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
        FROM tok WHERE len(t) >= 2
    ),
    bg AS (SELECT t[i] AS w1, t[i + 1] AS w2 FROM g),
    c AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_xy
        FROM bg GROUP BY 1, 2
    ),
    m AS (
        SELECT w1, w2, c_xy,
               CAST(SUM(c_xy) OVER (PARTITION BY w1) AS BIGINT) AS cl,
               CAST(SUM(c_xy) OVER (PARTITION BY w2) AS BIGINT) AS cr,
               CAST(SUM(c_xy) OVER () AS BIGINT) AS ntot
        FROM c
    )
    SELECT w1, w2, c_xy,
           round(CAST(c_xy AS DOUBLE) / CAST(cl AS DOUBLE), 6) AS cond_p,
           round(ln((CAST(c_xy AS DOUBLE) * CAST(ntot AS DOUBLE))
                    / (CAST(cl AS DOUBLE) * CAST(cr AS DOUBLE))), 6) AS pmi
    FROM m WHERE c_xy >= 5
    """,
)
def bigram_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram statistics — the n-gram-LM training counts plus
    the two classic collocation scores: P(w2|w1) and pointwise mutual
    information against the bigram-table marginals.

    The token array is projected ONCE before the in-row pair
    expansion (Catalyst would otherwise re-evaluate the tokenizer per
    sequence element — the higher-order-lambda inlining trap), so each
    document emits its bigrams from a single pass. After the one
    count shuffle the frame is vocabulary²-bounded; the marginal
    windows run on that small frame, not the corpus. PMI/cond_p are
    ratios of exact integers — one double expression, mirrored
    operation-for-operation in the oracle.
    """
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(tokenize("text").alias("t")).filter(
        F.size("t") >= 2
    )
    bg = tok.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(element_at(t, i) AS w1,"
                "             element_at(t, i + 1) AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    c = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c_xy")
    )
    # ntot as a broadcast 1-row scalar, NOT an empty-partition window:
    # the observed-bigram frame grows ~linearly with corpus tokens, so
    # sum().over(Window.partitionBy()) would funnel the whole frame
    # through one task (VERDICT r11 #3's partitionless-window class;
    # explain-audit asserts none survive on unbounded grains)
    ntot = c.agg(F.sum("c_xy").cast("long").alias("ntot"))
    m = c.select(
        "w1",
        "w2",
        "c_xy",
        F.sum("c_xy").over(Window.partitionBy("w1")).alias("cl"),
        F.sum("c_xy").over(Window.partitionBy("w2")).alias("cr"),
    ).crossJoin(F.broadcast(ntot))
    return m.filter(F.col("c_xy") >= 5).select(
        "w1",
        "w2",
        "c_xy",
        F.round(
            F.col("c_xy").cast("double") / F.col("cl").cast("double"), 6
        ).alias("cond_p"),
        F.round(
            F.log(
                (F.col("c_xy").cast("double") * F.col("ntot").cast("double"))
                / (F.col("cl").cast("double") * F.col("cr").cast("double"))
            ),
            6,
        ).alias("pmi"),
    )


# ---------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences.
# ---------------------------------------------------------------------------
@register(
    "event_transition_probs",
    oracle="""
    WITH x AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id, event_type)
                   AS prev
        FROM events
    ),
    c AS (
        SELECT prev AS prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM x WHERE prev IS NOT NULL GROUP BY 1, 2
    )
    SELECT prev_type, next_type, cnt,
           round(CAST(cnt AS DOUBLE)
                 / CAST(SUM(cnt) OVER (PARTITION BY prev_type) AS DOUBLE),
                 6) AS prob
    FROM c
    """,
)
def event_transition_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior:
    P(next event type | previous event type), estimated over every
    user's time-ordered event stream.

    The lag window and the count groupBy both key on user_id-derived
    partitions, so the whole query is one shuffle of the stream plus
    one |types|²-sized aggregate; the probability normalization runs
    as a window on that tiny matrix. The ORDER BY tie-break includes
    event_id AND event_type because the events table contains
    duplicate (ts, event_id) rows (same reasoning as
    ``scd2_user_type_history``).
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id", "event_type")
    x = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    )
    c = (
        x.filter(F.col("prev").isNotNull())
        .groupBy(
            F.col("prev").alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return c.select(
        "prev_type",
        "next_type",
        "cnt",
        F.round(
            F.col("cnt").cast("double")
            / F.sum("cnt")
            .over(Window.partitionBy("prev_type"))
            .cast("double"),
            6,
        ).alias("prob"),
    )


# ---------------------------------------------------------------------------
# Point-in-time join: purchases against the SCD2 browsing-state
# dimension (what non-purchase state was the user in when they bought).
# ---------------------------------------------------------------------------
@register(
    "pit_purchase_user_state",
    oracle="""
    WITH nonp AS (
        SELECT * FROM events WHERE event_type <> 'purchase'
    ),
    x AS (
        SELECT user_id, ts, event_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id, event_type)
                   AS prev
        FROM nonp
    ),
    g AS (
        SELECT user_id, ts, event_id, event_type,
               SUM(CASE WHEN prev IS NULL OR prev <> event_type
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id
                         ORDER BY ts, event_id, event_type
                         ROWS UNBOUNDED PRECEDING) AS grp
        FROM x
    ),
    isl AS (
        SELECT user_id, grp, event_type AS state, MIN(ts) AS valid_from
        FROM g GROUP BY 1, 2, 3
    ),
    dim AS (
        SELECT user_id, state, valid_from FROM (
            SELECT user_id, state, valid_from,
                   ROW_NUMBER() OVER (PARTITION BY user_id, valid_from
                                      ORDER BY grp DESC) AS rn
            FROM isl
        ) WHERE rn = 1
    ),
    pur AS (
        SELECT user_id, event_id, ts, value,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2, 3, 4
    ),
    j AS (
        SELECT p.user_id, p.event_id, p.ts, p.value, p.n_rows,
               d.state,
               ROW_NUMBER() OVER (
                   PARTITION BY p.user_id, p.event_id, p.ts, p.value
                   ORDER BY d.valid_from DESC) AS rn
        FROM pur p LEFT JOIN dim d
          ON d.user_id = p.user_id AND d.valid_from <= p.ts
    )
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           value, COALESCE(state, 'none') AS state, n_rows
    FROM j WHERE rn = 1
    """,
)
def pit_purchase_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) join of the purchase fact stream against
    the SCD2 browsing-state dimension: for each purchase, the state
    the user was in (latest non-purchase island started at or before
    the purchase), 'none' when the purchase precedes any state.

    Composition proof for two prior operators: the gaps-and-islands
    SCD2 build (``scd2_user_type_history``) feeding the sorted-merge
    as-of join (``asof_join_sorted``) — one shuffle per side on
    user_id, no per-key fan-out, which is the plan that survives users
    with deep histories at 100 TB. Purchases are pre-aggregated to
    (user, event, ts, value) with a multiplicity column because the
    raw feed contains exact-duplicate rows.
    """
    from datapipelinedemo_spark.operators.asof import asof_join_sorted

    ev = table(spark, sf_dir, "events")
    nonp = ev.filter(F.col("event_type") != "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id", "event_type")
    g = nonp.select(
        "user_id",
        "ts",
        F.col("event_type").alias("state"),
        F.sum(
            F.when(
                F.lag("event_type").over(w).isNull()
                | (F.lag("event_type").over(w) != F.col("event_type")),
                1,
            ).otherwise(0)
        )
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("grp"),
    )
    isl = g.groupBy("user_id", "grp", "state").agg(
        F.min("ts").alias("valid_from")
    )
    # Two islands can share a valid_from when duplicate-ts rows flip
    # type at the same instant; keep the later island (max grp).
    wd = Window.partitionBy("user_id", "valid_from").orderBy(F.desc("grp"))
    dim = (
        isl.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
        .select(
            F.col("user_id").alias("s_user"), "state", "valid_from"
        )
    )
    pur = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "event_id", "ts", "value")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    j = asof_join_sorted(
        pur, dim, "user_id", "s_user", "ts", "valid_from", how="left"
    )
    return j.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "value",
        F.coalesce("state", F.lit("none")).alias("state"),
        "n_rows",
    )


# ---------------------------------------------------------------------------
# BM25 retrieval: top-50 documents for a fixed keyword query.
# ---------------------------------------------------------------------------
_BM25_TERMS = ["join", "hash", "filter", "merge", "scan"]
_BM25_IN = ", ".join(f"'{t}'" for t in _BM25_TERMS)


@register(
    "bm25_topk_docs",
    oracle=f"""
    WITH dls AS (
        SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS dl FROM documents
    ),
    totals AS (
        SELECT CAST(SUM(dl) AS BIGINT) AS tot,
               CAST(COUNT(*) AS BIGINT) AS nd
        FROM dls
    ),
    tc AS (
        SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tc WHERE term IN ({_BM25_IN}) GROUP BY 1, 2
    ),
    dft AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS dft FROM tf GROUP BY 1
    ),
    idf AS (
        SELECT term,
               CAST(FLOOR(ln((CAST(nd AS DOUBLE) - CAST(dft AS DOUBLE) + 0.5)
                             / (CAST(dft AS DOUBLE) + 0.5) + 1.0)
                          * 1000000.0 + 0.5) AS BIGINT) AS idf6
        FROM dft, totals
    ),
    s AS (
        SELECT tf.doc_id,
               CAST(FLOOR(((CAST(idf.idf6 AS DOUBLE) / 1000000.0)
                           * (CAST(tf.tf AS DOUBLE) * 2.2))
                          / (CAST(tf.tf AS DOUBLE)
                             + 1.2 * (0.25 + 0.75 * (CAST(dls.dl AS DOUBLE)
                                      / (CAST(totals.tot AS DOUBLE)
                                         / CAST(totals.nd AS DOUBLE)))))
                          * 1000000.0 + 0.5) AS BIGINT) AS s6
        FROM tf
        JOIN idf ON idf.term = tf.term
        JOIN dls ON dls.doc_id = tf.doc_id
        CROSS JOIN totals
    ),
    perdoc AS (
        SELECT doc_id, CAST(SUM(s6) AS BIGINT) AS score6,
               CAST(COUNT(*) AS BIGINT) AS n_query_terms
        FROM s GROUP BY 1
    )
    SELECT doc_id, CAST(score6 AS DOUBLE) / 1000000.0 AS bm25,
           n_query_terms
    FROM perdoc ORDER BY score6 DESC, doc_id LIMIT 50
    """,
)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75) top-50 retrieval for a fixed
    5-term keyword query over the documents table.

    Plan shape for 100 TB: the corpus is touched twice (doc lengths,
    then a term scan pre-filtered to the query vocabulary — at most
    |Q| rows per doc survive the explode), and everything joined onto
    the per-doc rows is broadcast-sized (|Q| idf rows, one totals
    row). Per-(doc, term) scores snap to a 1e-6 integer grid before
    the per-doc sum, so ranking compares exact BIGINTs — no
    float-order ties — and both engines produce the identical top-50
    (ordered by score then doc_id).
    """
    docs = table(spark, sf_dir, "documents")
    dls = docs.select(
        "doc_id", F.size(tokenize("text")).cast("long").alias("dl")
    )
    # 1-row; pinned so idf and the scorer don't each re-run the
    # corpus-length aggregate (no cross-branch subtree sharing)
    totals = dls.agg(
        F.sum("dl").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("nd"),
    ).transform(pin)  # pin-bounded: 1-row corpus totals
    # dl rides along the term scan so the scorer needs no second
    # per-doc-length corpus pass
    tc = docs.select(
        "doc_id",
        F.size(tokenize("text")).cast("long").alias("dl"),
        F.explode(tokenize("text")).alias("term"),
    )
    # matched postings only (≤|Q| terms/doc survive the filter) —
    # the retrieval working set; pinned for its two consumers
    tf = (
        tc.filter(F.col("term").isin(_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.max("dl").alias("dl"),
        )
        .transform(pin)  # narrow-pin: ~40 B/row (doc_id, short term, tf, dl) — docs matching the fixed BM25 term set
    )
    dft = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("dft")
    )
    idf = dft.crossJoin(F.broadcast(totals)).select(
        "term",
        F.floor(
            F.log(
                (F.col("nd").cast("double") - F.col("dft").cast("double") + 0.5)
                / (F.col("dft").cast("double") + 0.5)
                + 1.0
            )
            * 1000000.0
            + 0.5
        )
        .cast("long")
        .alias("idf6"),
    )
    s = (
        tf.join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.floor(
                (
                    (F.col("idf6").cast("double") / 1000000.0)
                    * (F.col("tf").cast("double") * 2.2)
                )
                / (
                    F.col("tf").cast("double")
                    + 1.2
                    * (
                        0.25
                        + 0.75
                        * (
                            F.col("dl").cast("double")
                            / (
                                F.col("tot").cast("double")
                                / F.col("nd").cast("double")
                            )
                        )
                    )
                )
                * 1000000.0
                + 0.5
            )
            .cast("long")
            .alias("s6"),
        )
    )
    perdoc = s.groupBy("doc_id").agg(
        F.sum("s6").cast("long").alias("score6"),
        F.count(F.lit(1)).cast("long").alias("n_query_terms"),
    )
    return (
        perdoc.orderBy(F.desc("score6"), F.asc("doc_id"))
        .limit(50)
        .select(
            "doc_id",
            (F.col("score6").cast("double") / 1000000.0).alias("bm25"),
            "n_query_terms",
        )
    )


# ---------------------------------------------------------------------------
# Character-entropy quality scoring (Shannon entropy of the per-doc
# character distribution — the Gopher-family gibberish filter).
# ---------------------------------------------------------------------------
@register(
    "char_entropy_scores",
    oracle="""
    WITH x AS (
        SELECT doc_id, lower(text) AS s FROM documents WHERE length(text) >= 1
    ),
    g AS (
        SELECT doc_id, s, unnest(generate_series(1, length(s))) AS i FROM x
    ),
    ch AS (SELECT doc_id, substring(s, i, 1) AS ch FROM g),
    cnt AS (
        SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS nc
        FROM ch GROUP BY 1, 2
    ),
    t AS (
        SELECT doc_id, nc,
               nc * CAST(FLOOR(ln(CAST(nc AS DOUBLE)) * 1000000.0 + 0.5)
                         AS BIGINT) AS t6
        FROM cnt
    ),
    agg AS (
        SELECT doc_id,
               CAST(SUM(nc) AS BIGINT) AS dl,
               CAST(SUM(t6) AS BIGINT) AS s6,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_chars
        FROM t GROUP BY 1
    )
    SELECT doc_id,
           round(ln(CAST(dl AS DOUBLE))
                 - (CAST(s6 AS DOUBLE) / 1000000.0) / CAST(dl AS DOUBLE),
                 6) AS char_entropy,
           n_distinct_chars
    FROM agg
    """,
)
def char_entropy_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of each document's character
    distribution: H = ln(dl) - (sum n_c * ln n_c) / dl. Low-entropy
    docs (repeated characters, padding, boilerplate) are the classic
    cull; the natural-text band sits around 2.5-3.2 nats.

    Each per-character ln(n_c) snaps to the 1e-6 grid BEFORE the
    n_c-weighted per-doc sum, so the aggregation is exact integer
    math (order-independent across engines); the closing ln(dl) is a
    single double op on an exact integer. The character explode
    combines map-side (groupBy doc_id,char is partial-aggregable), so
    the shuffle carries at most |alphabet| rows per document, not the
    raw characters.
    """
    # r16 note: an in-row sorted-run-length rewrite (the
    # doc_repetition_stats treatment) was tried and REVERTED here —
    # per-CHARACTER interpreted HOF folds cost more than this explode
    # (2.2 s → 4.9 s): the (doc_id, ch) groupBy partial-aggregates
    # map-side to ≤|alphabet| rows per doc, so the exchange is tiny,
    # while the fold pays ~1 µs × every character. The repetition
    # stats won because their exploded form shuffled full GRAM STRINGS
    # (~3× the corpus text); single chars don't.
    docs = table(spark, sf_dir, "documents")
    x = docs.filter(F.length("text") >= 1).select(
        "doc_id", F.lower("text").alias("s")
    )
    ch = x.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("s"))).alias("i"),
        "s",
    ).select("doc_id", F.expr("substring(s, i, 1)").alias("ch"))
    cnt = ch.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).cast("long").alias("nc")
    )
    t = cnt.select(
        "doc_id",
        "nc",
        (
            F.col("nc")
            * F.floor(
                F.log(F.col("nc").cast("double")) * 1000000.0 + 0.5
            ).cast("long")
        ).alias("t6"),
    )
    agg = t.groupBy("doc_id").agg(
        F.sum("nc").cast("long").alias("dl"),
        F.sum("t6").cast("long").alias("s6"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chars"),
    )
    return agg.select(
        "doc_id",
        F.round(
            F.log(F.col("dl").cast("double"))
            - (F.col("s6").cast("double") / 1000000.0)
            / F.col("dl").cast("double"),
            6,
        ).alias("char_entropy"),
        "n_distinct_chars",
    )


# ---------------------------------------------------------------------------
# HLL register rollup: hourly sketch table merged to daily estimates.
# ---------------------------------------------------------------------------
@register(
    "hll_hourly_to_daily_users",
    oracle=f"""
    WITH hh AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               CAST(hour(ts) AS BIGINT) AS hr,
               CAST('0x' || substring(md5(CAST(user_id AS VARCHAR) || '#hll'),
                                      1, 15) AS BIGINT) AS hv
        FROM events
    ),
    hourly AS (
        SELECT day, hr, hv % 256 AS j,
               MAX(CASE WHEN hv // 256 = 0 THEN 53
                        ELSE 53 - length(bin(hv // 256)) END) AS m
        FROM hh GROUP BY 1, 2, 3
    ),
    merged AS (
        SELECT day, j, MAX(m) AS m FROM hourly GROUP BY 1, 2
    ),
    grid AS (
        SELECT d.day, g.j
        FROM (SELECT DISTINCT day FROM hh) d,
             (SELECT unnest(generate_series(0, 255)) AS j) g
    ),
    regs AS (
        SELECT grid.day, COALESCE(merged.m, 0) AS m
        FROM grid LEFT JOIN merged
          ON merged.day = grid.day AND merged.j = grid.j
    ),
    agg AS (
        SELECT day,
               CAST(SUM(CAST(1 AS BIGINT) << CAST(53 - m AS INT))
                    AS BIGINT) AS zsum,
               CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS v
        FROM regs GROUP BY 1
    ),
    exact AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS ed,
               CAST(COUNT(DISTINCT hour(ts)) AS BIGINT) AS n_hours
        FROM events GROUP BY 1
    )
    SELECT a.day AS day,
           round(CASE WHEN ({_HLL_C!r} / CAST(a.zsum AS DOUBLE))
                           <= {_HLL_SMALL!r} AND a.v > 0
                      THEN 256.0 * ln(256.0 / CAST(a.v AS DOUBLE))
                      ELSE {_HLL_C!r} / CAST(a.zsum AS DOUBLE) END, 6)
               AS hll_estimate,
           e.ed AS exact_distinct,
           e.n_hours AS n_hours_merged
    FROM agg a JOIN exact e ON e.day = a.day
    """,
)
def hll_hourly_to_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-rollup pattern that makes HLL worth having at
    100 TB: persist an HOURLY register table (|hours| x 256 rows —
    millions of times smaller than the raw stream), then answer the
    DAILY distinct-user question by merging registers (element-wise
    max) — never re-reading raw events. Associativity/idempotence of
    max makes the merged estimate IDENTICAL to a direct daily sketch
    (pytest-pinned), which is why the same register table can roll up
    to weeks or months for free.

    Plan: one partial-agg groupBy builds the hourly registers, one
    (day, register)-keyed max merges them; both combine map-side. The
    exact countDistinct runs alongside for the error audit.
    """
    ev = table(spark, sf_dir, "events")
    hh = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.hour("ts").cast("long").alias("hr"),
        md5_long(
            F.concat(F.col("user_id").cast("string"), F.lit("#hll"))
        ).alias("hv"),
    )
    r = hh.select(
        "day",
        "hr",
        F.expr("hv % 256").alias("j"),
        F.expr("hv div 256").alias("w"),
    )
    hourly = (
        r.select(
            "day",
            "hr",
            "j",
            F.when(F.col("w") == 0, F.lit(53))
            .otherwise(F.lit(53) - F.length(F.bin("w")))
            .alias("rho"),
        )
        .groupBy("day", "hr", "j")
        .agg(F.max("rho").alias("m"))
    )
    merged = hourly.groupBy("day", "j").agg(F.max("m").alias("m"))
    days = hh.select("day").distinct()
    grid = days.crossJoin(spark.range(256).select(F.col("id").alias("j")))
    regs = grid.join(merged, ["day", "j"], "left").select(
        "day", F.coalesce("m", F.lit(0)).alias("m")
    )
    agg = regs.groupBy("day").agg(
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - m AS INT))")
        ).alias("zsum"),
        F.sum(F.when(F.col("m") == 0, 1).otherwise(0))
        .cast("long")
        .alias("v"),
    )
    exact = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.countDistinct("user_id").alias("ed"),
        F.countDistinct(F.hour("ts")).alias("n_hours"),
    )
    e_raw = F.lit(_HLL_C) / F.col("zsum").cast("double")
    return (
        agg.join(exact, "day")
        .select(
            "day",
            F.round(
                F.when(
                    (e_raw <= F.lit(_HLL_SMALL)) & (F.col("v") > 0),
                    F.lit(256.0)
                    * F.log(F.lit(256.0) / F.col("v").cast("double")),
                ).otherwise(e_raw),
                6,
            ).alias("hll_estimate"),
            F.col("ed").alias("exact_distinct"),
            F.col("n_hours").alias("n_hours_merged"),
        )
    )


# ---------------------------------------------------------------------------
# Robust outlier statistics: median absolute deviation per event type.
# ---------------------------------------------------------------------------
@register(
    "value_mad_outliers",
    oracle="""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY 1
    ),
    dev AS (
        SELECT e.event_type, e.value, m.med,
               abs(e.value - m.med) AS adev
        FROM events e JOIN med m ON m.event_type = e.event_type
    ),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY 1
    )
    SELECT d.event_type AS event_type,
           round(MAX(d.med), 6) AS med,
           round(MAX(m.mad), 6) AS mad,
           CAST(SUM(CASE WHEN d.adev > 4.4478 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM dev d JOIN mad m ON m.event_type = d.event_type
    GROUP BY 1
    """,
)
def value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier accounting: median, median absolute
    deviation, and the count of values beyond 3 sigma-equivalents
    (3 x 1.4826 = 4.4478, the normal-consistency constant) — the
    outlier rule that, unlike mean/stddev, is not dragged by the
    outliers themselves.

    Three passes over the stream (median -> deviations -> MAD +
    flags), each a map-side-light aggregate; the per-type scalars
    travel as broadcast joins (|types| rows). Both engines compute
    the same interpolated median on the same doubles, and the flag
    compares identical IEEE products, so the counts agree exactly.
    """
    ev = table(spark, sf_dir, "events")
    # |types|-row scalars pinned: med feeds dev's two consumers, mad
    # feeds the final pass — without pins each re-derives a corpus scan
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    ).transform(pin)  # pin-bounded: |event types| rows
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    ).transform(pin)  # pin-bounded: |event types| rows
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.max("med"), 6).alias("med"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.sum(
                F.when(
                    F.col("adev") > F.lit(4.4478) * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 and vector cosine.
# ---------------------------------------------------------------------------
_RRF_K = 60.0
_VDOT = (
    "list_reduce(list_prepend(0.0::DOUBLE,"
    " [CAST(c.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)"
    "  for i in generate_series(1, 64)]), (x, y) -> x + y)"
)
_VNRM_C = (
    "sqrt(list_reduce(list_prepend(0.0::DOUBLE,"
    " [CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)"
    "  for i in generate_series(1, 64)]), (x, y) -> x + y))"
)
_VNRM_Q = _VNRM_C.replace("c.embedding", "q.embedding")


@register(
    "hybrid_retrieval_rrf",
    oracle=f"""
    WITH dls AS (
        SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS dl FROM documents
    ),
    totals AS (
        SELECT CAST(SUM(dl) AS BIGINT) AS tot,
               CAST(COUNT(*) AS BIGINT) AS nd
        FROM dls
    ),
    tc AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tc WHERE term IN ({_BM25_IN}) GROUP BY 1, 2
    ),
    dft AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS dft FROM tf GROUP BY 1
    ),
    idf AS (
        SELECT term,
               CAST(FLOOR(ln((CAST(nd AS DOUBLE) - CAST(dft AS DOUBLE) + 0.5)
                             / (CAST(dft AS DOUBLE) + 0.5) + 1.0)
                          * 1000000.0 + 0.5) AS BIGINT) AS idf6
        FROM dft, totals
    ),
    sc AS (
        SELECT tf.doc_id,
               CAST(FLOOR(((CAST(idf.idf6 AS DOUBLE) / 1000000.0)
                           * (CAST(tf.tf AS DOUBLE) * 2.2))
                          / (CAST(tf.tf AS DOUBLE)
                             + 1.2 * (0.25 + 0.75 * (CAST(dls.dl AS DOUBLE)
                                      / (CAST(totals.tot AS DOUBLE)
                                         / CAST(totals.nd AS DOUBLE)))))
                          * 1000000.0 + 0.5) AS BIGINT) AS s6
        FROM tf
        JOIN idf ON idf.term = tf.term
        JOIN dls ON dls.doc_id = tf.doc_id
        CROSS JOIN totals
    ),
    trank AS (
        SELECT doc_id AS id,
               ROW_NUMBER() OVER (ORDER BY score6 DESC, doc_id) AS rt
        FROM (SELECT doc_id, CAST(SUM(s6) AS BIGINT) AS score6
              FROM sc GROUP BY 1)
        ORDER BY score6 DESC, doc_id LIMIT 100
    ),
    vscore AS (
        SELECT c.vec_id AS id,
               round({_VDOT} / ({_VNRM_C} * {_VNRM_Q}), 6) AS cs
        FROM embeddings c, (SELECT embedding FROM embeddings
                            WHERE vec_id = 0) q
        WHERE c.vec_id <> 0
    ),
    vrank AS (
        SELECT id, ROW_NUMBER() OVER (ORDER BY cs DESC, id) AS rv
        FROM vscore ORDER BY cs DESC, id LIMIT 100
    ),
    fused AS (
        SELECT COALESCE(t.id, v.id) AS id,
               COALESCE(1.0 / ({_RRF_K!r} + CAST(t.rt AS DOUBLE)), 0.0)
               + COALESCE(1.0 / ({_RRF_K!r} + CAST(v.rv AS DOUBLE)), 0.0)
                   AS rrf,
               t.rt AS text_rank, v.rv AS vec_rank
        FROM trank t FULL OUTER JOIN vrank v ON v.id = t.id
    )
    SELECT id, round(rrf, 6) AS rrf_score,
           CAST(text_rank AS BIGINT) AS text_rank,
           CAST(vec_rank AS BIGINT) AS vec_rank
    FROM fused ORDER BY rrf DESC, id LIMIT 20
    """,
)
def hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search, the modern retrieval workload: fuse the BM25
    keyword ranking (fixed 5-term query) with the exact cosine
    ranking against a fixed query vector (vec_id 0) by reciprocal
    rank fusion, RRF = sum 1/(60 + rank) over both top-100 lists.

    Composition of two proven operators: the BM25 side ranks by the
    exact-integer grid score (no float ties), the vector side by the
    1e-6-rounded cosine with id tie-break, so both rank lists — and
    hence the fused ordering — are engine-identical. Each side is
    top-100-bounded before the full outer join, so the fusion frame
    is at most 200 rows regardless of corpus size; the expensive
    parts reuse the BM25/brute-force plans unchanged (query-vocab
    pre-filter, broadcast idf, corpus never shuffled).
    """
    from datapipelinedemo_spark.operators.similarity import cosine

    # --- text side: BM25 score6 ranking (same plan as bm25_topk_docs,
    # incl. its pins: 1-row totals, dl riding the term scan, postings
    # checkpointed for the dft + scorer consumers)
    docs = table(spark, sf_dir, "documents")
    dls = docs.select(
        "doc_id", F.size(tokenize("text")).cast("long").alias("dl")
    )
    totals = dls.agg(
        F.sum("dl").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("nd"),
    ).transform(pin)  # pin-bounded: 1-row corpus totals
    tc = docs.select(
        "doc_id",
        F.size(tokenize("text")).cast("long").alias("dl"),
        F.explode(tokenize("text")).alias("term"),
    )
    tf = (
        tc.filter(F.col("term").isin(_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.max("dl").alias("dl"),
        )
        .transform(pin)  # narrow-pin: ~40 B/row (doc_id, short term, tf, dl) — docs matching the fixed BM25 term set
    )
    dft = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("dft")
    )
    idf = dft.crossJoin(F.broadcast(totals)).select(
        "term",
        F.floor(
            F.log(
                (F.col("nd").cast("double") - F.col("dft").cast("double") + 0.5)
                / (F.col("dft").cast("double") + 0.5)
                + 1.0
            )
            * 1000000.0
            + 0.5
        )
        .cast("long")
        .alias("idf6"),
    )
    sc = (
        tf.join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.floor(
                (
                    (F.col("idf6").cast("double") / 1000000.0)
                    * (F.col("tf").cast("double") * 2.2)
                )
                / (
                    F.col("tf").cast("double")
                    + 1.2
                    * (
                        0.25
                        + 0.75
                        * (
                            F.col("dl").cast("double")
                            / (
                                F.col("tot").cast("double")
                                / F.col("nd").cast("double")
                            )
                        )
                    )
                )
                * 1000000.0
                + 0.5
            )
            .cast("long")
            .alias("s6"),
        )
    )
    trank = (
        sc.groupBy("doc_id")
        .agg(F.sum("s6").cast("long").alias("score6"))
        .orderBy(F.desc("score6"), F.asc("doc_id"))
        .limit(100)
        .select(
            F.col("doc_id").alias("id"),
            F.row_number()
            .over(Window.orderBy(F.desc("score6"), F.asc("doc_id")))
            .cast("long")
            .alias("rt"),
        )
    )

    # --- vector side: exact cosine vs the fixed query vector
    emb = table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )
    vscore = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("id"),
            F.round(cosine("embedding", "qvec"), 6).alias("cs"),
        )
    )
    vrank = (
        vscore.orderBy(F.desc("cs"), F.asc("id"))
        .limit(100)
        .select(
            "id",
            F.row_number()
            .over(Window.orderBy(F.desc("cs"), F.asc("id")))
            .cast("long")
            .alias("rv"),
        )
    )

    fused = trank.join(vrank, "id", "full_outer").select(
        "id",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(_RRF_K) + F.col("rt").cast("double")),
                F.lit(0.0),
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(_RRF_K) + F.col("rv").cast("double")),
                F.lit(0.0),
            )
        ).alias("rrf"),
        F.col("rt").alias("text_rank"),
        F.col("rv").alias("vec_rank"),
    )
    return (
        fused.orderBy(F.desc("rrf"), F.asc("id"))
        .limit(20)
        .select(
            "id",
            F.round("rrf", 6).alias("rrf_score"),
            "text_rank",
            "vec_rank",
        )
    )


# ---------------------------------------------------------------------------
# Recency-decayed engagement scores (exponential time decay).
# ---------------------------------------------------------------------------
_DECAY_REF = "2024-02-01 00:00:00"  # decay anchor (just past the event range)
# The anchor as exact epoch microseconds (UTC) — precomputed so the Spark
# side never parses the string through the session timezone: a literal
# integer is timezone-independent by construction, matching DuckDB's
# naive-as-UTC epoch_us(TIMESTAMP '...') exactly on any host TZ.
_DECAY_REF_US = 1706745600000000  # == epoch_us('2024-02-01 00:00:00' UTC)
_DECAY_LAMBDA = 0.1  # per-day decay rate


@register(
    "decayed_user_value_scores",
    oracle=f"""
    WITH d AS (
        SELECT user_id,
               CAST(FLOOR(
                   value * exp(-{_DECAY_LAMBDA!r} *
                       (CAST(epoch_us(TIMESTAMP '{_DECAY_REF}')
                             - epoch_us(ts) AS DOUBLE) / 86400000000.0))
                   * 10000.0 + 0.5) AS BIGINT) AS s4
        FROM events
    )
    SELECT user_id,
           round(CAST(CAST(SUM(s4) AS BIGINT) AS DOUBLE) / 10000.0, 6)
               AS decayed_value,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM d GROUP BY 1
    """,
)
def decayed_user_value_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement: per user, sum of event values
    decayed by exp(-0.1 * age_days) against a fixed anchor — the
    standard recency-weighted LTV / engagement score.

    Each row's decayed contribution snaps to a 1e-4 BIGINT grid
    BEFORE the per-user sum (the perplexity pattern): exp() of the
    same double is identical IEEE in both engines row-by-row, but a
    raw double SUM would be order-dependent — integer sums are not.
    Age is computed in exact microseconds (micros-truncated ts on
    both sides) divided once into days. One map-side-combining
    groupBy; no shuffle beyond it.
    """
    ev = table(spark, sf_dir, "events")
    # exact integer microsecond age (unix_micros), divided ONCE into
    # days — a seconds-double round-trip can drift an ulp vs DuckDB's
    # epoch_us integers
    age_days = (
        F.lit(_DECAY_REF_US) - F.unix_micros(F.col("ts"))
    ).cast("double") / 86400000000.0
    d = ev.select(
        "user_id",
        F.floor(
            F.col("value")
            * F.exp(F.lit(-_DECAY_LAMBDA) * age_days)
            * 10000.0
            + 0.5
        )
        .cast("long")
        .alias("s4"),
    )
    return d.groupBy("user_id").agg(
        F.round(F.sum("s4").cast("double") / 10000.0, 6).alias(
            "decayed_value"
        ),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Percent-of-parent contribution: priority share within its year.
# ---------------------------------------------------------------------------
@register(
    "priority_share_of_year",
    oracle="""
    WITH b AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS y, o_orderpriority,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS r2
        FROM orders GROUP BY 1, 2
    ),
    t AS (
        SELECT y, o_orderpriority, r2,
               CAST(SUM(r2) OVER (PARTITION BY y) AS BIGINT) AS yr2,
               CAST(SUM(r2) OVER () AS BIGINT) AS g2
        FROM b
    )
    SELECT y, o_orderpriority,
           round(CAST(r2 AS DOUBLE) / 100.0, 6) AS revenue,
           round(CAST(r2 AS DOUBLE) / CAST(yr2 AS DOUBLE), 6)
               AS share_of_year,
           round(CAST(r2 AS DOUBLE) / CAST(g2 AS DOUBLE), 6)
               AS share_of_total
    FROM t
    """,
)
def priority_share_of_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent contribution analysis: each (year, priority)
    cell's revenue as a share of its parent year and of the grand
    total — the drill-down companion to the rollup queries.

    The share windows run on the ALREADY-AGGREGATED
    (year x priority) frame (dozens of rows), never the fact table;
    cents are exact BIGINTs so every ratio is one double division of
    exact integers.
    """
    o = table(spark, sf_dir, "orders")
    b = o.groupBy(
        F.year("o_orderdate").cast("long").alias("y"),
        "o_orderpriority",
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
        )
        .cast("long")
        .alias("r2")
    )
    t = b.select(
        "y",
        "o_orderpriority",
        "r2",
        F.sum("r2").over(Window.partitionBy("y")).alias("yr2"),
        F.sum("r2").over(Window.partitionBy()).alias("g2"),
    )
    return t.select(
        "y",
        "o_orderpriority",
        F.round(F.col("r2").cast("double") / 100.0, 6).alias("revenue"),
        F.round(
            F.col("r2").cast("double") / F.col("yr2").cast("double"), 6
        ).alias("share_of_year"),
        F.round(
            F.col("r2").cast("double") / F.col("g2").cast("double"), 6
        ).alias("share_of_total"),
    )


# ---------------------------------------------------------------------------
# Trigram behavior paths: the most common 3-step event sequences.
# ---------------------------------------------------------------------------
@register(
    "top_event_trigram_paths",
    oracle="""
    WITH x AS (
        SELECT user_id, event_type,
               LAG(event_type, 1) OVER w AS p1,
               LAG(event_type, 2) OVER w AS p2
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY ts, event_id, event_type)
    ),
    c AS (
        SELECT p2 AS step1, p1 AS step2, event_type AS step3,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM x WHERE p2 IS NOT NULL GROUP BY 1, 2, 3
    )
    SELECT step1, step2, step3, cnt,
           round(CAST(cnt AS DOUBLE)
                 / CAST(CAST(SUM(cnt) OVER () AS BIGINT) AS DOUBLE), 6)
               AS frac
    FROM c
    """,
)
def top_event_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step behavior paths (the flow-analysis view of the
    Markov matrix): every consecutive (step1 -> step2 -> step3)
    triple per user with its share of all observed triples.

    Both lags share the one user_id window sort; the counted frame is
    |types|³-bounded (125 rows at 5 types) so the share window is
    free. Same duplicate-row tie-break discipline as the transition
    matrix.
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id", "event_type")
    x = ev.select(
        F.col("event_type").alias("step3"),
        F.lag("event_type", 1).over(w).alias("step2"),
        F.lag("event_type", 2).over(w).alias("step1"),
    )
    c = (
        x.filter(F.col("step1").isNotNull())
        .groupBy("step1", "step2", "step3")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return c.select(
        "step1",
        "step2",
        "step3",
        "cnt",
        F.round(
            F.col("cnt").cast("double")
            / F.sum("cnt").over(Window.partitionBy()).cast("double"),
            6,
        ).alias("frac"),
    )


# ---------------------------------------------------------------------------
# HLL set algebra: audience overlap via inclusion-exclusion.
# ---------------------------------------------------------------------------
_HLL_EST = (
    "CASE WHEN ({c!r} / CAST({z} AS DOUBLE)) <= {s!r} AND {v} > 0 "
    "THEN 256.0 * ln(256.0 / CAST({v} AS DOUBLE)) "
    "ELSE {c!r} / CAST({z} AS DOUBLE) END"
)


def _est_sql(z: str, v: str) -> str:
    return _HLL_EST.format(c=_HLL_C, s=_HLL_SMALL, z=z, v=v)


@register(
    "hll_type_overlap",
    oracle=f"""
    WITH hh AS (
        SELECT event_type,
               CAST('0x' || substring(md5(CAST(user_id AS VARCHAR) || '#hll'),
                                      1, 15) AS BIGINT) AS hv
        FROM events
    ),
    present AS (
        SELECT event_type, hv % 256 AS j,
               MAX(CASE WHEN hv // 256 = 0 THEN 53
                        ELSE 53 - length(bin(hv // 256)) END) AS m
        FROM hh GROUP BY 1, 2
    ),
    grid AS (
        SELECT t.event_type, g.j
        FROM (SELECT DISTINCT event_type FROM events) t,
             (SELECT unnest(generate_series(0, 255)) AS j) g
    ),
    regs AS (
        SELECT grid.event_type, grid.j, COALESCE(present.m, 0) AS m
        FROM grid LEFT JOIN present
          ON present.event_type = grid.event_type AND present.j = grid.j
    ),
    single AS (
        SELECT event_type,
               CAST(SUM(CAST(1 AS BIGINT) << CAST(53 - m AS INT))
                    AS BIGINT) AS z,
               CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
        FROM regs GROUP BY 1
    ),
    pairu AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(SUM(CAST(1 AS BIGINT)
                        << CAST(53 - GREATEST(a.m, b.m) AS INT))
                    AS BIGINT) AS z,
               CAST(SUM(CASE WHEN GREATEST(a.m, b.m) = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS v
        FROM regs a JOIN regs b
          ON a.j = b.j AND a.event_type < b.event_type
        GROUP BY 1, 2
    ),
    du AS (SELECT DISTINCT event_type, user_id FROM events),
    exact AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS exact_overlap
        FROM du a JOIN du b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b,
           round(({_est_sql('sa.z', 'sa.v')})
                 + ({_est_sql('sb.z', 'sb.v')})
                 - ({_est_sql('p.z', 'p.v')}), 6) AS est_overlap,
           e.exact_overlap
    FROM pairu p
    JOIN single sa ON sa.event_type = p.type_a
    JOIN single sb ON sb.event_type = p.type_b
    JOIN exact e ON e.type_a = p.type_a AND e.type_b = p.type_b
    """,
)
def hll_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch set-algebra: estimated audience overlap |A∩B| between
    every pair of event types by inclusion-exclusion —
    E(A) + E(B) − E(A∪B) — where the union sketch is just the
    element-wise register max (no raw-data re-scan), next to the
    exact overlap for error audit.

    This is why mergeable sketches run analytics at 100 TB: once the
    per-type register tables exist (256 rows each), every pairwise —
    or k-way — union/overlap question is answered on |types|·256
    rows. The register join is grid-aligned (equi-join on j), the
    union is GREATEST(m_a, m_b), and all three estimates reuse the
    same exact-BIGINT denominator construction, so the whole algebra
    is engine-exact.
    """
    ev = table(spark, sf_dir, "events")
    hh = ev.select(
        "event_type",
        md5_long(
            F.concat(F.col("user_id").cast("string"), F.lit("#hll"))
        ).alias("hv"),
    )
    present = (
        hh.select(
            "event_type",
            F.expr("hv % 256").alias("j"),
            F.expr("hv div 256").alias("w"),
        )
        .select(
            "event_type",
            "j",
            F.when(F.col("w") == 0, F.lit(53))
            .otherwise(F.lit(53) - F.length(F.bin("w")))
            .alias("rho"),
        )
        .groupBy("event_type", "j")
        .agg(F.max("rho").alias("m"))
    )
    # present is ≤ |types|·256 rows — pin it so the three consumers of
    # regs (single, ra, rb) don't each re-derive the corpus scan +
    # register shuffle (Catalyst has no cross-branch subtree sharing)
    present = present.transform(pin)  # pin-bounded: <= |types|*256 rows
    types = present.select("event_type").distinct()
    grid = types.crossJoin(spark.range(256).select(F.col("id").alias("j")))
    regs = grid.join(present, ["event_type", "j"], "left").select(
        "event_type", "j", F.coalesce("m", F.lit(0)).alias("m")
    )

    def sketch_agg(frame, keys):
        return frame.groupBy(*keys).agg(
            F.sum(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - m AS INT))")
            ).alias("z"),
            F.sum(F.when(F.col("m") == 0, 1).otherwise(0))
            .cast("long")
            .alias("v"),
        )

    single = sketch_agg(regs, ["event_type"])

    ra = regs.select(
        F.col("event_type").alias("type_a"), "j", F.col("m").alias("ma")
    )
    rb = regs.select(
        F.col("event_type").alias("type_b"), "j", F.col("m").alias("mb")
    )
    pairu = sketch_agg(
        ra.join(rb, "j")
        .filter(F.col("type_a") < F.col("type_b"))
        .select(
            "type_a", "type_b", F.greatest("ma", "mb").alias("m")
        ),
        ["type_a", "type_b"],
    )

    def est(z, v):
        e_raw = F.lit(_HLL_C) / z.cast("double")
        return F.when(
            (e_raw <= F.lit(_HLL_SMALL)) & (v > 0),
            F.lit(256.0) * F.log(F.lit(256.0) / v.cast("double")),
        ).otherwise(e_raw)

    # the exact-overlap audit column (test-scale only at this
    # fidelity); pinned so the self-join's two sides share one
    # distinct pass
    du = ev.select("event_type", "user_id").distinct().transform(pin)  # narrow-pin: ~24 B/row (short type, user_id)
    da = du.select(
        F.col("event_type").alias("type_a"), "user_id"
    )
    db = du.select(
        F.col("event_type").alias("type_b"), "user_id"
    )
    exact = (
        da.join(db, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_overlap"))
    )

    sa = single.select(
        F.col("event_type").alias("type_a"),
        F.col("z").alias("za"),
        F.col("v").alias("va"),
    )
    sb = single.select(
        F.col("event_type").alias("type_b"),
        F.col("z").alias("zb"),
        F.col("v").alias("vb"),
    )
    return (
        pairu.join(sa, "type_a")
        .join(sb, "type_b")
        .join(exact, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            F.round(
                est(F.col("za"), F.col("va"))
                + est(F.col("zb"), F.col("vb"))
                - est(F.col("z"), F.col("v")),
                6,
            ).alias("est_overlap"),
            "exact_overlap",
        )
    )


# --------------------------------------------------------------------------
# Day-over-day distribution drift (PSI) of the event-value histogram —
# the monitoring table a production pipeline alarms on (PSI > 0.2 is
# the standard "investigate" bar). Design for cross-engine exactness
# and scale:
# - bins are the certified value_histogram_20bins convention with
#   CORPUS-WIDE bounds (one 1-row broadcast), so every day's histogram
#   is comparable;
# - each day×bin cell is Laplace-smoothed ((c+1)/(n+20)) so empty bins
#   never hit ln(0) and the inputs to every float op are exact
#   integers;
# - the per-bin PSI term (p−q)·ln(p/q) snaps to the 1e-6 grid BEFORE
#   the 20-term sum, so the final SUM is exact-BIGINT and order-free —
#   a raw double SUM over bins would be engine-order-dependent (the
#   functions/stable.py playbook; ln shares the classifier-sigmoid
#   determinism precedent);
# - adjacent days pair by JOIN on day = prev_day + 1 (no window at
#   all); everything after the (day, bin) partial-agg count is
#   calendar-bounded (≤ |days|×20 rows).
# --------------------------------------------------------------------------
@register(
    "event_value_drift_psi",
    oracle="""
    WITH b AS (
        SELECT MIN(value) AS mn, MAX(value) AS mx FROM events
    ),
    cnt AS (
        SELECT CAST(ts AS DATE) AS day,
               LEAST(CAST(FLOOR((value - mn) / ((mx - mn) / 20.0))
                     AS BIGINT), 19) AS bin,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events, b GROUP BY 1, 2
    ),
    days AS (SELECT day, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
    dense AS (
        SELECT d.day, g.bin, d.n, COALESCE(cnt.c, 0) AS c
        FROM days d
        CROSS JOIN (SELECT unnest(generate_series(0, 19)) AS bin) g
        LEFT JOIN cnt ON cnt.day = d.day AND cnt.bin = g.bin
    ),
    pairs AS (
        SELECT cur.day AS day,
               cur.n AS n_cur, prv.n AS n_prev,
               CAST(FLOOR(
                 ((CAST(cur.c + 1 AS DOUBLE) / (cur.n + 20))
                  - (CAST(prv.c + 1 AS DOUBLE) / (prv.n + 20)))
                 * ln((CAST(cur.c + 1 AS DOUBLE) / (cur.n + 20))
                      / (CAST(prv.c + 1 AS DOUBLE) / (prv.n + 20)))
                 * 1e6 + 0.5) AS BIGINT) AS term6
        FROM dense cur
        JOIN dense prv
          ON prv.day = cur.day - INTERVAL 1 DAY AND prv.bin = cur.bin
    )
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(MAX(n_cur) AS BIGINT) AS n_cur,
           CAST(MAX(n_prev) AS BIGINT) AS n_prev,
           round(CAST(CAST(SUM(term6) AS BIGINT) AS DOUBLE) / 1e6, 6)
               AS psi
    FROM pairs GROUP BY day
    """,
)
def event_value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, n_cur, n_prev, psi): population-stability index of each
    day's event-value distribution against the previous day (section
    comment above)."""
    ev = table(spark, sf_dir, "events")
    b = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    binc = F.least(
        F.floor(
            (F.col("value") - F.col("mn"))
            / ((F.col("mx") - F.col("mn")) / 20.0)
        ).cast("long"),
        F.lit(19),
    )
    cnt = (
        ev.crossJoin(F.broadcast(b))
        .select(F.col("ts").cast("date").alias("day"), binc.alias("bin"))
        .groupBy("day", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    days = cnt.groupBy("day").agg(F.sum("c").cast("long").alias("n"))
    bins = spark.range(0, 20).select(F.col("id").cast("long").alias("bin"))
    from datapipelinedemo_spark.pin import pin

    # PINNED: both the current-day and previous-day branches consume
    # this frame, and Catalyst has no cross-branch subtree sharing —
    # unpinned, each branch re-derives the corpus-grain (day, bin)
    # count, i.e. TWO event scans instead of one. The frame itself is
    # calendar-bounded (|days|×20 rows), the class pinning is for.
    dense = pin(  # pin-bounded: calendar |days| x 20-bin grid
        days.crossJoin(F.broadcast(bins))
        .join(cnt, ["day", "bin"], "left")
        .select(
            "day",
            "bin",
            "n",
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c"),
        )
    )
    cur = dense.select(
        F.col("day"),
        "bin",
        F.col("n").alias("n_cur"),
        F.col("c").alias("c_cur"),
    )
    prv = dense.select(
        F.date_add(F.col("day"), 1).alias("day"),
        "bin",
        F.col("n").alias("n_prev"),
        F.col("c").alias("c_prev"),
    )
    p = (F.col("c_cur") + 1).cast("double") / (F.col("n_cur") + 20)
    q = (F.col("c_prev") + 1).cast("double") / (F.col("n_prev") + 20)
    term6 = F.floor((p - q) * F.log(p / q) * F.lit(1e6) + F.lit(0.5)).cast(
        "long"
    )
    pairs = cur.join(prv, ["day", "bin"]).select(
        "day", "n_cur", "n_prev", term6.alias("term6")
    )
    return pairs.groupBy("day").agg(
        F.max("n_cur").cast("long").alias("n_cur"),
        F.max("n_prev").cast("long").alias("n_prev"),
        F.round(
            F.sum("term6").cast("long").cast("double") / 1e6, 6
        ).alias("psi"),
    ).select(
        F.col("day").cast("string").alias("day"),
        "n_cur",
        "n_prev",
        "psi",
    )
