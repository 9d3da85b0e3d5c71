"""Deduplication operators for training-data pipelines.

Five strategies, all expression-native (no Python UDFs):

- ``exact``          — hash-groupBy on normalized content.
- ``minhash_lsh``    — shingle → MinHash signature → banded LSH
                       bucket join (the scale path for near-dup at
                       100 TB: candidate pairs only within buckets).
- ``simhash``        — 48-bit SimHash signatures; near-dups share
                       high-order band + small Hamming distance.
- ``ngram_jaccard``  — exact Jaccard over shingle sets for candidate
                       pairs (verification stage after LSH).
- embedding cosine near-dup lives in ``operators.similarity``.

Hash functions are md5-derived (``functions.stable.md5_long``) so the
DuckDB oracle can reproduce signatures bit-for-bit; swap for
``xxhash64`` when oracle parity is not needed (≈3× faster).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


MH_MOD = 2_147_483_647  # 2^31-1: a*h+b stays < 2^62, no BIGINT overflow


def _mh_params(num_hashes: int) -> tuple[list[int], list[int]]:
    """Deterministic (a, b) parameters for the MinHash family
    h_i(x) = (a_i * x + b_i) mod P — fixed LCG-style constants so
    Spark, the oracle, and every round agree."""
    a = [(2 * i + 1) * 40_503 % MH_MOD for i in range(num_hashes)]
    b = [(i * 1_299_721 + 104_729) % MH_MOD for i in range(num_hashes)]
    return a, b


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Keep exactly one row (min id) per distinct content. Grouping is
    on a hash of the content rather than the content itself so wide
    documents don't travel through the shuffle twice.

    NOT a per-fingerprint window (the r13 exact-substring de-skew
    lesson applied at the source): a hot fingerprint — one boilerplate
    page exact-duplicated 10⁶-10⁸ times in a crawl — would sort in a
    single unsplittable task under ``row_number().over(partitionBy(
    __fp))``. The min-id is a partial-aggregable ``groupBy`` (the hot
    key collapses map-side) and the join-back's skewed partition is
    AQE-splittable."""
    fp = F.md5(F.concat_ws("\x1f", *content_cols)).alias("__fp")
    with_fp = df.select("*", fp)
    keep = with_fp.groupBy("__fp").agg(
        F.min(F.col(id_col)).alias(id_col)
    )
    return with_fp.join(keep, ["__fp", id_col]).drop("__fp")


def shingle_hashes(text_col: str, k: int = 9, hash: str = "md5") -> Column:
    """Distinct integer hashes of the char k-shingles.

    ``hash='md5'`` (default) is the oracle-parity path — DuckDB can
    reproduce ``conv(substring(md5(s),1,15),16,10)`` bit-for-bit.
    ``hash='xxhash64'`` is the production path: one JVM intrinsic
    instead of md5→hex→parse (measured ~2× on the near-dup pipeline,
    PERF.md); same downstream semantics (uniform 31-bit values), not
    cross-engine reproducible."""
    if hash == "xxhash64":
        h = f"(xxhash64(s) % {MH_MOD} + {MH_MOD}) % {MH_MOD}"
    elif hash == "md5":
        h = f"cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint) % {MH_MOD}"
    else:
        raise ValueError(f"shingle_hashes: unknown hash {hash!r}")
    return F.expr(
        f"array_distinct(transform("
        f" transform(sequence(1, greatest(length({text_col}) - {k - 1}, 0)),"
        f"  i -> substring({text_col}, i, {k})),"
        f" s -> {h}))"
    )


def minhash_signature(shingle_col: str, num_hashes: int = 32) -> Column:
    """MinHash signature as array<bigint> of length ``num_hashes`` —
    element i = min over shingle hashes h of (a_i * h + b_i) mod P.

    Implemented as ONE left fold over the shingle array that updates
    all ``num_hashes`` running minima per step — the shingle array is
    evaluated exactly once per row. (The naive per-i formulation
    re-evaluates the shingle expression num_hashes times: 30× slower.)
    Empty shingle set → all-(P) sentinel signature (never matches)."""
    a, b = _mh_params(num_hashes)
    a_arr = "array(" + ",".join(f"{x}L" for x in a) + ")"
    b_arr = "array(" + ",".join(f"{x}L" for x in b) + ")"
    init = f"transform(sequence(1, {num_hashes}), x -> {MH_MOD}L)"
    return F.expr(
        f"aggregate({shingle_col}, {init}, (acc, h) ->"
        f" transform(acc, (m, i) ->"
        f"  least(m, (element_at({a_arr}, i + 1) * h"
        f"            + element_at({b_arr}, i + 1)) % {MH_MOD})))"
    )


def with_minhash(
    df: DataFrame, text: str, num_hashes: int = 32, k: int = 9,
    hash: str = "md5",
) -> DataFrame:
    return (
        df.withColumn("__sh", shingle_hashes(text, k, hash))
        .withColumn("minhash", minhash_signature("__sh", num_hashes))
        .drop("__sh")
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text: str,
    num_hashes: int = 32,
    bands: int = 4,
    k: int = 9,
    shingles: DataFrame | None = None,
    bucket_cap: int | None = 1024,
    hash: str = "md5",
) -> DataFrame:
    """Banded-LSH candidate pairs: docs whose MinHash signatures agree
    on at least one band of r = num_hashes/bands consecutive values.

    Plan shape (the 100 TB path): signature is computed per row
    (no shuffle), bands explode ×bands, then ONE shuffle on
    (band, band-key) groups candidates; the pair join happens only
    inside buckets. Output: distinct (id_a < id_b) pairs.

    Hot-bucket bound: web crawls have pathologically common signatures
    (boilerplate / near-constant docs), and an uncapped bucket means one
    k² task and one OOM. With ``bucket_cap`` = c, docs in a bucket are
    ranked by id (window over the same shuffle partitioning — no extra
    exchange) and
      * the first c docs expand all-pairs in-row (≤ C(c,2) per bucket);
      * every doc past the cap emits ONE pair with the bucket's minimum
        doc (star expansion) — per-task memory is O(c), output is
        O(n·c) per bucket instead of O(n²), and duplicate-cluster
        connectivity is preserved for union-find downstream (overflow
        docs in a hot bucket are near-identical boilerplate, so the
        star edges survive Jaccard verification together).
    Buckets at or under the cap produce the identical pair set as
    ``bucket_cap=None`` (the uncapped path).
    """
    banded = banded_minhash(
        df, id_col, text, num_hashes, bands, k, shingles, hash
    )
    return bucketed_candidate_pairs(banded, bucket_cap)


def banded_minhash(
    df: DataFrame,
    id_col: str,
    text: str,
    num_hashes: int = 32,
    bands: int = 4,
    k: int = 9,
    shingles: DataFrame | None = None,
    hash: str = "md5",
) -> DataFrame:
    """(doc, band, key) banded-MinHash index rows for ``df`` — the
    stored form of an LSH index. Persist/write this once per corpus;
    ``bucketed_candidate_pairs`` derives in-corpus candidates from it
    and ``incremental_lsh_candidates`` joins a new batch against it
    without re-signing the corpus."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    if shingles is None:
        shingles = df.select(
            F.col(id_col).alias("doc"),
            shingle_hashes(text, k, hash).alias("__sh"),
        )
    sig = shingles.withColumn("minhash", minhash_signature("__sh", num_hashes))
    return sig.select(
        "doc",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), bnd ->"
                f" array_join(transform(slice(minhash, bnd * {r} + 1, {r}),"
                f"  v -> cast(v as string)), '_'))"
            )
        ).alias("band", "key"),
    )


def incremental_lsh_candidates(
    new_banded: DataFrame,
    corpus_banded: DataFrame,
    bucket_cap: int | None = 1024,
) -> DataFrame:
    """Incremental near-dup: candidates for a NEW ingest batch against
    an EXISTING corpus whose banded index is already materialized —
    the daily-ingest path at 100 TB, where re-signing the corpus per
    batch would be a full re-scan of everything ever ingested.

    Inputs are (doc, band, key) frames from ``banded_minhash``. Plan:
    the tiny new batch shuffles into the corpus index's (band, key)
    buckets — ONE shuffle of the batch; the corpus index moves only if
    it isn't already bucketed by (band, key) (write it bucketed and
    this is a local join). Output is the union of
      * new-vs-corpus pairs (``pair_type='vs_corpus'``): any shared
        band key, corpus side capped at ``bucket_cap`` docs per bucket
        (hot boilerplate buckets bound each task; the cap keeps at
        least one representative edge per bucket so downstream
        clustering still connects the batch doc to the cluster), and
      * new-vs-new pairs (``pair_type='in_batch'``): the standard
        ``bucketed_candidate_pairs`` over the batch alone.
    Columns: (doc_a = new doc, doc_b, pair_type), distinct.
    """
    corpus = corpus_banded
    if bucket_cap is not None:
        w = Window.partitionBy("band", "key").orderBy(F.col("doc").asc())
        corpus = (
            corpus.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= bucket_cap)
            .drop("__rn")
        )
    cross = (
        new_banded.alias("n")
        .join(corpus.alias("c"), ["band", "key"])
        # a batch and a corpus are disjoint in the batch pipeline, but
        # an at-least-once STREAMING source can re-deliver an
        # already-indexed doc_id in a later batch — without this guard
        # that emits (doc, doc) self-pairs (the embedding stream's
        # id_new != id_corpus twin)
        .filter(F.col("n.doc") != F.col("c.doc"))
        .select(
            F.col("n.doc").alias("doc_a"),
            F.col("c.doc").alias("doc_b"),
        )
        .distinct()
        .withColumn("pair_type", F.lit("vs_corpus"))
    )
    in_batch = bucketed_candidate_pairs(new_banded, bucket_cap).withColumn(
        "pair_type", F.lit("in_batch")
    )
    return cross.unionByName(in_batch)


def bucketed_candidate_pairs(
    banded: DataFrame, bucket_cap: int | None
) -> DataFrame:
    """Shared bucket → pair expansion for every banding scheme
    (MinHash bands, SimHash bands, hyperplane buckets): group per
    (band, key) bucket and expand pairs in-row instead of a self-join
    — one shuffle, and the upstream signature pipeline is evaluated
    once (a self-join formulation recomputes it per side). Input
    frame: (doc, band, key). Output: distinct (doc_a < doc_b).

    ``bucket_cap`` applies the hot-bucket bound documented on
    ``lsh_candidate_pairs``: all-pairs for the first cap docs, star
    expansion to the bucket minimum for the overflow.
    """
    from datapipelinedemo_spark.operators.pairs import pair_combinations

    if bucket_cap is None:
        head = banded
    else:
        w = Window.partitionBy("band", "key").orderBy(F.col("doc").asc())
        ranked = banded.withColumn("__rn", F.row_number().over(w))
        head = ranked.filter(F.col("__rn") <= bucket_cap).drop("__rn")

    buckets = (
        head.groupBy("band", "key")
        .agg(F.sort_array(F.collect_list("doc")).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    pairs = (
        buckets.select(F.explode(pair_combinations("ds")).alias("p"))
        .select(F.col("p.item1").alias("doc_a"), F.col("p.item2").alias("doc_b"))
    )
    if bucket_cap is not None:
        rep = ranked.filter(F.col("__rn") == 1).select(
            "band", "key", F.col("doc").alias("doc_a")
        )
        overflow = ranked.filter(F.col("__rn") > bucket_cap).select(
            "band", "key", F.col("doc").alias("doc_b")
        )
        # rep is the bucket minimum and overflow ranks past it, so
        # doc_a < doc_b holds by construction; co-partitioned join.
        star = overflow.join(rep, ["band", "key"]).select("doc_a", "doc_b")
        pairs = pairs.unionByName(star)
    return pairs.distinct()


def simhash_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    bands: int = 4,
    band_bits: int = 12,
    bucket_cap: int | None = 1024,
) -> DataFrame:
    """Banded-SimHash candidate pairs: split the signature into
    ``bands`` contiguous bit fields and bucket-join docs agreeing on
    any band. With bands * band_bits covering the full signature,
    pigeonhole guarantees recall 1.0 for pairs within Hamming
    distance bands - 1 (4 x 12 over 48 bits -> every pair at
    Hamming <= 3 shares at least one band). Same single-shuffle,
    hot-bucket-capped plan as the MinHash path."""
    mask = (1 << band_bits) - 1
    banded = sigs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), bnd ->"
                f" shiftright({sig_col}, bnd * {band_bits}) & {mask}L)"
            )
        ).alias("band", "key"),
    )
    return bucketed_candidate_pairs(banded, bucket_cap)


def simhash(tokens_col: str, bits: int = 48) -> Column:
    """SimHash over a token array: bit b of the signature is 1 iff the
    sum over tokens of ±1 (per that token's md5 bit b) is >= 0.
    48 bits keeps every intermediate in BIGINT range in both engines.

    Single fold: token md5s are hashed once, then one pass updates all
    ``bits`` counters (the naive per-bit loop recomputes every token
    hash ``bits`` times — ~30× slower); a finish lambda folds the
    counter array into the signature."""
    h = "cast(conv(substring(md5(w), 1, 12), 16, 10) as bigint)"
    return F.expr(
        f"aggregate("
        f" transform({tokens_col}, w -> {h}),"
        f" transform(sequence(1, {bits}), x -> 0L),"
        f" (acc, hv) -> transform(acc, (cnt, b) ->"
        f"   cnt + if((hv >> b) & 1 = 1, 1L, -1L)),"
        f" acc -> aggregate(transform(acc, (cnt, b) ->"
        f"   if(cnt >= 0, shiftleft(1L, b), 0L)), 0L, (s, x) -> s + x))"
    ).cast("long")


def jaccard_verify(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str,
    text: str,
    k: int = 9,
    threshold: float = 0.5,
    shingles: DataFrame | None = None,
    hash: str = "md5",
) -> DataFrame:
    """Exact n-gram Jaccard over a candidate-pair set (``doc_a``,
    ``doc_b``): joins each side's distinct shingle-hash array back and
    intersects *inside the row* (no shingle-level explode join — the
    all-pairs shingle self-join is quadratic in docs-per-shingle and
    melts down on repetitive corpora). This is the verification stage
    after ``lsh_candidate_pairs``; the pair of hash-joins broadcasts
    when the candidate set is small."""
    if shingles is None:
        shingles = df.select(
            F.col(id_col).alias("doc"),
            shingle_hashes(text, k, hash).alias("__sh"),
        )
    sh = shingles
    out = (
        candidates.join(
            sh.select(F.col("doc").alias("doc_a"), F.col("__sh").alias("sh_a")),
            "doc_a",
        )
        .join(
            sh.select(F.col("doc").alias("doc_b"), F.col("__sh").alias("sh_b")),
            "doc_b",
        )
        .withColumn("ix", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("ix").cast("double")
            / (F.size("sh_a") + F.size("sh_b") - F.col("ix")).cast("double"),
        )
    )
    return out.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    )


def containment_verify(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str,
    text: str,
    k: int = 9,
    threshold: float = 0.7,
    shingles: DataFrame | None = None,
    hash: str = "md5",
) -> DataFrame:
    """Asymmetric shingle containment over a candidate-pair set:
    ``C(A,B) = |A∩B| / |A|``, reported as the max of the two
    directions. Catches subset/quote duplication — a short document
    wholly embedded in a much longer one — where symmetric Jaccard is
    diluted by the big side's size (|A∩B|/|A∪B| ≈ |A|/|B| → 0) and
    never crosses its threshold.

    Same plan shape as ``jaccard_verify``: the pair set is bounded by
    LSH upstream, each side's distinct shingle array joins back once,
    and the intersection happens *inside the row* — no shingle-level
    explode join, so repetitive corpora can't quadratic-blow the
    shuffle. Both engines filter on the ROUNDED score so boundary
    pairs agree bit-for-bit.
    """
    if shingles is None:
        shingles = df.select(
            F.col(id_col).alias("doc"),
            shingle_hashes(text, k, hash).alias("__sh"),
        )
    sh = shingles
    out = (
        candidates.join(
            sh.select(F.col("doc").alias("doc_a"), F.col("__sh").alias("sh_a")),
            "doc_a",
        )
        .join(
            sh.select(F.col("doc").alias("doc_b"), F.col("__sh").alias("sh_b")),
            "doc_b",
        )
        .withColumn("ix", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "containment",
            F.round(
                F.greatest(
                    F.col("ix").cast("double") / F.size("sh_a").cast("double"),
                    F.col("ix").cast("double") / F.size("sh_b").cast("double"),
                ),
                6,
            ),
        )
    )
    return out.filter(F.col("containment") >= threshold).select(
        "doc_a",
        "doc_b",
        F.col("ix").cast("long").alias("n_shared"),
        "containment",
    )


def neardup_pipeline(
    df: DataFrame,
    id_col: str,
    text: str,
    num_hashes: int = 32,
    bands: int = 4,
    k: int = 9,
    threshold: float = 0.5,
    bucket_cap: int | None = 1024,
    hash: str = "md5",
) -> DataFrame:
    """The full near-dup pipeline: MinHash → banded LSH candidates →
    exact Jaccard verification. One shuffle for the band grouping, two
    hash joins for verification — the shape that survives 100 TB.

    The shingle frame is computed once and cached (both the candidate
    stage and the verification stage consume it; on a real cluster
    you would checkpoint it to parquet instead of executor memory)."""
    shingles = df.select(
        F.col(id_col).alias("doc"), shingle_hashes(text, k, hash).alias("__sh")
    ).persist()
    cand = lsh_candidate_pairs(
        df, id_col, text, num_hashes, bands, k,
        shingles=shingles, bucket_cap=bucket_cap,
    )
    return jaccard_verify(
        df, cand, id_col, text, k, threshold, shingles=shingles
    )


# --------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer et al. 2003) — the distributable
# exact-substring-dedup primitive.
# --------------------------------------------------------------------------

WINNOW_K = 5  # token k-gram length
WINNOW_W = 4  # window size; guarantee: shared runs >= w+k-1 = 8 tokens


def winnow(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS fingerprinter) →
    ``(doc_id, pos, fingerprint, gram)``, pos 1-based over the doc's
    token k-gram sequence.

    Selection rule: a position is kept iff it is the rightmost
    minimum of at least one length-``w`` window of consecutive k-gram
    hashes (docs with fewer than ``w`` k-grams form a single window).
    Expected density 2/(w+1); the guarantee that makes this the
    distributable relaxation of exact-substring dedup (Lee et al.
    2022): any token run of length >= w+k-1 shared by two docs yields
    a shared fingerprint.

    Plan shape: per-row k-gram + hash expressions (whole-stage
    codegen), one explode to <=w rows per k-gram, one partial-agg
    groupBy (doc, window) taking min(struct(hash, -pos)) — the
    rightmost-min — then distinct. No window functions, so both
    shuffles are map-side combinable and keyed at (doc, window)
    grain; the explode factor w is a constant. The md5-derived 60-bit
    gram hash is the repo's cross-engine parity choice; production
    would flip to xxhash64 like the MinHash family.
    """
    from datapipelinedemo_spark.functions import text as TX
    from datapipelinedemo_spark.operators.decontamination import (
        ngrams_of_tokens,
    )

    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            TX.tokenize(text_col).alias("toks"),
        )
        .withColumn("grams", ngrams_of_tokens("toks", k))
        .withColumn("m", F.size("grams"))
        .filter(F.col("m") > 0)
    )
    hashed = toks.select(
        "doc_id",
        "m",
        F.posexplode("grams").alias("pos0", "gram"),
    ).select(
        "doc_id",
        "m",
        (F.col("pos0") + 1).alias("pos"),
        "gram",
        F.expr(
            "cast(conv(substring(md5(gram), 1, 15), 16, 10) as bigint)"
        ).alias("h"),
    )
    # window-start ids containing pos (1-based); for m < w the whole
    # doc is the single window 1.
    exploded = hashed.withColumn(
        "win",
        F.explode(
            F.sequence(
                F.greatest(F.lit(1), F.col("pos") - F.lit(w - 1)),
                F.least(
                    F.col("pos"),
                    F.greatest(F.lit(1), F.col("m") - F.lit(w - 1)),
                ),
            )
        ),
    )
    return (
        exploded.groupBy("doc_id", "win")
        .agg(
            F.min(
                F.struct(
                    F.col("h").alias("h"),
                    (-F.col("pos")).alias("np"),
                    F.col("gram").alias("gram"),
                )
            ).alias("sel")
        )
        .select(
            "doc_id",
            (-F.col("sel.np")).alias("pos"),
            F.col("sel.h").alias("fingerprint"),
            F.col("sel.gram").alias("gram"),
        )
        .distinct()
    )


ES_L = 50  # exact-substring span threshold (Lee et al. 2022), tokens


def exact_substring_grams(
    docs: DataFrame, L: int = ES_L, hash: str = "md5"
) -> DataFrame:
    """(doc_id, pos, h): the hash of every L-token gram of every
    document (1-based token position) — the corpus pass of the
    exact-substring dedup family (plans/dedup_ext.py banner). One
    in-row transform over the token array; the gram string never
    leaves the row.

    ``hash='md5'`` (default) is the oracle-parity path — DuckDB
    reproduces the hex-prefix parse bit-for-bit. ``hash='xxhash64'``
    is the production path, same flag as the MinHash family
    (``shingle_hashes``): one JVM intrinsic instead of
    md5→hex→parse (measured speedup in PERF.md); downstream
    duplicate DETECTION is hash-agnostic (grams are compared only
    for equality), equivalence-tested in
    tests/test_dedup_ext.py::test_exact_substring_xxhash64_same_detection.

    ``hash='rolling'`` (VERDICT r13 next-round #4) never materializes
    the gram string at all: one xxhash64 per TOKEN (JVM-side, O(n)
    total bytes instead of O(n·L) for the per-gram ``array_join``),
    then an Arrow-batched numpy cumulative polynomial hash over the
    token-hash sequence — O(1) per position (``_rolling_gram_hashes``).
    The Catalyst HOF form of the same idea measured SLOWER (interpreted
    lambdas, PERF.md r13); this is the ``mapInPandas`` form that
    analysis called for. Same detection-equivalence certification
    (tests/test_dedup_ext.py::test_exact_substring_rolling_same_detection)."""
    from datapipelinedemo_spark.functions import text as TX
    from datapipelinedemo_spark.functions.stable import md5_long

    if hash == "rolling":
        return _rolling_gram_hashes(docs, L)
    if hash == "xxhash64":
        h = F.xxhash64(F.col("gram"))
    elif hash == "md5":
        h = md5_long(F.col("gram"))
    else:
        raise ValueError(f"exact_substring_grams: unknown hash {hash!r}")
    return (
        docs.withColumn("t", TX.tokenize("text"))
        .filter(F.size("t") >= L)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(t) - {L - 1}),"
                    f" i -> array_join(slice(t, cast(i as int),"
                    f" {L}), ' '))"
                )
            ).alias("p0", "gram"),
        )
        .select(
            "doc_id",
            (F.col("p0") + 1).cast("long").alias("pos"),
            h.alias("h"),
        )
    )


# Polynomial base for the rolling gram hash: odd (hence invertible mod
# 2^64) and high-entropy (the 64-bit golden ratio, splitmix64's
# increment — a public-domain constant). All arithmetic is uint64
# wraparound, i.e. exact mod-2^64 — no BigInt, no precision loss.
_RG_BASE = 0x9E3779B97F4A7C15
_RG_BASE_INV = pow(_RG_BASE, -1, 1 << 64)


def _rolling_gram_hashes(docs: DataFrame, L: int) -> DataFrame:
    """(doc_id, pos, h) for every L-token gram — O(1) per position.

    The md5/xxhash64 paths pay O(L) bytes per position materializing
    the gram STRING (``array_join(slice(t, i, L))`` ≈ 300 bytes at
    L=50) before hashing; at 100 TB that inflates the corpus ~50× in
    flight. Here the gram string never exists:

    1. JVM-side, one ``xxhash64`` per TOKEN (O(n) work per doc) —
       the only pass that touches text bytes.
    2. ``mapInPandas`` over (doc_id, token-hash array): the gram hash
       is the degree-(L-1) polynomial of the window's token hashes
       mod 2^64,  H(i) = Σ_j t[i+j]·B^(L-1-j).  Computed for ALL
       positions in O(n) via exclusive prefix sums of t[j]·B^(-j)
       (numpy uint64 cumsum/cumprod — wraparound IS mod 2^64):
       H(i) = B^(i+L-1) · (P[i+L] − P[i]).

    Detection downstream compares hashes only for equality, so the
    mod-2^64 polynomial (collision odds ~n²/2^64) is interchangeable
    with the digest paths — certified by the same equivalence template
    as the xxhash64 flag. Arrow batches stream doc-at-a-time through
    numpy; per-doc state never leaves its batch, so partitioning and
    parallelism are exactly the scan's."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from datapipelinedemo_spark.functions import text as TX

    toks = (
        docs.withColumn("t", TX.tokenize("text"))
        .filter(F.size("t") >= L)
        .select(
            "doc_id",
            F.expr("transform(t, x -> xxhash64(x))").alias("th"),
        )
    )

    base = np.uint64(_RG_BASE)
    base_inv = np.uint64(_RG_BASE_INV)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, poss, hs = [], [], []
            for doc_id, th in zip(pdf["doc_id"], pdf["th"]):
                t = np.asarray(th, dtype=np.int64).astype(np.uint64)
                n = t.size
                m = n - L + 1
                if m <= 0:
                    continue
                # powers B^0..B^(n-1) and B^-0..B^-(n-1), wraparound
                bpow = np.ones(n, dtype=np.uint64)
                bpow[1:] = base
                np.cumprod(bpow, out=bpow)
                binv = np.ones(n, dtype=np.uint64)
                binv[1:] = base_inv
                np.cumprod(binv, out=binv)
                # exclusive prefix sums of t[j] * B^-j
                pref = np.zeros(n + 1, dtype=np.uint64)
                np.cumsum(t * binv, out=pref[1:])
                h = (pref[L:] - pref[:m]) * bpow[L - 1 :]
                ids.append(np.full(m, doc_id, dtype=np.int64))
                poss.append(np.arange(1, m + 1, dtype=np.int64))
                hs.append(h.astype(np.int64))
            if ids:
                yield pd.DataFrame(
                    {
                        "doc_id": np.concatenate(ids),
                        "pos": np.concatenate(poss),
                        "h": np.concatenate(hs),
                    }
                )

    return toks.mapInPandas(gen, "doc_id long, pos long, h long")
