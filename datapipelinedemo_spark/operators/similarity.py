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

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def lsh_bits_for(n: int, target_bucket: int = 32) -> int:
    """Bits per LSH band so the expected bucket size ``n / 2**r`` stays
    ~``target_bucket`` as the corpus grows.

    The scale property this buys (measured in tools/scale_bench.py):
    with FIXED bits the per-band bucket population grows linearly with
    the corpus, so candidate pairs — every (query, bucketmate) — grow
    quadratically when both sides scale; r = ceil(log2(n/target))
    pins bucket size, making per-query candidate work O(log n) (the
    Hamming-1 probe set is 1 + r keys of ~target_bucket rows each).
    At the oracle scale (sf0.01, n=500 embeddings) this yields r=4 —
    exactly the committed DuckDB oracle's geometry, so correctness
    parity is untouched.
    """
    return max(2, math.ceil(math.log2(max(2.0, n / target_bucket))))


def ivf_nlist_for(n: int, parity_n: int = 500, parity_nlist: int = 8) -> int:
    """IVF list count ∝ sqrt(n) (the FAISS heuristic: balances
    centroid-scan cost against per-list scan cost), calibrated so the
    sf0.01 oracle-parity configuration (n=500 → nlist=8) is the fixed
    point. With fixed nprobe the probed fraction is nprobe/nlist, so
    per-query work scales O(sqrt n) instead of O(n)."""
    return max(parity_nlist, int(parity_nlist * math.sqrt(n / parity_n)))


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
    max_sim: float | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    ``queries`` must be small (it is broadcast); the corpus is scanned
    once with no shuffle. Ties broken by neighbor id for determinism.
    Self-matches (same id) are excluded. ``max_sim`` caps the
    similarity BEFORE ranking (exclusive bound) — the hard-negative
    mining shape: nearest neighbors that are NOT near-duplicates.
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
    if max_sim is not None:
        scored = scored.filter(F.col("cos_sim") < F.lit(max_sim))
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
    block_col: str | None = None,
    threshold: float = 0.98,
    planes: int = 16,
    bands: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b) above a
    threshold.

    Default blocking is banded hyperplane LSH: each vector gets a
    ``planes``-bit random-hyperplane signature, sliced into ``bands``
    bands of planes/bands bits; two vectors become a candidate pair iff
    they agree on at least one whole band. Candidate generation is ONE
    shuffle on (band, key) with in-row pair expansion — no all-pairs
    join anywhere, which is what survives 100 TB (a semantic block
    column is quadratic within each block). Recall for cos ≥ t pairs is
    (1 - (1 - (1 - θ/π)^r)^bands), θ = arccos(t) — ≈0.99+ at the 0.98
    default with 4×4 banding; pinned by tests against the exact answer.

    ``block_col`` switches to legacy semantic blocking (pairs only
    inside equal block values, exact within the block). Scores are
    exact cosine either way; only candidate generation differs.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        norm(vec_col).alias("nrm"),
    )
    if block_col is not None:
        a = df.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
            norm(vec_col).alias("nrm"), F.col(block_col).alias("blk"),
        ).alias("a")
        b = df.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
            norm(vec_col).alias("nrm"), F.col(block_col).alias("blk"),
        ).alias("b")
        cond = (F.col("a.id") < F.col("b.id")) & (
            F.col("a.blk") == F.col("b.blk")
        )
        pairs = a.join(b, cond).select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (dot("a.v", "b.v") / (F.col("a.nrm") * F.col("b.nrm"))).alias(
                "cos_sim"
            ),
        )
        return pairs.filter(F.col("cos_sim") >= threshold)

    # LSH path: signature per row (no shuffle) → explode bands → bucket
    # group → in-row pair expansion → distinct ids → score exact cosine.
    # Signing uses the hoisted broadcast-plane form (bit-identical to
    # the md5 expression form; 9-11× measured on the 48-plane family,
    # VERDICT r14 missing #2 closed the 16-plane residual here).
    r = planes // bands
    assert planes % bands == 0
    banded = (
        with_hyperplane_signs(df, vec_col, planes, dim, out_col="sig")
        .select(
            F.col(id_col).alias("id"),
            "sig",
        )
        .select(
            "id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, {bands - 1}),"
                    f" b -> (sig >> (b * {r})) & {(1 << r) - 1})"
                )
            ).alias("band", "key"),
        )
    )
    return banded_neardup_pairs(banded, base, threshold)


def banded_neardup_pairs(
    banded: DataFrame, base: DataFrame, threshold: float
) -> DataFrame:
    """Candidate generation + exact-cosine verify over a prebuilt
    banded frame ``(id, band, key)`` and a vector frame
    ``(id, v, nrm)``. Split out of ``embedding_neardup_pairs`` so the
    banded side can come from the write-once parquet index
    (``operators.ann_index``) instead of per-run signing — the verify
    joins read the raw vectors either way, so scores are bit-identical
    to the inline path."""
    from datapipelinedemo_spark.operators.pairs import pair_combinations

    cand = (
        banded.groupBy("band", "key")
        .agg(F.sort_array(F.collect_list("id")).alias("ds"))
        .filter(F.size("ds") > 1)
        .select(F.explode(pair_combinations("ds")).alias("p"))
        .select(F.col("p.item1").alias("id_a"), F.col("p.item2").alias("id_b"))
        .distinct()
    )
    emb = base
    pairs = (
        cand.join(
            emb.select(
                F.col("id").alias("id_a"),
                F.col("v").alias("va"),
                F.col("nrm").alias("na"),
            ),
            "id_a",
        )
        .join(
            emb.select(
                F.col("id").alias("id_b"),
                F.col("v").alias("vb"),
                F.col("nrm").alias("nb"),
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            (dot("va", "vb") / (F.col("na") * F.col("nb"))).alias("cos_sim"),
        )
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


def with_hyperplane_signs(
    df: DataFrame,
    vec_col: str,
    planes: int,
    dim: int,
    out_col: str = "sig",
) -> DataFrame:
    """``hyperplane_signs`` with the md5 parity weights HOISTED to a
    plan constant: the expression form re-derives
    ``md5(concat(p,'_',i))`` per element PER ROW (Catalyst does no
    loop-invariant extraction inside correlated lambdas), which at 48
    planes × 64 dims is 3072 digests per vector — measured 33s for one
    sf0.1 Hamming serve. Here the ±1 matrix is computed once in Python
    (hashlib md5 — same first-8-hex parity, pinned bit-equal by
    ``test_fast_signs_equal_expression_signs``) and is embedded as a
    LITERAL array: Catalyst's ConstantFolding collapses the all-literal
    CreateArray into one Literal(ArrayData), so per row only the plain
    zip_with/aggregate fold remains. (The r14 form shipped the matrix
    as a broadcast 1-row crossJoin; the literal form removes that join
    stage entirely — on sub-second query-side frames the extra
    exchange was pure overhead.) The fold multiplies the same ±1.0
    doubles in the same left-to-right order, so signatures are
    BIT-IDENTICAL to the expression form and every oracle stays
    valid."""
    import hashlib

    w = [
        "1.0D"
        if int(
            hashlib.md5(f"{p}_{i}".encode()).hexdigest()[:8], 16
        )
        % 2
        == 0
        else "-1.0D"
        for p in range(planes)
        for i in range(dim)
    ]
    arr = "array(" + ",".join(w) + ")"
    sig = F.expr(
        f"aggregate(transform(sequence(0, {planes - 1}), p ->"
        f" if(aggregate(zip_with({vec_col},"
        f"      slice({arr}, p * {dim} + 1, {dim}),"
        f"      (x, y) -> cast(x as double) * y),"
        f"    0.0D, (acc, v) -> acc + v) >= 0.0D,"
        f"    shiftleft(1L, p), 0L)),"
        f" 0L, (acc, x) -> acc + x)"
    )
    return df.withColumn(out_col, sig)


def _dot_lit(vec_col: str, lit_arr: Column) -> Column:
    """Left fold of vec_col against a literal double array — the same
    ZipWith+Aggregate shape as dot(), so scores stay bit-identical
    with engines that fold left in double."""
    return F.aggregate(
        F.zip_with(
            F.col(vec_col), lit_arr, lambda x, y: x.cast("double") * y
        ),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def lloyd_refine(
    corpus: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    iters: int = 2,
) -> list[list[float]]:
    """Spherical k-means refinement of an initial centroid set.

    Each iteration: (1) one Arrow mapInPandas pass assigns every
    vector to its nearest (cosine) centroid and emits PER-BATCH
    partial sums — (cid, Σvec, n) — so the shuffle carries
    batches×nlist rows, never the corpus; (2) partial sums reduce in
    one tiny groupBy; (3) the driver rebuilds means (L2-normalized —
    spherical k-means, the cosine-metric variant) from nlist·dim
    numbers. Refined centroids fix the sampled-init failure mode where
    two samples land in one tight cluster and split it across lists.
    Deterministic given the init (no RNG), but NOT oracle-replayable
    (BLAS sum order) — production path, like assignment="pandas".
    """
    import numpy as np

    cents = np.array(centroids, dtype=np.float64)
    for _ in range(iters):
        cmat = cents
        cnorms = np.sqrt((cmat * cmat).sum(axis=1))

        def partial_sums(batches):
            import pandas as pd

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
                vn = np.sqrt((v * v).sum(axis=1))
                best = np.argmax(
                    (v @ cmat.T) / np.outer(vn, cnorms), axis=1
                )
                rows = []
                for cid in np.unique(best):
                    sel = v[best == cid]
                    rows.append(
                        (int(cid), sel.sum(axis=0).tolist(), len(sel))
                    )
                yield pd.DataFrame(rows, columns=["cid", "s", "n"])

        parts = corpus.select(F.col(vec_col).alias(vec_col)).mapInPandas(
            partial_sums, "cid long, s array<double>, n long"
        )
        reduced = (
            parts.select(
                "cid", "n", F.posexplode("s").alias("pos", "val")
            )
            .groupBy("cid", "pos")
            .agg(F.sum("val").alias("sv"), F.sum("n").alias("sn"))
            .collect()  # bounded-collect: nlist*dim centroid component sums
        )
        new = cents.copy()
        by_cid: dict[int, dict[int, float]] = {}
        counts: dict[int, int] = {}
        for r in reduced:
            by_cid.setdefault(r.cid, {})[r.pos] = r.sv
            counts[r.cid] = r.sn
        for cid, vals in by_cid.items():
            m = np.array(
                [vals[p] for p in range(len(vals))], dtype=np.float64
            ) / counts[cid]
            nrm = np.sqrt((m * m).sum())
            if nrm > 0:
                new[cid] = m / nrm
        cents = new
    return cents.tolist()


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nlist: int = 8,
    nprobe: int = 2,
    salt: str = "ivf",
    assignment: str = "expr",
    centroids: list[list[float]] | None = None,
    refine_iters: int = 0,
    max_sim: float | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k cosine neighbors.

    Centroids are the ``nlist`` corpus vectors with the smallest
    md5(id + salt) — a deterministic uniform sample, reproducible in
    any engine (no trained model to ship; Lloyd iterations would
    refine quality but break engine-reproducibility). The centroid
    table is driver-collected and inlined into expressions — the
    FAISS layout: centroids are tiny and replicated everywhere, the
    corpus never moves. Assignment (argmax cosine over centroids) and
    query-side probe selection (top ``nprobe`` lists) are in-row
    expressions — ZERO shuffle over the corpus; the only shuffles are
    the candidate join (probe side broadcast) and the final per-query
    top-k window over candidates.

    ``assignment="expr"`` (default) does assignment and probe
    selection as in-row Catalyst expressions — right for small nlist,
    and the oracle-parity path (left folds, bit-reproducible).
    ``assignment="pandas"`` routes both through one Arrow
    ``mapInPandas`` stage doing a BLAS matmul against the closure-
    shipped centroid matrix — the 100 TB path once nlist reaches
    thousands (the expression tree and per-row interpreted fold stop
    scaling; a matmul is one vectorized call). Same plan shape, same
    zero-shuffle assignment; scores within probed lists are identical
    (the search stage is shared) but BLAS sums in a different order
    than a strict left fold, so list assignment may differ on exact
    centroid-similarity ties — equivalence on real data is pinned in
    tests, oracle queries keep "expr".

    Recall on structureless (uniform-random) vectors is ≈ nprobe /
    nlist — the no-cluster worst case; on clustered data the probed
    lists contain the true neighbors (pinned by the planted-cluster
    test).

    ``refine_iters > 0`` runs that many spherical-k-means Lloyd
    iterations (``lloyd_refine``) on the seeded-sample init before
    building the index — fixes the sampled-init failure mode where two
    samples land in one tight cluster and split it across lists.
    Production quality knob; NOT oracle-replayable (BLAS sum order),
    so catalog/oracle queries keep the default 0. Measured lift on the
    sf0.01 embeddings table is recorded in PERF.md §"Round 5".
    """
    from datapipelinedemo_spark.functions.stable import md5_long

    if centroids is None and refine_iters > 0:
        # seeded-sample init + spherical k-means refinement — the
        # production quality path (not oracle-replayable: BLAS sums).
        init_rows = (
            corpus.select(
                F.col(id_col).alias("cid"),
                F.col(vec_col).alias("cv"),
                md5_long(
                    F.concat(F.col(id_col).cast("string"), F.lit("#" + salt))
                ).alias("__hv"),
            )
            .orderBy("__hv", "cid")
            .limit(nlist)
            .collect()  # bounded-collect: limit(nlist) seeds
        )
        centroids = lloyd_refine(
            corpus,
            vec_col,
            [[float(x) for x in r.cv] for r in init_rows],
            iters=refine_iters,
        )

    if centroids is not None:
        # explicit centroid set (e.g. lloyd_refine output); cid is just
        # the bucket key, so positional ids serve
        from types import SimpleNamespace

        cent_rows = [
            SimpleNamespace(cid=i, cv=list(v))
            for i, v in enumerate(centroids)
        ]
    else:
        cent_rows = (
            corpus.select(
                F.col(id_col).alias("cid"),
                F.col(vec_col).alias("cv"),
                md5_long(
                    F.concat(F.col(id_col).cast("string"), F.lit("#" + salt))
                ).alias("__hv"),
            )
            .orderBy("__hv", "cid")
            .limit(nlist)
            .collect()  # bounded-collect: limit(nlist) seeds
        )

    def _cent_sim(vec: str, vn: Column, row) -> Column:
        arr = F.array(*[F.lit(float(x)).cast("double") for x in row.cv])
        # centroid norm precomputed driver-side with the SAME left-fold
        # order as the engine folds (Python sum is sequential), so the
        # double is bit-identical to an in-engine fold — and the
        # codegen'd expression halves
        import math

        acc = 0.0
        for x in row.cv:
            acc = acc + float(x) * float(x)
        cn = F.lit(math.sqrt(acc)).cast("double")
        return _dot_lit(vec, arr) / (vn * cn)

    def _best_lists(vec: str, vn: Column, n: int) -> Column:
        """Array of the n best centroid ids for vec (desc sim, ties →
        smaller cid), as one in-row expression."""
        cells = F.array(
            *[
                F.struct(
                    (-_cent_sim(vec, vn, r)).alias("ns"),
                    F.lit(int(r.cid)).alias("cid"),
                )
                for r in cent_rows
            ]
        )
        return F.slice(F.array_sort(cells), 1, n).getField("cid")

    if assignment == "pandas":
        import numpy as np

        order = sorted(range(len(cent_rows)), key=lambda j: int(cent_rows[j].cid))
        cids = np.array([int(cent_rows[j].cid) for j in order])
        cmat = np.array(
            [[float(x) for x in cent_rows[j].cv] for j in order],
            dtype=np.float64,
        )
        cnorms = np.sqrt((cmat * cmat).sum(axis=1))

        def _assign(n_lists, id_name, vec_name, norm_name):
            def fn(batches):
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    v = np.array(pdf[vec_name].tolist(), dtype=np.float64)
                    vn = np.sqrt((v * v).sum(axis=1))
                    sims = (v @ cmat.T) / np.outer(vn, cnorms)
                    # top n_lists per row, desc sim; ties -> smaller
                    # cid (cmat rows are cid-sorted, argsort is stable)
                    top = np.argsort(-sims, axis=1, kind="stable")[:, :n_lists]
                    out = pdf.loc[pdf.index.repeat(n_lists)].copy()
                    out[norm_name] = np.repeat(vn, n_lists)
                    out["cid"] = cids[top].ravel()
                    yield out

            return fn

        # norms are RE-derived with the shared fold expression after
        # the Arrow stage so the scoring arithmetic is bit-identical
        # to the expr path (only list assignment may differ, on ties)
        c_schema = "neighbor_id long, cv array<float>, cn double, cid long"
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            F.lit(0.0).alias("cn"),
        ).mapInPandas(
            _assign(1, "neighbor_id", "cv", "cn"), c_schema
        ).withColumn("cn", norm("cv"))
        q_schema = "query_id long, qv array<float>, qn double, cid long"
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.lit(0.0).alias("qn"),
        ).mapInPandas(
            _assign(nprobe, "query_id", "qv", "qn"), q_schema
        ).withColumn("qn", norm("qv"))
    else:
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            norm(vec_col).alias("cn"),
        ).withColumn("cid", _best_lists("cv", F.col("cn"), 1)[0])
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            norm(vec_col).alias("qn"),
        ).withColumn(
            "cid", F.explode(_best_lists("qv", F.col("qn"), nprobe))
        )
    scored = (
        c.join(F.broadcast(q), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("cos_sim"),
        )
    )
    if max_sim is not None:
        # cap BEFORE ranking (hard-negative contract, shared with
        # cosine_topk_bruteforce): sub-threshold neighbors pack into
        # the top slots instead of leaving holes where dups ranked
        scored = scored.filter(F.col("cos_sim") < F.lit(max_sim))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def lsh_corpus_frame(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 16,
    dim: int = 64,
    bands: int = 4,
) -> DataFrame:
    """The banded corpus side of ``cosine_topk_lsh``: one row per
    (vector, band) carrying ``(neighbor_id, cv, cn, band, key)``. This
    is the stored form of a hyperplane-LSH index — the vector and its
    norm ride along so serving never joins back to the corpus — and is
    exactly what ``operators.ann_index`` persists as parquet."""
    assert planes % bands == 0
    r = planes // bands
    mask = (1 << r) - 1
    band_keys = (
        f"transform(sequence(0, {bands - 1}),"
        f" b -> (__sig >> (b * {r})) & {mask})"
    )
    return with_hyperplane_signs(
        corpus, vec_col, planes, dim, out_col="__sig"
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(vec_col).alias("cn"),
        "__sig",
    ).select(
        "neighbor_id",
        "cv",
        "cn",
        F.posexplode(F.expr(band_keys)).alias("band", "key"),
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    planes: int = 16,
    dim: int = 64,
    bands: int = 4,
    probe_hamming: int = 1,
    broadcast_queries: bool = True,
    corpus_frame: DataFrame | None = None,
    max_sim: float | None = None,
) -> DataFrame:
    """Approximate top-k cosine neighbors: banded hyperplane buckets
    with query-side multiprobe.

    ``corpus_frame``, if given, replaces the inline corpus signing with
    a prebuilt banded frame (the ``lsh_corpus_frame`` schema —
    typically the write-once parquet index from
    ``operators.ann_index``): at scale the signed corpus persists next
    to the data and serving is probe-only. Results are identical — the
    index stores the same deterministic signatures.

    The ``planes``-bit signature is sliced into ``bands`` bands of
    r = planes/bands bits (band match ⇒ candidate, like MinHash-LSH).
    The query side additionally probes every band key within Hamming
    distance ``probe_hamming`` (0 = exact bucket only; 1 = also flip
    each of the r bits), which multiplies query rows by 1 + r — cheap,
    the query side is broadcast — while the corpus is signed once and
    NEVER shuffles for candidate generation. Candidates are scored at
    the join (exact cosine), deduped per (query, neighbor), then
    windowed to top-k.

    Recall/candidate-rate trade-off is data-dependent: on clustered
    real embeddings the bands prune hard; on uniform-random vectors
    (the synthetic test data — top-10 "neighbors" at θ≈70°) reaching
    ≥0.9 recall costs a high candidate rate (measured in PERF.md).
    Tighten r / lower probe_hamming when the corpus has real structure.
    """
    assert planes % bands == 0
    r = planes // bands
    mask = (1 << r) - 1
    band_keys = (
        f"transform(sequence(0, {bands - 1}),"
        f" b -> (__sig >> (b * {r})) & {mask})"
    )

    c = (
        corpus_frame
        if corpus_frame is not None
        else lsh_corpus_frame(corpus, id_col, vec_col, planes, dim, bands)
    )
    if probe_hamming >= 1:
        # key itself + r single-bit flips per band (Hamming-1 ball)
        probe = (
            f"array_union(array(key), transform(sequence(0, {r - 1}),"
            f" j -> cast(key as bigint) ^ shiftleft(1L, j)))"
        )
    else:
        probe = "array(key)"
    q = (
        with_hyperplane_signs(
            queries, vec_col, planes, dim, out_col="__sig"
        )
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            norm(vec_col).alias("qn"),
            "__sig",
        )
        .select(
            "query_id",
            "qv",
            "qn",
            F.posexplode(F.expr(band_keys)).alias("band", "key"),
        )
        .select(
            "query_id",
            "qv",
            "qn",
            "band",
            F.explode(F.expr(probe)).alias("key"),
        )
    )
    # The corpus side must never shuffle for candidate generation, so
    # the probe side broadcasts — but a hard hint on a side that grows
    # with the corpus (queries × bands × (1+r) probes) would eventually
    # force an OOM instead of degrading to a shuffle join; callers that
    # know the query volume gate it (broadcast_queries=False lets AQE
    # decide, picking broadcast itself whenever the probe side is small).
    probe_side = F.broadcast(q) if broadcast_queries else q
    scored = (
        c.join(probe_side, ["band", "key"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("cos_sim"),
        )
        # a pair can match in several (band, probe) cells — dedup before
        # ranking (values are identical, max() is just the dedup)
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cos_sim").alias("cos_sim"))
    )
    if max_sim is not None:
        # cap BEFORE ranking — see cosine_topk_bruteforce/ivf; a
        # post-hoc filter on the top-k output would leave holes in the
        # ranks instead of promoting sub-threshold neighbors
        scored = scored.filter(F.col("cos_sim") < F.lit(max_sim))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
