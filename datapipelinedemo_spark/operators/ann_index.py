"""Write-once materialized hyperplane-LSH index over the embeddings
table — the ANN twin of ``operators.neardup_index``.

``cosine_topk_lsh`` spends most of its corpus-side time signing: a
``planes``-term hyperplane fold over every vector, and with the
corpus-adaptive geometry (``similarity.lsh_bits_for``) planes grows as
4·log2(n), so per-run signing cost grows n·log n. At 100 TB nobody
signs the corpus per query batch: the signed, banded corpus persists
next to the data (FAISS on disk, Milvus segments, Vespa posting lists
all share this shape) and serving is probe-only. This module
reproduces that architecture locally: first call per (embeddings file,
geometry) builds the ``similarity.lsh_corpus_frame`` and writes it as
parquet under ``SPARK_GRAFT_INDEX_DIR`` (default
``<repo>/.cache/ann_index``); every later call — including later
processes, which in-memory memoization cannot serve — is one parquet
scan, partition-pruned to the probed (band, key) buckets by the scan's
pushed filters.

Freshness/atomicity/integrity follow ``neardup_index`` via
``operators.write_once``: the cache key embeds the source file's
(mtime_ns, size) and the geometry; builds commit atomically with a
part-file manifest, and reads are pinned to the manifest's file list.

Results are bit-identical to inline signing (same deterministic
md5-derived hyperplanes), so DuckDB-oracle parity is unaffected.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from datapipelinedemo_spark.operators import similarity as SIM
from datapipelinedemo_spark.operators.write_once import ensure_dir, read_frame

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
INDEX_DIR_ENV = "SPARK_GRAFT_INDEX_DIR"


def _index_root() -> str:
    return os.environ.get(
        INDEX_DIR_ENV, os.path.join(_REPO_ROOT, ".cache", "ann_index")
    )


def _cache_tag(sf_dir: str, planes: int, bands: int, dim: int) -> str:
    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    return (
        f"{sf_name}-m{st.st_mtime_ns}-s{st.st_size}"
        f"-p{planes}b{bands}d{dim}"
    )


def lsh_index(
    spark: SparkSession,
    sf_dir: str,
    planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Return the banded LSH corpus frame for the embeddings table at
    ``sf_dir``, served from the write-once parquet index (building it
    on first use). Bit-identical to ``similarity.lsh_corpus_frame``
    computed inline — only the storage location of the intermediate
    changes."""
    dest = os.path.join(_index_root(), _cache_tag(sf_dir, planes, bands, dim))

    def _build(tmp: str) -> None:
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        frame = SIM.lsh_corpus_frame(emb, id_col, vec_col, planes, dim, bands)
        # partition-friendly order: bucket rows of one (band, key)
        # cluster inside row groups, so probe-time pushed filters on
        # (band, key) skip most of the file via footer min/max stats
        frame.repartitionByRange(8, "band", "key").write.mode(
            "overwrite"
        ).parquet(tmp)

    ensure_dir(dest, _build)
    return read_frame(spark, dest)


def hamming_sig_index(
    spark: SparkSession,
    sf_dir: str,
    planes: int = 48,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, sig): the packed ``planes``-bit sign signatures of the
    embeddings table, served from a write-once parquet index — the
    stage-1 scan frame of the Hamming-rerank family
    (plans/hamming_ops.py). One BIGINT per vector: at 100 TB this is
    the 64×-smaller artifact the candidate scan reads instead of the
    float corpus, and signing (a planes×dim fold per vector) runs once
    per corpus generation, not per query batch. Bit-identical to
    inline signing (same md5-parity hyperplanes), so the stored and
    inline serving entries share one oracle."""
    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    dest = os.path.join(
        _index_root(),
        f"{sf_name}-m{st.st_mtime_ns}-s{st.st_size}"
        f"-hamsig{planes}d{dim}",
    )

    def _build(tmp: str) -> None:
        from pyspark.sql import functions as F

        emb = spark.read.parquet(src)
        SIM.with_hyperplane_signs(emb, vec_col, planes, dim).select(
            F.col(id_col).alias("vec_id"), "sig"
        ).repartitionByRange(8, "vec_id").write.mode(
            "overwrite"
        ).parquet(tmp)

    ensure_dir(dest, _build)
    return read_frame(spark, dest)
