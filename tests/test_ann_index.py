"""Write-once index equivalence: the persisted ANN / near-dup indexes
must serve frames bit-identical to computing them inline — the indexes
change WHERE the intermediate lives, never WHAT it contains. Guarded
here because the oracle gate only exercises the catalog entries'
end-to-end output, not the index layer's equivalence directly.
"""

from __future__ import annotations

import os

import pytest

from datapipelinedemo_spark.operators import ann_index as AX
from datapipelinedemo_spark.operators import neardup_index as NX
from datapipelinedemo_spark.operators import similarity as SIM
from datapipelinedemo_spark.tables import table


@pytest.fixture()
def index_root(tmp_path, monkeypatch):
    monkeypatch.setenv(AX.INDEX_DIR_ENV, str(tmp_path))
    return tmp_path


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_lsh_index_matches_inline(spark, sf_dir, index_root):
    emb = table(spark, sf_dir, "embeddings")
    inline = SIM.lsh_corpus_frame(emb, planes=8, dim=64, bands=4)
    served = AX.lsh_index(spark, sf_dir, planes=8, bands=4, dim=64)
    cols = ["neighbor_id", "band", "key", "cn"]
    assert _rows(served, cols) == _rows(inline, cols)
    # vectors ride along unchanged (float32 exact)
    iv = {r["neighbor_id"]: list(r["cv"]) for r in inline.collect()}
    sv = {r["neighbor_id"]: list(r["cv"]) for r in served.collect()}
    assert iv == sv


def test_lsh_index_build_is_once(spark, sf_dir, index_root):
    AX.lsh_index(spark, sf_dir, planes=8, bands=4, dim=64)
    dirs = set(os.listdir(index_root))
    assert len(dirs) == 1 and not any(".tmp-" in d for d in dirs)
    # second call serves the same directory; a different geometry
    # builds a sibling (the cache key embeds the parameters)
    AX.lsh_index(spark, sf_dir, planes=8, bands=4, dim=64)
    assert set(os.listdir(index_root)) == dirs
    AX.lsh_index(spark, sf_dir, planes=16, bands=4, dim=64)
    assert len(os.listdir(index_root)) == 2


def test_lsh_topk_served_equals_inline(spark, sf_dir, index_root):
    from pyspark.sql import functions as F

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    kw = dict(k=5, planes=8, dim=64, bands=4, probe_hamming=1)
    inline = SIM.cosine_topk_lsh(emb, queries, "vec_id", "embedding", **kw)
    served = SIM.cosine_topk_lsh(
        emb,
        queries,
        "vec_id",
        "embedding",
        corpus_frame=AX.lsh_index(spark, sf_dir, planes=8, bands=4, dim=64),
        **kw,
    )
    cols = ["query_id", "neighbor_id", "cos_sim", "rank"]
    assert _rows(served, cols) == _rows(inline, cols)


def test_neardup_index_matches_inline(spark, sf_dir, tmp_path, monkeypatch):
    monkeypatch.setenv(NX.INDEX_DIR_ENV, str(tmp_path))
    from datapipelinedemo_spark.operators import dedup as DD

    docs = table(spark, sf_dir, "documents")
    sh, banded = NX.neardup_index(spark, sf_dir, num_hashes=8, bands=4, k=9)
    inline_sh = docs.select(
        docs.doc_id.alias("doc"), DD.shingle_hashes("text", 9, "md5").alias("__sh")
    )
    assert sorted(
        (r["doc"], tuple(sorted(r["__sh"]))) for r in sh.collect()
    ) == sorted(
        (r["doc"], tuple(sorted(r["__sh"]))) for r in inline_sh.collect()
    )
    inline_banded = DD.banded_minhash(docs, "doc_id", "text", 8, 4, 9)
    bcols = sorted(set(banded.columns) & set(inline_banded.columns))
    assert _rows(banded.select(*bcols), bcols) == _rows(
        inline_banded.select(*bcols), bcols
    )
