"""Focused pins for the r17 optimization/alignment changes: each
changed operator internal is asserted against the semantics it must
preserve (the DuckDB oracle separately pins full query semantics on
the real testdata; these tests pin the edge cases and equivalence
arguments the changes rest on)."""

from __future__ import annotations

import os
import sys

import pandas as pd
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def empty_doc_sf_dir(tmp_path_factory):
    """A tiny sf-dir whose documents table contains an empty-text and a
    whitespace-only doc alongside normal ones — the corpus edge the
    shipped testdata lacks (ADVICE r16 medium)."""
    d = tmp_path_factory.mktemp("empty_doc_sf")
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "the cat sat on the the mat",
                "",  # tokenizes to []
                "   \t  ",  # whitespace-only: tokenizes to []
                "one two two three three three",
            ],
            "lang": ["en", "en", "es", "es"],
            "source": ["src0", "src0", "src1", "src1"],
            "n_chars": [27, 0, 6, 29],
        }
    )
    docs["doc_id"] = docs["doc_id"].astype("int64")
    docs["n_chars"] = docs["n_chars"].astype("int64")
    docs.to_parquet(os.path.join(d, "documents.parquet"))
    return str(d)


def _oracle_rows(sql: str, sf_dir: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.sql(sql).df()


def test_doc_repetition_stats_drops_empty_token_docs(spark, empty_doc_sf_dir):
    """ADVICE r16 (medium): the oracle's unnest emits NO row for a doc
    whose tokenization is empty; the in-row form must not emit an
    all-null row for it. Pinned on a fixture corpus containing empty
    and whitespace-only docs — rows AND per-doc values must match."""
    from datapipelinedemo_spark.plans.catalog import ORACLES
    from datapipelinedemo_spark.plans.llm_ops import doc_repetition_stats

    sdf = doc_repetition_stats(spark, empty_doc_sf_dir).toPandas()
    odf = _oracle_rows(ORACLES["doc_repetition_stats"], empty_doc_sf_dir)
    assert sorted(sdf["doc_id"]) == [0, 3], (
        "empty-token docs leaked into doc_repetition_stats"
    )
    assert sorted(odf["doc_id"]) == [0, 3]
    s = sdf.sort_values("doc_id").reset_index(drop=True)
    o = odf.sort_values("doc_id").reset_index(drop=True)
    for col in ["n_words", "max_word_frac", "top_bigram_frac",
                "dup_trigram_frac"]:
        assert list(s[col].astype(float)) == list(o[col].astype(float)), col


def test_gopher_kept_corpus_excludes_empty_docs_from_totals(
    spark, empty_doc_sf_dir
):
    """ADVICE r16 (medium): the oracle's `gq JOIN rep` (inner) excludes
    empty-tokenization docs from docs_total/keep_rate; the fused
    single-scan form must mirror that."""
    from datapipelinedemo_spark.plans.catalog import ORACLES
    from datapipelinedemo_spark.plans.quality_ops import gopher_kept_corpus

    sdf = (
        gopher_kept_corpus(spark, empty_doc_sf_dir)
        .toPandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    odf = (
        _oracle_rows(ORACLES["gopher_kept_corpus"], empty_doc_sf_dir)
        .sort_values("lang")
        .reset_index(drop=True)
    )
    # each lang has one empty-tokenization doc -> docs_total must be 1
    assert list(sdf["docs_total"]) == [1, 1]
    assert list(odf["docs_total"].astype(int)) == [1, 1]
    for col in ["docs_total", "docs_kept", "kept_words"]:
        assert list(sdf[col].astype(int)) == list(odf[col].astype(int)), col
    assert list(sdf["keep_rate"].astype(float)) == list(
        odf["keep_rate"].astype(float)
    )


def test_gopher_repetition_flags_inherits_empty_doc_semantics(
    spark, empty_doc_sf_dir
):
    """gopher_repetition_flags is FROM (doc_repetition_stats) in both
    engines, so empty-token docs must be absent here too."""
    from datapipelinedemo_spark.plans.quality_ops import (
        gopher_repetition_flags,
    )

    sdf = gopher_repetition_flags(spark, empty_doc_sf_dir).toPandas()
    assert sorted(sdf["doc_id"]) == [0, 3]
