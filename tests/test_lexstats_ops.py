"""Lexical statistics (plans/lexstats_ops.py): histogram buckets,
diversity ratios, and the power-law fit pinned on corpora with known
term frequencies."""

from __future__ import annotations

import math


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, "src0", len(t)) for i, (t, lang) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _write(tmp_path, spark, rows):
    _docs(spark, rows).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_histogram_buckets_known_frequencies(spark, tmp_path):
    """freq 1 -> bucket round(log2(2))+1 = 2; freq 3 -> round(2)+1 = 3;
    freq 7 -> round(3)+1 = 4."""
    from datapipelinedemo_spark.plans.lexstats_ops import (
        token_zipf_histogram,
    )

    # 'aa' x7, 'bb' x3, 'cc'/'dd' x1
    rows = [("aa aa aa aa aa aa aa", "en"), ("bb bb bb cc dd", "en")]
    sf = _write(tmp_path, spark, rows)
    got = {
        r.bucket: (r.n_terms, r.occurrences)
        for r in token_zipf_histogram(spark, sf).collect()
    }
    assert got == {2: (2, 2), 3: (1, 3), 4: (1, 7)}


def test_diversity_ratios_exact(spark, tmp_path):
    from datapipelinedemo_spark.plans.lexstats_ops import (
        lexical_diversity_by_lang,
    )

    rows = [
        ("x x x y", "en"),  # en: types {x,y}, tokens 4, hapax {y}
        ("z", "fr"),        # fr: 1 type, 1 token, 1 hapax
    ]
    sf = _write(tmp_path, spark, rows)
    got = {r.lang: r for r in lexical_diversity_by_lang(spark, sf).collect()}
    en = got["en"]
    assert (en.n_docs, en.types, en.tokens, en.hapax_types) == (1, 2, 4, 1)
    assert en.type_token_ratio == 0.5 and en.hapax_ratio == 0.5
    fr = got["fr"]
    assert fr.type_token_ratio == 1.0 and fr.hapax_ratio == 1.0


def test_zipf_slope_negative_on_zipfian_counts(spark, tmp_path):
    """A corpus whose freq-of-freq halves per doubling bucket (ideal
    Zipf s=1) fits slope ~ -ln 2; a flat-frequency corpus fits ~0."""
    from datapipelinedemo_spark.plans.lexstats_ops import (
        token_zipf_slope,
    )

    # zipfian: 64 hapaxes (freq 1), 16 terms at freq 3, 4 at freq 7,
    # 1 at freq 15 -> buckets 2,3,4,5 with n_terms 64,16,4,1:
    # ln(n_terms) drops by ln(4) per bucket -> slope = -ln(4)
    words = []
    words += [f"h{i}" for i in range(64)]
    for i in range(16):
        words += [f"m{i}"] * 3
    for i in range(4):
        words += [f"b{i}"] * 7
    words += ["t0"] * 15
    sf = _write(tmp_path, spark, [(" ".join(words), "en")])
    row = token_zipf_slope(spark, sf).collect()[0]
    assert row.n_buckets == 4
    assert row.n_terms_total == 64 + 16 + 4 + 1
    assert abs(row.slope - (-math.log(4))) < 1e-5
