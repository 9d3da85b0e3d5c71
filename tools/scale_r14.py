"""Round-14 scale validation: 100× document-grain exponents for the
lexical-statistics family —

- ``token_zipf_histogram`` / ``token_zipf_slope``: one tokenize +
  explode into a partial-aggregable term count, then ≤~40 histogram
  buckets; expected ~linear in corpus tokens (the slope adds one
  single-row aggregate over the histogram — corpus-size-independent).
- ``lexical_diversity_by_lang``: the same shape keyed by (lang, term);
  the vocabulary-grain shuffle grows with distinct terms, the output
  stays |languages| rows.

The Hamming-rerank entries (``similarity_topk_hamming_rerank``,
``hamming_recall_by_depth``) are EXCLUDED by the standing
``pq_recall_at_10`` rationale: their certified query sample is a fixed
FRACTION of the corpus (``TOPK_QUERY_MOD``), so measured work grows
~Q×N by construction. The per-query serving cost is the 8-byte
signature scan + a 49-bucket histogram — the scale story is the 64×
scan-byte cut vs raw floats, recorded in plans/hamming_ops.py and
SCALE.md, not an exponent.

Slice: ``_scaledata/sf10_docs`` (100× documents, line-tagged — each
copy's lines carry a copy-unique token so vocabulary grows with the
corpus instead of collapsing onto 26 Caesar classes).
Methodology identical to tools/scale100.py: min-of-2 with clearCache
per run, one process, exponent = log(t_100x / t_1x) / log(100).

Usage: python tools/scale_r14.py [out_json]
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from tools.scale100 import timed  # noqa: E402

BASE = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALED = os.path.join(REPO, "_scaledata", "sf10_docs")
K = 100.0

QUERIES = [
    "token_zipf_histogram",
    "token_zipf_slope",
    "lexical_diversity_by_lang",
    # per-source template detector: block explode + two-level partial
    # agg; expected ~linear in corpus blocks (same family as
    # c4_line_dedup's 0.6-ish document-grain exponents)
    "source_boilerplate_report",
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_r14.json"
    import __spark_entry__ as e
    from datapipelinedemo_spark.session import get_spark

    spark = get_spark(app_name="scale-r14")
    qs = e.queries()
    qs[QUERIES[0]](spark, BASE).limit(1).collect()  # JVM warmup

    rows = []
    for name in QUERIES:
        t1, _ = timed(spark, qs[name], BASE)
        t100, c100 = timed(spark, qs[name], SCALED)
        exp = (
            round(math.log(t100 / t1) / math.log(K), 2) if t1 > 0 else None
        )
        rows.append(
            {
                "query": name,
                "t_sf01": t1,
                "t_100x": t100,
                "cold_100x": c100,
                "exponent": exp,
            }
        )
        print(rows[-1])

    with open(out_path, "w") as fh:
        json.dump(rows, fh, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
