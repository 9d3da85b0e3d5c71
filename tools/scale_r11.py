"""Round-11 scale validation: 100× exponents for this round's plan
changes and new sub-linear paths —

- ``intra_doc_block_dedup`` re-measured after the linear rewrite
  (r10 exponent 0.70 with the in-row quadratic; VERDICT r10 #2),
- ``streaming_embedding_vs_corpus_capped`` vs the uncapped entry
  (VERDICT r10 #6: the uncapped batch grows with the corpus, 0.90),
- ``embedding_pq_codes_packed`` — the write-once packed-coding path
  (build + manifest-pinned read),
- ``unigram_byte_fallback_token_counts`` — trained-vocab byte
  fallback (training + distinct-word DP, expected tokenizer-flat).

The ADC top-k serving entries (pq_stored / after_ingest / residual
IVFADC) are EXCLUDED by the ``pq_recall_at_10`` r10 rationale: their
certified query sample is a fixed FRACTION of the corpus
(``TOPK_QUERY_MOD``), so the measured work grows ~Q×N by
construction — the per-query serving cost is what scales, and that
is bounded by list sizes (IVF) and code width (ADC), not corpus
size.

Slice: ``_scaledata/sf10_sse`` (100× events+embeddings, 100×
documents symlinked) — the r10 fixture's slice, unchanged.
Methodology identical to tools/scale100.py: min-of-2 with clearCache
per run, one process, exponent = log(t_100x / t_1x) / log(100).

Usage: python tools/scale_r11.py [out_json]
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
SCALED = os.path.join(REPO, "_scaledata", "sf10_sse")
K = 100.0

QUERIES = [
    "intra_doc_block_dedup",
    "streaming_embedding_vs_corpus",
    "streaming_embedding_vs_corpus_capped",
    "embedding_pq_codes_packed",
    "unigram_byte_fallback_token_counts",
]


def main() -> None:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, "fixtures", "scale_r11.json")
    )
    import __spark_entry__ as e
    from datapipelinedemo_spark.session import get_spark

    spark = get_spark(app_name="scale-r11")
    qs = e.queries()
    rows = []
    for name in QUERIES:
        fn = qs[name]
        t1, _ = timed(spark, fn, BASE)
        tk, cold = timed(spark, fn, SCALED)
        exp = round(
            math.log(max(tk, 1e-3) / max(t1, 1e-3)) / math.log(K), 2
        )
        rows.append(
            {
                "query": name,
                "t_sf01": t1,
                "t_100x": tk,
                "cold_100x": cold,
                "exponent": exp,
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    with open(out_path, "w") as fh:
        json.dump({"k": K, "queries": rows}, fh, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
