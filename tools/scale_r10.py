"""Round-10 scale validation (VERDICT r9 #8): 100× exponents for the
r9 streaming/stateful additions that only had 10× numbers —
``streaming_stateful_user_totals`` (a REAL 2-micro-batch stream over
the 100× events slice), the post-cap embedding-stream twins, and
``training_corpus_pipeline_v3`` — plus 100× rows for this round's two
new trainable families (``unigram_train_rounds_3``,
``wordpiece_train_merges``) and the fixed EM round.

Slice: ``_scaledata/sf10_sse`` — 100× events + embeddings from
``gen_scale_slice.py --tables=events,embeddings --line-tag`` with the
existing 100× documents slice symlinked in:

    python tools/gen_scale_slice.py 100 /root/testdata/sf0.1 \
        _scaledata/sf10_sse --tables=events,embeddings --line-tag
    ln -s ../sf10_docs/documents.parquet _scaledata/sf10_sse/

Methodology identical to tools/scale100.py: min-of-2 with clearCache
per run, one process, exponent = log(t_100x / t_1x) / log(100).

Usage: python tools/scale_r10.py [out_json]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from tools.scale100 import timed  # noqa: E402

BASE = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALED = os.path.join(REPO, "_scaledata", "sf10_sse")
K = 100.0

QUERIES = [
    # r9 streaming/stateful additions (10×-only until now)
    "streaming_stateful_user_totals",
    "streaming_embedding_first_batch",
    "streaming_embedding_vs_corpus",
    "training_corpus_pipeline_v3",
    # r10 additions
    "unigram_em_piece_usage",
    "unigram_train_rounds_3",
    "wordpiece_train_merges",
]


def main() -> None:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, "fixtures", "scale_r10.json")
    )
    import __spark_entry__ as e
    from datapipelinedemo_spark.session import get_spark

    spark = get_spark(app_name="scale-r10")
    qs = e.queries()
    rows = []
    for name in QUERIES:
        fn = qs[name]
        t1, _ = timed(spark, fn, BASE)
        tk, cold = timed(spark, fn, SCALED)
        exp = round(math.log(max(tk, 1e-3) / max(t1, 1e-3)) / math.log(K), 2)
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
