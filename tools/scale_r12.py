"""Round-12 scale validation: 100x exponents for this round's plan
changes and new operators on the document grain —

- ``c4_line_dedup`` re-measured after the staged-word-array fix
  (VERDICT r11 #2: the per-block lambda re-split the document, an
  O(words x blocks) per-row hidden quadratic; r10-vintage exponent
  was 0.83 with that defect in place),
- ``bpe_byte_level_token_counts`` — byte-alphabet train+encode (word
  histogram is the only corpus pass; expected tokenizer-flat like
  the char family),
- ``doremi_domain_weights`` — the LM-chain composition after the
  tokenize-once memo (scan shared across both chains).

The filtered-ANN serving entries are EXCLUDED by the standing
``pq_recall_at_10`` rationale (fixed-fraction query sample => work
grows ~QxN by construction; per-query cost is the scaling quantity).

Slice: ``_scaledata/sf10_docs`` (100x documents). Methodology
identical to tools/scale100.py: min-of-2 with clearCache per run,
one process, exponent = log(t_100x / t_1x) / log(100).

Usage: python tools/scale_r12.py [out_json]
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
    "c4_line_dedup",
    "bpe_byte_level_token_counts",
    "doremi_domain_weights",
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_r12.json"
    import __spark_entry__ as e
    from datapipelinedemo_spark.session import get_spark

    spark = get_spark(app_name="scale-r12")
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
