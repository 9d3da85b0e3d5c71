"""Round-13 scale validation: 100x exponents for this round's plan
changes on the document grain —

- ``exact_substring_duplicate_spans`` / ``exact_substring_dedup``
  re-measured after the de-skew (VERDICT r12 #2: the per-gram-hash
  ``row_number``/``count`` windows shipped every occurrence of one
  hash into a single unsplittable sorted task; the rewrite is a
  partial-aggregable ``groupBy(h).agg(min(struct), count)`` +
  join-back, AQE-splittable on the hot hash). The r12-vintage
  exponents with the windows in place were 0.53 / 0.56 — the
  synthetic corpus has no boilerplate skew, so the rewrite should
  hold or improve them while removing the skew cliff the exponent
  can't see.

Slice: ``_scaledata/sf10_docs`` (100x documents). Methodology
identical to tools/scale100.py: min-of-2 with clearCache per run,
one process, exponent = log(t_100x / t_1x) / log(100).

Usage: python tools/scale_r13.py [out_json]
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
    "exact_substring_duplicate_spans",
    "exact_substring_dedup",
    # new r13 family: the Gopher battery (in-row scan; expected ~flat
    # at toy scale, linear in bytes at 100 TB) and its composed report
    "gopher_quality_flags",
    "gopher_repetition_flags",
    "gopher_kept_corpus",
    "streaming_quality_admission",
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_r13.json"
    import __spark_entry__ as e
    from datapipelinedemo_spark.session import get_spark

    spark = get_spark(app_name="scale-r13")
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
