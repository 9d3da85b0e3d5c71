"""100× spot-validation of the linear-exponent ops (VERDICT r7 #6).

The 10× slice (tools/scale_bench.py) measured three ops at or near a
linear exponent — bloom_decontamination (0.99), c4_line_dedup (0.83),
dsir_importance_weights (0.83 memo-warm). All three are single
corpus scans, so the exponents should HOLD at 100×; this runner
confirms it on a 100× documents-only slice:

    python tools/gen_scale_slice.py 100 /root/testdata/sf0.1 \
        _scaledata/sf10_docs --tables=documents --line-tag
    python tools/scale100.py [out_json]

(``--line-tag`` matters: at K>26 the Caesar-only transform collides
and would manufacture cross-copy duplicate lines — super-linear by
construction, not by engine.)

Methodology per bench-noise notes: min-of-2 with clearCache per run,
one process, exponent = log(t_100x / t_1x) / log(100).
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

QUERIES = [
    "bloom_decontamination",
    "c4_line_dedup",
    "dsir_importance_weights",
]

BASE = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALED = os.path.join(REPO, "_scaledata", "sf10_docs")
K = 100.0


def timed(spark, fn, sf_dir: str) -> tuple[float, float]:
    runs = []
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        fn(spark, sf_dir).collect()
        runs.append(round(time.time() - t0, 3))
    return min(runs), runs[0]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale100.json"
    import __spark_entry__ as e
    from datapipelinedemo_spark.session import get_spark

    spark = get_spark(app_name="scale100")
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

    out = {"k": K, "queries": rows}
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
