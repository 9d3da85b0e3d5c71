"""Round-15 scale validation: the two measurements this round's plan
changes claim —

1. **16-plane signing, md5-expression vs hoisted literal-array form**
   (`operators/similarity.py::with_hyperplane_signs`), at a row count
   where per-row signing cost dominates plan overhead (the 100×
   embeddings slice, 200k vectors). The r14 measurement covered the
   48-plane geometry (9-11×); the 16-plane family's query/batch
   frames at sf0.1 are 100-500 rows, where overhead hides the win —
   this run is the "win at real batch sizes" PERF.md asserts.

2. **Fixed-batch Hamming admission exponent** after the broadcast-side
   swap (`plans/hamming_ops.py::hamming_screen_batch`): a 200-vector
   batch (the trigger-rate contract) screened against the stored
   signature index at 1× and 100× corpus. Expected ~linear (the
   decision is one 8-byte-per-vector signature scan with a map-side
   min); the certified catalog twin is EXCLUDED from exponent tables
   by the fixed-fraction rationale (its batch is vec_id % 10 — it
   grows with the corpus by construction), so this fixed-batch form
   is the honest scale number for the operator.

Slice: ``_scaledata/sf10_emb`` (100× embeddings via key-offset
sharding + per-copy dim-0 jitter; tools/gen_scale_slice.py
--tables=embeddings). Methodology identical to tools/scale100.py:
min-of-2 with clearCache per run, one process,
exponent = log(t_100x / t_1x) / log(100).

Usage: python tools/scale_r15.py [out_json]
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

BASE = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALED = os.path.join(REPO, "_scaledata", "sf10_emb")
K = 100.0
BATCH_N = 200  # fixed admission batch (trigger-rate contract)


def _timed(fn, reps: int = 2) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    # floor at 1 ms: a sub-millisecond run rounded to 0.0 would blow
    # up the log-ratio exponent after the expensive runs completed
    # (ADVICE r15)
    return max(round(min(ts), 3), 1e-3)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_r15.json"

    from pyspark.sql import functions as F

    from datapipelinedemo_spark.operators import similarity as SIM
    from datapipelinedemo_spark.operators.ann_index import hamming_sig_index
    from datapipelinedemo_spark.operators.similarity import (
        hyperplane_signs,
        with_hyperplane_signs,
    )
    from datapipelinedemo_spark.plans.hamming_ops import (
        _HAM_PLANES,
        hamming_screen_batch,
    )
    from datapipelinedemo_spark.session import get_spark

    spark = get_spark(app_name="scale-r15")
    emb100 = spark.read.parquet(os.path.join(SCALED, "embeddings.parquet"))
    emb1 = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    n100, n1 = emb100.count(), emb1.count()
    results = []

    # --- 1) 16-plane signing forms at 200k rows -----------------------
    def run_expr():
        spark.catalog.clearCache()
        emb100.select(
            hyperplane_signs("embedding", 16, 64).alias("sig")
        ).agg(F.sum("sig")).collect()

    def run_literal():
        spark.catalog.clearCache()
        with_hyperplane_signs(emb100, "embedding", 16, 64).agg(
            F.sum("sig")
        ).collect()

    t_expr = _timed(run_expr)
    t_lit = _timed(run_literal)
    results.append(
        {
            "measure": "sign16_md5_expression_200k",
            "t": t_expr,
            "rows": n100,
        }
    )
    results.append(
        {
            "measure": "sign16_literal_hoist_200k",
            "t": t_lit,
            "rows": n100,
            "speedup_vs_expression": round(t_expr / t_lit, 2),
        }
    )

    # --- 2) fixed-batch admission exponent ----------------------------
    batch = emb1.orderBy("vec_id").limit(BATCH_N).select(
        "vec_id", "embedding"
    )

    def screen(sf_dir: str):
        corpus = hamming_sig_index(spark, sf_dir, _HAM_PLANES, 64)

        def run():
            spark.catalog.clearCache()
            hamming_screen_batch(batch, corpus).agg(
                F.sum("min_ham"), F.sum("admitted")
            ).collect()

        return run

    # build both indexes once (cold, outside the timed window)
    cold1 = _timed(screen(BASE), reps=1)
    cold100 = _timed(screen(SCALED), reps=1)
    t1 = _timed(screen(BASE))
    t100 = _timed(screen(SCALED))
    results.append(
        {
            "query": "hamming_admission_fixed_batch",
            "batch_rows": BATCH_N,
            "t_sf01": t1,
            "t_100x": t100,
            "cold_1x": cold1,
            "cold_100x": cold100,
            "corpus_rows": [n1, n100],
            "exponent": round(math.log(t100 / t1) / math.log(K), 2),
        }
    )

    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
