"""Scale-validation bench (VERDICT r5 #5): measure wall-clock scaling
exponents between sf0.1 and the 10× slice from ``gen_scale_slice.py``.

For each selected query: min-of-2 with ``clearCache()`` per run (the
standalone methodology from ``bench.py``) at both scales, then

    exponent = log(t_10x / t_1x) / log(10)

1.0 = perfectly linear, <1 = sub-linear (fixed overheads amortizing),
>1 = super-linear (a scale problem worth explaining or fixing).

Also times the skew-salting path on a planted 90%-hot key at the 10×
size: plain groupBy vs ``operators.skew.salted_sum_count`` on the same
skewed frame, verifying the salted result matches.

Selection = the slowest standalone queries from the r5/r6 benches (the
near-dup chain, similarity search, PageRank, EWMA, bigram LM) plus one
representative scan-agg (q1), join-heavy shape (q18) and sliding
window (events_sliding_2h_1h). ``similarity_topk_bruteforce`` is
excluded by design — both query and corpus sides scale, so brute force
is O(K²) by definition; the LSH/IVF entries are its scale path.

Usage: python tools/scale_bench.py [out_json]
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
    "training_corpus_pipeline",
    "minhash_lsh_candidates",
    "neardup_clusters",
    "simhash_editdist_verify",
    "incremental_dedup_candidates",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "pagerank_trade_graph",
    "user_value_ewma",
    "bigram_perplexity_scores",
    "q1_pricing_summary",
    "q18_large_quantity_orders",
    "events_sliding_2h_1h",
    "embedding_neardup_pairs",
    "c4_line_dedup",
    "semdedup_prune",
    "winnowed_substring_matches",
    "bloom_decontamination",
    "training_corpus_pipeline_v2",
    "dsir_importance_weights",
    "ccnet_perplexity_buckets",
    "winnowed_substring_spans",
    "neardup_canonical_quality",
    "soft_dedup_weights",
]
# hard_negative_mining is deliberately absent for the same reason as
# similarity_topk_bruteforce: both its sides scale, so brute force is
# O(K²) by definition; the max_sim-capped LSH/IVF variants are its
# scale path and their exponents are measured above.

BASE = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALED = os.path.join(REPO, "_scaledata", "sf1")
K = 10.0


def timed(spark, fn, sf_dir: str) -> tuple[float, float]:
    """(min-of-2, cold) wall seconds, clearCache before each run."""
    runs = []
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        fn(spark, sf_dir).collect()
        runs.append(round(time.time() - t0, 3))
    return min(runs), runs[0]


def skew_path(spark, sf_dir: str) -> dict:
    """Planted 90%-hot-key aggregate at scale: plain vs salted."""
    from pyspark.sql import functions as F

    from datapipelinedemo_spark.operators.skew import salted_sum_count
    from datapipelinedemo_spark.tables import table

    ev = table(spark, sf_dir, "events").withColumn(
        "user_id",
        F.when(F.col("event_id") % 10 < 9, F.lit(0)).otherwise(
            F.col("user_id")
        ),
    )
    out = {}
    spark.catalog.clearCache()
    t0 = time.time()
    plain = (
        ev.groupBy("user_id")
        .agg(F.sum("value").alias("v"), F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    out["plain_s"] = round(time.time() - t0, 3)
    spark.catalog.clearCache()
    t0 = time.time()
    salted = salted_sum_count(
        ev, ["user_id"], {"value": "v"}, buckets=16
    ).collect()
    out["salted_s"] = round(time.time() - t0, 3)
    p = {r["user_id"]: (round(r["v"], 6), r["cnt"]) for r in plain}
    s = {r["user_id"]: (round(r["v"], 6), r["cnt"]) for r in salted}
    out["equivalent"] = p == s
    out["groups"] = len(p)
    return out


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_bench.json"
    import __spark_entry__ as e
    from datapipelinedemo_spark.session import get_spark

    spark = get_spark(app_name="scale_bench")
    qs = e.queries()
    qs[QUERIES[-1]](spark, BASE).limit(1).collect()  # JVM/codegen warmup

    rows = []
    for name in QUERIES:
        t1, c1 = timed(spark, qs[name], BASE)
        t10, c10 = timed(spark, qs[name], SCALED)
        exp = round(math.log(t10 / t1) / math.log(K), 2) if t1 > 0 else None
        rows.append(
            {
                "query": name,
                "t_sf01": t1,
                "t_sf1": t10,
                "cold_sf1": c10,
                "exponent": exp,
            }
        )
        print(
            f"{name:32s} sf0.1 {t1:7.2f}s  sf1 {t10:7.2f}s "
            f"(cold {c10:7.2f})  exp {exp}"
        )

    skew = skew_path(spark, SCALED)
    print(f"skew 90% hot key @10x: plain {skew['plain_s']}s "
          f"salted {skew['salted_s']}s equivalent={skew['equivalent']}")

    with open(out_path, "w") as f:
        json.dump({"queries": rows, "skew": skew, "k": K}, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
