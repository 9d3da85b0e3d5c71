"""Round-9 scale validation: 10× exponents for the ops that had none
(VERDICT r8 next-round #6 — bpe_vocab, unimax_epoch_allocation, the
hard-negative LSH/IVF variants, the two text-streaming twins) plus
every op added in r9 (partition-offset repack — timed against its
windowed twin, histogram Gini against its ranked twin, the embedding
streaming twins, pipeline v3), plus the real-scale BPE training loop
itself at n_merges=256 (VERDICT r8 next-round #1: the bench row the
4-merge catalog entries can't provide).

Methodology identical to tools/scale_bench.py: min-of-2 with
clearCache() per run at sf0.1 and at the 10× slice
(_scaledata/sf1, from gen_scale_slice.py);
exponent = log(t_10x/t_1x)/log(10).

Usage: python tools/scale_r09.py [out_json]
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

from tools.scale_bench import BASE, SCALED, K, timed  # noqa: E402

QUERIES = [
    # r8 ops with no exponent row yet
    "bpe_vocab",
    "unimax_epoch_allocation",
    "hard_negative_mining_lsh",
    "hard_negative_mining_ivf",
    "streaming_first_batch_pairs",
    "streaming_batch_vs_corpus_pairs",
    # r9 ops
    "fixed_window_repack",
    "fixed_window_repack_offsets",
    "customer_revenue_gini",
    "customer_revenue_gini_histogram",
    "streaming_embedding_first_batch",
    "streaming_embedding_vs_corpus",
    "training_corpus_pipeline_v3",
]

N_MERGES_BENCH = 256


def bpe_train_row(spark) -> dict:
    """Time train_bpe at n_merges=256 on the sf0.1 and 10× word
    histograms (the training loop itself, not the 4-merge catalog
    twins). The histogram build is included — it is the run's one
    corpus-scale pass."""
    from datapipelinedemo_spark.plans.tokenizer_ops import (
        _word_histogram,
        train_bpe,
    )

    out = {"n_merges": N_MERGES_BENCH}
    for tag, sf in (("t_sf01", BASE), ("t_sf1", SCALED)):
        spark.catalog.clearCache()
        t0 = time.time()
        merges = train_bpe(
            spark, _word_histogram(spark, sf), N_MERGES_BENCH
        )
        out[tag] = round(time.time() - t0, 3)
        out[tag + "_n_merges_done"] = len(merges)
    out["exponent"] = round(
        math.log(out["t_sf1"] / out["t_sf01"]) / math.log(K), 2
    )
    return out


def main() -> None:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "fixtures",
            "scale_r09.json",
        )
    )
    import __spark_entry__ as e
    from datapipelinedemo_spark.session import get_spark

    spark = get_spark(app_name="scale_r09")
    qs = e.queries()
    qs["q1_pricing_summary"](spark, BASE).limit(1).collect()  # warmup

    rows = []
    for name in QUERIES:
        t1, _c1 = timed(spark, qs[name], BASE)
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
        print(json.dumps(rows[-1]), flush=True)
        # incremental write: a killed run keeps its finished rows
        with open(out_path, "w") as f:
            json.dump({"k": K, "queries": rows}, f, indent=1)

    result = {"k": K, "queries": rows, "bpe_train_256": bpe_train_row(spark)}
    print(json.dumps(result["bpe_train_256"]), flush=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
