"""Round-11b scale validation: 100x exponents for the round's late
additions with a corpus-grain or index-grain cost —
`doremi_domain_weights` (two LM chains + |sources|-row arithmetic),
`pq_balanced_subspace_error` (exact-moment permutation + the
balanced Lloyd chain), `kmeans_clusters_k64` (the broadcast-strategy
coarse quantizer at production nlist), and the two index reads
(`trained_unigram_vocab_stored`, `ivf_list_balance_report`) whose
warm cost should be flat. Same slice and methodology as
tools/scale_r11.py; the ADC-topk exclusion rationale still applies
to the serving entries.

Usage: python tools/scale_r11b.py [out_json]
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
    "doremi_domain_weights",
    "pq_balanced_subspace_error",
    "kmeans_clusters_k64",
    "trained_unigram_vocab_stored",
    "ivf_list_balance_report",
]


def main() -> None:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, "fixtures", "scale_r11b.json")
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
