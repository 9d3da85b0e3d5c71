"""Round-13b scale validation: 100x document-grain exponents for the
second batch of r13 entries —

- ``lsh_band_planner``: one signature pass over the stored shingle
  index + a 63-rows/doc explode + two partial aggs; expected ~linear
  (the planner never materializes the pair floods it costs).
- ``packing_efficiency_sweep``: one per-lang windowed prefix pass +
  a 4-row in-row explode; expected to track pack_documents_bins.
- ``neardup_source_matrix`` / ``leakage_safe_split``: the r13
  cluster-composition entries (candidate pairs -> components ->
  doc-grain joins), measured here because the first r13 batch only
  covered the Gopher/exact-substring families.
- ``classifier_calibration_bins`` / ``classifier_threshold_sweep``
  are EXCLUDED on purpose: both are one histogram agg over the
  certified score frame, but a fresh 100x corpus would first pay the
  40-iteration training chain for a new weights artifact — the
  exponent would measure training, which is already characterized
  (one corpus-scale aggregate pass per iteration), not the tables.

Slice: ``_scaledata/sf10_docs`` (100x documents, line-tagged).
Methodology identical to tools/scale100.py: min-of-2 with clearCache
per run, one process, exponent = log(t_100x / t_1x) / log(100).

Usage: python tools/scale_r13b.py [out_json]
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
    "lsh_band_planner",
    "packing_efficiency_sweep",
    "neardup_source_matrix",
    "leakage_safe_split",
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_r13b.json"
    import __spark_entry__ as e
    from datapipelinedemo_spark.session import get_spark

    spark = get_spark(app_name="scale-r13b")
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
