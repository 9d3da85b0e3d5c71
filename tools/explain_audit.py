"""Physical-plan audit: prints red flags across every catalog query.

Checks each plan for: row-at-a-time Python (BatchEvalPython),
cartesian products, missing ReadSchema pruning on wide scans, and
counts exchanges (shuffles). Usage:
    python tools/explain_audit.py [query ...]     # flags summary
    python tools/explain_audit.py -v q1_pricing_summary  # full plan
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "-v"]
    verbose = "-v" in sys.argv

    import __spark_entry__ as e
    from datapipelinedemo_spark.session import get_spark

    spark = get_spark(app_name="explain-audit")
    sf_dir = "/root/testdata/sf0.01"
    qs = e.queries()
    names = args or sorted(qs)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        flags = []
        if "BatchEvalPython" in plan:
            flags.append("PYTHON-ROW-UDF")
        if "CartesianProduct" in plan and "cosine" not in name:
            flags.append("CARTESIAN")
        n_exch = plan.count("Exchange")
        n_bc = plan.count("BroadcastExchange")
        n_scan = len(re.findall(r"Scan parquet", plan))
        flags.append(f"shuffles={n_exch - n_bc}")
        flags.append(f"broadcasts={n_bc}")
        flags.append(f"scans={n_scan}")
        wsc = len(set(re.findall(r"codegen id : (\d+)", plan)))
        flags.append(f"codegen_spans={wsc}")
        print(f"{name}: {' '.join(flags)}")
        if verbose:
            print(plan)


if __name__ == "__main__":
    main()
