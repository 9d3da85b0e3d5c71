"""Physical-plan audit: red flags across catalog queries.

Checks each plan for: row-at-a-time Python (BatchEvalPython),
cartesian products, missing ReadSchema pruning on wide scans, and
counts exchanges (shuffles). Importable (pytest wires `plan_string` +
`audit_flags` into the suite so pushdown/pruning regressions fail CI);
CLI usage:
    python tools/explain_audit.py [query ...]     # flags summary
    python tools/explain_audit.py -v q1_pricing_summary  # full plan
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_string(df) -> str:
    """Formatted physical plan (same text as df.explain('formatted'))."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def audit_flags(plan: str) -> dict:
    """Machine-readable red-flag summary of a formatted plan."""
    n_exch = plan.count("Exchange")
    n_bc = plan.count("BroadcastExchange")
    return {
        "python_row_udf": "BatchEvalPython" in plan,
        "cartesian": "CartesianProduct" in plan,
        "shuffles": n_exch - n_bc,
        "broadcasts": n_bc,
        "scans": len(re.findall(r"Scan parquet", plan)),
        "codegen_spans": len(set(re.findall(r"codegen id : (\d+)", plan))),
    }


def single_partition_sorts(plan: str) -> list[int]:
    """Node ids of ``Exchange SinglePartition`` operators that feed a
    Sort — the global-sort anti-pattern (one task sorts every row).
    A SinglePartition exchange that merely merges scalar partial
    aggregates (1 row per partition) is NOT flagged: the scale bug is
    sorting data on one task, not reducing to one value."""
    tree = plan.split("\n\n")[0]
    sort_children: list[int] = []
    lines = tree.splitlines()
    # under AQE the Sort's child is wrapped (AQEShuffleRead →
    # ShuffleQueryStage → Exchange, or a ReusedExchange) — walk past
    # wrapper nodes before matching the Exchange (ADVICE r9)
    wrapper = re.compile(
        r"\b(AQEShuffleRead|ShuffleQueryStage|TableCacheQueryStage"
        r"|InMemoryTableScan|InputAdapter) \(\d+\)"
    )
    for i, line in enumerate(lines):
        if not re.search(r"\bSort \(\d+\)", line):
            continue
        j = i + 1
        while j < len(lines) and wrapper.search(lines[j]):
            j += 1
        if j >= len(lines):
            continue
        m = re.search(r"\bExchange \((\d+)\)", lines[j])
        if m:
            sort_children.append(int(m.group(1)))
            continue
        m = re.search(r"\bReusedExchange \((\d+)\)", lines[j])
        if m:
            # resolve the reuse target from the detail section
            reuse = re.search(
                rf"\({m.group(1)}\) ReusedExchange"
                rf"(?:.*\n)*?Reuses operator id: (\d+)",
                plan,
            )
            if reuse:
                sort_children.append(int(reuse.group(1)))
    flagged = []
    for nid in sort_children:
        detail = re.search(
            rf"\({nid}\) Exchange\n(?:.*\n)*?Arguments: ([^\n]*)", plan
        )
        if detail and "SinglePartition" in detail.group(1):
            flagged.append(nid)
    return flagged


def single_partition_windows(plan: str) -> list[int]:
    """Node ids of ``Exchange SinglePartition`` operators feeding a
    Window — a PARTITIONLESS window function (``over(orderBy(...))``
    with no partitionBy): every input row lands in one task
    (WindowExec warns about exactly this). On an unbounded grain
    (customers, documents) that one task is the whole corpus — the
    straggler class VERDICT r11 #3 flags; calendar-bounded grains
    (days, months) are capacity-bounded and allowlisted at the test
    layer, not here."""
    tree = plan.split("\n\n")[0]
    lines = tree.splitlines()
    wrapper = re.compile(
        r"\b(AQEShuffleRead|ShuffleQueryStage|TableCacheQueryStage"
        r"|InMemoryTableScan|InputAdapter|Sort|WholeStageCodegen"
        r"|RunningWindowFunction) \(\d+\)"
    )
    window_children: list[int] = []
    for i, line in enumerate(lines):
        if not re.search(r"\bWindow(?:GroupLimit)? \(\d+\)", line):
            continue
        j = i + 1
        while j < len(lines) and wrapper.search(lines[j]):
            j += 1
        if j >= len(lines):
            continue
        m = re.search(r"\bExchange \((\d+)\)", lines[j])
        if m:
            window_children.append(int(m.group(1)))
            continue
        m = re.search(r"\bReusedExchange \((\d+)\)", lines[j])
        if m:
            reuse = re.search(
                rf"\({m.group(1)}\) ReusedExchange"
                rf"(?:.*\n)*?Reuses operator id: (\d+)",
                plan,
            )
            if reuse:
                window_children.append(int(reuse.group(1)))
    flagged = []
    for nid in window_children:
        detail = re.search(
            rf"\({nid}\) Exchange\n(?:.*\n)*?Arguments: ([^\n]*)", plan
        )
        if detail and "SinglePartition" in detail.group(1):
            flagged.append(nid)
    return flagged


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
        plan = plan_string(df)
        a = audit_flags(plan)
        flags = []
        if a["python_row_udf"]:
            flags.append("PYTHON-ROW-UDF")
        if single_partition_sorts(plan):
            flags.append("SINGLE-PARTITION-SORT")
        if single_partition_windows(plan):
            flags.append("SINGLE-PARTITION-WINDOW")
        if a["cartesian"] and "cosine" not in name:
            flags.append("CARTESIAN")
        flags.append(f"shuffles={a['shuffles']}")
        flags.append(f"broadcasts={a['broadcasts']}")
        flags.append(f"scans={a['scans']}")
        flags.append(f"codegen_spans={a['codegen_spans']}")
        print(f"{name}: {' '.join(flags)}")
        if verbose:
            print(plan)


if __name__ == "__main__":
    main()
