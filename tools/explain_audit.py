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


# ---------------------------------------------------------------------------
# Broadcast-side discipline (VERDICT r14 #4): nothing corpus-grain may sit
# on the BUILD side of a broadcast join. The r14 hamming_screen_batch defect
# (corpus signature index broadcast to every executor — ~8 GB at the
# operator's own 10⁹-vector target) passed every correctness gate because
# sf0.1 doesn't feel an 8-byte × N broadcast; only the PLAN knows.

# Big-table scans: anything proportional to corpus size. The dimension
# tables (region, nation, customer, part, supplier) are broadcast-sized
# by design — classic star-schema dims.
CORPUS_TABLES = ("lineitem", "orders", "events", "documents", "embeddings")

# Disk-cache artifact tags that are CORPUS-GRAIN (one+ row per corpus
# row): packed sign signatures, PQ codes, substring grams, minhash
# signatures, the classifier training base. Bounded artifacts (qcw*
# weight vectors, centroid tables) are not listed and never flag.
CORPUS_GRAIN_ARTIFACTS = ("hamsig", "p16b", "p24b", "esg", "h32b", "qcbase")

# A node between the exchange and the corpus scan that bounds the frame
# to aggregate/limit cardinality makes the broadcast safe.
_BOUNDING = (
    "HashAggregate", "SortAggregate", "ObjectHashAggregate",
    "GlobalLimit", "LocalLimit", "CollectLimit",
    "TakeOrderedAndProject", "WindowGroupLimit", "Window",
)

_AGG_NODES = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")

# Sanctioned filter shapes that bound a corpus scan to a query/batch
# slice: a POSITIVE modulus-equality on an id column keeps a 1/M
# fraction (the catalog's stand-in for a bounded query set / trigger-
# bounded micro-batch). The NEGATED form (`NOT ((id % M) = 0)`) keeps
# (M-1)/M — still corpus-grain, NOT sanctioned: exactly the r14
# hamming_screen_batch corpus side, which this distinction catches.
_ID_COL = r"(?:\w*_?id|doc)"  # row-identity columns: vec_id, doc_id, doc, id
_SLICE_OK = re.compile(
    rf"(?<!NOT )\(\({_ID_COL}#\d+L? % \d+\) = \d+\)"  # positive modulus slice
    rf"|(?<!NOT )\({_ID_COL}#\d+L? = \d+\)"  # id-equality slice (single row)
    rf"|EqualTo\({_ID_COL},\d+\)"  # same, in PushedFilters form
)

# Grouping keys that ARE a row-identity column: an aggregate (e.g.
# ``.distinct()``) keyed on doc/vec ids reduces NOTHING — output
# cardinality stays corpus-grain, so it must not count as bounding
# (VERDICT r15 #2: ``cand_docs.distinct()`` sanctioned a
# corpus-fraction broadcast through exactly this loophole). Matches
# the column token immediately before ``#`` so ``doc#12L`` and
# ``vec_id#3L`` flag while ``doc_count#9L`` and band/bucket keys
# don't.
_ID_KEY = re.compile(rf"(?:^|[\s\[,(]){_ID_COL}#\d+")


def _is_bounding(plan: str, name: str, nid: int) -> bool:
    """True if node (name, nid) bounds corpus-grain cardinality.

    Limits / window-limits always bound. Aggregates bound ONLY when no
    grouping key is a row-identity column — a distinct/groupBy on ids
    keeps one row per corpus row."""
    base = name.split()[0]
    if base not in _BOUNDING:
        return False
    if base in _AGG_NODES:
        m = re.search(r"Keys \[\d+\]: \[([^\n]*)", _node_detail(plan, nid))
        if m and _ID_KEY.search(m.group(1)):
            return False
    return True


_NODE_RE = re.compile(r"^(?P<pre>[ :+\-]*)(?P<name>\*?\s*[A-Za-z][\w .]*?)\s\((?P<id>\d+)\)")


def _tree_nodes(plan: str) -> list[tuple[int, int, str, int]]:
    """(line_no, depth, name, node_id) for each tree-section line."""
    out = []
    for i, line in enumerate(plan.split("\n\n")[0].splitlines()):
        m = _NODE_RE.match(line)
        if m:
            out.append(
                (i, len(m.group("pre")), m.group("name").lstrip("* "),
                 int(m.group("id")))
            )
    return out


def _node_detail(plan: str, nid: int) -> str:
    """Detail-section text of one node (until the next '(n) ' header)."""
    m = re.search(
        rf"^\({nid}\) [^\n]*\n(?:(?!\(\d+\) )[^\n]*\n?)*", plan, re.M
    )
    return m.group(0) if m else ""


def _is_corpus_scan(detail: str) -> bool:
    loc = re.search(r"Location: \w+ \[([^\]]*)", detail)
    if not loc:
        return False
    path = loc.group(1)
    if any(f"{t}.parquet" in path for t in CORPUS_TABLES):
        return True
    return any(f"-{tag}" in path for tag in CORPUS_GRAIN_ARTIFACTS)


def corpus_broadcasts(plan: str) -> list[dict]:
    """Corpus-grain frames on the build side of a broadcast.

    For every ``BroadcastExchange`` subtree: each corpus-grain scan
    (big testdata table or corpus-grain disk artifact) must have a
    bounding operator (aggregate / limit / window-limit) OR a
    sanctioned positive modulus slice filter on the exchange→scan
    path. Everything else is a frame that grows with the corpus being
    shipped to every executor — returns one flag dict per violation.
    """
    nodes = _tree_nodes(plan)
    flags: list[dict] = []
    for idx, (_line, depth, name, nid) in enumerate(nodes):
        if name != "BroadcastExchange":
            continue
        # subtree = following nodes while deeper
        sub = []
        for j in range(idx + 1, len(nodes)):
            if nodes[j][1] <= depth:
                break
            sub.append(j)
        for j in sub:
            _sl, sdepth, sname, sid = nodes[j]
            if not sname.startswith("Scan"):
                continue
            sdetail = _node_detail(plan, sid)
            if not _is_corpus_scan(sdetail):
                continue
            # ancestor chain scan→exchange (exclusive): walk upward
            path_ids, cur = [], sdepth
            for k in range(j - 1, idx, -1):
                if nodes[k][1] < cur:
                    path_ids.append(k)
                    cur = nodes[k][1]
            if any(
                _is_bounding(plan, nodes[k][2], nodes[k][3])
                for k in path_ids
            ):
                continue
            path_text = sdetail + "".join(
                _node_detail(plan, nodes[k][3]) for k in path_ids
            )
            if _SLICE_OK.search(path_text):
                continue
            loc = re.search(r"Location: \w+ \[([^\],]*)", sdetail)
            flags.append(
                {
                    "exchange_id": nid,
                    "scan_id": sid,
                    "location": loc.group(1) if loc else "?",
                    "path": [nodes[k][2] for k in path_ids],
                }
            )
    return flags


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
