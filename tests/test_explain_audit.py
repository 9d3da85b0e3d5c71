"""Physical-plan regression gate (tools/explain_audit.py wired into
pytest): catches silent optimizer regressions — a filter that stops
pushing into the parquet scan, a scan that stops pruning columns, a
broadcast that degrades to a shuffle join, or a Python row-UDF sneaking
into the hot path — before they show up as bench slowdowns.

Plans are built (analyzed + optimized), never executed, so the whole
sweep is cheap. Queries whose *construction* executes a small job
(pivot-label collect, k-means centroid seeding) still only run at
sf0.001.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.explain_audit import audit_flags, plan_string

# brute-force exact paths documented as (broadcast) nested-loop scans
CARTESIAN_OK = {
    "similarity_topk_bruteforce",
    "embedding_pair_cosine_stats",
}


@pytest.fixture(scope="module")
def catalog_plans(spark, sf_dir):
    import __spark_entry__ as e

    qs = e.queries()
    out = {}
    for name, fn in qs.items():
        out[name] = plan_string(fn(spark, sf_dir))
    return out


def test_no_python_row_udfs_anywhere(catalog_plans):
    # the whole engine claim: Arrow-batched seams only, zero
    # row-at-a-time Python in any catalog plan
    offenders = [
        n for n, p in catalog_plans.items() if audit_flags(p)["python_row_udf"]
    ]
    assert not offenders, offenders


def test_no_unexpected_cartesian_products(catalog_plans):
    offenders = [
        n
        for n, p in catalog_plans.items()
        if audit_flags(p)["cartesian"] and n not in CARTESIAN_OK
    ]
    assert not offenders, offenders


def test_q10_filter_pushdown_and_pruning(spark, sf_dir):
    from datapipelinedemo_spark.plans.tpch_deep import q10_returned_items

    plan = plan_string(q10_returned_items(spark, sf_dir))
    # the returnflag predicate must reach the lineitem scan and the
    # orderdate range must reach the orders scan
    assert "PushedFilters" in plan
    assert "l_returnflag" in plan.split("PushedFilters", 1)[1].splitlines()[0] or (
        "l_returnflag" in plan[plan.index("PushedFilters") :][:400]
    )
    # lineitem scan must NOT read all 11 columns
    for seg in plan.split("Scan parquet"):
        if "l_returnflag" in seg[:2000] and "ReadSchema" in seg:
            schema_line = seg.split("ReadSchema:", 1)[1].splitlines()[0]
            assert "l_shipdate" not in schema_line
            assert "l_linenumber" not in schema_line
            break
    else:
        pytest.fail("no lineitem scan with ReadSchema found")


def test_q12_filter_pushdown(spark, sf_dir):
    from datapipelinedemo_spark.plans.tpch_rest import (
        q12_late_shipment_priority,
    )

    plan = plan_string(q12_late_shipment_priority(spark, sf_dir))
    a = audit_flags(plan)
    assert not a["python_row_udf"]
    # ship/order date IS NOT NULL predicates push to both scans
    assert plan.count("PushedFilters") >= 2


def test_dim_joins_broadcast(spark, sf_dir):
    # small dimensions must broadcast, never shuffle the fact side
    from datapipelinedemo_spark.plans.tpch_deep import q10_returned_items
    from datapipelinedemo_spark.plans.tpch_rest import q11_important_parts

    for fn, min_bc in ((q10_returned_items, 2), (q11_important_parts, 2)):
        a = audit_flags(plan_string(fn(spark, sf_dir)))
        assert a["broadcasts"] >= min_bc, (fn.__name__, a)
