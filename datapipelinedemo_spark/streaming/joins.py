"""Stream-stream interval join: attribute each purchase to the same
user's most recent click within an attribution window, with both
sides arriving as unbounded streams.

Why this shape (vs a static-dimension stream join): both inputs are
facts, so Spark must buffer state on BOTH sides. The watermarks plus
the time-range join condition are what let the state store evict —
without the range bound the join would buffer the streams forever.
State per key is bounded by (attribution window + watermark delay) of
events; the join itself shuffles both streams once on user_id, the
same partitioning the state store uses, which is the plan that holds
when each side is a firehose.

Reference scope note: the reference engine is batch-only
(SURVEY.md §2); streaming operators are part of the §2.7 gap surface
this repo adds. Parity for the join SEMANTICS is pinned by the
batch-equivalence test (the same interval join expressed statically),
which is also why there is no DuckDB oracle entry — the streaming
runtime, not the relational algebra, is what's under test here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clicks_to_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = "1 hour",
    click_watermark: str = "2 hours",
    purchase_watermark: str = "2 hours",
) -> DataFrame:
    """Join purchase events to every click by the same user in the
    preceding ``window``. Inner interval join: purchases with no
    prior click in-window drop (attribution denominator handles them
    upstream).

    Columns in: both sides (user_id, ts, event_id, value)-shaped;
    clicks keep (user_id, click_ts, click_id), purchases keep
    (user_id, purchase_ts, purchase_id, value).
    Output: one row per (purchase, qualifying click).
    """
    c = (
        clicks.select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", click_watermark)
    )
    p = (
        purchases.select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", purchase_watermark)
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {window}")
        ),
        "inner",
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "purchase_value",
        "click_id",
        "click_ts",
    )


def clicks_to_purchases_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """LEFT OUTER variant: every click eventually emits — joined rows
    as matches arrive, and a null-purchase row once the watermark
    passes the end of the click's attribution window (proving the
    click can no longer match and its state can be evicted).

    This is the conversion-rate-denominator shape: unmatched clicks
    are the non-converting population, and they surface from the
    JOIN itself instead of a separate anti-join pass. Outer-side
    emission is watermark-driven, so results are eventually-complete,
    not instant — the test pins that two-phase behavior.
    """
    c = (
        clicks.select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    p = (
        purchases.select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {window}")
        ),
        "left_outer",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )
