"""Event-stream operators over the ``events`` table.

Sessionization — the batch shape of the classic stateful-streaming
operator (Structured Streaming expresses the same thing with
``session_window`` / ``applyInPandasWithState``; the batch plan below is
its deterministic oracle-checkable twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Gap-based sessions: consecutive events of one user belong to the
    same session while the inter-event gap stays under ``gap_minutes``.

    Output: one row per session —
    (user_id, session_seq, n_events, start_ts, end_ts, duration_s,
    sum_value) with ``session_seq`` numbering a user's sessions from 1 in
    time order.

    Plan shape at 100 TB: ONE exchange on ``user_col`` serves both the
    lag/cumsum windows and the final session aggregate (the groupBy keys
    are a superset of the window partition key, so Catalyst reuses the
    sort/exchange — no second shuffle). User keys are naturally bounded
    (a user's event history fits a task); a pathological single hot user
    is a data-model problem, not a plan problem. Ties on ``ts`` break by
    ``order_tiebreak`` so both engines number identically. ``sum_value``
    runs through decimal so the result is order-independent and
    bit-identical across engines.
    """
    # microsecond integer epochs: gap compare and duration are exact
    # integer arithmetic, bit-identical in Spark and DuckDB (epoch_us).
    # timestampdiff from the NTZ epoch literal is timezone-free, so a
    # TIMESTAMP_NTZ column (parquet naive timestamps) works under any
    # session timezone; plain TIMESTAMP coerces into the same expression.
    us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"cast({ts_col} as timestamp_ntz))"
    )
    w = Window.partitionBy(user_col).orderBy(us, F.col(order_tiebreak))
    gap_us = gap_minutes * 60 * 1_000_000
    with_flag = events.withColumn("_us", us).withColumn(
        "_new_session",
        F.when(
            F.col("_us") - F.lag(F.col("_us")).over(w) > F.lit(gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "session_seq",
        (F.sum("_new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) + F.lit(1)).cast("int"),
    )
    return (
        with_flag.groupBy(user_col, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("_us").alias("_start_us"),
            F.max("_us").alias("_end_us"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            user_col,
            "session_seq",
            "n_events",
            F.col("_start_us").alias("start_us"),
            F.col("_end_us").alias("end_us"),
            ((F.col("_end_us") - F.col("_start_us")) / F.lit(1_000_000.0))
            .alias("duration_s"),
            "sum_value",
        )
    )
