"""Event-stream operators over the ``events`` table.

Sessionization — the batch shape of the classic stateful-streaming
operator (Structured Streaming expresses the same thing with
``session_window`` / ``applyInPandasWithState``; the batch plan below is
its deterministic oracle-checkable twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch_us(ts_col: str):
    """Microsecond integer epoch of a timestamp column — timezone-free
    (goes through TIMESTAMP_NTZ) and bit-identical to DuckDB epoch_us."""
    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"cast({ts_col} as timestamp_ntz))"
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    right_cols: tuple = ("value",),
    tiebreak: str = "event_id",
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: attach to every ``left`` row the most recent
    ``right`` row of the same ``on`` group with ``right.ts <= left.ts``
    (equal timestamps match). Unmatched left rows keep NULLs.

    Output: every left column, plus ``{prefix}us`` (the matched right
    row's microsecond epoch) and ``{prefix}{c}`` for each ``right_cols``
    entry. When several right rows share one timestamp, the greatest
    ``tiebreak`` wins — deterministic across engines and partition orders.

    Spark has no ASOF JOIN; the naive encoding (inequality theta-join +
    argmax) degenerates to BroadcastNestedLoop / an exploded range join.
    This is the scale-correct composition: tag both sides, UNION them,
    and carry the latest right payload forward with
    ``last(..., ignoreNulls=True)`` over one window ordered by
    (epoch_us, side, tiebreak) — right rows sort before left rows at
    equal timestamps, which implements the <=.

    100 TB design: exactly ONE exchange (on the join key) and one sort —
    the same cost as the sort-merge join Spark would run for an equi-join
    of the two tables; no row multiplication, no driver state. A
    pathologically hot key serializes within its task (window semantics);
    AQE skew-split cannot divide a window partition, so extreme key skew
    is a data-model concern, documented here rather than hidden.
    """
    lus, rus = _epoch_us(ts_col), _epoch_us(ts_col)
    payload = [F.col(c).alias(f"_r_{c}") for c in right_cols]
    # A right row with a NULL timestamp can never satisfy right.ts <=
    # left.ts (the comparison is unknown), so drop it BEFORE the union —
    # otherwise it would sort nulls-first and be carried as a spurious
    # "oldest" match. Left rows with NULL ts also sort first and therefore
    # correctly see no preceding right row (NULL match).
    right = right.where(F.col(ts_col).isNotNull())
    r = right.select(
        F.col(on),
        rus.alias("_us"),
        F.lit(0).alias("_side"),
        F.col(tiebreak).alias("_tie"),
        *payload,
        *[F.lit(None).cast(t.dataType).alias(f"_l_{t.name}")
          for t in left.schema.fields],
    )
    l = left.select(
        F.col(on),
        lus.alias("_us"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("_tie"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in right_cols],
        *[F.col(t.name).alias(f"_l_{t.name}") for t in left.schema.fields],
    )
    w = (
        Window.partitionBy(on)
        .orderBy("_us", "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry the matched right row as ONE struct so the timestamp and every
    # payload column always come from the same row: a matched right row
    # whose payload is genuinely NULL must yield a NULL payload (not an
    # older row's value). ``last(ignoreNulls)`` skips NULL structs (no
    # match yet), never NULL fields inside a carried struct.
    match_struct = F.struct(
        F.col("_us").alias("us"),
        *[F.col(f"_r_{c}").alias(c) for c in right_cols],
    )
    carried = l.unionByName(r).select(
        "*",
        F.last(F.when(F.col("_side") == 0, match_struct), ignorenulls=True)
        .over(w)
        .alias("_match"),
    )
    keep = [
        F.col(f"_l_{t.name}").alias(t.name)
        for t in left.schema.fields
        if t.name != on
    ]
    return carried.where(F.col("_side") == 1).select(
        F.col(on),
        *keep,
        F.col("_match.us").alias(f"{prefix}us"),
        *[F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )


def asof_hot_key_audit(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    threshold: int = 1_000_000,
    metrics=None,
) -> DataFrame:
    """Audit for :func:`asof_join`'s documented skew hazard: one narrow
    count per key per side, returning the keys whose combined row count
    exceeds ``threshold`` (the scale where a single window partition's
    task becomes the straggler). Feed those corpora to
    :func:`asof_join_bucketed` instead. When ``metrics`` is given, the
    hot-key count is recorded (mirrors decontaminate's build-side
    record)."""
    # null-safe outer join: asof_join's window partitionBy groups NULL
    # keys into ONE partition, so a hot NULL key is exactly as real a
    # straggler as any other — an equality join would split its left and
    # right counts onto two rows and let it slip under the threshold
    lc = left.groupBy(on).agg(F.count(F.lit(1)).alias("n_left"))
    rc = right.groupBy(on).agg(F.count(F.lit(1)).alias("n_right"))
    counts = (
        lc.join(rc, on=lc[on].eqNullSafe(rc[on]), how="outer")
        .select(
            F.coalesce(lc[on], rc[on]).alias(on),
            F.coalesce("n_left", F.lit(0)).alias("n_left"),
            F.coalesce("n_right", F.lit(0)).alias("n_right"),
        )
        .where(F.col("n_left") + F.col("n_right") > threshold)
    )
    if metrics is not None:
        metrics.record(
            "asof_hot_keys", n_hot=counts.count(), threshold=threshold
        )
    return counts


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    right_cols: tuple = ("value",),
    tiebreak: str = "event_id",
    prefix: str = "asof_",
    bucket_minutes: int = 60,
) -> DataFrame:
    """:func:`asof_join` semantics (same output, bit-for-bit) with the
    hot-key escape hatch: windows partition on (key, TIME BUCKET) instead
    of the key alone, so a pathologically hot key's rows split across
    ceil(span/bucket) independent tasks instead of serializing in one.

    Decomposition: a left row's match is either (a) the latest right row
    in its OWN bucket with right.ts <= left.ts — the same union+window
    carry as asof_join, now partitioned by (key, bucket) — or, when the
    bucket has no earlier right row, (b) the latest right row of any
    EARLIER bucket: a per-(key, bucket) max aggregate (map-side
    combinable) carried forward by a window over the (tiny) bucket spine,
    joined back on (key, bucket). ``coalesce`` of the two struct carries
    preserves the single-matched-row contract (us and payload always from
    one row; genuine NULL payloads stay NULL).

    Cost: three exchanges (vs asof_join's one) — the union window on
    (key, bucket), the bucket-spine aggregate, and the carry-in join —
    all on keys that subdivide hot keys. Use asof_join by default; switch
    when :func:`asof_hot_key_audit` flags keys, sizing ``bucket_minutes``
    so a single (key, bucket) group fits a task comfortably.
    """
    if int(bucket_minutes) < 1:
        raise ValueError(
            f"bucket_minutes must be >= 1, got {bucket_minutes}"
        )
    bucket_us = int(bucket_minutes) * 60 * 1_000_000
    right = right.where(F.col(ts_col).isNotNull())
    payload = [F.col(c).alias(f"_r_{c}") for c in right_cols]
    r = right.select(
        F.col(on),
        _epoch_us(ts_col).alias("_us"),
        F.lit(0).alias("_side"),
        F.col(tiebreak).alias("_tie"),
        *payload,
        *[F.lit(None).cast(t.dataType).alias(f"_l_{t.name}")
          for t in left.schema.fields],
    ).withColumn("_bucket", F.floor(F.col("_us") / F.lit(bucket_us)))
    l = left.select(
        F.col(on),
        _epoch_us(ts_col).alias("_us"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("_tie"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in right_cols],
        *[F.col(t.name).alias(f"_l_{t.name}") for t in left.schema.fields],
    ).withColumn("_bucket", F.floor(F.col("_us") / F.lit(bucket_us)))

    match_struct = F.struct(
        F.col("_us").alias("us"),
        *[F.col(f"_r_{c}").alias(c) for c in right_cols],
    )
    # (a) within-bucket carry — asof_join's window, partitioned finer
    wb = (
        Window.partitionBy(on, "_bucket")
        .orderBy("_us", "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).select(
        "*",
        F.last(F.when(F.col("_side") == 0, match_struct), ignorenulls=True)
        .over(wb)
        .alias("_match"),
    )

    # (b) cross-bucket carry-in over the bucket SPINE (one row per
    # (key, bucket) seen on either side — O(buckets), not O(rows)).
    # _best orders by (us, tie) first, so max() picks exactly the row the
    # within-bucket window would have carried out of that bucket.
    best_struct = F.struct(
        F.col("_us").alias("us"),
        F.col("_tie").alias("tie"),
        *[F.col(f"_r_{c}").alias(c) for c in right_cols],
    )
    # NULL-SAFE key joins throughout: asof_join's window partitionBy
    # groups NULL keys (and a NULL-ts left row's NULL bucket) into one
    # partition, so the bit-for-bit contract requires the spine and
    # carry-in joins to match NULL keys too — an equality join would
    # silently drop every cross-bucket match for the NULL-key group
    rb = r.groupBy(on, "_bucket").agg(F.max(best_struct).alias("_best"))
    spine_keys = (
        l.select(on, "_bucket")
        .unionByName(rb.select(on, "_bucket"))
        .distinct()
    )
    spine = (
        spine_keys.alias("sk")
        .join(
            rb.alias("rb"),
            F.col(f"sk.{on}").eqNullSafe(F.col(f"rb.{on}"))
            & F.col("sk._bucket").eqNullSafe(F.col("rb._bucket")),
            "left",
        )
        .select(
            F.col(f"sk.{on}").alias(on),
            F.col("sk._bucket").alias("_bucket"),
            F.col("rb._best").alias("_best"),
        )
    )
    wc = (
        Window.partitionBy(on)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = spine.select(
        on,
        "_bucket",
        F.last("_best", ignorenulls=True).over(wc).alias("_carry"),
    )

    carry_as_match = F.when(
        F.col("_carry").isNotNull(),
        F.struct(
            F.col("_carry.us").alias("us"),
            *[F.col(f"_carry.{c}").alias(c) for c in right_cols],
        ),
    )
    keep = [
        F.col(f"_l_{t.name}").alias(t.name)
        for t in left.schema.fields
        if t.name != on
    ]
    return (
        carried.where(F.col("_side") == 1)
        .alias("lc")
        .join(
            carry.alias("cy"),
            F.col(f"lc.{on}").eqNullSafe(F.col(f"cy.{on}"))
            & F.col("lc._bucket").eqNullSafe(F.col("cy._bucket")),
            "left",
        )
        .select(
            F.col(f"lc.{on}").alias(on),
            *keep,
            F.coalesce(F.col("lc._match"), carry_as_match).alias("_m"),
        )
        .select(
            F.col(on),
            *[t.name for t in left.schema.fields if t.name != on],
            F.col("_m.us").alias(f"{prefix}us"),
            *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_cols],
        )
    )


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
