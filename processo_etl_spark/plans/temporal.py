"""Temporal-join plans: as-of join and point-in-interval range join.

Extensions beyond the reference's equi-join-only surface (SURVEY.md
§2.3) — implemented scale-first in operators/temporal.py (one keyed
shuffle, no nested loop) and oracle-checked here against DuckDB's
native ``ASOF JOIN`` resp. a plain BETWEEN join.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from processo_etl_spark.operators.temporal import asof_join, range_join_bucketed
from processo_etl_spark.plans import register
from processo_etl_spark.plans.common import dec, t

_SESSION_GAP_S = 1800


@register(
    "asof_purchase_last_view",
    oracle="""
    SELECT p.event_id, p.user_id,
           CAST(CAST(ROUND(p.value, 2) AS DECIMAL(12,2)) AS DOUBLE) AS purchase_value,
           v.ts AS view_ts,
           CAST(CAST(ROUND(v.value, 2) AS DECIMAL(12,2)) AS DOUBLE) AS view_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def asof_purchase_last_view(spark, sf_dir):
    """For each purchase, the user's most recent prior-or-equal 'view'
    event (backward as-of join on user_id).

    Union-sort formulation — one shuffle on user_id, no nested loop —
    vs DuckDB's built-in ASOF LEFT JOIN as the oracle.
    """
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        dec("value").cast("double").alias("purchase_value"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", dec("value").cast("double").alias("view_value")
    )
    out = asof_join(purchases, views, on=["user_id"], ts="ts", payload=["view_value"])
    return out.select(
        "event_id",
        "user_id",
        "purchase_value",
        F.col("ts_right").alias("view_ts"),
        F.col("view_value_right").alias("view_value"),
    )


@register(
    "range_error_sessions",
    oracle=f"""
    WITH base AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type <> 'error'),
    flagged AS (
      SELECT user_id, ts,
        CASE WHEN lag(ts) OVER w IS NULL
               OR epoch(ts) - epoch(lag(ts) OVER w) > {_SESSION_GAP_S}
             THEN 1 ELSE 0 END AS new_session
      FROM base WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged),
    intervals AS (
      SELECT user_id, sid,
             min(ts) - INTERVAL {_SESSION_GAP_S} SECOND AS session_start,
             max(ts) + INTERVAL {_SESSION_GAP_S} SECOND AS session_end
      FROM sess GROUP BY 1, 2)
    SELECT i.user_id, i.session_start, count(*) AS n_errors
    FROM intervals i
    JOIN events e
      ON e.user_id = i.user_id AND e.event_type = 'error'
     AND e.ts BETWEEN i.session_start AND i.session_end
    GROUP BY 1, 2
    """,
)
def range_error_sessions(spark, sf_dir):
    """Count 'error' events attributable to each activity session:
    sessions built from the non-error events (30-min gap — same rule as
    sessionize_gap), each widened by the gap on both ends, so an error
    within the inactivity window around a session matches.  Widened
    intervals can overlap, so one error may legitimately land in two
    sessions — real range-join semantics, not bucket assignment.

    The containment join runs as a bucketed hash range join
    (operators/temporal.range_join_bucketed): intervals explode into the
    30-min epoch buckets they cover, points equi-join on (user_id,
    bucket), residual BETWEEN at full microsecond precision.  No
    nested-loop join at any scale.
    """
    ev = t(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type") != "error")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = base.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull() | (gap > _SESSION_GAP_S), 1).otherwise(0),
    )
    sid = F.sum("new_session").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    intervals = (
        flagged.withColumn("sid", sid)
        .groupBy("user_id", "sid")
        .agg(
            (F.min("ts") - F.expr(f"INTERVAL {_SESSION_GAP_S} SECOND")).alias(
                "session_start"
            ),
            (F.max("ts") + F.expr(f"INTERVAL {_SESSION_GAP_S} SECOND")).alias(
                "session_end"
            ),
        )
    )
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts")
    micros = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    joined = range_join_bucketed(
        errors,
        intervals,
        on=["user_id"],
        point=micros("ts"),
        start=micros("session_start"),
        end=micros("session_end"),
        bucket_width=_SESSION_GAP_S * 1_000_000,
    )
    return joined.groupBy("user_id", "session_start").agg(
        F.count(F.lit(1)).alias("n_errors")
    )
