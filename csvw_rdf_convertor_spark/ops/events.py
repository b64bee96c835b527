"""Event-stream analytics: sessionization and funnels.

The standard product-analytics pair over an append-only event log —
included because an "analytics engine over transcripts/events" needs them
as much as it needs the training-data ops (the events table is this
repo's stand-in for that log; the streaming sessionizer in
``streaming/transcripts_stream.py`` is the event-time twin of the batch
``sessionize`` here).

Scale shapes:
- ``sessionize``: ONE window keyed on the user id (uniform key; per-user
  partitions are session-history sized, never corpus-sized) — lag + a
  running sum of session-break flags, the classic gaps-and-islands plan.
- ``funnel``: one algebraic min-aggregation per step plus an equi-join on
  the user id per step — K small shuffles for a K-step funnel, no window
  over event history and no cross product. Timestamps are compared as
  ``unix_micros`` (NTZ-safe under the pinned UTC session).

Both are exactly replayable in DuckDB (gates ``events_sessionize`` /
``events_funnel``) — all arithmetic is integer microseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _us(ts_col: str):
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def sessionize(events: DataFrame, *, gap_minutes: int = 30,
               user_col: str = "user_id", ts_col: str = "ts",
               order_col: str = "event_id") -> DataFrame:
    """Add ``session_idx`` (0-based per user): a new session starts when
    the gap since the previous event exceeds ``gap_minutes``. Ties in
    ``ts`` break on ``order_col`` so numbering is total and retry-stable.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    us = _us(ts_col)
    brk = F.when(F.lag(us).over(w).isNull()
                 | (us - F.lag(us).over(w) > gap_us), 1).otherwise(0)
    return events.withColumn(
        "session_idx",
        (F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding,
                                       Window.currentRow)) - 1)
        .cast("long"))


def session_stats(events: DataFrame, *, gap_minutes: int = 30,
                  user_col: str = "user_id", ts_col: str = "ts",
                  order_col: str = "event_id") -> DataFrame:
    """Per-session rollup: ``(user_col, session_idx, n_events, start_us,
    end_us, duration_us)``."""
    us = _us(ts_col)
    return (sessionize(events, gap_minutes=gap_minutes, user_col=user_col,
                       ts_col=ts_col, order_col=order_col)
            .groupBy(user_col, "session_idx")
            .agg(F.count("*").alias("n_events"),
                 F.min(us).alias("start_us"),
                 F.max(us).alias("end_us"))
            .withColumn("duration_us",
                        F.col("end_us") - F.col("start_us")))


def funnel(events: DataFrame, steps: list[str], *,
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type") -> DataFrame:
    """Strictly-ordered funnel: a user completes step i when a step-i
    event occurs strictly AFTER their earliest completion of step i−1
    (the greedy earliest-match semantics every funnel tool defaults to).
    Returns ``(user_col, steps_completed)`` for users who completed ≥1
    step."""
    if not steps:
        raise ValueError("need at least one funnel step")
    base = events.select(F.col(user_col), F.col(type_col).alias("_t"),
                         _us(ts_col).alias("_us"))
    level = (base.where(F.col("_t") == steps[0])
             .groupBy(user_col).agg(F.min("_us").alias("_ts0")))
    out = level.select(user_col, F.lit(1).cast("long")
                       .alias("steps_completed"))
    for i, s in enumerate(steps[1:], start=1):
        nxt = (base.where(F.col("_t") == s)
               .join(level.select(user_col,
                                  F.col(f"_ts{i - 1}").alias("_prev")),
                     user_col)
               .where(F.col("_us") > F.col("_prev"))
               .groupBy(user_col).agg(F.min("_us").alias(f"_ts{i}")))
        out = (out.join(nxt.select(user_col, F.col(f"_ts{i}").alias("_n")),
                        user_col, "left")
               .withColumn("steps_completed",
                           F.when(F.col("_n").isNotNull(),
                                  F.lit(i + 1).cast("long"))
                           .otherwise(F.col("steps_completed")))
               .drop("_n"))
        level = nxt
    return out.select(user_col, "steps_completed")


#: microseconds per week (cohort bucketing is integer division on epoch_us)
_WEEK_US = 7 * 86_400 * 1_000_000


def retention_cohorts(events: DataFrame, *, user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Weekly retention triangle: users bucketed by FIRST-event week
    (cohort), counted per week-offset they were active in.

    ``(cohort_week, week_offset, n_users)`` — week = epoch_us div one
    week (integer, engine-exact; no calendar/timezone functions, the
    pinned-UTC equivalent of date_trunc('week') without its locale
    pitfalls). Two algebraic shuffles: per-user min (cohort) and the
    (cohort, offset) distinct-count — both on uniform keys.
    """
    weeks = (events.select(F.col(user_col),
                           F.expr(f"unix_micros(cast({ts_col} as timestamp))"
                                  f" div {_WEEK_US}").alias("_wk")))
    first = weeks.groupBy(user_col).agg(F.min("_wk").alias("cohort_week"))
    return (weeks.join(first, user_col)
            .select(user_col, "cohort_week",
                    (F.col("_wk") - F.col("cohort_week"))
                    .alias("week_offset"))
            .distinct()
            .groupBy("cohort_week", "week_offset")
            .agg(F.count("*").alias("n_users")))


def sql_retention_cohorts(rel: str = "events", *, user_col: str = "user_id",
                          ts_col: str = "ts") -> str:
    """DuckDB oracle twin of :func:`retention_cohorts`."""
    return rf"""
WITH w AS (SELECT {user_col},
                  epoch_us({ts_col}) // {_WEEK_US} AS wk FROM {rel}),
f AS (SELECT {user_col}, MIN(wk) AS cohort_week FROM w GROUP BY {user_col}),
a AS (SELECT DISTINCT w.{user_col}, f.cohort_week,
             w.wk - f.cohort_week AS week_offset
      FROM w JOIN f USING ({user_col}))
SELECT cohort_week, week_offset, COUNT(*) AS n_users
FROM a GROUP BY cohort_week, week_offset
"""


def sql_session_stats(rel: str = "events", *, gap_minutes: int = 30,
                      user_col: str = "user_id", ts_col: str = "ts",
                      order_col: str = "event_id") -> str:
    """DuckDB oracle twin of :func:`session_stats`."""
    gap_us = gap_minutes * 60 * 1_000_000
    return rf"""
WITH e AS (
  SELECT {user_col}, epoch_us({ts_col}) AS us, {order_col} AS oid
  FROM {rel}),
b AS (
  SELECT {user_col}, us,
         CASE WHEN lag(us) OVER w IS NULL
                OR us - lag(us) OVER w > {gap_us} THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY {user_col} ORDER BY us, oid)),
s AS (
  SELECT {user_col}, us,
         CAST(SUM(brk) OVER (PARTITION BY {user_col} ORDER BY us
           ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx
  FROM b)
SELECT {user_col}, session_idx, COUNT(*) AS n_events,
       MIN(us) AS start_us, MAX(us) AS end_us,
       MAX(us) - MIN(us) AS duration_us
FROM s GROUP BY {user_col}, session_idx
"""


def sql_funnel(rel: str, steps: list[str], *, user_col: str = "user_id",
               ts_col: str = "ts", type_col: str = "event_type") -> str:
    """DuckDB oracle twin of :func:`funnel`."""
    parts = [rf"""
WITH base AS (SELECT {user_col}, {type_col} AS t, epoch_us({ts_col}) AS us
              FROM {rel}),
l0 AS (SELECT {user_col}, MIN(us) AS ts0 FROM base
       WHERE t = '{steps[0]}' GROUP BY {user_col})"""]
    for i, s in enumerate(steps[1:], start=1):
        parts.append(rf""",
l{i} AS (SELECT b.{user_col}, MIN(b.us) AS ts{i}
         FROM base b JOIN l{i - 1} p USING ({user_col})
         WHERE b.t = '{s}' AND b.us > p.ts{i - 1}
         GROUP BY b.{user_col})""")
    lvl = " + ".join(
        f"CASE WHEN l{i}.ts{i} IS NOT NULL THEN 1 ELSE 0 END"
        for i in range(1, len(steps)))
    joins = "".join(f" LEFT JOIN l{i} USING ({user_col})"
                    for i in range(1, len(steps)))
    completed = f"CAST(1 + {lvl} AS BIGINT)" if len(steps) > 1 \
        else "CAST(1 AS BIGINT)"
    parts.append(rf"""
SELECT {user_col}, {completed} AS steps_completed
FROM l0{joins}""")
    return "".join(parts)
