"""ops/events.py: sessionization boundaries and funnel ordering."""

from __future__ import annotations

import datetime as dt

import pytest

from csvw_rdf_convertor_spark.ops.events import funnel, session_stats, sessionize

T0 = dt.datetime(2024, 3, 1, 9, 0, 0)
SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(minutes=m), u, t)
         for i, (m, u, t) in enumerate(rows)], SCHEMA)


def test_sessionize_gap_boundary(spark):
    ev = _ev(spark, [
        (0, 1, "view"), (10, 1, "click"), (41, 1, "view"),   # 31min gap at 10→41
        (42, 1, "click"),
        (0, 2, "view"),                                       # other user
    ])
    got = {(r.user_id, r.event_id): r.session_idx
           for r in sessionize(ev, gap_minutes=30).collect()}
    assert got[(1, 0)] == 0 and got[(1, 1)] == 0
    assert got[(1, 2)] == 1 and got[(1, 3)] == 1
    assert got[(2, 4)] == 0
    # exactly-at-gap is SAME session (strict >)
    ev2 = _ev(spark, [(0, 9, "view"), (30, 9, "view")])
    assert {r.session_idx
            for r in sessionize(ev2, gap_minutes=30).collect()} == {0}


def test_session_stats_rollup(spark):
    ev = _ev(spark, [(0, 1, "a"), (5, 1, "b"), (100, 1, "c")])
    got = {r.session_idx: (r.n_events, r.duration_us)
           for r in session_stats(ev, gap_minutes=30).collect()}
    assert got[0] == (2, 5 * 60 * 1_000_000)
    assert got[1] == (1, 0)


def test_funnel_strict_ordering(spark):
    ev = _ev(spark, [
        # user 1: full funnel in order
        (0, 1, "view"), (1, 1, "click"), (2, 1, "purchase"),
        # user 2: purchase BEFORE click → only 2 steps
        (0, 2, "view"), (1, 2, "purchase"), (2, 2, "click"),
        # user 3: starts at click → never enters (no view)
        (0, 3, "click"), (1, 3, "purchase"),
        # user 4: view only
        (0, 4, "view"),
    ])
    got = {r.user_id: r.steps_completed
           for r in funnel(ev, ["view", "click", "purchase"]).collect()}
    assert got == {1: 3, 2: 2, 4: 1}


def test_retention_cohorts_triangle(spark):
    from csvw_rdf_convertor_spark.ops.events import retention_cohorts
    wk = dt.timedelta(days=7)
    rows = [
        # user 1: weeks 0, 1, 1 (dedup), 3
        (0, T0, 1), (1, T0 + wk, 1), (2, T0 + wk + dt.timedelta(hours=1), 1),
        (3, T0 + 3 * wk, 1),
        # user 2: first seen week 1, active week 1 only
        (4, T0 + wk + dt.timedelta(days=1), 2),
    ]
    ev = spark.createDataFrame(
        [(i, t, u, "view") for (i, t, u) in rows], SCHEMA)
    got = {(r.cohort_week, r.week_offset): r.n_users
           for r in retention_cohorts(ev).collect()}
    c1 = min(k[0] for k in got)  # user 1's cohort week
    assert got[(c1, 0)] == 1 and got[(c1, 1)] >= 1 and got[(c1, 3)] == 1
    # user 2's cohort has exactly one (offset 0) cell
    c2 = [k[0] for k in got if k[0] != c1]
    assert all(k[1] == 0 for k in got if k[0] in c2)


def test_funnel_rejects_empty(spark):
    with pytest.raises(ValueError):
        funnel(_ev(spark, [(0, 1, "view")]), [])
