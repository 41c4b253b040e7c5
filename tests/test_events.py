"""Fixture tests for the batch event-analytics operators (funnel,
retention cohorts) — the synthetic events table converts every user, so
the ordering/cohort semantics are pinned here on hand-built fixtures."""

from __future__ import annotations

from datetime import datetime

from iconic_data_science_spark.operators.events import funnel, retention_cohorts


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, datetime(2024, 1, d, h, 0, 0), u, t, 0.0, "{}") for i, (d, h, u, t) in enumerate(rows)],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )


def test_funnel_requires_stage_order(spark):
    ev = _ev(spark, [
        # user 1: view(d1) -> click(d2) -> purchase(d3): full funnel
        (1, 0, 1, "view"), (2, 0, 1, "click"), (3, 0, 1, "purchase"),
        # user 2: click BEFORE any view, purchase after: counts only as view
        (1, 0, 2, "click"), (2, 0, 2, "view"), (3, 0, 2, "purchase"),
        # user 3: view only
        (1, 0, 3, "view"),
        # user 4: never views; click+purchase must not count anywhere
        (1, 0, 4, "click"), (2, 0, 4, "purchase"),
    ])
    out = {r.stage: r.n_users for r in funnel(ev).collect()}
    # user 2's purchase: no click after their view -> not purchase-stage.
    assert out == {"view": 3, "click": 1, "purchase": 1}


def test_funnel_same_timestamp_not_progress(spark):
    # strict > : a click at exactly the view instant is not funnel progress
    ev = _ev(spark, [(1, 0, 1, "view"), (1, 0, 1, "click")])
    out = {r.stage: r.n_users for r in funnel(ev).collect()}
    assert out == {"view": 1, "click": 0, "purchase": 0}


def test_retention_cohorts_fixture(spark):
    ev = _ev(spark, [
        # user 1 signs up day 1 (week 0), active weeks 0 and 2
        (1, 0, 1, "signup"), (2, 0, 1, "click"), (16, 0, 1, "view"),
        # user 2 signs up day 8 (week 1), active week 1 only
        (8, 0, 2, "signup"),
        # user 3: no signup -> in no cohort
        (3, 0, 3, "view"),
    ])
    got = {(r.cohort_week, r.week_offset): r.n_users for r in retention_cohorts(ev).collect()}
    assert got == {(0, 0): 1, (0, 2): 1, (1, 0): 1}


def test_retention_pre_signup_activity_excluded(spark):
    # activity in a week BEFORE the signup week is not retention
    ev = _ev(spark, [(1, 0, 1, "view"), (15, 0, 1, "signup"), (16, 0, 1, "click")])
    got = {(r.cohort_week, r.week_offset): r.n_users for r in retention_cohorts(ev).collect()}
    assert got == {(2, 0): 1}


def test_funnel_and_retention_empty_input(spark):
    ev = _ev(spark, [])
    assert funnel(ev).count() == 3  # one zero row per stage
    assert all(r.n_users == 0 for r in funnel(ev).collect())
    assert retention_cohorts(ev).count() == 0


def test_last_touch_attribution_fixture(spark):
    from datetime import datetime

    from iconic_data_science_spark.operators.events import last_touch_attribution

    def ev(eid, user, minute, etype, value=0.0):
        return (eid, datetime(2024, 1, 1, 10, minute), user, etype, value, "{}")

    rows = [
        # user 1: view@10:00, click@10:05 (two clicks same ts: ids 3 > 2),
        # purchase@10:30 -> attributed to click id 3 (last touch, max id tie)
        ev(1, 1, 0, "view"),
        ev(2, 1, 5, "click"),
        ev(3, 1, 5, "click"),
        ev(10, 1, 30, "purchase", 9.5),
        # user 2: touch 2h before purchase -> outside 1h lookback -> null
        ev(4, 2, 0, "view"),
        ev(11, 2, 0, "purchase", 1.0),  # same-ts touch counts (<=)
        # user 3: purchase with no touches at all -> null
        ev(12, 3, 15, "purchase", 2.0),
    ]
    # shift user 2's purchase to 12:05 for the outside-lookback case
    rows[5] = (11, datetime(2024, 1, 1, 12, 5), 2, "purchase", 1.0, "{}")
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = {r["event_id"]: r for r in last_touch_attribution(events).collect()}
    assert out[10]["attributed_id"] == 3 and out[10]["attributed_type"] == "click"
    assert out[11]["attributed_id"] is None  # most recent touch outside lookback
    assert out[12]["attributed_id"] is None  # no touches at all
    assert out[10]["amount"] == 9.5


def test_last_touch_attribution_same_ts_touch_counts(spark):
    from datetime import datetime

    from iconic_data_science_spark.operators.events import last_touch_attribution

    rows = [
        (1, datetime(2024, 1, 1, 10, 0), 7, "click", 0.0, "{}"),
        (2, datetime(2024, 1, 1, 10, 0), 7, "purchase", 5.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = last_touch_attribution(events).collect()
    assert out[0]["attributed_id"] == 1  # ts-equal touch matches (<= semantics)
