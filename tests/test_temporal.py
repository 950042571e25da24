"""As-of and range joins (extractor/ops/temporal.py).

No reference analogue (the reference has no time-series surface); the
end-to-end semantics are oracle-checked against DuckDB's native ASOF and
inequality joins via the `asof_view_attribution` / `range_join_campaigns`
entries — these tests pin edge semantics and plan shapes.
"""
import datetime as dt

import pytest

from pyspark.sql import functions as F

from extractor.ops.temporal import asof_join, range_join


def _ts(minutes):
    return dt.datetime(2024, 1, 1, 0, minutes)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(10)), (2, 10, _ts(30)), (3, 20, _ts(5)), (4, 30, _ts(7))],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(100, 10, _ts(8), 1.5), (101, 10, _ts(30), 2.5), (102, 20, _ts(6), 3.5)],
        "event_id long, user_id long, ts timestamp_ntz, value double",
    )
    return left, right


def test_asof_backward_and_ties_and_no_match(spark, sides):
    left, right = sides
    out = asof_join(left, right, right_cols=("event_id", "value"))
    got = {r["event_id"]: r.asDict() for r in out.collect()}
    assert len(got) == 4
    # user 10 @10min -> view @8min
    assert got[1]["asof_event_id"] == 100 and got[1]["asof_value"] == 1.5
    assert got[1]["asof_lag_us"] == 2 * 60 * 1_000_000
    # exact-same-instant right row matches (<=, not <)
    assert got[2]["asof_event_id"] == 101 and got[2]["asof_lag_us"] == 0
    # user 20 @5min: the only view is @6min, later -> no match
    assert got[3]["asof_event_id"] is None and got[3]["asof_lag_us"] is None
    # user 30 has no right rows at all
    assert got[4]["asof_event_id"] is None


def test_asof_tolerance_nulls_stale_matches(spark, sides):
    left, right = sides
    out = asof_join(
        left, right, right_cols=("event_id",), tolerance_us=60 * 1_000_000
    )
    got = {r["event_id"]: r.asDict() for r in out.collect()}
    # 2-minute-old match exceeds the 1-minute tolerance
    assert got[1]["asof_event_id"] is None and got[1]["asof_lag_us"] is None
    # 0-lag match survives
    assert got[2]["asof_event_id"] == 101 and got[2]["asof_lag_us"] == 0


def test_asof_plan_single_shuffle_no_join(spark, sides):
    left, right = sides
    plan = (asof_join(left, right, right_cols=("value",))
            ._jdf.queryExecution().executedPlan().toString())
    # union + window: exactly one exchange (on the by key), no join node
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "Window" in plan


def test_range_join_matches_inclusive_bounds_and_overlaps(spark):
    points = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(10)), (3, _ts(20)), (4, _ts(59))],
        "pid long, ts timestamp_ntz",
    )
    ranges = spark.createDataFrame(
        [(10, _ts(0), _ts(10)), (11, _ts(10), _ts(25))],
        "rid long, start_ts timestamp_ntz, end_ts timestamp_ntz",
    )
    out = range_join(points, ranges, bin_us=7 * 60 * 1_000_000)
    got = sorted((r["pid"], r["rid"]) for r in out.collect())
    # p2 @10min sits on both ranges' boundary (inclusive both ends)
    assert got == [(1, 10), (2, 10), (2, 11), (3, 11)]


def test_range_join_plan_is_hash_join_not_nested_loop(spark):
    points = spark.createDataFrame([(1, _ts(0))], "pid long, ts timestamp_ntz")
    ranges = spark.createDataFrame(
        [(10, _ts(0), _ts(10))],
        "rid long, start_ts timestamp_ntz, end_ts timestamp_ntz",
    )
    plan = (range_join(points, ranges)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
