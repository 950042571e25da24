"""The plan linter must flag each designed-in red flag and stay silent
on the engine's own (gate-approved) plans."""

from pyspark.sql import functions as F

from extractor.plan_lint import assert_clean, lint_plan

SF = "/root/testdata/sf0.001"


def _rules(df):
    return {f["rule"] for f in lint_plan(df)}


def test_flags_cross_join(spark):
    # Spark plans a small cross join as BroadcastNestedLoopJoin(Cross)
    # and only degrades to CartesianProduct when nothing broadcasts —
    # the linter flags both shapes
    a = spark.range(10).select(F.col("id").alias("x"))
    b = spark.range(10).select(F.col("id").alias("y"))
    assert _rules(a.crossJoin(b)) & {
        "cartesian_product",
        "broadcast_nested_loop",
    }


def test_flags_broadcast_nested_loop(spark):
    a = spark.range(100).select(F.col("id").alias("x"))
    b = spark.range(100).select(F.col("id").alias("y"))
    j = a.join(F.broadcast(b), F.col("x") < F.col("y"))
    assert "broadcast_nested_loop" in _rules(j)


def test_flags_python_row_udf(spark):
    from pyspark.sql.functions import udf

    slow = udf(lambda s: (s or "") + "!")
    df = spark.read.parquet(f"{SF}/documents.parquet").select(
        slow("text").alias("t")
    )
    assert "python_row_udf" in _rules(df)


def test_flags_single_partition_window(spark):
    from pyspark.sql.window import Window

    df = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "rn", F.row_number().over(Window.orderBy("ts"))
    )
    assert "single_partition_exchange" in _rules(df)


def test_flags_multi_distinct_expand(spark):
    df = spark.read.parquet(f"{SF}/events.parquet").groupBy(
        "event_type"
    ).agg(
        F.countDistinct("user_id"), F.countDistinct("event_id")
    )
    assert "multi_distinct_expand" in _rules(df)


def test_clean_plans_stay_clean(spark):
    from extractor.ops import relational

    assert lint_plan(relational.q3_shipping_priority(spark, SF)) == []
    assert lint_plan(relational.s7_point_lookup(spark, SF)) == []
    assert_clean(relational.q1_pricing_summary(spark, SF))


def test_allowlist_and_assert(spark):
    import pytest

    a = spark.range(5)
    b = spark.range(5).select(F.col("id").alias("j"))
    bad = a.crossJoin(b)
    with pytest.raises(AssertionError, match="loop|cartesian"):
        assert_clean(bad)
    assert_clean(
        bad, allow=("cartesian_product", "broadcast_nested_loop")
    )
