"""Focused tests for extractor.fanout.fan_out_scan (round-6 optimization):
the guarded repartition must fire exactly when a scan is starved AND small,
and must never fire for layouts a production table would have."""

import os

import pytest
from pyspark.sql import functions as F

import extractor.fanout as fanout
from extractor.fanout import fan_out_scan, post_shuffle_filter


# uses the session-scoped ``spark`` fixture from conftest.py — defining a
# local fixture that stops the shared getOrCreate session would kill it
# for every later test module


@pytest.fixture(scope="module")
def single_file(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fo") / "one")
    spark.range(1000).coalesce(1).write.mode("overwrite").parquet(path)
    return path


def test_fires_on_starved_single_file(spark, single_file):
    df = spark.read.parquet(single_file)
    out = fan_out_scan(spark, df, df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # results unchanged
    assert out.count() == 1000


def test_cap_bounds_target(spark, single_file):
    df = spark.read.parquet(single_file)
    out = fan_out_scan(spark, df, df, cap=3)
    assert out.rdd.getNumPartitions() == 3


def test_skips_when_enough_files(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fo") / "many")
    n = spark.sparkContext.defaultParallelism
    spark.range(1000).repartition(n + 2).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    out = fan_out_scan(spark, df, df)
    assert out is df  # untouched: no repartition node added


def test_skips_when_bytes_exceed_cap(spark, single_file, monkeypatch):
    monkeypatch.setattr(fanout, "FAN_OUT_MAX_BYTES", 1)
    df = spark.read.parquet(single_file)
    out = fan_out_scan(spark, df, df)
    assert out is df


def test_keyed_fanout_reuses_window_exchange(spark, single_file):
    """key= must satisfy the downstream hash requirement: ONE Exchange in
    the plan (the fan-out), not round-robin + hash (guide 2.4)."""
    from pyspark.sql.window import Window

    df = spark.read.parquet(single_file)
    key = F.pmod(F.col("id"), F.lit(97))
    fanned = fan_out_scan(spark, df, df, key=key)
    w = Window.partitionBy(key).orderBy("id")
    out = fanned.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_exchanges = sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )
    assert n_exchanges == 1, plan
    assert out.count() == 97


def test_derived_frame_keeps_filters(spark, single_file):
    df = spark.read.parquet(single_file).where(F.col("id") % 2 == 0)
    out = fan_out_scan(spark, df, df)
    assert out.count() == 500


def test_post_shuffle_filter_stays_above_exchange(spark, single_file):
    """The anchored gate must NOT be pushed back below the fan-out
    exchange (the plain .where form is — that is the bug it fixes), and
    the kept rows must be identical to the plain form."""
    df = spark.read.parquet(single_file)
    fanned = fan_out_scan(spark, df, df)
    cond = F.col("id") % 3 == 0

    anchored = post_shuffle_filter(fanned, cond)
    plan = anchored._jdf.queryExecution().optimizedPlan().toString()
    top, _, below = plan.partition("Repartition")
    assert "Filter" in top, plan        # gate stayed post-exchange
    assert "Filter" not in below, plan  # nothing pushed into the scan

    pushed = fanned.where(cond)
    p2 = pushed._jdf.queryExecution().optimizedPlan().toString()
    assert "Filter" in p2.partition("Repartition")[2], p2  # control: pushed

    assert sorted(r.id for r in anchored.collect()) == sorted(
        r.id for r in pushed.collect()
    )
