"""Partition-level checkpoint/resume + bounded retry rounds (operator O2/O3).

Re-expresses the reference's retry/resume template — rounds of re-running only
failed units with bounded retries (``app/watermark.py:226-315``; failed-set
semi-join :285-287) and the queryable task-status registry
(``app/api/routes.py:41,197-203``) — as Spark-native job orchestration:

- The unit of work is a **bucket**: ``pmod(xxhash64(conv_id), n_buckets)``.
  Buckets are stable across runs and cluster sizes, so a resume after a crash
  (or against the same input snapshot) skips exactly the committed work.
- The checkpoint table is an append-only parquet dir of completed
  ``(bucket, snapshot_id, status, turns, finished_at)`` rows.  Resume =
  **broadcast left-anti join** of input buckets against it (the reference's
  ``failed_paths`` set filter, distributed).
- Buckets are processed in **groups**, one Spark write job per group, because
  a Spark file-sink job commits atomically at job granularity: a mid-job
  failure commits nothing, so the group's buckets simply remain unclaimed and
  are retried next round (≤ ``max_retries`` rounds, mirroring
  ``add_watermarks_batch``'s loop).  Output uses dynamic partition overwrite
  on ``bucket=`` so a retried group cleanly replaces any torn output.

Scale: at 10^12 turns use e.g. n_buckets=4096, groups_per_round=32 — each
job still spans thousands of tasks, driver-side state is just the bucket set,
and the checkpoint table stays tiny (one row per completed bucket).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .pipeline import extract_transcripts

CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("snapshot_id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("turns", T.LongType()),
        T.StructField("finished_at", T.DoubleType()),
        T.StructField("error", T.StringType()),
    ]
)


def _completed_buckets(
    spark: SparkSession, ckpt_dir: str, snapshot_id: str
) -> DataFrame:
    try:
        ckpt = spark.read.schema(CHECKPOINT_SCHEMA).parquet(f"{ckpt_dir}/completed")
    except Exception:
        return spark.createDataFrame([], "bucket int")
    return (
        ckpt.where(
            (F.col("snapshot_id") == snapshot_id) & (F.col("status") == "completed")
        )
        .select("bucket")
        .distinct()
    )


def _record(
    spark: SparkSession,
    ckpt_dir: str,
    rows: list[tuple],
) -> None:
    spark.createDataFrame(rows, CHECKPOINT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(f"{ckpt_dir}/completed")


def with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
    )


def run_with_checkpoint(
    input_df: DataFrame,
    out_dir: str,
    ckpt_dir: str,
    snapshot_id: str = "snap-0",
    n_buckets: int = 64,
    groups_per_round: int = 8,
    max_retries: int = 3,
    partition_mode: str = "map_only",
    failure_hook=None,
) -> dict:
    """Run extraction resumably. Returns a summary dict (A4/A5 analogue).

    *failure_hook(bucket:int)*, if given, runs executor-side before the
    kernel — the deterministic fault-injection port of the reference's
    mock-based retry test (``test_retry_mechanism.py:99-119``).
    """
    spark = input_df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    df = with_bucket(input_df, n_buckets)
    completed = _completed_buckets(spark, ckpt_dir, snapshot_id)
    remaining_df = df.join(F.broadcast(completed), "bucket", "left_anti")
    remaining = sorted(
        r["bucket"] for r in remaining_df.select("bucket").distinct().collect()
    )
    already_done = completed.count()

    summary = {
        "snapshot_id": snapshot_id,
        "buckets_total": n_buckets,
        "buckets_already_completed": already_done,
        "rounds": [],
    }

    for attempt in range(1, max_retries + 1):
        if not remaining:
            break
        failed: list[int] = []
        errors: dict[int, str] = {}
        group_size = max(1, -(-len(remaining) // groups_per_round))
        groups = [
            remaining[i : i + group_size] for i in range(0, len(remaining), group_size)
        ]
        for group in groups:
            sub = df.where(F.col("bucket").isin(group))
            if failure_hook is not None:
                hook = failure_hook  # capture for closure serialization

                def _inject(iterator, _hook=hook):
                    for pdf in iterator:
                        for b in pdf["bucket"].unique():
                            _hook(int(b))
                        yield pdf

                sub = sub.mapInPandas(_inject, sub.schema)
            out = extract_transcripts(
                sub.drop("bucket"), partition_mode=partition_mode, sort_output=True
            )
            out = with_bucket(out, n_buckets)
            try:
                out.write.mode("overwrite").partitionBy("bucket").parquet(out_dir)
                turns = (
                    spark.read.parquet(out_dir)
                    .where(F.col("bucket").isin(group))
                    .count()
                )
                now = time.time()
                _record(
                    spark,
                    ckpt_dir,
                    [
                        (int(b), snapshot_id, "completed", int(turns), now, None)
                        for b in group
                    ],
                )
            except Exception as exc:
                msg = str(exc).splitlines()[0][:500]
                failed.extend(group)
                for b in group:
                    errors[b] = msg
        summary["rounds"].append(
            {
                "attempt": attempt,
                "processed": len(remaining) - len(failed),
                "failed": len(failed),
            }
        )
        remaining = failed

    if remaining:
        now = time.time()
        _record(
            spark,
            ckpt_dir,
            [
                (int(b), snapshot_id, "failed", 0, now, errors.get(b))
                for b in remaining
            ],
        )
    summary["buckets_failed"] = len(remaining)
    summary["status"] = "FAILED" if remaining else "COMPLETED"
    return summary
