"""SparkSession builder with the engine's scale-oriented defaults.

Local mode here is a stand-in for a multi-executor cluster; every knob is
chosen to survive a 1000-executor / 100 TB deployment:

- AQE on (runtime coalescing + skew-join splitting) — the safety net for the
  skewed conversation-length distribution.
- Arrow batch size 8192: measured sweet spot on this box (1024 costs 3-4x in
  per-batch overhead; 32k+ hurts memory locality).  For corpora with much
  longer texts (50 KB+ turns), lower it so batch bytes stay ~tens of MB —
  batch *bytes*, not rows, are what must stay bounded per core
  (SURVEY.md §4 "Arrow memory for long turns").
- shuffle partitions sized to cores in local mode; on a real cluster this is
  overridden per job (or left to AQE coalescing from a high initial value).
- driver memory high: local mode = driver-only; Arrow batches of text from
  32 concurrent tasks live on the JVM heap, and an undersized heap turns
  into GC thrash that *inverts* scaling (measured: 8g heap made local[32]
  2x slower than local[8]).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_BATCH_ROWS = 8192


def get_spark(
    master: str | None = None,
    app_name: str = "extraction-engine",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cpus if n in ("", "*") else int(n)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python Data Source connectors (extractor.datasource) implement
        # pushFilters; Spark requires this opt-in before it consults them
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "64g"))
    )
    # Cap JVM background threads (GC parallelism) when asked: at full core
    # saturation the default G1 thread pools oversubscribe the box and the
    # Python-heavy pipeline degrades superlinearly under external load.
    gc_opts = os.environ.get("SPARK_GC_OPTS")
    if gc_opts:
        builder = builder.config("spark.driver.extraJavaOptions", gc_opts)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
