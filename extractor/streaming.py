"""Structured Streaming extraction (incremental ingest).

The reference's closest analogue is the async-task pattern
(``app/api/routes.py:189-223``): work arrives, gets processed once, status is
queryable.  Batch + checkpoint (extractor.checkpoint) already covers the
snapshot-driven resumable requirement; this module adds the *continuous
ingest* variant for transcript streams:

    readStream(parquet dir, file source)
      → mapInPandas(extraction kernel)          # stateless → streaming-safe
      → writeStream(parquet sink, checkpointLocation, availableNow/continuous)

Exactly-once: the file-source + file-sink pair is end-to-end exactly-once
under Spark's streaming checkpoint (source offsets + sink commit log), so a
turn arriving in any micro-batch is extracted exactly once even across
restarts — the streaming twin of the bucket checkpoint table.

The kernel stage is identical to batch (same kernel iterator), so per-turn
output is byte-identical between batch and streaming paths (tested).

Scale: file-source streaming shards by arriving files; at 10^12-turn scale
the same topology runs against a Kafka source (swap ``readStream.format``).
Three operators:

- ``stream_extract``           — stateless kernel stream (exactly-once)
- ``stream_windowed_metrics``  — watermark + event-time windowed aggregation
                                 (late rows beyond the watermark dropped,
                                 windows finalize in append mode — the
                                 late-data-safe metrics rollup)
- ``stream_conversation_state``— custom stateful operator
                                 (``applyInPandasWithState``)
- ``stream_dedup``             — streaming exact dedup with BOUNDED state
                                 (``dropDuplicatesWithinWatermark``)
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from .pipeline import _PASSTHROUGH, OUTPUT_SCHEMA, _make_extract_iter
from .transcripts import TRANSCRIPT_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Start (and with available_now=True, drain) a streaming extraction.

    Returns the StreamingQuery; caller awaits termination.  Restarting with
    the same checkpoint_dir resumes from the last committed source offset.
    """
    reader = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("latestFirst", "false")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(input_dir)

    extracted = stream.mapInPandas(_make_extract_iter(_PASSTHROUGH), OUTPUT_SCHEMA)

    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_windowed_metrics(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> StreamingQuery:
    """Watermarked event-time windowed metrics over the transcript stream:
    per-(window, role) turn counts and input bytes.

    Late-data contract: rows arriving more than *watermark* behind the
    observed max event time are DROPPED; a window finalizes (and emits —
    append mode, file-sink safe) once the watermark passes its end.  State
    is bounded by (windows in flight × groups), not stream length — the
    100 TB posture for continuous metrics.  Restarts resume from the
    streaming checkpoint with the same watermark state."""
    from pyspark.sql import functions as F

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "role")
        .agg(
            F.count("*").alias("turns"),
            F.sum(F.length("text")).alias("bytes_in"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "role",
            "turns",
            "bytes_in",
        )
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
) -> StreamingQuery:
    """Streaming exact dedup on (conv_id, turn_idx): a re-delivered turn
    (at-least-once upstream, retried producer, replayed Kafka offset) is
    dropped if its duplicate was seen within the event-time watermark.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    watermark passes the key's event time, so state is bounded by
    (arrival rate × watermark delay) — NOT stream length.  A plain
    streaming ``dropDuplicates`` would grow state forever at 10^12-turn
    scale; this is the operator you actually deploy in front of the
    extraction kernel when the transport is at-least-once."""
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_dir)
    deduped = stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_conversation_state(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    per-conversation running progress — cumulative turn count and max
    turn_idx seen — maintained in Spark's streaming state store across
    micro-batches AND restarts (state lives under checkpoint_dir).

    This is the task-status registry of the reference
    (``app/api/routes.py:41,197-203`` — poll task progress while work
    streams in) as a distributed, fault-tolerant stateful stream.
    """
    from pyspark.sql import types as T

    output_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turns_seen", T.LongType()),
            T.StructField("max_turn_idx", T.IntegerType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("turns_seen", T.LongType()),
            T.StructField("max_turn_idx", T.IntegerType()),
        ]
    )

    def update(key, pdfs, state):
        import pandas as pd

        turns, max_idx = state.get if state.exists else (0, -1)
        for pdf in pdfs:
            turns += len(pdf)
            if len(pdf):
                max_idx = max(max_idx, int(pdf["turn_idx"].max()))
        state.update((turns, max_idx))
        yield pd.DataFrame(
            {
                "conv_id": [key[0]],
                "turns_seen": [turns],
                "max_turn_idx": [max_idx],
            }
        )

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_dir)
    )
    progress = stream.groupBy("conv_id").applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
    # Update-mode stateful output can't go straight to a file sink (append
    # only); foreachBatch appends each micro-batch's updated rows — the
    # standard pattern for state snapshots to files.
    def write_batch(batch_df, batch_id):
        batch_df.write.mode("append").parquet(output_dir)

    return (
        progress.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
