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
the same topology runs against a Kafka source (swap ``readStream.format``)
with watermarked event-time aggregations for the metrics stream.  No custom
stateful operator is needed because extraction is stateless per turn — the
one case where ``applyInPandasWithState`` would enter is cross-turn
conversation stitching, which downstream consumers do after the sorted batch
output instead.
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
