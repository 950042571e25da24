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

The kernel stage is identical to batch (same ``_extract_iter``), so per-turn
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

from .pipeline import OUTPUT_SCHEMA, _extract_iter
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

    extracted = stream.mapInPandas(_extract_iter, OUTPUT_SCHEMA)

    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
