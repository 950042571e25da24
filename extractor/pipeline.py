"""The extraction DataFrame pipeline (SURVEY.md §3 "Spark re-expression").

Replaces the reference's per-document loop + subprocess dataflow
(``app/core/document_converter.py:225-255`` calling
``process_single_document`` :37-184) with a declarative Spark plan:

    scan (pruned to needed columns)
      → [optional] explicit repartition on hash(conv_id) with skew salting
      → mapInPandas(extraction kernel)        # one fused Arrow stage
      → repartition(hash(conv_id)) + sortWithinPartitions(conv_id, turn_idx)
      → sink (parquet/Iceberg append) + lineage manifest

Scale rationale (100 TB / 1000 executors):

- The kernel is row-independent, so the *extraction* stage needs NO shuffle:
  parquet splits (``spark.sql.files.maxPartitionBytes``) already balance by
  bytes, which is the right unit for text work.  ``partition_mode="map_only"``
  (default) therefore goes scan→kernel directly — zero pre-shuffle at any
  scale.
- ``partition_mode="hash_conv"`` adds the explicit hash(conv_id) partitioning
  the north rule calls for when conversation-colocated processing is needed.
  Skew (Zipf conversation lengths) is handled by salting: turns of
  conversations longer than ``salt_threshold`` get ``pmod(xxhash64(turn_idx),
  salt_buckets)`` appended to the key, splitting a hot conversation across
  ``salt_buckets`` tasks.  Correct for a row-independent kernel; ordering is
  restored by the final cluster+sort stage.
- Output layout: one shuffle on conv_id then ``sortWithinPartitions(conv_id,
  turn_idx)`` — the "stable secondary sort on turn_idx" — so each output file
  holds whole conversations in turn order (what a downstream trainer reads).
- Per-partition lineage/metrics are computed distributedly (groupBy on the
  executor-reported partition id); nothing is collected to the driver except
  the tiny manifest itself.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, functions as F, types as T

from .kernel import DEFAULT_OPTIONS, MAX_TEXT_CHARS, ConvertOptions, convert_batch

SPAN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
        ]
    )
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("extracted_text", T.StringType()),
        T.StructField("spans", SPAN_TYPE),
        T.StructField("tables_count", T.IntegerType()),
        T.StructField("math_count", T.IntegerType()),
        T.StructField("images_count", T.IntegerType()),
        T.StructField("output_length", T.IntegerType()),
        T.StructField("error", T.StringType()),
        T.StructField(
            "images",  # S6 inventory: explode() to the image side table
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("src", T.StringType()),
                        T.StructField("alt", T.StringType()),
                        T.StructField("title", T.StringType()),
                        T.StructField("filename", T.StringType()),
                        T.StructField("in_table", T.BooleanType()),
                    ]
                )
            ),
        ),
        T.StructField("bytes_in", T.LongType()),
        T.StructField("part_id", T.IntegerType()),
        T.StructField("kernel_secs", T.DoubleType()),
    ]
)

_PASSTHROUGH = ("conv_id", "turn_idx", "role", "tool", "ts")


def _make_extract_iter(
    pass_cols: tuple, options: ConvertOptions = DEFAULT_OPTIONS
):
    """mapInPandas body factory: one ``convert_batch`` call per Arrow batch.

    *pass_cols* are copied from input to output untouched — this is how
    per-conversation attributes (e.g. ``source``) ride through the kernel
    with ZERO joins: at 10^12 turns a post-hoc "re-attach metadata" join is
    either a full shuffle or a non-broadcastable broadcast; a passthrough
    column is free.

    Emits executor-side observability columns: the physical partition id
    (lineage key) and per-row amortized kernel seconds (so
    ``sum(kernel_secs)`` over a partition = that partition's kernel time).
    """

    def _extract_iter(iterator):
        import pandas as pd
        from pyspark import TaskContext

        ctx = TaskContext.get()
        part_id = ctx.partitionId() if ctx is not None else -1
        for pdf in iterator:
            t0 = time.monotonic()
            result = convert_batch(pdf["text"], MAX_TEXT_CHARS, options)
            elapsed = time.monotonic() - t0
            out = pd.DataFrame({c: pdf[c].values for c in pass_cols})
            for c in result.columns:
                out[c] = result[c].values
            out["bytes_in"] = (
                pdf["text"].str.len().fillna(0).astype("int64")
            )
            out["part_id"] = part_id
            out["kernel_secs"] = elapsed / max(len(pdf), 1)
            yield out

    return _extract_iter


def salted_partition_key(
    df: DataFrame,
    salt_threshold: int,
    salt_buckets: int,
    hot_sample_fraction: float | None = None,
) -> DataFrame:
    """Add ``part_key``: xxhash64(conv_id) with per-turn salt for hot convs.

    The hot-key set comes from a cheap pre-pass count (map-side partial agg;
    at 10^12 turns this aggregates to ~n_convs rows) broadcast-joined back —
    replaces the reference's absent skew handling (SURVEY.md §4).

    *hot_sample_fraction*: at very large scale the exact pre-pass is a full
    extra input scan; a seeded sample (e.g. 0.01) finds the same heavy
    hitters at 1% of the scan cost — salting is a placement hint, so a
    missed borderline key costs balance, never correctness (the determinism
    test runs both modes).  The threshold is scaled by the fraction.
    """
    if hot_sample_fraction:
        source = df.sample(fraction=hot_sample_fraction, seed=42)
        threshold = max(int(salt_threshold * hot_sample_fraction), 1)
    else:
        source, threshold = df, salt_threshold
    counts = source.groupBy("conv_id").agg(F.count("*").alias("conv_turns"))
    hot = counts.filter(F.col("conv_turns") > threshold).select(
        "conv_id", F.lit(True).alias("is_hot")
    )
    return (
        df.join(F.broadcast(hot), "conv_id", "left")
        .withColumn(
            "salt",
            F.when(
                F.col("is_hot"),
                F.pmod(F.xxhash64("turn_idx"), F.lit(salt_buckets)),
            ).otherwise(F.lit(0)),
        )
        .withColumn("part_key", F.xxhash64("conv_id", "salt"))
        .drop("is_hot")
    )


def extract_transcripts(
    df: DataFrame,
    partition_mode: str = "map_only",
    num_partitions: int | None = None,
    salt_threshold: int = 500,
    salt_buckets: int = 8,
    sort_output: bool = True,
    hot_sample_fraction: float | None = None,
    extra_passthrough: tuple = (),
    options: ConvertOptions = DEFAULT_OPTIONS,
) -> DataFrame:
    """Run the extraction kernel over a transcripts DataFrame.

    partition_mode:
      - ``map_only``  — no pre-shuffle; kernel runs on scan partitions
                        (the right default: extraction is row-independent).
      - ``hash_conv`` — explicit repartition on salted hash(conv_id)
                        (conversation colocation; north-rule mode).

    *extra_passthrough*: additional input columns carried through the kernel
    unchanged (appended to the output schema with their input types).  This
    is the zero-join way to keep per-turn metadata (``source``, labels, …)
    attached to extraction output — never re-join the corpus to itself.
    """
    extra_fields = [df.schema[c] for c in extra_passthrough]
    cols = (
        [c for c in _PASSTHROUGH if c in df.columns]
        + list(extra_passthrough)
        + ["text"]
    )
    slim = df.select(*cols)  # column pruning reaches the scan
    for c in _PASSTHROUGH:
        if c not in df.columns:
            slim = slim.withColumn(
                c,
                F.lit(None).cast(
                    dict(zip(_PASSTHROUGH, ("string", "int", "string", "string", "timestamp")))[c]
                ),
            )

    if partition_mode == "hash_conv":
        n = num_partitions or df.sparkSession.sparkContext.defaultParallelism * 2
        slim = salted_partition_key(
            slim, salt_threshold, salt_buckets, hot_sample_fraction
        )
        slim = slim.repartition(n, "part_key").drop("salt", "part_key", "conv_turns")
    elif partition_mode != "map_only":
        raise ValueError(f"unknown partition_mode: {partition_mode}")

    pass_cols = _PASSTHROUGH + tuple(extra_passthrough)
    schema = T.StructType(
        list(OUTPUT_SCHEMA.fields[: len(_PASSTHROUGH)])
        + extra_fields
        + list(OUTPUT_SCHEMA.fields[len(_PASSTHROUGH) :])
    )
    out = slim.mapInPandas(_make_extract_iter(pass_cols, options), schema)

    if sort_output:
        n_out = num_partitions or df.sparkSession.sparkContext.defaultParallelism
        out = out.repartition(n_out, "conv_id").sortWithinPartitions(
            "conv_id", "turn_idx"
        )
    return out


def lineage_manifest(extracted: DataFrame) -> DataFrame:
    """Per-partition lineage + metrics rows (reference A1/O6 analogues):
    turns, bytes in/out, error/null counts, kernel seconds, throughput."""
    return (
        extracted.groupBy("part_id")
        .agg(
            F.count("*").alias("turns"),
            F.sum("bytes_in").alias("bytes_in"),
            F.sum(F.coalesce("output_length", F.lit(0))).alias("chars_out"),
            F.sum(F.col("extracted_text").isNull().cast("long")).alias("null_rows"),
            F.sum(F.col("error").isNotNull().cast("long")).alias("error_rows"),
            F.sum("tables_count").alias("tables"),
            F.sum("math_count").alias("maths"),
            F.sum("images_count").alias("images"),
            F.sum("kernel_secs").alias("kernel_secs"),
        )
        .withColumn(
            "turns_per_sec",
            F.when(F.col("kernel_secs") > 0, F.col("turns") / F.col("kernel_secs")),
        )
        .withColumn(
            "bytes_per_sec",
            F.when(F.col("kernel_secs") > 0, F.col("bytes_in") / F.col("kernel_secs")),
        )
        .withColumn(
            "null_extraction_rate", F.col("null_rows") / F.col("turns")
        )
    )


STITCH_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_turns", T.IntegerType()),
        T.StructField("n_errors", T.IntegerType()),
        T.StructField("conversation_markdown", T.StringType()),
    ]
)


def stitch_conversations(extracted: DataFrame) -> DataFrame:
    """Reassemble one markdown document per conversation from extracted
    turns — the downstream-trainer view.  ``applyInPandas`` over the
    conv_id group: each group arrives as one pandas frame, is sorted by
    turn_idx (stable order regardless of upstream salting), and rendered
    as ``[role] text`` sections.

    Scale: groups are conversations (bounded by the longest conversation,
    which the salt threshold caps upstream for the kernel stage; stitching
    itself must see the whole conversation, so this is the one operator
    that genuinely requires conv-colocation — exactly what hash(conv_id)
    partitioning provides, one shuffle)."""

    def stitch(pdf):
        import pandas as pd

        pdf = pdf.sort_values("turn_idx")
        parts = []
        for role, text in zip(pdf["role"], pdf["extracted_text"]):
            if text:
                parts.append(f"[{role or 'unknown'}]\n{text}")
        return pd.DataFrame(
            {
                "conv_id": [pdf["conv_id"].iloc[0]],
                "n_turns": [len(pdf)],
                "n_errors": [int(pdf["error"].notna().sum())],
                "conversation_markdown": ["\n\n".join(parts)],
            }
        )

    return extracted.groupBy("conv_id").applyInPandas(stitch, STITCH_SCHEMA)


def split_quarantine(extracted: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Route extraction output to (good, quarantine) — the F3/O4 sink split:
    quarantine rows carry the error (size cap, null input, contained kernel
    failure) for later triage; good rows are the trainer-facing table.
    Both sides share one upstream computation (no double kernel run)."""
    good = extracted.where(F.col("error").isNull())
    quarantined = extracted.where(F.col("error").isNotNull()).select(
        "conv_id", "turn_idx", "role", "ts", "bytes_in", "error"
    )
    return good, quarantined
