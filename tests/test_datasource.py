"""Python Data Source connector: equality with the mapInPandas generator,
partition planning, and connector-level pruning."""

import pytest
from pyspark.sql import functions as F

from extractor.datasource import TranscriptsDataSource, TranscriptsReader
from extractor.transcripts import transcripts_df


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(TranscriptsDataSource)
    return spark


def _key(rows):
    return sorted((r["conv_id"], r["turn_idx"], r["text"]) for r in rows)


def test_format_read_equals_generator(registered):
    spark = registered
    via_ds = (
        spark.read.format("transcripts")
        .option("n_convs", 50)
        .option("mean_turns", 8)
        .option("seed", 7)
        .load()
    )
    via_map = transcripts_df(spark, n_convs=50, mean_turns=8, seed=7)
    assert _key(via_ds.collect()) == _key(via_map.collect())


def test_point_lookup_plans_one_conversation(registered):
    spark = registered
    df = (
        spark.read.format("transcripts")
        .option("n_convs", 200)
        .option("seed", 7)
        .load()
        .where(F.col("conv_id") == "conv_00000005")
    )
    rows = df.collect()
    assert rows and all(r["conv_id"] == "conv_00000005" for r in rows)


def test_prefix_filter_prunes(registered):
    spark = registered
    df = (
        spark.read.format("transcripts")
        .option("n_convs", 200)
        .option("seed", 7)
        .load()
        .where(F.col("conv_id").startswith("conv_0000001"))
    )
    convs = {r["conv_id"] for r in df.collect()}
    assert convs == {f"conv_{i:08d}" for i in range(10, 20)}


def test_stream_source_drains_corpus_exactly_once(registered, tmp_path):
    """readStream on the connector: micro-batches of batch_convs
    conversations drain the bounded corpus; output equals the batch
    generator; a restart from the same checkpoint adds nothing."""
    spark = registered
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def run():
        q = (
            spark.readStream.format("transcripts")
            .option("n_convs", 30)
            .option("mean_turns", 6)
            .option("seed", 9)
            .option("batch_convs", 7)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # availableNow commits the one prefetched micro-batch per run (the
    # simple reader prefetches driver-side); successive restarts from the
    # same checkpoint advance through the bounded corpus batch by batch
    truth = transcripts_df(spark, n_convs=30, mean_turns=6, seed=9)
    n_truth = truth.count()
    for _ in range(8):
        run()
        if spark.read.parquet(out).count() >= n_truth:
            break
    got = spark.read.parquet(out)
    assert _key(got.collect()) == _key(truth.collect())

    run()  # fully drained: one more restart adds nothing
    assert spark.read.parquet(out).count() == n_truth


def test_reader_pruning_unit():
    """Direct pushFilters contract: EqualTo narrows to one conversation;
    a disjoint prefix empties the plan; all filters are handed back."""
    from pyspark.sql.datasource import EqualTo, StringStartsWith

    r = TranscriptsReader({"n_convs": "100"})
    handed_back = list(
        r.pushFilters([EqualTo(("conv_id",), "conv_00000042")])
    )
    assert len(handed_back) == 1
    assert (r.lo, r.hi) == (42, 43)
    parts = r.partitions()
    assert len(parts) == 1 and parts[0].value == (42, 43)

    r2 = TranscriptsReader({"n_convs": "100"})
    list(r2.pushFilters([StringStartsWith(("conv_id",), "user_")]))
    assert r2.partitions()[0].value == (0, 0)
