"""Two-phase-commit manifest sink: atomic visibility + orphan invisibility."""

import json
import os

import pytest
from pyspark.sql import functions as F

from extractor.manifest_sink import ManifestParquetDataSource, read_manifest


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(ManifestParquetDataSource)
    return spark


def test_write_commit_read_roundtrip(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "tbl")
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )
    df.repartition(4).write.format("manifest_parquet").option(
        "path", out
    ).mode("append").save()

    manifest = json.load(open(f"{out}/_manifest.json"))
    assert len(manifest["files"]) == 4
    assert sum(e["rows"] for e in manifest["files"]) == 1000

    got = read_manifest(spark, out)
    assert got.count() == 1000
    assert got.agg(F.sum("v")).collect()[0][0] == 2 * sum(range(1000))


def test_orphan_files_invisible(registered, tmp_path):
    """A data file written but never committed (torn job) must not surface
    through the manifest reader."""
    spark = registered
    out = str(tmp_path / "tbl")
    spark.range(10).write.format("manifest_parquet").option(
        "path", out
    ).mode("append").save()
    # simulate a torn second job: stage a file, never commit
    committed = read_manifest(spark, out).count()
    orphan = f"{out}/data/part-orphan.parquet"
    spark.range(500).toPandas().to_parquet(orphan)
    assert read_manifest(spark, out).count() == committed
    assert os.path.exists(orphan)  # file is there, table ignores it


def test_append_accumulates_snapshots(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "tbl")
    for _ in range(3):
        spark.range(100).write.format("manifest_parquet").option(
            "path", out
        ).mode("append").save()
    assert read_manifest(spark, out).count() == 300


def test_empty_partition_and_all_none_column_typed_correctly(
    registered, tmp_path
):
    """An empty task partition (and a partition whose column is all-None)
    must still write correctly-typed parquet part files, or the multi-file
    read fails on null-type schema merge."""
    spark = registered
    out = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, None), (2, None)], "id long, label string"
    ).repartition(8)  # 8 partitions, 2 rows -> >= 6 empty partitions
    df.write.format("manifest_parquet").option("path", out).mode(
        "append"
    ).save()
    got = read_manifest(spark, out)
    assert dict(got.dtypes) == {"id": "bigint", "label": "string"}
    assert got.count() == 2
    assert got.where(F.col("label").isNull()).count() == 2


def test_orphan_detection_and_removal(registered, tmp_path):
    from extractor.manifest_sink import (
        find_orphan_files,
        remove_orphan_files,
    )

    spark = registered
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    df.coalesce(1).write.format("manifest_parquet").option(
        "path", path
    ).mode("append").save()
    assert find_orphan_files(path) == []
    # strand two fake part files (aborted-job leftovers)
    import pathlib

    for name in ("part-deadbeef.parquet", "part-cafebabe.parquet"):
        pathlib.Path(path, "data", name).write_bytes(b"not really parquet")
    orphans = find_orphan_files(path)
    assert len(orphans) == 2 and all(o.startswith("data/part-") for o in orphans)
    # dry run deletes nothing
    rep = remove_orphan_files(path, dry_run=True)
    assert rep["orphans_found"] == 2 and rep["orphans_removed"] == 0
    assert len(find_orphan_files(path)) == 2
    # real run deletes only the orphans; committed data still reads
    rep = remove_orphan_files(path, dry_run=False)
    assert rep["orphans_removed"] == 2
    assert find_orphan_files(path) == []
    assert read_manifest(spark, path).count() == 2


def test_time_travel_read(spark, tmp_path):
    from extractor.manifest_sink import (
        ManifestParquetDataSource,
        read_manifest,
        snapshots,
    )

    spark.dataSource.register(ManifestParquetDataSource)
    out = str(tmp_path / "tt")
    for batch in ([(1, "a")], [(2, "b"), (3, "c")], [(4, "d")]):
        spark.createDataFrame(batch, "id long, v string").coalesce(
            1
        ).write.format("manifest_parquet").option("path", out).mode(
            "append"
        ).save()
    hist = snapshots(out)
    assert [h["snapshot"] for h in hist] == [1, 2, 3]
    assert [h["n_rows"] for h in hist] == [1, 2, 1]
    # VERSION AS OF semantics: each snapshot sees its prefix of commits
    assert read_manifest(spark, out, as_of=1).count() == 1
    got2 = sorted(
        r["id"] for r in read_manifest(spark, out, as_of=2).collect()
    )
    assert got2 == [1, 2, 3]
    assert read_manifest(spark, out).count() == 4
    # overwrite starts a fresh history
    spark.createDataFrame([(9, "z")], "id long, v string").write.format(
        "manifest_parquet"
    ).option("path", out).mode("overwrite").save()
    assert [h["snapshot"] for h in snapshots(out)] == [1]
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_manifest(spark, out, as_of=0)


def test_write_audit_publish_branch(spark, tmp_path):
    import pytest as _pytest

    from extractor.manifest_sink import (
        ManifestParquetDataSource,
        drop_branch,
        find_orphan_files,
        publish_branch,
        read_manifest,
        remove_orphan_files,
        snapshots,
    )

    spark.dataSource.register(ManifestParquetDataSource)
    out = str(tmp_path / "wap")

    def write(rows, **opts):
        w = spark.createDataFrame(rows, "id long, v string").coalesce(
            1
        ).write.format("manifest_parquet").option("path", out)
        for k, v in opts.items():
            w = w.option(k, v)
        w.mode("append").save()

    write([(1, "a")])
    write([(2, "b"), (3, "c")], branch="audit")
    # staged data invisible to main readers, visible on its branch
    assert read_manifest(spark, out).count() == 1
    assert read_manifest(spark, out, branch="audit").count() == 2
    assert [s["snapshot"] for s in snapshots(out)] == [1]
    assert [s["snapshot"] for s in snapshots(out, "audit")] == [1]

    # publish: atomically one new main snapshot, branch emptied
    res = publish_branch(out, "audit")
    assert (res["published_rows"], res["main_snapshot"]) == (2, 2)
    assert sorted(r["id"] for r in read_manifest(spark, out).collect()) == [
        1,
        2,
        3,
    ]
    assert read_manifest(spark, out, as_of=1).count() == 1  # history intact
    with _pytest.raises(FileNotFoundError):
        read_manifest(spark, out, branch="audit")
    with _pytest.raises(ValueError):
        publish_branch(out, "audit")  # nothing staged anymore

    # reject: dropped branch files become collectable orphans
    write([(9, "z")], branch="bad")
    assert drop_branch(out, "bad")["dropped_rows"] == 1
    assert read_manifest(spark, out).count() == 3
    orphans = find_orphan_files(out)
    assert len(orphans) == 1
    removed = remove_orphan_files(out, dry_run=False)
    assert removed["orphans_removed"] == 1
    assert find_orphan_files(out) == []
