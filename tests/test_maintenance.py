"""Small-file compaction (Iceberg rewrite_data_files / OPTIMIZE analogue):
content preservation, crash-leftover cleanup, idempotence, size-derived
target count."""
import os

import pytest
from pyspark.sql import functions as F

from extractor.ops.maintenance import compact_files, _list_parquet_files


def _frag(spark, tmp_path, n_files=12, rows=5000):
    path = str(tmp_path / "tbl")
    spark.range(rows).select(
        "id", (F.col("id") * 3).alias("v"), F.md5(F.col("id").cast("string")).alias("s")
    ).repartition(n_files).write.parquet(path)
    return path


def test_compacts_and_preserves_content(spark, tmp_path):
    path = _frag(spark, tmp_path)
    before = sorted(
        tuple(r) for r in spark.read.parquet(path).collect()
    )
    stats = compact_files(spark, path, target_files=3)
    assert stats["files_before"] == 12
    assert stats["files_after"] == 3
    assert len(_list_parquet_files(path)) == 3
    after = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert after == before
    assert stats["content_match"] is True


def test_idempotent(spark, tmp_path):
    path = _frag(spark, tmp_path)
    compact_files(spark, path, target_files=3)
    stats2 = compact_files(spark, path, target_files=3)
    assert stats2["files_before"] == 3 and stats2["files_after"] == 3


def test_size_derived_target(spark, tmp_path):
    path = _frag(spark, tmp_path)
    total = sum(os.path.getsize(f) for f in _list_parquet_files(path))
    stats = compact_files(spark, path, target_file_bytes=total // 2 + 1)
    assert stats["files_after"] == 2


def test_stale_tmp_and_bak_cleaned(spark, tmp_path):
    path = _frag(spark, tmp_path)
    os.makedirs(f"{path}.compact-tmp/junk")
    os.makedirs(f"{path}.compact-bak/junk")
    stats = compact_files(spark, path, target_files=2)
    assert stats["files_after"] == 2
    assert not os.path.exists(f"{path}.compact-tmp")
    assert not os.path.exists(f"{path}.compact-bak")


def test_codec_change_during_rewrite(spark, tmp_path):
    """Rewrite-with-recompression: zstd output is smaller than an
    uncompressed source, content identical."""
    path = str(tmp_path / "tbl")
    spark.range(20000).select(
        "id", F.md5(F.col("id").cast("string")).alias("s")
    ).repartition(8).write.option("compression", "none").parquet(path)
    before_bytes = sum(os.path.getsize(f) for f in _list_parquet_files(path))
    stats = compact_files(spark, path, target_files=2, codec="zstd")
    assert stats["content_match"] and stats["files_after"] == 2
    assert stats["bytes_after"] < before_bytes


def test_crash_between_swap_renames_recovers(spark, tmp_path):
    """Death after table->bak but before tmp->table leaves no live table;
    the next compact_files call must restore the backup, not crash."""
    path = _frag(spark, tmp_path, n_files=6, rows=1000)
    before = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    os.rename(path, f"{path}.compact-bak")  # simulate the crash window
    stats = compact_files(spark, path, target_files=2)
    assert stats["files_before"] == 6 and stats["files_after"] == 2
    after = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert after == before
    assert not os.path.exists(f"{path}.compact-bak")
