"""Deployment-path smoke: the north rule's `spark-submit --py-files
extractor.zip` mode, exercised for real — the zip is rebuilt from source,
the job script runs under spark-submit in a separate process (NOT the
pytest session's SparkContext), and output + lineage land on disk.

Marked slow: one JVM cold start (~60-90 s).
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    # small deterministic input written by the session fixture's Spark
    from extractor.transcripts import transcripts_df

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    df = transcripts_df(spark, n_convs=12, mean_turns=5, seed=11)
    df.write.parquet(inp)
    n_turns = df.count()

    # rebuild the deployment zip from current sources
    subprocess.run(
        [os.path.join(REPO, "scripts", "make_zip.sh")],
        check=True, capture_output=True,
    )
    zip_path = os.path.join(REPO, "dist", "extractor.zip")
    assert os.path.exists(zip_path)

    from pyspark import find_spark_home

    spark_submit = os.path.join(
        find_spark_home._find_spark_home(), "bin", "spark-submit"
    )
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable)
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", zip_path,
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            os.path.join(REPO, "scripts", "run_extraction.py"),
            "--input", inp,
            "--output", out,
            "--checkpoint", ck,
            "--n-buckets", "8",
            "--groups", "2",
        ],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=str(tmp_path),  # NOT the repo root: only the zip provides code
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["status"] == "COMPLETED"

    got = spark.read.parquet(out)
    assert got.count() == n_turns
    lineage = spark.read.parquet(out + "_lineage")
    assert lineage.agg({"turns": "sum"}).collect()[0][0] == n_turns


@pytest.mark.slow
def test_spark_submit_curation_end_to_end(spark, tmp_path):
    """The curation twin under spark-submit: gates -> dedup keeper ->
    split -> chunk, output partitioned by split, summary JSON on stdout.
    Uses the driver-generated sf0.001 documents table as input."""
    import shutil

    inp = str(tmp_path / "documents.parquet")
    shutil.copy("/root/testdata/sf0.001/documents.parquet", inp)
    out = str(tmp_path / "curated")

    subprocess.run(
        [os.path.join(REPO, "scripts", "make_zip.sh")],
        check=True, capture_output=True,
    )
    zip_path = os.path.join(REPO, "dist", "extractor.zip")

    from pyspark import find_spark_home

    spark_submit = os.path.join(
        find_spark_home._find_spark_home(), "bin", "spark-submit"
    )
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable)
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", zip_path,
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            os.path.join(REPO, "scripts", "run_curation.py"),
            "--input", inp,
            "--output", out,
        ],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["status"] == "COMPLETED"
    assert summary["stages"] == ["gate", "dedup", "split", "chunk"]
    assert set(summary["per_split"]) <= {"train", "val", "test"}

    got = spark.read.parquet(out)
    assert got.count() == summary["rows"] > 0
    assert "chunk_text" in got.columns and "split" in got.columns
    # directory-level split partitioning (readers prune their split)
    assert any(d.startswith("split=") for d in os.listdir(out))
    # chunking respects the token budget
    from pyspark.sql import functions as F

    assert (
        got.agg(F.max(F.size(F.split("chunk_text", " ")))).collect()[0][0]
        <= 64
    )
