"""Unit tests for incremental aggregate maintenance and the key-skew
profile (ops/maintenance.py) — hand-built inputs, hand-computed outputs."""

from extractor.ops.maintenance import key_skew_profile, merge_partial_aggs


def test_merge_partial_aggs_identity(spark):
    full = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3), ("b", 4), ("c", 5)],
        "k string, v long",
    )
    base = full.where("v <= 3")
    delta = full.where("v > 3")

    def partial(df):
        import pyspark.sql.functions as F

        return df.groupBy("k").agg(
            F.count("*").cast("long").alias("n"),
            F.sum("v").cast("long").alias("s"),
        )

    merged = {
        r["k"]: (r["n"], r["s"])
        for r in merge_partial_aggs(partial(base), partial(delta), ["k"]).collect()
    }
    recomputed = {r["k"]: (r["n"], r["s"]) for r in partial(full).collect()}
    assert merged == recomputed == {"a": (2, 3), "b": (2, 7), "c": (1, 5)}


def test_merge_partial_aggs_delta_only_key(spark):
    base = spark.createDataFrame([("a", 1, 10)], "k string, n long, s long")
    delta = spark.createDataFrame([("z", 2, 7)], "k string, n long, s long")
    out = {r["k"]: (r["n"], r["s"])
           for r in merge_partial_aggs(base, delta, ["k"]).collect()}
    assert out == {"a": (1, 10), "z": (2, 7)}


def test_key_skew_profile(spark):
    # 4 keys with counts 1, 2, 3, 10 -> ranked asc: [1, 2, 3, 10]
    rows = (
        [("k1", i) for i in range(1)]
        + [("k2", i) for i in range(2)]
        + [("k3", i) for i in range(3)]
        + [("hot", i) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "key string, x long")
    out = key_skew_profile(df, "key").collect()[0]
    assert out["n_keys"] == 4
    assert out["total_rows"] == 16
    assert out["max_n"] == 10
    # positions: ceil(.5*4)=2 -> 2; ceil(.9*4)=4 -> 10; ceil(.99*4)=4 -> 10
    assert out["p50_n"] == 2
    assert out["p90_n"] == 10
    assert out["p99_n"] == 10
    assert out["top_key"] == "hot" and out["top_n"] == 10


def test_table_profile(spark, tmp_path):
    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": pd.array(["b", None, "a"], dtype="string"),
            "lang": ["en", "en", "de"],
            "source": ["s", "s", "s"],
            "n_chars": [1, 0, 1],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    from extractor.ops.maintenance import table_profile

    out = {r["col_name"]: r for r in table_profile(spark, str(tmp_path)).collect()}
    assert set(out) == {"doc_id", "text", "lang", "source", "n_chars"}
    assert all(r["n_rows"] == 3 for r in out.values())
    assert out["text"]["n_nulls"] == 1
    assert out["text"]["n_distinct"] == 2  # nulls excluded from distinct
    assert out["text"]["min_val"] == "a" and out["text"]["max_val"] == "b"
    assert out["lang"]["n_distinct"] == 2
    assert out["source"]["n_distinct"] == 1
    assert out["doc_id"]["min_val"] == "0" and out["doc_id"]["max_val"] == "2"
