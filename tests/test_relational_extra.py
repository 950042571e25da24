"""Independent semantic checks for the CDC diff and Z-order operators
(the DuckDB oracle equality in test_entry_contract proves engine
agreement; these prove the *semantics* without re-deriving the formula)."""

from pyspark.sql import functions as F

from extractor.ops import relational

SF = "/root/testdata/sf0.001"


def test_zorder_key_deinterleaves_back(spark):
    """z_key must be the exact bit interleave: de-interleaving recovers
    both dimensions for every row."""
    rows = relational.zorder_key(spark, SF).collect()
    assert rows
    for r in rows:
        z = r["z_key"]
        x = y = 0
        for i in range(16):
            x |= ((z >> (2 * i)) & 1) << i
            y |= ((z >> (2 * i + 1)) & 1) << i
        assert x == r["x_dim"] and y == r["y_dim"], r


def test_zorder_sort_clusters_both_dims(spark):
    """On a full 64×64 grid, walking in z_key order must keep BOTH
    coordinates locally clustered: mean absolute neighbor distance far
    below the random-shuffle baseline (~range/3) in each dimension —
    the property that makes min/max file stats prune on either column."""
    from pyspark.sql import functions as F

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )
    rows = [
        (r["x"], r["y"], r["z"])
        for r in grid.select(
            "x", "y", relational.morton_key(F.col("x"), F.col("y"), 6).alias("z")
        ).collect()
    ]
    by_z = sorted(rows, key=lambda t: t[2])

    def mean_jump(seq, dim):
        return sum(
            abs(seq[i][dim] - seq[i - 1][dim]) for i in range(1, len(seq))
        ) / (len(seq) - 1)

    import hashlib

    shuffled = sorted(
        rows, key=lambda t: hashlib.md5(str(t[2]).encode()).hexdigest()
    )
    for dim in (0, 1):
        assert mean_jump(by_z, dim) < mean_jump(shuffled, dim) * 0.15, dim


def test_snapshot_diff_classes(spark):
    old_ids = {
        r["doc_id"]
        for r in relational._read(spark, SF, "documents")
        .select("doc_id")
        .collect()
    }
    diff = relational.snapshot_diff_cdc(spark, SF).collect()
    by_class = {}
    for r in diff:
        by_class.setdefault(r["change"], set()).add(r["doc_id"])
    assert by_class["delete"] == {d for d in old_ids if d % 97 == 0}
    assert by_class["insert"] == {
        d + 1000000 for d in old_ids if d % 113 == 0
    }
    # updates: rewritten rows that survived the delete and had non-null text
    assert all(
        d % 31 == 0 and d % 97 != 0 for d in by_class.get("update", set())
    )
    # the three classes are disjoint
    classes = list(by_class.values())
    assert sum(len(c) for c in classes) == len({x for c in classes for x in c})


def test_gdpr_cascade_consistency(spark):
    from extractor.ops.relational import gdpr_delete_cascade

    rows = {
        r["table_name"]: r
        for r in gdpr_delete_cascade(spark, "/root/testdata/sf0.001").collect()
    }
    assert set(rows) == {"documents", "chunks", "embeddings"}
    for r in rows.values():
        assert r["rows_after"] == r["rows_before"] - r["rows_deleted"]
        assert 0 < r["rows_deleted"] < r["rows_before"]
    # every embedding keys to a document, so the same ~25% sample applies
    docs, emb = rows["documents"], rows["embeddings"]
    assert emb["rows_deleted"] <= docs["rows_deleted"]
