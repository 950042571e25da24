"""Multimodal plumbing tests: binary columns through Arrow batches, stubbed
decode with error containment, metadata transforms."""

from pyspark.sql import functions as F

from extractor.ops import multimodal as mm


def test_synth_media_deterministic(spark):
    a = mm.synth_media_df(spark, n=50).collect()
    b = mm.synth_media_df(spark, n=50).collect()
    am = {r["media_id"]: bytes(r["payload"]) for r in a}
    bm = {r["media_id"]: bytes(r["payload"]) for r in b}
    assert am == bm
    row = a[0]
    assert row["meta"]["n_bytes"] == len(bytes(row["payload"]))


def test_extract_features_shapes_and_errors(spark):
    media = mm.synth_media_df(spark, n=40)
    feats = mm.extract_features(media).collect()
    assert len(feats) == 40
    ok = [r for r in feats if r["error"] is None]
    assert len(ok) == 40
    for r in ok[:5]:
        assert len(r["features"]) == mm.FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in r["features"])

    # a non-synthetic payload must yield an error ROW (NotImplementedError
    # contained), not a job failure
    bad = spark.createDataFrame(
        [(999, b"\x89PNG not really")], "media_id long, payload binary"
    )
    out = mm.extract_features(bad).collect()
    assert out[0]["error"] is not None
    assert "codec" in out[0]["error"]


def test_resize_meta(spark):
    media = mm.synth_media_df(spark, n=30)
    for r in mm.resize_meta(media, max_side=32).collect():
        assert max(r["target_width"], r["target_height"]) <= 32
        # aspect ratio preserved within rounding
        if r["width"] >= r["height"]:
            assert r["target_width"] >= r["target_height"] - 1
        else:
            assert r["target_height"] >= r["target_width"] - 1


def test_frame_stride_plan(spark):
    media = mm.synth_media_df(spark, n=60)
    plan = mm.frame_stride_plan(media, every_n=10)
    rows = plan.collect()
    assert rows, "expected some video rows"
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    for idxs in by_id.values():
        assert sorted(idxs) == idxs or sorted(idxs) == sorted(idxs)
        assert all(i % 10 == 0 for i in idxs)
