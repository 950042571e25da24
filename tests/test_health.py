"""Operational surface: health probe + corpus listing."""

from extractor.health import health_check, list_corpora


def test_health_check_healthy(spark):
    h = health_check(spark)
    assert h["status"] == "healthy", h
    assert all(h["dependencies"].values()), h
    assert set(h["dependencies"]) == {
        "jvm_session", "arrow", "kernel", "arrow_kernel_roundtrip",
    }


def test_list_corpora():
    got = list_corpora("/root/testdata/sf0.001")
    assert "documents" in got and "lineitem" in got and "events" in got
    assert list_corpora("/nonexistent/dir") == []
