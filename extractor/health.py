"""Service-surface analogues of the reference's operational endpoints:

- ``health_check``  ↔ GET /health (app/api/routes.py:44-63): dependency
  probe + status rollup.  The reference shells out to check pandoc
  (document_converter ``check_dependencies``); this engine's dependencies
  are the JVM session, Arrow transfer, and the extraction kernel, so the
  probe exercises exactly those: a 1-row Arrow round-trip through the
  fused kernel.
- ``list_corpora``  ↔ GET /documents (routes.py:75-84): enumerate the
  queryable inputs (parquet tables under a data dir), the catalog-listing
  analogue.

Both are driver-cheap by design (the health probe is one task over one
row) — they exist to be called from orchestration/liveness hooks, not the
data path.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import SparkSession

ENGINE_VERSION = "0.3.0"


def health_check(spark: SparkSession) -> dict:
    """Probe every dependency the extraction path needs and roll up a
    status — ``healthy`` iff all probes pass (routes.py:51 semantics)."""
    deps: dict[str, bool] = {}
    try:
        deps["jvm_session"] = spark.sql("SELECT 1").collect()[0][0] == 1
    except Exception:
        deps["jvm_session"] = False
    try:
        import pyarrow  # noqa: F401

        deps["arrow"] = True
    except Exception:
        deps["arrow"] = False
    try:
        from extractor.kernel import convert_text

        out = convert_text("<p>health <strong>probe</strong></p>")
        deps["kernel"] = "health" in (out.extracted_text or "")
    except Exception:
        deps["kernel"] = False
    try:
        from extractor.pipeline import extract_transcripts

        df = spark.createDataFrame(
            [("hc", 0, "user", "<p>arrow probe</p>", None,
              dt.datetime(2024, 1, 1))],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp",
        )
        row = extract_transcripts(df, sort_output=False).select(
            "extracted_text"
        ).collect()[0]
        deps["arrow_kernel_roundtrip"] = "arrow probe" in (
            row["extracted_text"] or ""
        )
    except Exception:
        deps["arrow_kernel_roundtrip"] = False
    return {
        "status": "healthy" if all(deps.values()) else "unhealthy",
        "version": ENGINE_VERSION,
        "timestamp": dt.datetime.now(dt.timezone.utc).isoformat(),
        "dependencies": deps,
    }


def list_corpora(data_dir: str) -> list[str]:
    """Enumerate queryable parquet tables under *data_dir* — the corpus
    listing endpoint (a real deployment asks the Iceberg catalog; the
    filesystem form mirrors the reference's directory listing)."""
    try:
        return sorted(
            f[: -len(".parquet")]
            for f in os.listdir(data_dir)
            if f.endswith(".parquet")
        )
    except FileNotFoundError:
        return []
