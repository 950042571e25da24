"""Unit tests for the exact-integer scoring operators: DSIR importance
weights, char-distribution entropy (ops/textops.py) and rolling z-score
outliers (ops/temporal.py) — hand-computed values on tiny inputs,
independent of the DuckDB oracle parity in test_entry_contract."""

import datetime as dt
import math

import pandas as pd
import pytest

from extractor.ops.temporal import zscore_outliers


@pytest.fixture()
def tiny_docs_sf(tmp_path):
    pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["alpha alpha beta", "alpha beta", "gamma gamma", "aaaa"],
            "lang": ["en", "en", "de", "de"],
            "source": ["s"] * 4,
            "n_chars": [16, 10, 11, 4],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def test_dsir_importance_directional(spark, tiny_docs_sf):
    from extractor.ops.textops import dsir_importance

    out = {r["doc_id"]: r for r in dsir_importance(spark, tiny_docs_sf).collect()}
    assert out[0]["n_toks"] == 3 and out[2]["n_toks"] == 2
    # per-token score: docs of target-only tokens (alpha/beta, en) must
    # outscore docs of raw-only tokens (gamma, de-only)
    per_tok_en = out[1]["dsir_micro"] / out[1]["n_toks"]
    per_tok_de = out[2]["dsir_micro"] / out[2]["n_toks"]
    assert per_tok_en > per_tok_de
    # determinism across runs
    again = {r["doc_id"]: r["dsir_micro"]
             for r in dsir_importance(spark, tiny_docs_sf).collect()}
    assert again == {k: v["dsir_micro"] for k, v in out.items()}


def test_doc_entropy_known_values(spark, tmp_path):
    pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["aaaa", "ab", "abcd"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [4, 2, 4],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    from extractor.ops.textops import doc_entropy

    out = {r["doc_id"]: r for r in doc_entropy(spark, str(tmp_path)).collect()}
    assert out[0]["entropy_micro"] == 0  # single symbol
    assert out[1]["entropy_micro"] == round(math.log(2) * 1_000_000)
    assert out[2]["entropy_micro"] == round(math.log(4) * 1_000_000)
    assert out[2]["n_chars"] == 4


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string"
    )


def test_zscore_outliers_flags_spike(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: 20 events alternating 10.0/12.0, then a 100.0 spike
    for i in range(20):
        rows.append((i, t0 + dt.timedelta(minutes=i), 1, "e",
                     10.0 if i % 2 == 0 else 12.0, "{}"))
    rows.append((20, t0 + dt.timedelta(minutes=20), 1, "e", 100.0, "{}"))
    # user 2: constant values -> zero variance, equal value: never flagged
    for i in range(25):
        rows.append((100 + i, t0 + dt.timedelta(minutes=i), 2, "e", 5.0, "{}"))
    out = zscore_outliers(_events(spark, rows)).collect()
    assert [(r["event_id"], r["user_id"]) for r in out] == [(20, 1)]
    spike = out[0]
    assert spike["value_milli"] == 100_000
    assert spike["win_sum"] == 10 * 10_000 + 10 * 12_000


def test_zscore_outliers_needs_full_window(spark):
    t0 = dt.datetime(2024, 1, 1)
    # only 10 prior events -> no row ever has a full 20-event baseline
    rows = [(i, t0 + dt.timedelta(minutes=i), 1, "e",
             10.0 if i < 10 else 1000.0, "{}") for i in range(11)]
    assert zscore_outliers(_events(spark, rows)).count() == 0


def test_pii_luhn_matches_reference_implementation(spark):
    from extractor.ops.textops import pii_luhn_audit

    def luhn_ok(card: str) -> bool:
        total = 0
        for i, ch in enumerate(reversed(card)):
            d = int(ch)
            if i % 2 == 1:  # every second digit from the right
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    rows = pii_luhn_audit(spark, "/root/testdata/sf0.001").collect()
    assert rows
    seen_valid = seen_invalid = 0
    for r in rows:
        card = f"{(r['doc_id'] * 48271 + 12345) % 10**16:016d}"
        assert r["card_masked"] == "************" + card[-4:]
        assert r["is_valid"] == int(luhn_ok(card))
        seen_valid += r["is_valid"]
        seen_invalid += 1 - r["is_valid"]
    assert seen_valid > 0 and seen_invalid > 0  # both classes exercised
