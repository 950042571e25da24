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


def test_hashed_classifier_map_only_and_consistent(spark, tiny_docs_sf):
    from extractor.ops.textops import hashed_classifier_score

    df = hashed_classifier_score(spark, tiny_docs_sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # zero-shuffle inference
    rows = {r["doc_id"]: r for r in df.collect()}
    # "alpha alpha beta": 3 unigrams + 2 bigrams
    assert rows[0]["n_feats"] == 5
    # single-token doc: 1 unigram, no bigram
    assert rows[3]["n_feats"] == 1
    for r in rows.values():
        assert r["label"] == (1 if r["score"] > 0 else 0)
    # identical text -> identical hashed features -> identical score
    again = {r["doc_id"]: r["score"]
             for r in hashed_classifier_score(spark, tiny_docs_sf).collect()}
    assert again == {k: v["score"] for k, v in rows.items()}


def test_paragraph_dup_profile_counts_planted_dups(spark, tmp_path):
    import pandas as pd
    from extractor.ops.textops import paragraph_dup_profile

    # find doc_ids in each planted-duplicate bucket (md5('pdup:'||id) % 3)
    import hashlib

    def bucket(i):
        return int(hashlib.md5(f"pdup:{i}".encode()).hexdigest()[:8], 16) % 3

    ids = {bucket(i): i for i in range(30)}
    text = "x" * 100  # 3 windows of 40/40/20 chars, all-'x' so w1 == w2
    pd.DataFrame(
        {
            "doc_id": [ids[0], ids[1], ids[2]],
            "text": [text] * 3,
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [100] * 3,
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    rows = {r["doc_id"]: r
            for r in paragraph_dup_profile(spark, str(tmp_path)).collect()}
    # bucket 0: base (w,w,tail) + [w] -> w appears 3x -> 3 dup paras of 4
    r0 = rows[ids[0]]
    assert (r0["n_paras"], r0["n_dup_paras"]) == (4, 3)
    assert r0["dup_para_bp"] == 7500
    # bucket 1: base + [w, w] -> all four 40-char windows identical
    r1 = rows[ids[1]]
    assert (r1["n_paras"], r1["n_dup_paras"]) == (5, 4)
    # bucket 2: unmodified; the two 40-char windows are identical dups
    r2 = rows[ids[2]]
    assert (r2["n_paras"], r2["n_dup_paras"]) == (3, 2)
    # char fractions consistent: dup chars never exceed total
    for r in rows.values():
        assert 0 <= r["dup_char_bp"] <= 10000


def test_cms_topk_never_underestimates(spark):
    from extractor.ops.textops import cms_topk, CMS_D, CMS_W

    sf = "/root/testdata/sf0.001"
    rows = cms_topk(spark, sf).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["overcount"] >= 0  # CMS is upward-biased by construction
        assert r["est"] == r["exact_n"] + r["overcount"]
    # the sketch the estimates came from is genuinely bounded
    from extractor.ops.textops import _docs, _tok_arr
    from pyspark.sql import functions as F

    vocab = (
        _docs(spark, sf).where(F.col("text").isNotNull())
        .select(F.explode(_tok_arr()).alias("tok")).distinct().count()
    )
    assert vocab > 0 and CMS_D * CMS_W == 512


def test_kn_continuation_properties(spark, tiny_docs_sf):
    from extractor.ops.textops import kn_continuation

    rows = kn_continuation(spark, tiny_docs_sf).collect()
    # corpus bigrams: (alpha,alpha) (alpha,beta) x2, (gamma,gamma);
    # distinct pair types = 3
    by_w = {r["w"]: r for r in rows}
    assert by_w["beta"]["cont_types"] == 1  # only 'alpha' precedes beta
    assert by_w["beta"]["total_count"] == 2
    assert by_w["alpha"]["cont_types"] == 1  # 'alpha alpha' only
    assert by_w["gamma"]["cont_types"] == 1
    for r in rows:
        assert r["cont_types"] <= r["total_count"]
        assert r["p_cont_ppm"] == r["cont_types"] * 1_000_000 // 3


def test_ccnet_buckets_are_ordered_thirds(spark):
    from collections import Counter, defaultdict

    from extractor.ops.textops import ccnet_perplexity_buckets

    rows = ccnet_perplexity_buckets(spark, "/root/testdata/sf0.001").collect()
    per_lang = defaultdict(list)
    for r in rows:
        per_lang[r["lang"]].append(r)
    order = {"head": 0, "middle": 1, "tail": 2}
    for lang, rs in per_lang.items():
        n = len(rs)
        c = Counter(r["ppl_bucket"] for r in rs)
        # exact integer cut-points: head = floor(n/3), head+middle = floor(2n/3)
        assert c["head"] == n // 3
        assert c["head"] + c["middle"] == 2 * n // 3
        # scores are monotone across buckets
        rs.sort(key=lambda r: (r["lm_score"], r["doc_id"]))
        labels = [order[r["ppl_bucket"]] for r in rs]
        assert labels == sorted(labels)


def test_flesch_readability_hand_values(spark, tmp_path):
    import pandas as pd

    from extractor.ops.textops import flesch_readability

    rows = [
        # 14 words of one syllable each -> 2 sentences, W=14, Y=14
        {"doc_id": 0, "text": " ".join(["cat"] * 14)},
        # 3 words, no sentence boundary -> S=1; "rhythm"-like vowel-less
        {"doc_id": 1, "text": "zz shh psst"},
    ]
    pd.DataFrame(
        [{**r, "lang": "en", "source": "s", "n_chars": len(r["text"])}
         for r in rows]
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    out = {r["doc_id"]: r for r in flesch_readability(spark, str(tmp_path)).collect()}
    r0 = out[0]
    assert (r0["n_words"], r0["n_sentences"], r0["n_syllables"]) == (14, 2, 14)
    assert r0["flesch_milli"] == 206835 - (1015 * 14) // 2 - (84600 * 14) // 14
    r1 = out[1]
    # vowel-less words count one syllable each
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (3, 1, 3)
