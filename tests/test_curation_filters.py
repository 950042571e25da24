"""Unit tests for the corpus-curation filters added in round 4's
extension sweep: C4 line/page cleaning, mojibake detection + repair,
and SFT loss-mask spans — hand-computed expectations on tiny inputs,
independent of the DuckDB oracle parity in test_entry_contract."""

import pandas as pd
import pytest

from extractor.ops import convops
from extractor.ops.textops import (
    _MOJIBAKE_MARKERS,
    _MOJIBAKE_REPAIRS,
    _MOJIBAKE_SUFFIX_A,
    _MOJIBAKE_SUFFIX_B,
    c4_page_filter,
    mojibake_stats,
)

LONG = " ".join(["word"] * 60)  # > 181 chars of clean prose


@pytest.fixture()
def docs_sf(tmp_path):
    # doc_ids chosen to hit each planted branch:
    #   7  -> %7==0  curly-brace page drop
    #   3  -> %11==3 lorem-ipsum page drop (and %3==0 short l5)
    #   1  -> %5==1  javascript line drop
    #   2  -> clean page, everything survives
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 7],
            "text": [LONG] * 4,
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [len(LONG)] * 4,
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def test_c4_page_rules(spark, docs_sf):
    out = {r["doc_id"]: r for r in c4_page_filter(spark, docs_sf).collect()}
    assert out[7]["drop_reason"] == "curly_brace"
    assert out[7]["kept_md5"] is None
    assert out[3]["drop_reason"] == "lorem_ipsum"
    # doc 2: l0/l3/l4/l5 survive (12-word chunks, terminal punct); the
    # subscribe line (no punct) and footer line (no punct) never do
    assert out[2]["drop_reason"] == "kept"
    assert out[2]["n_kept_lines"] == 4
    assert out[2]["kept_md5"] is not None
    # doc 1: javascript kills l3 but l0/l4/l5 still clear the page bar
    assert out[1]["drop_reason"] == "kept"
    assert out[1]["n_kept_lines"] == 3


def test_c4_word_counts_match_python(spark, docs_sf):
    row = {r["doc_id"]: r for r in c4_page_filter(spark, docs_sf).collect()}[2]
    # rebuild doc 2's kept lines in plain Python
    lines = [
        LONG[:60] + ".",
        LONG[60:120] + ".",
        LONG[120:180] + "!",
        LONG[180:240] + "?",
    ]
    assert row["kept_words"] == sum(len(ln.split(" ")) for ln in lines)


def test_mojibake_repair_roundtrip():
    # the planted suffixes are real UTF-8-as-Latin-1 damage: repairing
    # them must reproduce the clean originals
    repaired_a = _MOJIBAKE_SUFFIX_A
    repaired_b = _MOJIBAKE_SUFFIX_B
    for bad, good in _MOJIBAKE_REPAIRS:
        repaired_a = repaired_a.replace(bad, good)
        repaired_b = repaired_b.replace(bad, good)
    assert repaired_a == " café résumé naïve coördinate"
    assert repaired_b == " don’t use “smart” quotes §5"
    # damage model identity: clean -> encode utf-8 -> decode latin-1
    assert (
        " café résumé naïve coördinate".encode("utf-8").decode("latin-1")
        == _MOJIBAKE_SUFFIX_A
    )


def test_mojibake_stats_counts(spark, docs_sf):
    out = {r["doc_id"]: r for r in mojibake_stats(spark, docs_sf).collect()}
    # doc 2 (%4==2): suffix A — four 'Ã' markers, no 'â€'/'Â'
    assert out[2]["n_mojibake"] == sum(
        _MOJIBAKE_SUFFIX_A.count(m) for m in _MOJIBAKE_MARKERS
    )
    assert bool(out[2]["is_mojibake"])
    # doc 3 (%4==3): suffix B — three 'â€' + one 'Â'
    assert out[3]["n_mojibake"] == 4
    # doc 1 (%4==1): clean — zero markers, not flagged
    assert out[1]["n_mojibake"] == 0 and not out[1]["is_mojibake"]


def test_loss_mask_spans_offsets(spark):
    turns = spark.createDataFrame(
        [
            ("c1", 0, "user", "hello"),
            ("c1", 1, "assistant", "hi there"),
            ("c1", 2, "tool", "{}"),
            ("c1", 3, "assistant", "done"),
            ("c2", 0, "assistant", "solo"),
        ],
        ["conv_id", "turn_idx", "role", "text"],
    )
    rows = {
        (r["conv_id"], r["turn_idx"]): r
        for r in convops.loss_mask_spans(turns).collect()
    }
    # stitched c1 = "hello\n\nhi there\n\n{}\n\ndone"
    assert (rows[("c1", 0)]["span_start"], rows[("c1", 0)]["span_end"]) == (0, 5)
    assert (rows[("c1", 1)]["span_start"], rows[("c1", 1)]["span_end"]) == (7, 15)
    assert (rows[("c1", 2)]["span_start"], rows[("c1", 2)]["span_end"]) == (17, 19)
    assert (rows[("c1", 3)]["span_start"], rows[("c1", 3)]["span_end"]) == (21, 25)
    assert rows[("c2", 0)]["span_start"] == 0
    # mask: loss only on assistant turns
    assert not rows[("c1", 1)]["mask"] and not rows[("c1", 3)]["mask"]
    assert rows[("c1", 0)]["mask"] and rows[("c1", 2)]["mask"]
    # spans reconstruct the exact turn text from the stitched doc
    stitched = "hello\n\nhi there\n\n{}\n\ndone"
    for (cid, _), r in rows.items():
        if cid == "c1":
            src = {0: "hello", 1: "hi there", 2: "{}", 3: "done"}[r["turn_idx"]]
            assert stitched[r["span_start"]:r["span_end"]] == src


@pytest.fixture()
def prefix_heavy_emb_sf(tmp_path):
    # 30 vectors, 64 dims, all signal in the first 16 dims (the MRL
    # training ideal): truncated and full rankings must coincide.
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = np.zeros((30, 64), dtype=np.float32)
    vecs[:, :16] = rng.uniform(-1, 1, (30, 16)).astype(np.float32)
    pd.DataFrame(
        {
            "vec_id": np.arange(30, dtype=np.int64),
            "embedding": [v.tolist() for v in vecs],
            "label": np.zeros(30, dtype=np.int32),
        }
    ).to_parquet(tmp_path / "embeddings.parquet", index=False)
    return str(tmp_path)


def test_matryoshka_perfect_prefix_recall(spark, prefix_heavy_emb_sf):
    from extractor.ops.similarity import matryoshka_eval

    rows = matryoshka_eval(spark, prefix_heavy_emb_sf).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["recall_bp"] == 10000, r
        assert r["n_overlap"] == r["k"]


@pytest.fixture()
def packdocs_sf(tmp_path):
    # lengths chosen so shard 0 (all ids % 16 == 0) packs:
    # order by len desc: 1200(oversized solo) | 600+300 | 500
    texts = {0: "a" * 600, 16: "b" * 1200, 32: "c" * 300, 48: "d" * 500}
    pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [len(t) for t in texts.values()],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def test_bin_pack_nextfit_chain(spark, packdocs_sf):
    from extractor.ops.dedup import bin_pack_nextfit

    rows = {
        r["doc_id"]: r for r in bin_pack_nextfit(spark, packdocs_sf).collect()
    }
    assert all(r["shard"] == 0 for r in rows.values())
    # greedy order 1200, 600, 500, 300: 1200 alone (oversized), then
    # 600 opens bin 1, 500 doesn't fit (1100 > 1000) -> bin 2, 300
    # fits after 500 (800 <= 1000)
    assert (rows[16]["bin_local"], rows[16]["bin_fill_after"]) == (0, 1200)
    assert (rows[0]["bin_local"], rows[0]["bin_fill_after"]) == (1, 600)
    assert (rows[48]["bin_local"], rows[48]["bin_fill_after"]) == (2, 500)
    assert (rows[32]["bin_local"], rows[32]["bin_fill_after"]) == (2, 800)


def test_bin_pack_invariants_sf001(spark):
    from extractor.ops.dedup import BINPACK_CAP, bin_pack_nextfit

    df = bin_pack_nextfit(spark, "/root/testdata/sf0.01").toPandas()
    # every doc placed exactly once
    assert df["doc_id"].is_unique and len(df) == 500
    # within each (shard, bin): final fill <= cap unless the bin holds
    # a single oversized doc
    g = df.groupby(["shard", "bin_local"])
    for (_, _), grp in g:
        final = grp["bin_fill_after"].max()
        assert final <= BINPACK_CAP or len(grp) == 1
    # bins are contiguous from 0 within each shard
    for _, grp in df.groupby("shard"):
        b = sorted(grp["bin_local"].unique())
        assert b == list(range(len(b)))


def test_classifier_auc_matches_bruteforce(spark):
    import hashlib

    from extractor.ops.textops import classifier_auc, hashed_classifier_score

    sf = "/root/testdata/sf0.001"
    scores = {
        r["doc_id"]: r["score"]
        for r in hashed_classifier_score(spark, sf).collect()
    }
    y = {
        d: hashlib.md5(str(d).encode()).hexdigest()[1] < "8" for d in scores
    }
    pos = [scores[d] for d in scores if y[d]]
    neg = [scores[d] for d in scores if not y[d]]
    won = sum(1 for p in pos for q in neg if p > q)
    tie = sum(1 for p in pos for q in neg if p == q)
    row = classifier_auc(spark, sf).collect()[0]
    assert (row["n_pos"], row["n_neg"]) == (len(pos), len(neg))
    assert (row["pairs_won"], row["ties"]) == (won, tie)
    assert row["auc_micro"] == (2 * won + tie) * 10**6 // (
        2 * len(pos) * len(neg)
    )


def test_curation_report_funnel_consistency(spark):
    from extractor.ops.textops import curation_report

    df = curation_report(spark, "/root/testdata/sf0.01").toPandas()
    assert df["n_docs"].sum() == 500
    for _, r in df.iterrows():
        assert r["n_pass_all"] <= min(
            r["n_pass_c4"], r["n_pass_quality"], r["n_clean_encoding"]
        )
        for c in ("n_pass_c4", "n_pass_quality", "n_clean_encoding"):
            assert 0 <= r[c] <= r["n_docs"]


def test_calibration_ece_bins(spark):
    from extractor.ops.textops import calibration_ece

    rows = calibration_ece(spark, "/root/testdata/sf0.001").collect()
    assert rows
    assert all(0 <= r["bin"] <= 9 for r in rows)
    for r in rows:
        assert 0 <= r["acc_micro"] <= 1_000_000
        assert 0 <= r["conf_micro"] <= 1_000_000
        assert r["gap_micro"] == abs(r["acc_micro"] - r["conf_micro"])
        assert r["n"] > 0
    # mid-rank confidences must be monotone with the bin index
    by_bin = sorted((r["bin"], r["conf_micro"]) for r in rows)
    confs = [c for _, c in by_bin]
    assert confs == sorted(confs)
