"""Unit tests for the conversation-curation operators (ops/convops.py),
the BFS hop-distance graph op (ops/links.py) and the BPE pair-count
kernel (ops/textops.py) — hand-built inputs with hand-computed outputs,
independent of the DuckDB oracle parity checks in test_entry_contract."""

import pandas as pd
import pytest

from extractor.ops.convops import (
    role_sequence_stats,
    strip_repeated_prefix,
    truncate_to_token_budget,
)
from extractor.ops.links import bfs_hop_distance


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, conv_id long, turn_idx long, role string, text string"
    )


def test_strip_repeated_prefix_basic(spark):
    df = _turns(
        spark,
        [
            (0, 1, 0, "user", "CONTEXT: alpha beta. question one"),
            (1, 1, 1, "assistant", "CONTEXT: alpha beta. answer one"),
            (2, 1, 2, "user", "totally different"),
            (3, 2, 0, "user", "solo turn"),
        ],
    )
    out = {
        r["turn_idx"]: r
        for r in strip_repeated_prefix(df).where("conv_id = 1").collect()
    }
    assert out[0]["lcp"] == 0  # first turn has no previous
    # "CONTEXT: alpha beta. " is 21 chars; next char differs (q vs a)
    assert out[1]["lcp"] == 21
    assert out[1]["head"] == "answer one"
    assert out[1]["kept_chars"] == len("answer one")
    assert out[2]["lcp"] == 0
    single = strip_repeated_prefix(df).where("conv_id = 2").collect()
    assert single[0]["lcp"] == 0 and single[0]["head"] == "solo turn"


def test_strip_repeated_prefix_cap_and_empty(spark):
    long_common = "x" * 100
    df = _turns(
        spark,
        [
            (0, 1, 0, "user", long_common + "A"),
            (1, 1, 1, "assistant", long_common + "B"),
            (2, 3, 0, "user", ""),
            (3, 3, 1, "assistant", ""),
        ],
    )
    rows = {
        (r["conv_id"], r["turn_idx"]): r
        for r in strip_repeated_prefix(df).collect()
    }
    assert rows[(1, 1)]["lcp"] == 64  # capped, not 100
    assert rows[(1, 1)]["kept_chars"] == 101 - 64
    assert rows[(3, 1)]["lcp"] == 0 and rows[(3, 1)]["head"] == ""


def test_truncate_to_token_budget(spark):
    # tok = ceil(len/4); texts of length 40 -> 10 tokens each
    rows = [(i, 1, i, "user", "a" * 40) for i in range(10)]
    df = _turns(spark, rows)
    out = truncate_to_token_budget(df, budget=35).collect()
    # from the end: cum 10,20,30,40 -> only the last 3 turns fit
    kept = sorted(r["turn_idx"] for r in out)
    assert kept == [7, 8, 9]
    assert {r["tok"] for r in out} == {10}
    assert max(r["cum_from_end"] for r in out) == 30


def test_role_sequence_stats(spark):
    df = _turns(
        spark,
        [
            (0, 1, 0, "user", "q"),
            (1, 1, 1, "assistant", "a"),
            (2, 1, 2, "assistant", "a again"),  # violation
            (3, 1, 3, "tool", "t"),
            (4, 2, 0, "user", "q"),
            (5, 2, 1, "assistant", "a"),
        ],
    )
    out = {r["conv_id"]: r for r in role_sequence_stats(df).collect()}
    assert out[1]["n_turns"] == 4
    assert out[1]["n_tool_turns"] == 1
    assert out[1]["n_same_role_adjacent"] == 1
    assert out[1]["alternation_ok"] == 0
    assert out[2]["n_same_role_adjacent"] == 0
    assert out[2]["alternation_ok"] == 1


def test_bfs_hop_distance(spark):
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0), (2, 4), (7, 8)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    out = {r["node"]: r["hops"] for r in bfs_hop_distance(edges, seeds).collect()}
    # 7->8 component unreachable; shortest hops from 0 elsewhere
    assert out == {0: 0, 1: 1, 2: 2, 3: 3, 4: 3}


def test_bfs_hop_distance_max_hops_cap(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    out = bfs_hop_distance(edges, seeds, max_hops=3).collect()
    assert {r["node"]: r["hops"] for r in out} == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bpe_pair_counts(spark, tmp_path):
    pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["abab", "ba", "x", None],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [4, 2, 1, 0],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    from extractor.ops.textops import bpe_pair_counts

    out = {
        r["pair"]: r["n"]
        for r in bpe_pair_counts(spark, str(tmp_path)).collect()
    }
    # "abab" -> ab, ba, ab ; "ba" -> ba ; "x"/None contribute nothing
    assert out == {"ab": 2, "ba": 2}


def test_detect_repeat_runs(spark):
    from extractor.ops.convops import detect_repeat_runs

    df = spark.createDataFrame(
        [
            # conv 1: tool repeats sig "x" three times consecutively
            (1, 0, "user", "a"),
            (1, 1, "tool", "x"),
            (1, 2, "tool", "x"),
            (1, 3, "tool", "x"),
            (1, 4, "assistant", "b"),
            # same sig later but NOT consecutive -> separate island of 1
            (1, 5, "tool", "x"),
            # conv 2: no repeats
            (2, 0, "user", "a"),
            (2, 1, "assistant", "b"),
        ],
        "conv_id long, turn_idx long, role string, sig string",
    )
    out = {r["conv_id"]: r for r in detect_repeat_runs(df).collect()}
    assert out[1]["n_turns"] == 6
    assert out[1]["max_run"] == 3
    assert out[1]["n_repeat_islands"] == 1
    assert out[2]["max_run"] == 1 and out[2]["n_repeat_islands"] == 0
