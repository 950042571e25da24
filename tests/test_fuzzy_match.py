"""Focused tests for the distinct-name-proxy form of ``fuzzy_match_parts``
(round-6 optimization): the argmin over key pairs must survive the collapse
to one candidate row per (part, name group), including every edge the
collapse introduces — singleton names, the min-key probe needing its
group's SECOND-min, and cross-name distance ties."""

import pytest

from extractor.ops.dedup import fuzzy_match_parts


# part names chosen so split_part(name, ' ', 1) puts them all in one block
# ("alpha ...") plus one unreachable singleton in its own block.
PARTS = [
    # same-name group: three keys -> d=0 matches inside the group
    (10, "alpha red"),
    (20, "alpha red"),
    (30, "alpha red"),
    # one-edit neighbour of "alpha red", two keys
    (40, "alpha bed"),
    (50, "alpha bed"),
    # singleton name, d=1 from "alpha red" ("alpha reed"); ties with
    # nothing, matches the neighbour groups' min keys
    (60, "alpha reed"),
    # singleton name >5 edits from everything AND alone in its block:
    # must be absent from the output
    (70, "zzzz qqqqqqqqqqqq"),
    # length-band exclusion: same block, |len-9| > 5 vs "alpha red",
    # > 5 edits from everything it bands with
    (80, "alpha red extravagantly long"),
    # NULL name and NULL key: both were invisible to the pair form
    # (comparisons against NULL never hold) and must stay invisible —
    # a NULL-key probe must not borrow another name's representative
    (90, None),
    (None, "alpha red"),
]


@pytest.fixture(scope="module")
def parts_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fuzzy"))
    spark.createDataFrame(
        PARTS, "p_partkey long, p_name string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/part.parquet")
    return path


def test_fuzzy_match_edge_cases(spark, parts_dir):
    rows = {
        r["p_partkey"]: (r["match_key"], r["dist"])
        for r in fuzzy_match_parts(spark, parts_dir).collect()
    }
    assert rows == {
        # inside the "alpha red" group the match is the lowest OTHER key:
        # the min-key part takes the group's second-min
        10: (20, 0),
        20: (10, 0),
        30: (10, 0),
        # "alpha bed" pair: d=0 same-name beats d=1 "alpha red"
        40: (50, 0),
        50: (40, 0),
        # singleton "alpha reed": nearest is d=1 for BOTH "alpha red"
        # (insert e) and "alpha bed" (insert e, r->b is 2 — no:
        # reed->red deletes one e = 1; reed->bed = 2), so min struct
        # picks ("alpha red" group min key 10, d=1)
        60: (10, 1),
        # 70 (isolated block) and 80 (length-banded out) absent
    }


def test_fuzzy_match_unique_names_degenerate(spark, tmp_path_factory):
    # all-distinct names: the proxy is the old pair cascade; classic
    # nearest-neighbour result with (dist, key) tie-break
    path = str(tmp_path_factory.mktemp("fuzzy_uniq"))
    spark.createDataFrame(
        [(1, "beta carmine"), (2, "beta carmins"), (3, "beta carmine x")],
        "p_partkey long, p_name string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/part.parquet")
    rows = {
        r["p_partkey"]: (r["match_key"], r["dist"])
        for r in fuzzy_match_parts(spark, path).collect()
    }
    assert rows == {1: (2, 1), 2: (1, 1), 3: (1, 2)}
