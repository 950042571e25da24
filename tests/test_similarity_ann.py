"""ANN search accuracy + plan gates: approximate top-k must track the exact
scan (recall@k), and the candidate join must be bucket-local with the tiny
query side broadcast (the 100 TB plan shape)."""

from extractor.ops import similarity

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_ann_recall_vs_exact(spark):
    exact = {
        (r["query_id"], r["vec_id"])
        for r in similarity.cosine_topk(spark, SF).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in similarity.ann_topk(spark, SF).collect()
    }
    assert exact, "exact top-k must be non-empty"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"ANN recall {recall:.2f} < 0.9"


def test_ann_rows_shape(spark):
    rows = similarity.ann_topk(spark, SF).collect()
    per_query = {}
    for r in rows:
        per_query.setdefault(r["query_id"], []).append(r["rank"])
    assert set(per_query) == set(range(similarity.N_QUERIES))
    for q, ranks in per_query.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= similarity.TOP_K


def test_ivf_recall_vs_exact(spark):
    exact = {
        (r["query_id"], r["vec_id"])
        for r in similarity.cosine_topk(spark, SF).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in similarity.ivf_topk(spark, SF).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"IVF recall {recall:.2f} < 0.9"


def test_ivf_cell_join_broadcasts_queries(spark):
    plan = _plan(similarity.ivf_topk(spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    streamed = plan.split("BroadcastHashJoin")[1].split("BroadcastExchange")[0]
    assert "Exchange" not in streamed, plan


def test_ann_candidate_join_is_bucket_local_broadcast(spark):
    plan = _plan(similarity.ann_topk(spark, SF))
    # the query-side bucket list broadcasts; the corpus-side assignment
    # table (streamed side, printed between the join node and the
    # BroadcastExchange child) must reach the join with NO Exchange
    assert "BroadcastHashJoin" in plan, plan
    streamed = plan.split("BroadcastHashJoin")[1].split("BroadcastExchange")[0]
    assert "MapInPandas" in streamed, plan
    assert "Exchange" not in streamed, plan
