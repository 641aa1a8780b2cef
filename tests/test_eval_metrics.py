"""operators/eval_metrics.py against hand-computed fixtures."""

from __future__ import annotations

import math

import pytest

from vettore_spark.operators.eval_metrics import retrieval_metrics


def test_retrieval_metrics_hand_computed(spark):
    """q0: run [d1(rel2), d2(rel0), d3(rel1)] with 3 positives total
    (d4 rel=3 unretrieved); q1: no relevant anywhere; q2: perfect
    single-hit run."""
    runs = spark.createDataFrame(
        [
            (0, "d1", 1), (0, "d2", 2), (0, "d3", 3),
            (1, "x1", 1), (1, "x2", 2),
            (2, "y1", 1),
        ],
        "query_id long, doc_id string, rank long",
    )
    qrels = spark.createDataFrame(
        [
            (0, "d1", 2), (0, "d3", 1), (0, "d4", 3),
            (2, "y1", 1),
        ],
        "query_id long, doc_id string, rel long",
    )
    out = {
        r["query_id"]: r
        for r in retrieval_metrics(runs, qrels, k=3).collect()
    }

    q0 = out[0]
    assert q0["hits"] == 2
    assert q0["precision_at_k"] == pytest.approx(2 / 3, abs=1e-5)
    assert q0["recall_at_k"] == pytest.approx(2 / 3, abs=1e-5)
    assert q0["rr"] == pytest.approx(1.0)
    dcg = (2**2 - 1) / math.log2(2) + 0.0 + (2**1 - 1) / math.log2(4)
    idcg = (2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3) + (
        2**1 - 1
    ) / math.log2(4)
    assert q0["ndcg_at_k"] == pytest.approx(dcg / idcg, abs=1e-5)

    q1 = out[1]
    assert q1["hits"] == 0
    assert q1["recall_at_k"] == 0.0  # unlabeled query: 0, not null
    assert q1["rr"] == 0.0
    assert q1["ndcg_at_k"] == 0.0

    q2 = out[2]
    assert q2["hits"] == 1
    assert q2["recall_at_k"] == pytest.approx(1.0)
    assert q2["rr"] == pytest.approx(1.0)
    assert q2["ndcg_at_k"] == pytest.approx(1.0)


def test_retrieval_metrics_ignores_rows_past_k(spark):
    runs = spark.createDataFrame(
        [(0, "a", 1), (0, "b", 2), (0, "c", 3)],
        "query_id long, doc_id string, rank long",
    )
    qrels = spark.createDataFrame(
        [(0, "c", 5)], "query_id long, doc_id string, rel long"
    )
    row = retrieval_metrics(runs, qrels, k=2).collect()[0]
    assert row["hits"] == 0  # the only relevant doc sits at rank 3 > k
    assert row["rr"] == 0.0
    assert row["ndcg_at_k"] == 0.0


def test_retrieval_metrics_plan_no_global_window(spark):
    """The only window partitions by query_id over qrels — a global
    (unpartitioned) window would plan an Exchange SinglePartition, the
    serialize-everything shape this operator must never take."""
    runs = spark.createDataFrame(
        [(0, "a", 1)], "query_id long, doc_id string, rank long"
    )
    qrels = spark.createDataFrame(
        [(0, "a", 1)], "query_id long, doc_id string, rel long"
    )
    df = retrieval_metrics(runs, qrels, k=10)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan


def test_spearman_hand_computed(spark):
    """Classic fixtures: perfect agreement -> 1, perfect reversal -> -1,
    a tie-bearing case against the scipy-checked value, constant column
    -> NULL."""
    from vettore_spark.operators.stats import spearman_by_group

    rows = (
        # g=same: y == x
        [("same", float(i), float(i) * 2.0) for i in range(5)]
        # g=rev: y reversed
        + [("rev", float(i), float(4 - i)) for i in range(5)]
        # g=tie: x = [1,2,2,3], y = [1,3,2,4]
        + [("tie", 1.0, 1.0), ("tie", 2.0, 3.0), ("tie", 2.0, 2.0),
           ("tie", 3.0, 4.0)]
        # g=const: x constant
        + [("const", 7.0, float(i)) for i in range(4)]
    )
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {
        r["g"]: r
        for r in spearman_by_group(
            df, group_col="g", x_col="x", y_col="y"
        ).collect()
    }
    assert out["same"]["spearman"] == pytest.approx(1.0)
    assert out["rev"]["spearman"] == pytest.approx(-1.0)
    # ranks x: [1, 2.5, 2.5, 4]; y: [1, 3, 2, 4]
    # pearson of those ranks = 0.9486833 (scipy.stats.spearmanr parity)
    assert out["tie"]["spearman"] == pytest.approx(0.94868, abs=1e-5)
    assert out["const"]["spearman"] is None
    assert out["same"]["n"] == 5


def test_retrieval_metrics_zero_fills_queries_past_k(spark):
    """A query whose run rows ALL sit past rank k still gets its output
    row, zero-filled — one row per run query, always (the rank<=k filter
    must not silently drop whole queries)."""
    runs = spark.createDataFrame(
        [(0, "a", 1), (1, "b", 5), (1, "c", 6)],
        "query_id long, doc_id string, rank long",
    )
    qrels = spark.createDataFrame(
        [(0, "a", 1), (1, "b", 2)], "query_id long, doc_id string, rel long"
    )
    out = {
        r["query_id"]: r for r in retrieval_metrics(runs, qrels, k=2).collect()
    }
    assert set(out) == {0, 1}
    q1 = out[1]
    assert q1["hits"] == 0
    assert q1["precision_at_k"] == 0.0
    assert q1["recall_at_k"] == 0.0  # npos=1 but 0 hits
    assert q1["rr"] == 0.0
    assert q1["ndcg_at_k"] == 0.0
    assert out[0]["hits"] == 1


def test_spearman_excludes_null_scores(spark):
    """NULL x/y rows are excluded before ranking (engines disagree on
    NULL sort order); n reflects the exclusion."""
    from vettore_spark.operators.stats import spearman_by_group

    rows = (
        [("g", float(i), float(i)) for i in range(4)]
        + [("g", None, 9.0), ("g", 5.0, None)]
    )
    df = spark.createDataFrame(rows, "g string, x double, y double")
    row = spearman_by_group(
        df, group_col="g", x_col="x", y_col="y"
    ).collect()[0]
    assert row["n"] == 4
    assert row["spearman"] == pytest.approx(1.0)
