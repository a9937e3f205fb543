"""Rerank stage: reference (flashrank_reranker.py) list semantics on Spark."""

import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from graphrag_mrkr_2_spark.operators.rerank import (
    lexical_overlap_scorer,
    rerank_candidates,
)


def _jacc(q: str, t: str) -> float:
    tok = re.compile(r"[^a-z0-9]+")
    qs = {w for w in tok.split(q.lower()) if w}
    ts = {w for w in tok.split(t.lower()) if w}
    u = len(qs | ts)
    return len(qs & ts) / u if u else 0.0


def _reference_rerank(query, cands, cap, blend):
    """Sequential mirror of flashrank_reranker.py:105-137: score the top-cap
    slice, blend, stable-sort, append the untouched tail."""
    to_rank = [dict(c) for c in cands[:cap]]
    for c in to_rank:
        c["rerank_score"] = _jacc(query, c["content"])
    if blend > 0.0:
        for c in to_rank:
            c["combined_score"] = blend * c["rerank_score"] + (1.0 - blend) * c["hybrid_score"]
        to_rank.sort(key=lambda x: x["combined_score"], reverse=True)  # stable
    else:
        to_rank.sort(key=lambda x: x["rerank_score"], reverse=True)
    return to_rank + [dict(c) for c in cands[cap:]]


def test_default_scorer_values():
    s = lexical_overlap_scorer(
        pd.Series(["spark shuffle", "spark shuffle"]),
        pd.Series(["the spark shuffle partitions", ""]),
    )
    assert s.tolist() == [pytest.approx(2 / 4), 0.0]


@pytest.mark.spark
def test_rerank_matches_reference_list_semantics(spark):
    query = "spark shuffle partitions"
    texts = [
        "spark shuffle partitions control parallelism",
        "completely unrelated text about mailstores",
        "shuffle partitions in spark are a knob",
        "spark",
        "partitions partitions everywhere",
        "the proxy routes requests",
        "spark shuffle",
        "tail doc never scored one",
        "tail doc never scored two",
    ]
    hybrid = [0.9, 0.85, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3, 0.2]
    cap, blend = 7, 0.4

    # incoming order = hybrid desc (texts already arranged that way)
    cands = [{"content": t, "hybrid_score": h} for t, h in zip(texts, hybrid)]
    expected = _reference_rerank(query, cands, cap, blend)

    df = spark.createDataFrame(
        [(0, query, t, h) for t, h in zip(texts, hybrid)],
        "query_id int, query string, content string, hybrid_score double",
    )
    got = (
        rerank_candidates(df, max_candidates=cap, blend_weight=blend)
        .orderBy("final_rank")
        .collect()
    )
    assert [r["content"] for r in got] == [c["content"] for c in expected]
    for r, c in zip(got, expected):
        if "rerank_score" in c:
            assert r["rerank_score"] == pytest.approx(c["rerank_score"])
            assert r["combined_score"] == pytest.approx(c["combined_score"])
        else:  # untouched tail
            assert r["rerank_score"] is None and r["combined_score"] is None
    assert [r["final_rank"] for r in got] == list(range(1, len(texts) + 1))


@pytest.mark.spark
def test_rerank_blend_zero_sorts_by_rerank_only(spark):
    df = spark.createDataFrame(
        [
            (0, "alpha beta", "gamma delta", 0.99),  # top hybrid, zero overlap
            (0, "alpha beta", "alpha beta", 0.01),  # perfect overlap
        ],
        "query_id int, query string, content string, hybrid_score double",
    )
    got = rerank_candidates(df, max_candidates=10, blend_weight=0.0).orderBy("final_rank").collect()
    assert got[0]["content"] == "alpha beta"
    assert got[0]["rerank_score"] == pytest.approx(1.0)


@pytest.mark.spark
def test_rerank_multiple_queries_partition_independently(spark):
    rows = [
        (1, "red fish", "red fish swim", 0.2),
        (1, "red fish", "blue bird", 0.9),
        (2, "blue bird", "blue bird", 0.1),
        (2, "blue bird", "red fish", 0.8),
    ]
    df = spark.createDataFrame(
        rows, "query_id int, query string, content string, hybrid_score double"
    )
    got = {
        (r["query_id"], r["final_rank"]): r["content"]
        for r in rerank_candidates(df, max_candidates=10).collect()
    }
    assert got[(1, 1)] == "red fish swim"
    assert got[(2, 1)] == "blue bird"
