"""Deterministic sampling / data-mixing operators."""

import pytest
from pyspark.sql import functions as F

from graphrag_mrkr_2_spark.operators.sampling import (
    stratified_sample,
    token_budget_shards,
    weighted_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, ["en", "de", "fr"][i % 3], float((i % 10) + 1), 100 + (i % 7) * 50) for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, lang string, quality double, n_tokens int")


@pytest.mark.spark
def test_stratified_exact_quotas_and_determinism(corpus):
    s = stratified_sample(corpus, "lang", 15)
    counts = {r["lang"]: r["n"] for r in s.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 15, "de": 15, "fr": 15}
    # pure function of (data, seed): same ids regardless of partitioning
    ids1 = {r["doc_id"] for r in s.collect()}
    ids2 = {r["doc_id"] for r in stratified_sample(corpus.repartition(7), "lang", 15).collect()}
    assert ids1 == ids2
    # a different seed draws a different sample
    ids3 = {r["doc_id"] for r in stratified_sample(corpus, "lang", 15, seed=7).collect()}
    assert ids1 != ids3


@pytest.mark.spark
def test_stratified_small_stratum_takes_all(spark):
    df = spark.createDataFrame([(1, "x"), (2, "x"), (3, "y")], "doc_id long, lang string")
    s = stratified_sample(df, "lang", 10)
    assert s.count() == 3


@pytest.mark.spark
def test_weighted_sample_respects_weights(corpus):
    k = 60
    s = weighted_sample(corpus, "quality", k)
    assert s.count() == k
    # mean quality of the sample must exceed the corpus mean (weights bias)
    mean_all = corpus.agg(F.avg("quality")).collect()[0][0]
    mean_s = s.agg(F.avg("quality")).collect()[0][0]
    assert mean_s > mean_all
    # zero/negative weights can never be drawn
    with_zero = corpus.withColumn(
        "quality", F.when(F.col("doc_id") < 100, 0.0).otherwise(F.col("quality"))
    )
    s2 = weighted_sample(with_zero, "quality", k)
    assert s2.where(F.col("doc_id") < 100).count() == 0


@pytest.mark.spark
def test_token_budget_shards_bounded(corpus):
    budget = 2000
    sh = token_budget_shards(corpus, "n_tokens", budget)
    per = sh.groupBy("shard").agg(
        F.sum("n_tokens").alias("tok"), F.count("*").alias("n")
    ).collect()
    max_doc = corpus.agg(F.max("n_tokens")).collect()[0][0]
    assert all(r["tok"] <= budget + max_doc for r in per)
    shards = sorted(r["shard"] for r in per)
    assert shards == list(range(len(shards)))  # contiguous ids from 0
    assert sh.count() == corpus.count()  # partition of the corpus


@pytest.mark.spark
def test_token_budget_shards_two_phase_matches_single_window(corpus):
    """The stratum-less path (two-phase distributed prefix sum, VERDICT r2
    #2) must equal the naive global-window formulation row for row, and be
    invariant to input partitioning (cluster-size independence)."""
    budget = 2000
    rows = sorted(
        ((r["doc_id"], r["n_tokens"]) for r in corpus.collect()), key=lambda t: t[0]
    )
    cum, expected = 0, {}
    for doc_id, tok in rows:
        expected[doc_id] = (cum) // budget
        cum += tok
    got = {
        r["doc_id"]: r["shard"]
        for r in token_budget_shards(corpus, "n_tokens", budget).collect()
    }
    assert got == expected
    got7 = {
        r["doc_id"]: r["shard"]
        for r in token_budget_shards(corpus.repartition(7), "n_tokens", budget).collect()
    }
    assert got7 == expected


@pytest.mark.spark
def test_token_budget_shards_no_single_partition_window(corpus):
    """Plan property: the stratum-less path must not funnel the corpus
    through a single-partition exchange (the r2 scale-killer)."""
    sh = token_budget_shards(corpus, "n_tokens", 2000)
    plan = sh._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan


@pytest.mark.spark
def test_token_budget_shards_no_localcheckpoint(corpus):
    """VERDICT r3 #4: the stratum-less path must not pin the corpus with a
    localCheckpoint (lineage-free executor blocks = full materialization +
    executor-loss job kill at 100 TB). A checkpointed input shows up as a
    'Scan ExistingRDD' leaf; the plan must read the real source instead."""
    sh = token_budget_shards(corpus, "n_tokens", 2000)
    plan = sh._jdf.queryExecution().executedPlan().toString()
    # the corpus fixture itself is createDataFrame (an ExistingRDD leaf), so
    # assert on a parquet-backed frame where the leaf type is observable
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        corpus.write.mode("overwrite").parquet(f"{d}/c.parquet")
        pq = corpus.sparkSession.read.parquet(f"{d}/c.parquet")
        sh2 = token_budget_shards(pq, "n_tokens", 2000)
        plan2 = sh2._jdf.queryExecution().executedPlan().toString()
        # the ONLY driver-built leaf allowed is the O(parallelism) broadcast
        # offsets table (__pid, __off); the corpus itself must stay a real
        # FileScan with lineage
        import re

        leaves = re.findall(r"Scan ExistingRDD\[([^\]]*)\]", plan2)
        assert all("__off" in leaf for leaf in leaves), plan2
        assert "FileScan parquet" in plan2, plan2
        assert "Exchange SinglePartition" not in plan2
        # still correct against the single-window oracle
        rows = sorted(
            ((r["doc_id"], r["n_tokens"]) for r in pq.collect()), key=lambda t: t[0]
        )
        cum, expected = 0, {}
        for doc_id, tok in rows:
            expected[doc_id] = cum // 2000
            cum += tok
        got = {r["doc_id"]: r["shard"] for r in sh2.collect()}
        assert got == expected
    assert plan is not None


@pytest.mark.spark
def test_token_budget_shards_snapshot_dir(corpus, tmp_path):
    """snapshot_dir routes the bucketed frame through a durable stage
    snapshot (the cluster path for nondeterministic upstreams — review r4
    pass-2 findings #1/#2): identical shard ids, snapshot actually
    written."""
    import os

    budget = 2000
    snap = str(tmp_path / "shards_stage")
    base = {r["doc_id"]: r["shard"] for r in token_budget_shards(corpus, "n_tokens", budget).collect()}
    got = {
        r["doc_id"]: r["shard"]
        for r in token_budget_shards(
            corpus, "n_tokens", budget, snapshot_dir=snap
        ).collect()
    }
    assert got == base
    assert os.path.exists(os.path.join(snap, "_SUCCESS"))


@pytest.mark.spark
def test_token_budget_shards_string_order_col(spark):
    """Non-numeric order columns take the content-hash-sample cut path and
    must still match the single-window oracle exactly."""
    rows = [(f"doc-{i:05d}", 100 + (i % 7) * 50) for i in range(257)]
    df = spark.createDataFrame(rows, "doc_id string, n_tokens int")
    budget = 1500
    cum, expected = 0, {}
    for doc_id, tok in sorted(rows):
        expected[doc_id] = cum // budget
        cum += tok
    got = {
        r["doc_id"]: r["shard"]
        for r in token_budget_shards(df, "n_tokens", budget).collect()
    }
    assert got == expected


@pytest.mark.spark
def test_token_budget_shards_per_stratum(corpus):
    sh = token_budget_shards(corpus, "n_tokens", 2000, stratum_col="lang")
    # shard ids restart per language
    firsts = sh.groupBy("lang").agg(F.min("shard").alias("m")).collect()
    assert all(r["m"] == 0 for r in firsts)
