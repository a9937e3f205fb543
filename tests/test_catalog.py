"""Snapshot catalog: atomic commits, lineage, time travel, resume."""

import json
import os

import pytest

from graphrag_mrkr_2_spark.sources.catalog import SnapshotCatalog


@pytest.mark.spark
def test_write_read_roundtrip(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    df = spark.range(100).withColumnRenamed("id", "x")
    m = cat.write("t1", df, metrics={"triple_count": 100})
    assert m["snapshot_id"] == 0
    assert m["row_count"] == 100
    assert sum(p["rows"] for p in m["partition_counts"]) == 100
    assert m["metrics"]["triple_count"] == 100
    back = cat.read("t1")
    assert back.count() == 100


@pytest.mark.spark
def test_time_travel(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    cat.write("t", spark.range(10))
    cat.write("t", spark.range(25))
    assert cat.read("t").count() == 25  # current
    assert cat.read("t", snapshot=0).count() == 10  # time travel
    hist = cat.history("t")
    assert [h["snapshot_id"] for h in hist] == [0, 1]
    assert hist[1]["parent_id"] == 0


@pytest.mark.spark
def test_materialize_skips_on_same_fingerprint(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path))
    calls = []

    def compute():
        calls.append(1)
        return spark.range(5)

    cat.materialize("t", compute, input_fingerprint="fp1")
    cat.materialize("t", compute, input_fingerprint="fp1")  # resume: skip
    assert len(calls) == 1
    cat.materialize("t", compute, input_fingerprint="fp2")  # stale: recompute
    assert len(calls) == 2
    assert cat.current_snapshot("t")["snapshot_id"] == 1


@pytest.mark.spark
def test_checkpointed_pipeline_resume(spark, tmp_path):
    """Kill-and-resume semantics: a second run over the same input reuses
    every committed stage (no new snapshots)."""
    from graphrag_mrkr_2_spark.plans.checkpoint import run_checkpointed
    from graphrag_mrkr_2_spark.sources.pages import generate_pages

    pages = generate_pages(spark, 6)
    root = str(tmp_path / "cat")
    r1 = run_checkpointed(spark, pages, root, input_fingerprint="pages-v1")
    t1 = {(r["subj"], r["pred"], r["obj"]) for r in r1["triples"].collect()}
    cat = SnapshotCatalog(spark, root)
    snaps_before = {t: cat.current_snapshot(t)["snapshot_id"] for t in ("chunks", "mentions", "triples")}

    r2 = run_checkpointed(spark, generate_pages(spark, 6), root, input_fingerprint="pages-v1")
    t2 = {(r["subj"], r["pred"], r["obj"]) for r in r2["triples"].collect()}
    snaps_after = {t: cat.current_snapshot(t)["snapshot_id"] for t in ("chunks", "mentions", "triples")}

    assert t1 == t2
    assert snaps_before == snaps_after  # nothing recomputed
    assert cat.current_snapshot("triples")["metrics"]["triple_count"] == len(t1)
