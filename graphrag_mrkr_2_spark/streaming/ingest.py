"""Structured Streaming ingestion: continuous KG construction.

The reference ingests per-uploaded-document with a background thread pool
(SURVEY §3.1) — i.e. micro-batched arrival. The Spark-native equivalent is a
file-source stream over the pages table directory: every new parquet file of
crawled pages flows through the SAME chunk→extract→canonicalize operators
(mapInPandas works identically on streaming DataFrames), and graph-table
merges happen in ``foreachBatch`` where batch-scoped groupBys + snapshot
appends implement the MERGE semantics.

Also provides windowed event-stream aggregation (watermark + tumbling
window) over an events-shaped stream — the standard late-data-tolerant
telemetry rollup a crawl pipeline needs (pages/sec per host, filter-reason
rates), demonstrated on the testdata ``events`` schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..operators.extract import chunk_pages, filter_chunks  # noqa: F401 (re-export for callers)
from ..operators.triples import extract_mentions
from ..sources.pages import PAGES_SCHEMA


def stream_pages(spark: SparkSession, pages_dir: str, max_files_per_trigger: int = 4) -> DataFrame:
    """File-source stream over an append-only pages parquet directory."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )


def streaming_mentions(pages_stream: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """chunk → filter → extract on a streaming DataFrame — the same fused
    mapInPandas stage as batch (stateless per-row transforms stream without
    watermarks; one Arrow crossing per page)."""
    from ..operators.triples import extract_mentions_fused

    return extract_mentions_fused(
        pages_stream,
        strategy="html_heading",
        chunk_cfg=cfg.chunking,
        filter_cfg=cfg.content_filter,
        max_gleanings=cfg.extraction.max_gleanings,
    )


def start_kg_stream(
    spark: SparkSession,
    pages_dir: str,
    catalog_root: str,
    checkpoint_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
):
    """Continuous KG construction: each micro-batch canonicalizes its own
    mentions and appends to the snapshot catalog; cross-batch entity merge is
    the same MERGE-by-name reduction applied at read/compaction time (the
    aggregations are associative, so batch-local partials compose exactly —
    entity_graph.py merge semantics are reduction-safe by construction)."""
    from ..operators.triples import build_edges, build_nodes, canonicalize
    from ..sources.catalog import SnapshotCatalog

    mentions = streaming_mentions(stream_pages(spark, pages_dir), cfg)
    cat = SnapshotCatalog(spark, catalog_root)

    def _process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        entities_doc, rels_doc = canonicalize(
            batch_df,
            importance_threshold=cfg.extraction.importance_score_threshold,
            strength_threshold=cfg.extraction.strength_threshold,
        )
        cat.write(
            f"nodes_batches/batch-{batch_id:06d}",
            build_nodes(entities_doc),
            input_fingerprint=f"stream-batch-{batch_id}",
        )
        cat.write(
            f"edges_batches/batch-{batch_id:06d}",
            build_edges(rels_doc),
            input_fingerprint=f"stream-batch-{batch_id}",
        )

    return (
        mentions.writeStream.foreachBatch(_process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_stream_batches(spark: SparkSession, catalog_root: str) -> dict[str, DataFrame]:
    """Merge all per-batch node/edge snapshots into global tables — the same
    global groupBys as the batch pipeline (associative merge)."""
    import os

    from ..operators.triples import build_triples
    from ..sources.catalog import SnapshotCatalog

    cat = SnapshotCatalog(spark, catalog_root)

    def _union(prefix: str) -> DataFrame | None:
        base = os.path.join(catalog_root, prefix)
        if not os.path.isdir(base):
            return None
        out = None
        for b in sorted(os.listdir(base)):
            df = cat.read(f"{prefix}/{b}")
            out = df if out is None else out.unionByName(df)
        return out

    nodes_raw = _union("nodes_batches")
    edges_raw = _union("edges_batches")
    from ..operators.triples import capped_provenance

    nodes = (
        nodes_raw.groupBy("name")
        .agg(
            F.max("type").alias("type"),
            F.max_by("description", F.length("description")).alias("description"),
            F.avg("importance_score").alias("importance_score"),
            F.sum("mention_count").alias("mention_count"),
            F.min(F.col("is_orphan").cast("int")).cast("boolean").alias("is_orphan"),
            F.sum("doc_count").alias("doc_count"),
        )
        .withColumn("entity_id", F.substring(F.md5(F.lower(F.col("name"))), 1, 16))
        .join(capped_provenance(nodes_raw, ["name"]), "name", "left")
        .withColumn(
            "source_chunks",
            F.coalesce(F.col("source_chunks"), F.array().cast("array<string>")),
        )
    )
    edges = (
        edges_raw.groupBy("subj", "obj", "rel_type")
        .agg(
            F.sum("strength").alias("strength"),
            F.sum("mention_count").alias("mention_count"),
            F.sum("doc_count").alias("doc_count"),
        )
        .withColumn("edge_type", F.lit("RELATED_TO"))
        .join(capped_provenance(edges_raw, ["subj", "obj", "rel_type"]), ["subj", "obj", "rel_type"], "left")
        .withColumn(
            "source_chunks",
            F.coalesce(F.col("source_chunks"), F.array().cast("array<string>")),
        )
    )
    return {"nodes": nodes, "edges": edges, "triples": build_triples(edges)}


# ---------------------------------------------------------------------------
# windowed event aggregation (watermark + tumbling window)
# ---------------------------------------------------------------------------


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Late-data-tolerant tumbling-window rollup (works on batch DFs too —
    Spark evaluates window()/watermark identically, which is how the tests
    pin semantics without a live stream)."""
    df = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        df.groupBy(F.window(F.col(ts_col), window_duration).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )
