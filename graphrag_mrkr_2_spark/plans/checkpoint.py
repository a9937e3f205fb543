"""Checkpointed, resumable KG pipeline: every stage is a catalog snapshot.

Stage boundaries mirror the reference's per-document progress checkpoints
(document_processor.py stage fields, SURVEY §3.1) at partition granularity:

    chunks → mentions → entities_doc/rels_doc → nodes/edges/triples

Each stage commits a snapshot whose ``input_fingerprint`` chains the parent
snapshot id, so `run_checkpointed` after a crash (or on unchanged input)
skips every already-committed stage — kill-and-resume is a no-op re-read.
Triple-count metrics land in each manifest per the north rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..operators.extract import chunk_pages, filter_chunks
from ..operators.triples import (
    build_edges,
    build_nodes,
    build_triples,
    canonicalize,
    extract_mentions,
)
from ..sources.catalog import SnapshotCatalog


def _count_metrics(df: DataFrame) -> dict:
    return {"rows": df.count()}


def run_checkpointed(
    spark: SparkSession,
    pages: DataFrame,
    catalog_root: str,
    input_fingerprint: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    strategy: str = "html_heading",
) -> dict[str, DataFrame]:
    """Run (or resume) the KG pipeline with one snapshot per stage.

    ``input_fingerprint`` identifies the input pages state (e.g. the input
    table's snapshot id, or a content hash at test scale); stage K's
    fingerprint is ``{input_fingerprint}/{stage_{K-1}.snapshot_id}`` so a new
    input invalidates the whole chain while a resume reuses every committed
    stage.
    """
    cat = SnapshotCatalog(spark, catalog_root)

    chunks = cat.materialize(
        "chunks",
        lambda: filter_chunks(chunk_pages(pages, strategy=strategy, cfg=cfg.chunking)),
        input_fingerprint=f"{input_fingerprint}/chunks-v1",
    )
    chunks_snap = cat.current_snapshot("chunks")["snapshot_id"]

    mentions = cat.materialize(
        "mentions",
        lambda: extract_mentions(chunks, max_gleanings=cfg.extraction.max_gleanings),
        input_fingerprint=f"{input_fingerprint}/chunks-{chunks_snap}/mentions-v1",
    )
    mentions_snap = cat.current_snapshot("mentions")["snapshot_id"]

    out = _downstream_stages(
        cat, mentions, f"{input_fingerprint}/mentions-{mentions_snap}", cfg
    )
    return {"chunks": chunks, "mentions": mentions, **out}


_CHUNK_COLS = [
    "chunk_id", "document_id", "content", "page", "start_offset",
    "end_offset", "chunk_index", "content_hash", "url",
    "heading_path", "section_title",
]


def run_checkpointed_fused(
    spark: SparkSession,
    pages: DataFrame,
    catalog_root: str,
    input_fingerprint: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    strategy: str = "html_heading",
) -> dict[str, DataFrame]:
    """Checkpointed pipeline under the UNIFIED FUSED pass: one "extracted"
    snapshot holds the chunk rows AND the mention rows emitted by the single
    HTML parse (pipeline.py materialize_chunks plan), so kill-and-resume
    never re-parses a page — the reference's recovery semantics
    (document_processor.py:141-280: per-document stage fields let a resumed
    run skip chunking/extraction for documents already past that stage),
    here at snapshot granularity. A crash after the extracted snapshot
    commits resumes into identical triples with zero extraction work
    (tests/test_catalog.py::test_fused_kill_and_resume)."""
    from ..operators.triples import MENTION_SCHEMA, extract_mentions_fused

    cat = SnapshotCatalog(spark, catalog_root)
    unified = cat.materialize(
        "extracted",
        lambda: extract_mentions_fused(
            pages,
            strategy=strategy,
            chunk_cfg=cfg.chunking,
            filter_cfg=cfg.content_filter,
            max_gleanings=cfg.extraction.max_gleanings,
            emit_chunks=True,
        ),
        input_fingerprint=f"{input_fingerprint}/extracted-v1",
    )
    ext_snap = cat.current_snapshot("extracted")["snapshot_id"]
    mention_cols = [f.name for f in MENTION_SCHEMA.fields]
    mentions = unified.where(F.col("kind") != "chunk").select(*mention_cols)
    chunks = unified.where(F.col("kind") == "chunk").select(*_CHUNK_COLS)

    out = _downstream_stages(
        cat, mentions, f"{input_fingerprint}/extracted-{ext_snap}", cfg
    )
    return {"chunks": chunks, "mentions": mentions, **out}


def _downstream_stages(
    cat: SnapshotCatalog,
    mentions: DataFrame,
    fp_prefix: str,
    cfg: PipelineConfig,
) -> dict[str, DataFrame]:
    """canonicalize → nodes/edges/triples with one snapshot per stage —
    shared by the modular and fused checkpointed plans."""
    canon_fp = f"{fp_prefix}/canon-v1"
    if not (
        cat.exists("entities_doc")
        and cat.current_snapshot("entities_doc").get("input_fingerprint") == canon_fp
        and cat.exists("rels_doc")
        and cat.current_snapshot("rels_doc").get("input_fingerprint") == canon_fp
    ):
        e_doc, r_doc = canonicalize(
            mentions,
            importance_threshold=cfg.extraction.importance_score_threshold,
            strength_threshold=cfg.extraction.strength_threshold,
        )
        cat.write("entities_doc", e_doc, input_fingerprint=canon_fp)
        cat.write("rels_doc", r_doc, input_fingerprint=canon_fp)
    entities_doc = cat.read("entities_doc")
    rels_doc = cat.read("rels_doc")
    canon_snap = cat.current_snapshot("rels_doc")["snapshot_id"]

    nodes = cat.materialize(
        "nodes",
        lambda: build_nodes(entities_doc),
        input_fingerprint=f"{canon_fp}/{canon_snap}/nodes-v1",
    )
    edges = cat.materialize(
        "edges",
        lambda: build_edges(rels_doc),
        input_fingerprint=f"{canon_fp}/{canon_snap}/edges-v1",
    )
    triples = cat.materialize(
        "triples",
        lambda: build_triples(edges),
        input_fingerprint=f"{canon_fp}/{canon_snap}/triples-v1",
        metrics_fn=lambda df: {"triple_count": df.count()},
    )
    return {
        "entities_doc": entities_doc,
        "rels_doc": rels_doc,
        "nodes": nodes,
        "edges": edges,
        "triples": triples,
    }
