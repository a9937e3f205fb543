"""S4-S8: triple extraction (with gleaning), consolidation, canonicalization.

Reference semantics replicated (SURVEY §2.3/§2.4):

  per chunk (inside one Arrow batch, chunk-local → mapInPandas):
    LLM pass 1 + gleaning passes        entity_extraction.py:879-1044
    tuple_v1 parse                      tuple_parser.py:69-344
    low-value filter                    entity_extraction.py:443-468
    per-chunk dedup + normalization     entity_extraction.py:470-513
  per document (groupBy aggregations):
    global dedup                        entity_extraction.py:1142-1148
    endpoint semi-join (drop rels with  entity_extraction.py:1152-1163,
    missing endpoints)                  :1279
    importance >= 0.3 / strength >= 0.4 document_processor.py:1096-1125
    entity merge (desc set-union,       entity_graph.py:132-198
    mean importance, mention counts)
    relationship merge (strength SUM,   entity_graph.py:217-290
    desc set-union, directed key
    (source, target, rel_type))
  global:
    entity id md5(lower(name))[:16]     entity_graph.py:400-404
    node MERGE by name / edge MERGE by  entity_graph.py:424-480
    (source_name, target_name, type)

Documented divergences (none affect (subj, pred, obj) identity — SURVEY §7.4):
- importance averaging is the reference's order-dependent pairwise mean; we
  use the arithmetic mean (exact for the entity_graph stage, which the
  reference itself computes as a running mean ≡ arithmetic mean).
- when one name carries several types, the reference keeps the dict-insertion
  "last" type (entity_extraction.py:1147); we keep the lexicographically
  greatest type deterministically.
- description keep-longer tie-breaks are first-seen in the reference;
  max_by(length) here.

Scale notes:
- extraction is chunk-local: no shuffle; Arrow batch size bounds UDF memory.
- every groupBy below benefits from Spark's built-in partial (map-side)
  aggregation; mega-entity keys ("THE"-like) produce one partial row per map
  partition, so the final reduce sees O(#partitions) rows per key, not
  O(#mentions). Provenance arrays can be capped via ``provenance_cap``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.charsets import to_text
from ..functions.extraction import extract_chunk_with_gleaning
from ..functions.mock_llm import mock_llm_response

MENTION_SCHEMA = StructType(
    [
        StructField("kind", StringType(), False),  # 'entity' | 'relationship'
        StructField("chunk_id", StringType(), False),
        StructField("document_id", StringType(), False),
        StructField("name", StringType(), True),  # entity name / rel source
        StructField("type", StringType(), True),  # entity type / rel type
        StructField("target", StringType(), True),  # rel target (null for entity)
        StructField("description", StringType(), True),
        StructField("importance", DoubleType(), True),
        StructField("strength", DoubleType(), True),
        StructField("source_chunks", ArrayType(StringType()), True),
    ]
)


def extract_mentions(
    chunks: DataFrame,
    llm: Callable[[str, str, int], str] = mock_llm_response,
    max_gleanings: int = 1,
    content_col: str = "content",
) -> DataFrame:
    """S4+S5: run the gleaning extraction per chunk, emit mention rows.

    One union table ('entity'/'relationship' rows) so the LLM runs once per
    chunk; split with ``entity_mentions``/``relationship_mentions`` below.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for rec in pdf.itertuples(index=False):
                chunk_id = rec.chunk_id
                doc_id = rec.document_id
                text = getattr(rec, content_col) or ""
                entities, relationships = extract_chunk_with_gleaning(
                    text, chunk_id, llm, max_gleanings=max_gleanings
                )
                for e in entities:
                    rows.append(
                        {
                            "kind": "entity",
                            "chunk_id": chunk_id,
                            "document_id": doc_id,
                            "name": e["name"],
                            "type": e["type"],
                            "target": None,
                            "description": e["description"],
                            "importance": e["importance_score"],
                            "strength": None,
                            "source_chunks": e["source_chunks"],
                        }
                    )
                for r in relationships:
                    rows.append(
                        {
                            "kind": "relationship",
                            "chunk_id": chunk_id,
                            "document_id": doc_id,
                            "name": r["source_entity"],
                            "type": r["relationship_type"],
                            "target": r["target_entity"],
                            "description": r["description"],
                            "importance": None,
                            "strength": r["strength"],
                            "source_chunks": r["source_chunks"],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in MENTION_SCHEMA.fields])

    return chunks.select("chunk_id", "document_id", content_col).mapInPandas(
        _extract, MENTION_SCHEMA
    )


UNIFIED_EXTRA_FIELDS = [
    StructField("url", StringType(), True),
    StructField("content", StringType(), True),
    StructField("page", IntegerType(), True),
    StructField("start_offset", LongType(), True),
    StructField("end_offset", LongType(), True),
    StructField("chunk_index", IntegerType(), True),
    StructField("content_hash", StringType(), True),
    StructField("heading_path", StringType(), True),
    StructField("section_title", StringType(), True),
]

UNIFIED_SCHEMA = StructType([*MENTION_SCHEMA.fields, *UNIFIED_EXTRA_FIELDS])


def extract_mentions_fused(
    pages: DataFrame,
    strategy: str = "html_heading",
    chunk_cfg=None,
    filter_cfg=None,
    llm: Callable[[str, str, int], str] = mock_llm_response,
    max_gleanings: int = 1,
    id_col: str = "url",
    html_col: str = "html",
    text_col: str = "text",
    binary_col: str = "binary",
    emit_chunks: bool = False,
) -> DataFrame:
    """Fused S2+S3+S4+S5: pages → mention rows in ONE mapInPandas stage.

    The modular operators (chunk_pages → with_content_filter →
    extract_mentions) ship every chunk's content across the Arrow boundary
    twice (JVM→Python for chunking output, JVM→Python again for extraction
    input). All three steps are chunk-local, so fusing them keeps the page
    content in Python from parse to mention emission — measured ~6× on the
    end-to-end pipeline. The content filter runs as the pure-Python oracle
    (functions/quality.should_embed_chunk), which unit tests pin equal to
    the JVM column-expression variant.

    ``emit_chunks=True`` widens the output to UNIFIED_SCHEMA and also emits
    one kind='chunk' row per surviving TextUnit — so a consumer that needs
    BOTH the mentions and the chunk table (similarity, checkpointing) pays
    the HTML parse exactly once instead of running chunk_pages again
    (round-1 bench showed that second parse as its own 7s line).
    """
    from ..config import ChunkingConfig, ContentFilterConfig
    from ..functions.chunking import (
        StructureHybridChunker,
        assign_text_units,
        chunk_document,
    )
    from ..functions.html_text import HtmlHeadingChunker, extract_plain_text
    from ..functions.extraction import extract_chunk_with_gleaning
    from ..functions.quality import should_embed_chunk
    from .extract import document_id_for_url

    chunk_cfg = chunk_cfg or ChunkingConfig()
    filter_cfg = filter_cfg or ContentFilterConfig()
    use_html = strategy == "html_heading"
    use_structure = strategy == "structure_hybrid"
    chunker = HtmlHeadingChunker(
        chunk_cfg.chunk_target_tokens,
        chunk_cfg.chunk_min_tokens,
        chunk_cfg.chunk_max_tokens,
        chunk_cfg.chunk_overlap_tokens,
        chunk_cfg.include_heading_path,
    )
    fkw = dict(
        min_chunk_length=filter_cfg.min_chunk_length,
        max_chunk_length=filter_cfg.max_chunk_length,
        min_unique_word_ratio=filter_cfg.min_unique_word_ratio,
        max_special_char_ratio=filter_cfg.max_special_char_ratio,
        min_alphanumeric_ratio=filter_cfg.min_alphanumeric_ratio,
    )

    structure_chunker = StructureHybridChunker(
        chunk_cfg.chunk_target_tokens,
        chunk_cfg.chunk_min_tokens,
        chunk_cfg.chunk_max_tokens,
        chunk_cfg.chunk_overlap_tokens,
        chunk_cfg.include_heading_path,
    )

    if use_structure and binary_col not in pages.columns:
        raise ValueError(
            f"strategy='structure_hybrid' needs the '{binary_col}' payload "
            f"column (have: {pages.columns}); load with keep_binary=True"
        )
    wanted = [id_col] + ([binary_col] if use_structure else []) + [html_col, text_col]
    cols = [c for c in dict.fromkeys(wanted) if c in pages.columns]

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # columnar accumulation: pd.DataFrame-from-dict-of-lists is much
            # cheaper than from list-of-dicts in the hot path
            kind, chunk_ids, doc_ids, names, types, targets = [], [], [], [], [], []
            descriptions, importances, strengths, provs = [], [], [], []
            chunk_rows: list[dict] = []

            def emit(k, cid, did, nm, ty, tg, de, im, st, pv):
                kind.append(k)
                chunk_ids.append(cid)
                doc_ids.append(did)
                names.append(nm)
                types.append(ty)
                targets.append(tg)
                descriptions.append(de)
                importances.append(im)
                strengths.append(st)
                provs.append(pv)

            for rec in pdf.itertuples(index=False):
                url = str(getattr(rec, id_col))
                doc_id = document_id_for_url(url)
                if use_html:
                    raw = getattr(rec, html_col)
                    # charset-sniffing decode (r7) — MUST match the
                    # modular chunk_pages path byte-for-byte or the
                    # fused/modular parity breaks on legacy-encoded pages
                    html = to_text(raw)
                    pieces = chunker.chunk_html(html)
                    base_text = (
                        getattr(rec, text_col, None) if text_col in pdf.columns else None
                    ) or extract_plain_text(html)
                    units = assign_text_units(doc_id, base_text, [p["text"] for p in pieces])
                    metas = [p["metadata"] for p in pieces]
                elif use_structure:
                    from ..functions.docformats import decode_document, document_blocks

                    raw = (
                        getattr(rec, binary_col, None)
                        if binary_col in pdf.columns
                        else None
                    )
                    data = bytes(raw) if isinstance(raw, (bytes, bytearray)) else None
                    blocks = document_blocks(data, url) if data else None
                    base_text = (
                        getattr(rec, text_col, None) if text_col in pdf.columns else None
                    ) or (decode_document(data, url) if data else None) or ""
                    if blocks:
                        pieces = structure_chunker.chunk_blocks(blocks)
                        units = assign_text_units(
                            doc_id, base_text, [p["text"] for p in pieces]
                        )
                        metas = [p["metadata"] for p in pieces]
                    else:
                        # structure unavailable → legacy downgrade, same as
                        # chunk_pages (core/chunking.py:288-292)
                        units = chunk_document(
                            doc_id, base_text, chunk_cfg.chunk_size,
                            chunk_cfg.chunk_overlap,
                        )
                        metas = [{} for _ in units]
                else:
                    text = getattr(rec, text_col) or ""
                    units = chunk_document(
                        doc_id, text, chunk_cfg.chunk_size, chunk_cfg.chunk_overlap
                    )
                    metas = [{} for _ in units]
                for unit, meta in zip(units, metas):
                    content = unit["content"]
                    ok, _reason = should_embed_chunk(content, **fkw)
                    if not ok:
                        continue
                    chunk_id = unit["chunk_id"]
                    if emit_chunks:
                        chunk_rows.append(
                            {
                                "kind": "chunk",
                                "chunk_id": chunk_id,
                                "document_id": doc_id,
                                # explicit Nones: a column absent from the
                                # dicts would concat as float NaN, which
                                # Arrow cannot convert for ArrayType
                                "name": None,
                                "type": None,
                                "target": None,
                                "description": None,
                                "importance": None,
                                "strength": None,
                                "source_chunks": None,
                                "url": url,
                                "content": content,
                                # structure blocks carry a real page number
                                # (pdf pages); it overrides the offset-derived
                                # one, same as chunk_pages' structure branch
                                "page": (
                                    meta["page"]
                                    if meta.get("page") is not None
                                    else unit["page"]
                                ),
                                "start_offset": unit["start_offset"],
                                "end_offset": unit["end_offset"],
                                "chunk_index": unit["chunk_index"],
                                "content_hash": unit["content_hash"],
                                "heading_path": meta.get("heading_path"),
                                "section_title": meta.get("section_title"),
                            }
                        )
                    entities, relationships = extract_chunk_with_gleaning(
                        content, chunk_id, llm, max_gleanings=max_gleanings
                    )
                    for e in entities:
                        emit(
                            "entity", chunk_id, doc_id, e["name"], e["type"], None,
                            e["description"], e["importance_score"], None,
                            e["source_chunks"],
                        )
                    for r in relationships:
                        emit(
                            "relationship", chunk_id, doc_id, r["source_entity"],
                            r["relationship_type"], r["target_entity"],
                            r["description"], None, r["strength"], r["source_chunks"],
                        )
            if not kind and not chunk_rows:
                # a batch where every chunk was filtered (or extraction found
                # nothing) must yield NOTHING: an all-empty dict-of-lists
                # frame defaults every column to float64, and Arrow cannot
                # cast an empty float64 ndarray to list<string> for
                # source_chunks (surfaced by short structure_hybrid docs)
                continue
            mentions_pdf = pd.DataFrame(
                {
                    "kind": kind,
                    "chunk_id": chunk_ids,
                    "document_id": doc_ids,
                    "name": names,
                    "type": types,
                    "target": targets,
                    "description": descriptions,
                    "importance": pd.array(importances, dtype="float64"),
                    "strength": pd.array(strengths, dtype="float64"),
                    "source_chunks": provs,
                }
            )
            if not emit_chunks:
                yield mentions_pdf
                continue
            out_cols = [f.name for f in UNIFIED_SCHEMA.fields]
            for c in out_cols:
                if c not in mentions_pdf.columns:
                    mentions_pdf[c] = None
            chunks_pdf = pd.DataFrame(chunk_rows, columns=out_cols)
            # Align dtypes BEFORE concat: an all-NA object column on one
            # side of a concat with a typed column on the other is a pandas
            # FutureWarning today and a dtype change on the next major.
            # Nullable Int for the offset fields also keeps Arrow happy
            # (float64-with-NaN does not convert to an int Spark column).
            dtypes = {"importance": "float64", "strength": "float64",
                      "page": "Int32", "chunk_index": "Int32",
                      "start_offset": "Int64", "end_offset": "Int64"}
            # .copy(): mentions_pdf[out_cols] is a slice — mutating it below
            # would raise SettingWithCopyWarning per column per batch
            parts = [
                p for p in (mentions_pdf[out_cols].copy(), chunks_pdf) if len(p)
            ]
            if not parts:
                continue
            for p in parts:
                for c, dt in dtypes.items():
                    p[c] = pd.array(p[c], dtype=dt)
            both = (
                parts[0].copy()
                if len(parts) == 1
                else pd.concat(parts, ignore_index=True)
            )
            yield both

    schema = UNIFIED_SCHEMA if emit_chunks else MENTION_SCHEMA
    return pages.select(*cols).mapInPandas(_run, schema)


def entity_mentions(mentions: DataFrame) -> DataFrame:
    return mentions.where(F.col("kind") == "entity").select(
        "chunk_id",
        "document_id",
        "name",
        "type",
        "description",
        F.col("importance").alias("importance_score"),
        "source_chunks",
    )


def relationship_mentions(mentions: DataFrame) -> DataFrame:
    return mentions.where(F.col("kind") == "relationship").select(
        "chunk_id",
        "document_id",
        F.col("name").alias("source_entity"),
        F.col("target").alias("target_entity"),
        F.col("type").alias("relationship_type"),
        "description",
        "strength",
        "source_chunks",
    )


# ---------------------------------------------------------------------------
# S6: per-document consolidation + canonicalization (C1-C6, X9, X10)
# ---------------------------------------------------------------------------


def _union_sorted_chunks(col_name: str, cap: int | None):
    arr = F.array_sort(F.array_distinct(F.flatten(F.collect_list(F.col(col_name)))))
    if cap is not None:
        arr = F.slice(arr, 1, cap)
    return arr


def _desc_set_union():
    """Sorted set-union of newline-split, non-empty descriptions, '\\n'-joined.

    entity_graph.py:163-167 / :261-269 — descriptions accumulate as a sorted,
    deduplicated newline-joined set.
    """
    parts = F.flatten(F.collect_list(F.split(F.col("description"), "\n")))
    cleaned = F.array_sort(
        F.array_distinct(F.filter(F.transform(parts, lambda x: F.trim(x)), lambda x: x != ""))
    )
    return F.array_join(cleaned, "\n")


def consolidate_entities_per_doc(
    ents: DataFrame, provenance_cap: int | None = None
) -> DataFrame:
    """X9 global dedup + entity-dict collapse, per document.

    Stage 1 — key (lower(name), type) (entity_extraction.py:494):
    merge provenance, keep longest description, mean importance.
    Stage 2 — key name only (dict at entity_extraction.py:1147): one
    representative per name (type divergence documented above), then the
    EntityGraph merge (C3) which — with one row per (name) — reduces to
    identity, so both stages fuse into the aggregations below.
    """
    stage1 = (
        ents.groupBy("document_id", F.lower(F.col("name")).alias("name_key"), "type")
        .agg(
            F.first("name").alias("name"),
            F.max_by("description", F.length("description")).alias("description"),
            F.avg("importance_score").alias("importance_score"),
            _union_sorted_chunks("source_chunks", provenance_cap).alias("source_chunks"),
            F.count(F.lit(1)).alias("mention_count"),
        )
        .drop("name_key")
    )
    # stage 2: one row per (document_id, upper(name)) — reference dict keyed
    # on entity.name.upper().strip() keeps a single representative.
    w_key = F.upper(F.trim(F.col("name")))
    stage2 = (
        stage1.withColumn("name_key", w_key)
        .groupBy("document_id", "name_key")
        .agg(
            F.first("name").alias("name"),
            F.max("type").alias("type"),
            F.max_by("description", F.length("description")).alias("description"),
            F.avg("importance_score").alias("importance_score"),
            _union_sorted_chunks("source_chunks", provenance_cap).alias("source_chunks"),
            F.sum("mention_count").alias("mention_count"),
        )
        .drop("name_key")
    )
    return stage2


def consolidate_relationships_per_doc(
    rels: DataFrame,
    entities_doc: DataFrame,
    strength_threshold: float = 0.4,
    provenance_cap: int | None = None,
) -> DataFrame:
    """X10 endpoint check + C2 strength gate + C4 relationship merge.

    Endpoint semi-joins implement entity_extraction.py:1152-1163 (drop
    relationships whose source or target is not an extracted entity — keys
    are upper().strip() which the parser normalization already guarantees).
    Then strength >= 0.4 (document_processor.py:1110-1125) and the directed
    (source, target, rel_type) merge with strength SUM
    (entity_graph.py:255-262).
    """
    # Endpoint existence as ONE join against a per-document name-set table
    # instead of two left-semi joins: Catalyst cannot share the build side
    # between two semi-joins, so the r1-r7 shape physically re-ran the whole
    # entity consolidation chain (2 exchanges + 3 sort aggregates) once per
    # endpoint — the dominant cost of the canonicalization stage (plan audit
    # r8; 1.95 s -> 1.33 s at sf0.1 with byte-identical rels_doc/triples).
    # Set sizes are bounded by entities-per-document (chunks-per-doc bounded),
    # so the collect_set buffer is not a mega-key risk.
    name_sets = entities_doc.groupBy("document_id").agg(
        F.collect_set(F.upper(F.trim(F.col("name")))).alias("__enames")
    )
    keyed = rels.withColumn("skey", F.upper(F.trim(F.col("source_entity")))).withColumn(
        "tkey", F.upper(F.trim(F.col("target_entity")))
    )
    present = (
        keyed.join(name_sets, "document_id")
        .where(
            F.array_contains(F.col("__enames"), F.col("skey"))
            & F.array_contains(F.col("__enames"), F.col("tkey"))
        )
        .drop("__enames")
    )
    gated = present.where(F.col("strength") >= strength_threshold)
    return (
        gated.groupBy(
            "document_id", "source_entity", "target_entity", "relationship_type"
        )
        .agg(
            F.sum("strength").alias("strength"),
            _desc_set_union().alias("description"),
            _union_sorted_chunks("source_chunks", provenance_cap).alias("source_chunks"),
            F.count(F.lit(1)).alias("mention_count"),
        )
    )


def orphan_entities_per_doc(
    rels_doc: DataFrame, entities_doc: DataFrame
) -> DataFrame:
    """C5 — endpoints that resolve to no entity by name become orphan rows
    (type '', importance 0, mention_count 0, is_orphan=true;
    entity_graph.py:292-341). Empty by construction after the consolidation
    endpoint check; real for the direct-persistence path and exercised by
    the F4 fixtures.
    """
    endpoints = (
        rels_doc.select("document_id", F.col("source_entity").alias("name"))
        .unionByName(rels_doc.select("document_id", F.col("target_entity").alias("name")))
        .withColumn("name_key", F.upper(F.trim(F.col("name"))))
        .dropDuplicates(["document_id", "name_key"])
    )
    known = entities_doc.select(
        "document_id", F.upper(F.trim(F.col("name"))).alias("name_key")
    ).distinct()
    missing = endpoints.join(known, ["document_id", "name_key"], "left_anti")
    return missing.select(
        "document_id",
        F.trim(F.col("name")).alias("name"),
        F.lit("").alias("type"),
        F.lit("").alias("description"),
        F.lit(0.0).alias("importance_score"),
        F.array().cast(ArrayType(StringType())).alias("source_chunks"),
        F.lit(0).cast("long").alias("mention_count"),
        F.lit(True).alias("is_orphan"),
    )


def canonicalize(
    mentions: DataFrame,
    importance_threshold: float = 0.3,
    strength_threshold: float = 0.4,
    provenance_cap: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Full S6: mentions → (entities_doc, relationships_doc).

    Importance gate per document_processor.py:1096-1108 applied after
    consolidation, before graph assembly (a no-op in practice because the
    low-value filter already dropped importance<0.3 — kept for parity).
    """
    ents = entity_mentions(mentions)
    rels = relationship_mentions(mentions)

    entities_doc = consolidate_entities_per_doc(ents, provenance_cap).where(
        F.col("importance_score") >= importance_threshold
    )
    rels_doc = consolidate_relationships_per_doc(
        rels, entities_doc, strength_threshold, provenance_cap
    )
    orphans = orphan_entities_per_doc(rels_doc, entities_doc)
    entities_doc = entities_doc.withColumn("is_orphan", F.lit(False)).unionByName(
        orphans
    )
    return entities_doc, rels_doc


# ---------------------------------------------------------------------------
# S8: global node/edge/triple materialization
# ---------------------------------------------------------------------------


# global tables default to a bounded provenance union: an uncapped
# collect_list for a mega-entity ("THE" across 10^12 docs) materializes the
# whole provenance in ONE aggregation buffer — the same trap class as the
# round-1 CC collect_set. Per-doc consolidations stay uncapped by default
# (bounded by chunks-per-document).
DEFAULT_GLOBAL_PROVENANCE_CAP = 1000


def capped_provenance(
    df: DataFrame,
    key_cols: list[str],
    chunk_col: str = "source_chunks",
    cap: int = DEFAULT_GLOBAL_PROVENANCE_CAP,
    buckets: int = 32,
) -> DataFrame:
    """(key_cols..., source_chunks) with the lexicographically-first ``cap``
    distinct chunk ids per key, computed with BOUNDED aggregation buffers.

    Slice-after-collect_list still materializes the full set in one reduce
    buffer; this instead distincts exploded (key, chunk) rows, pre-reduces
    per (key, hash-bucket) with a per-bucket slice (buffer <= cap), then
    merges the <= buckets*cap survivors per key (buffer <= buckets*cap).
    Result is identical to slice(sorted_union, cap) because the global
    lexicographic minimum cap elements survive their buckets."""
    exploded = (
        df.select(*key_cols, F.explode_outer(F.col(chunk_col)).alias("__chunk"))
        .where(F.col("__chunk").isNotNull())
        .distinct()
    )
    per_bucket = (
        exploded.withColumn("__b", F.pmod(F.xxhash64("__chunk"), F.lit(buckets)))
        .groupBy(*key_cols, "__b")
        .agg(F.slice(F.array_sort(F.collect_list("__chunk")), 1, cap).alias("__part"))
    )
    return per_bucket.groupBy(*key_cols).agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("__part"))), 1, cap
        ).alias(chunk_col)
    )


def build_nodes(
    entities_doc: DataFrame,
    provenance_cap: int = DEFAULT_GLOBAL_PROVENANCE_CAP,
) -> DataFrame:
    """Global entity table: MERGE-by-name across documents (graph_db MERGE
    (e:Entity {name}) — entity_graph.py:445-458); id = md5(lower(name))[:16]
    (entity_graph.py:400-404). Same-name/different-type collapses here, as in
    the reference's persistence layer. Provenance is union-sorted and capped
    through bounded buffers (capped_provenance)."""
    main = (
        entities_doc.groupBy(F.col("name"))
        .agg(
            F.max("type").alias("type"),
            F.max_by("description", F.length("description")).alias("description"),
            F.avg("importance_score").alias("importance_score"),
            F.sum("mention_count").alias("mention_count"),
            F.min(F.col("is_orphan").cast("int")).cast("boolean").alias("is_orphan"),
            F.countDistinct("document_id").alias("doc_count"),
        )
        .withColumn("entity_id", F.substring(F.md5(F.lower(F.col("name"))), 1, 16))
    )
    prov = capped_provenance(entities_doc, ["name"], cap=provenance_cap)
    return main.join(prov, "name", "left").withColumn(
        "source_chunks",
        F.coalesce(F.col("source_chunks"), F.array().cast("array<string>")),
    )


def build_edges(
    rels_doc: DataFrame,
    provenance_cap: int = DEFAULT_GLOBAL_PROVENANCE_CAP,
) -> DataFrame:
    """Global RELATED_TO edges keyed on (source, target, type) — directed, as
    entity_graph MERGE (source)-[r:RELATED_TO {type}]->(target)
    (entity_graph.py:461-473). Cross-document strength is summed (the
    reference's SET-last-writer is doc-order-dependent; sum is the
    deterministic, associative choice — triple identity unaffected)."""
    keyed = rels_doc.select(
        F.col("source_entity").alias("subj"),
        F.col("target_entity").alias("obj"),
        F.col("relationship_type").alias("rel_type"),
        "strength",
        "mention_count",
        "document_id",
        "source_chunks",
    )
    main = (
        keyed.groupBy("subj", "obj", "rel_type")
        .agg(
            F.sum("strength").alias("strength"),
            F.sum("mention_count").alias("mention_count"),
            F.countDistinct("document_id").alias("doc_count"),
        )
        .withColumn("edge_type", F.lit("RELATED_TO"))
        .withColumn("source_id", F.substring(F.md5(F.lower(F.col("subj"))), 1, 16))
        .withColumn("target_id", F.substring(F.md5(F.lower(F.col("obj"))), 1, 16))
    )
    prov = capped_provenance(keyed, ["subj", "obj", "rel_type"], cap=provenance_cap)
    return main.join(prov, ["subj", "obj", "rel_type"], "left").withColumn(
        "source_chunks",
        F.coalesce(F.col("source_chunks"), F.array().cast("array<string>")),
    )


def build_triples(edges: DataFrame) -> DataFrame:
    """(subj, pred, obj) — the P/R comparison surface (BASELINE.json)."""
    return edges.select(
        F.col("subj"), F.col("rel_type").alias("pred"), F.col("obj")
    ).distinct()


def mentions_table(entities_doc: DataFrame) -> DataFrame:
    """J4 — CONTAINS_ENTITY (chunk→entity) by exploding provenance
    (core/graph_db.py:3908-3958)."""
    return (
        entities_doc.select(
            F.substring(F.md5(F.lower(F.col("name"))), 1, 16).alias("entity_id"),
            F.explode(F.col("source_chunks")).alias("chunk_id"),
        )
        .distinct()
    )


def entity_counts_per_chunk(mentions: DataFrame) -> DataFrame:
    """Per-chunk extraction yield, input to T6 chunk removal and J6 metrics."""
    return mentions.groupBy("chunk_id").agg(
        F.sum(F.when(F.col("kind") == "entity", 1).otherwise(0)).alias("entity_count"),
        F.sum(F.when(F.col("kind") == "relationship", 1).otherwise(0)).alias(
            "relationship_count"
        ),
    )
