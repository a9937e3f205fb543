"""S1-S3: HTML→text extraction, chunking, content filtering, quality scoring.

Spark-first design notes (scale rationale in SURVEY §4/§7):
- html→text and chunking are row-multiplying, CPU-bound, chunk-local →
  Arrow-batched ``mapInPandas``; no shuffle is introduced, partition layout
  of the pages scan is preserved.
- content filtering (T7, ingestion/content_filters.py:86-198) and quality
  scoring (T5, core/ocr.py:162-297) are pure per-row math → expressed as
  built-in column expressions (JVM/whole-stage-codegen, no Python), with the
  pure-Python twins in functions/quality.py serving as test oracles.
- The pages input is repartitioned by ``pmod(xxhash64(url), N)`` before the
  heavy UDF stages so Zipf-headed domains can't serialize a partition
  (north_rule skew requirement).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..config import ChunkingConfig, ContentFilterConfig
from ..functions.charsets import to_text
from ..functions.chunking import chunk_document
from ..functions.html_text import HtmlHeadingChunker, extract_plain_text

# ---------------------------------------------------------------------------
# S1: plain-text extraction (T1 — core/html_chunker.py:88-91)
# ---------------------------------------------------------------------------


def document_id_for_url(url: str) -> str:
    """Stable document id = md5(url).

    The reference keys documents on md5(path+mtime)
    (ingestion/document_processor.py:312-321); for the immutable
    (url, warc_ts) web-page input we key on the url alone so re-crawls of the
    same url overwrite (J5 incremental path diffs on content_hash).
    """
    return hashlib.md5(url.encode("utf-8", "replace")).hexdigest()


def repartition_by_url(df: DataFrame, num_partitions: int, salt: int = 1) -> DataFrame:
    """Salted url-hash repartition for head-domain skew (SURVEY §4).

    ``salt > 1`` spreads rows of a single hot key range across ``salt``
    buckets; with hashing on full url the key space is already fine-grained,
    so salt only matters when callers later co-group by domain.

    The partitioning KEY keeps 64x more distinct values than output
    partitions: hashing a key with exactly ``num_partitions`` values into
    ``num_partitions`` buckets leaves ~1/e of the partitions empty and
    loads others 2-4x (balls-in-bins — the guide's synthetic-key trap,
    measured r8: 122/192 partitions non-empty, max 226 rows vs 52 median,
    a straggler tail on the Python-heavy stage downstream).
    """
    key = F.pmod(F.xxhash64(F.col("url")), F.lit(num_partitions * salt * 64))
    return df.repartition(num_partitions, key)


def extract_text(pages: DataFrame, html_col: str = "html", out_col: str = "text") -> DataFrame:
    """Decode the html binary column to plain text (T1).

    Bytes → str rides the WHATWG charset sniffer (r7,
    functions/charsets.py): BOM, meta prescan, strict-UTF-8 with a
    windows-1252 fallback — a crawl is ~5% legacy-encoded and a flat
    utf-8/replace mojibakes those pages into the corpus. Undeclared
    valid UTF-8 decodes exactly as before; a page DECLARING a legacy
    charset now follows its declaration like a browser would, even when
    its bytes happen to be valid UTF-8."""

    @F.pandas_udf(StringType())
    def _extract(html: pd.Series) -> pd.Series:
        return html.map(lambda b: extract_plain_text(to_text(b)))

    return pages.withColumn(out_col, _extract(F.col(html_col)))


# ---------------------------------------------------------------------------
# S2: chunking (T2 html_heading / T3 legacy recursive, T4 ids+offsets)
# ---------------------------------------------------------------------------

CHUNK_SCHEMA = StructType(
    [
        StructField("chunk_id", StringType(), False),
        StructField("document_id", StringType(), False),
        StructField("url", StringType(), True),
        StructField("content", StringType(), False),
        StructField("page", IntegerType(), True),
        StructField("start_offset", IntegerType(), True),
        StructField("end_offset", IntegerType(), True),
        StructField("chunk_index", IntegerType(), False),
        StructField("content_hash", StringType(), False),
        StructField("heading_path", StringType(), True),
        StructField("section_title", StringType(), True),
    ]
)


def chunk_pages(
    pages: DataFrame,
    strategy: str = "html_heading",
    cfg: ChunkingConfig | None = None,
    id_col: str = "url",
    html_col: str = "html",
    text_col: str = "text",
    binary_col: str = "binary",
) -> DataFrame:
    """Chunk pages into TextUnits (one output row per chunk).

    strategy='html_heading' replicates HtmlHeadingChunker.chunk_html
    (core/html_chunker.py:93-124); 'legacy' replicates the recursive splitter
    (core/chunking.py:260-264); 'structure_hybrid' is the docling_hybrid
    analog (core/chunking.py:149-158 + core/docling_chunker.py): structured
    blocks parsed from the ``binary_col`` payload (docx headings/tables, pdf
    pages) are packed by StructureHybridChunker, and rows whose payload
    yields no structure fall back to legacy per the reference's
    _resolve_chunking_strategy downgrade (core/chunking.py:288-292).
    Stable ids {doc}_tu_{start}_{end}_{sha1[:8]}
    per core/chunking.py:508-513. Chunk-local => mapInPandas, no shuffle.
    """
    cfg = cfg or ChunkingConfig()
    use_html = strategy == "html_heading"
    use_structure = strategy == "structure_hybrid"
    target, minimum, maximum, overlap = (
        cfg.chunk_target_tokens,
        cfg.chunk_min_tokens,
        cfg.chunk_max_tokens,
        cfg.chunk_overlap_tokens,
    )
    chunk_size, chunk_overlap = cfg.chunk_size, cfg.chunk_overlap
    include_heading = cfg.include_heading_path

    if use_structure and binary_col not in pages.columns:
        # without the payload column EVERY row would take the per-document
        # legacy downgrade — that silent corpus-wide misconfiguration should
        # be a plan-time error (the per-row downgrade is for documents whose
        # payload yields no structure, not for a missing column)
        raise ValueError(
            f"strategy='structure_hybrid' needs the '{binary_col}' payload "
            f"column (have: {pages.columns}); load with keep_binary=True"
        )
    cols = (
        [id_col]
        + ([html_col] if use_html else [])
        + ([binary_col] if use_structure else [])
        + [text_col]
    )
    # always carry text when available for offset assignment
    cols = list(dict.fromkeys([c for c in cols if c in pages.columns]))

    def _chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.chunking import StructureHybridChunker, assign_text_units
        from ..functions.docformats import decode_document, document_blocks

        chunker = HtmlHeadingChunker(target, minimum, maximum, overlap, include_heading)
        structure_chunker = StructureHybridChunker(
            target, minimum, maximum, overlap, include_heading
        )
        for pdf in batches:
            rows: list[dict] = []
            for rec in pdf.itertuples(index=False):
                url = getattr(rec, id_col)
                doc_id = document_id_for_url(str(url))
                if use_html:
                    raw = getattr(rec, html_col)
                    html = to_text(raw)  # charset-sniffing decode (r7)
                    pieces = chunker.chunk_html(html)
                    base_text = (
                        getattr(rec, text_col, None) if text_col in pdf.columns else None
                    ) or extract_plain_text(html)
                    units = assign_text_units(doc_id, base_text, [p["text"] for p in pieces])
                    for unit, piece in zip(units, pieces):
                        meta = piece["metadata"]
                        rows.append(
                            {
                                **unit,
                                "url": str(url),
                                "heading_path": meta.get("heading_path"),
                                "section_title": meta.get("section_title"),
                            }
                        )
                elif use_structure:
                    raw = getattr(rec, binary_col, None) if binary_col in pdf.columns else None
                    data = bytes(raw) if isinstance(raw, (bytes, bytearray)) else None
                    blocks = document_blocks(data, str(url)) if data else None
                    base_text = (
                        getattr(rec, text_col, None) if text_col in pdf.columns else None
                    ) or (decode_document(data, str(url)) if data else None) or ""
                    if blocks:
                        pieces = structure_chunker.chunk_blocks(blocks)
                        units = assign_text_units(
                            doc_id, base_text, [p["text"] for p in pieces]
                        )
                        for unit, piece in zip(units, pieces):
                            meta = piece["metadata"]
                            row = {
                                **unit,
                                "url": str(url),
                                "heading_path": meta.get("heading_path"),
                                "section_title": meta.get("section_title"),
                            }
                            if meta.get("page") is not None:
                                row["page"] = meta["page"]
                            rows.append(row)
                    else:
                        # structure unavailable → legacy downgrade
                        # (core/chunking.py:288-292)
                        for unit in chunk_document(
                            doc_id, base_text, chunk_size, chunk_overlap
                        ):
                            rows.append(
                                {
                                    **unit,
                                    "url": str(url),
                                    "heading_path": None,
                                    "section_title": None,
                                }
                            )
                else:
                    text = getattr(rec, text_col) or ""
                    for unit in chunk_document(doc_id, text, chunk_size, chunk_overlap):
                        rows.append(
                            {**unit, "url": str(url), "heading_path": None, "section_title": None}
                        )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in CHUNK_SCHEMA.fields],
            )

    return pages.select(*cols).mapInPandas(_chunk, CHUNK_SCHEMA)


# ---------------------------------------------------------------------------
# S3: content filter (T7) — pure column expressions, JVM-side
# ---------------------------------------------------------------------------


def with_content_filter(
    chunks: DataFrame,
    content_col: str = "content",
    cfg: ContentFilterConfig | None = None,
) -> DataFrame:
    """Adds ``filter_reason`` (null = keep). Mirrors should_embed_chunk
    (ingestion/content_filters.py:127-171 + :200-283), generic text path, as
    whole-stage-codegen column expressions — zero Python in the hot path.

    Reason labels match the reference's FilterMetrics categories
    (content_filters.py:23-58): too_short, too_long, repetitive,
    bad_char_distribution.
    """
    cfg = cfg or ContentFilterConfig()
    c = F.trim(F.col(content_col))
    length = F.length(c)
    words = F.split(c, r"\s+")
    n_words = F.size(words)
    unique_ratio = F.size(F.array_distinct(words)) / n_words
    first_word = F.lower(F.element_at(words, 1))
    # count of words equal (case-folded) to the first word. NOT
    # F.filter(words, lambda w: lower(w) == first_word): an interpreted
    # higher-order filter re-evaluates the captured first_word expression —
    # which embeds the full split — once PER ELEMENT, making the predicate
    # O(words^2) per row (measured r8: this one expression was 2.6 s of the
    # 2.8 s content-filter pass at sf0.1). array_remove evaluates both
    # operands once and scans linearly; count = |words| - |words without
    # first_word|, value-identical (pinned by the DuckDB oracle and the
    # quality.py twin tests).
    lowered = F.transform(words, lambda w: F.lower(w))
    first_word_count = F.size(lowered) - F.size(F.array_remove(lowered, first_word))
    # character classes: \p{L}\p{N} ≈ Python str.isalnum (exact on ASCII)
    alnum = F.length(F.regexp_replace(c, r"[^\p{L}\p{N}]", ""))
    space = F.length(F.regexp_replace(c, r"[^\s]", ""))
    special = length - alnum - space

    reason = (
        F.when(length < cfg.min_chunk_length, F.lit("too_short"))
        .when(length > cfg.max_chunk_length, F.lit("too_long"))
        .when(n_words == 0, F.lit("repetitive"))
        .when(unique_ratio < cfg.min_unique_word_ratio, F.lit("repetitive"))
        .when(
            (n_words >= 4) & ((first_word_count / n_words) > 0.7),
            F.lit("repetitive"),
        )
        .when(
            (alnum / length) < cfg.min_alphanumeric_ratio,
            F.lit("bad_char_distribution"),
        )
        .when(
            (special / length) > cfg.max_special_char_ratio,
            F.lit("bad_char_distribution"),
        )
        .otherwise(F.lit(None).cast(StringType()))
    )
    return chunks.withColumn("filter_reason", reason)


def filter_chunks(chunks: DataFrame, content_col: str = "content", cfg: ContentFilterConfig | None = None) -> DataFrame:
    """Keep only chunks passing the content filter."""
    return (
        with_content_filter(chunks, content_col, cfg)
        .where(F.col("filter_reason").isNull())
        .drop("filter_reason")
    )


def filter_metrics(chunks: DataFrame, content_col: str = "content", cfg: ContentFilterConfig | None = None) -> DataFrame:
    """Histogram of filter reasons (content_filters.py:23-70 FilterMetrics)."""
    return (
        with_content_filter(chunks, content_col, cfg)
        .groupBy(F.coalesce(F.col("filter_reason"), F.lit("passed")).alias("reason"))
        .agg(F.count(F.lit(1)).alias("n_chunks"))
    )


# ---------------------------------------------------------------------------
# T5: quality scoring — column expressions (oracle: functions/quality.py)
# ---------------------------------------------------------------------------


def with_quality_score(chunks: DataFrame, content_col: str = "content") -> DataFrame:
    """Adds ``quality_score`` replicating core/ocr.py:162-258 JVM-side.

    score = text_ratio*0.4 + (1-ws_ratio)*0.3 + min(words_per_line/5,1)*0.3
    with multiplicative penalties (non-ASCII ×0.8, fragmented ×0.7,
    triple-space ×0.9, short ×0.6); 0.0 for len(strip)<5.
    """
    c = F.col(content_col)
    total = F.length(c)
    alnum = F.length(F.regexp_replace(c, r"[^\p{L}\p{N}]", ""))
    space = F.length(F.regexp_replace(c, r"[^\s]", ""))
    text_ratio = alnum / total
    ws_ratio = space / total

    lines = F.filter(
        F.transform(F.split(c, "\n"), lambda x: F.trim(x)), lambda x: x != ""
    )
    total_words = F.aggregate(
        lines, F.lit(0), lambda acc, x: acc + F.size(F.split(x, r"\s+"))
    )
    avg_wpl = F.when(F.size(lines) > 0, total_words / F.size(lines)).otherwise(F.lit(0.0))

    has_artifacts = c.rlike(r"[^\x00-\x7F]")
    # NB: Java's \W is ASCII-only; Python's re is Unicode — use the explicit
    # Unicode class so both agree on fragmented-word counting
    n_short_words = F.size(
        F.filter(F.split(c, r"[^\p{L}\p{N}_]+"), lambda w: (F.length(w) >= 1) & (F.length(w) <= 2))
    )
    has_fragmented = n_short_words > (total * F.lit(0.1))
    has_triple_space = c.contains("   ")

    base = (
        text_ratio * 0.4
        + (F.lit(1.0) - ws_ratio) * 0.3
        + F.least(avg_wpl / 5, F.lit(1.0)) * 0.3
    )
    score = (
        base
        * F.when(has_artifacts, 0.8).otherwise(1.0)
        * F.when(has_fragmented, 0.7).otherwise(1.0)
        * F.when(has_triple_space, 0.9).otherwise(1.0)
        * F.when(total < 30, 0.6).otherwise(1.0)
    )
    score = F.when(F.length(F.trim(c)) < 5, F.lit(0.0)).otherwise(score)
    return chunks.withColumn("quality_score", score)


def post_entity_chunk_removal(
    chunks: DataFrame,
    entity_counts: DataFrame,
    content_col: str = "content",
) -> DataFrame:
    """T6 — drop chunks by quality + extraction yield (core/ocr.py:300-330).

    ``entity_counts``: (chunk_id, entity_count, relationship_count). Chunks
    missing from it count as 0/0. Broadcast-joinable in practice (counts are
    small); left join + filter keeps the plan shuffle-light.
    """
    scored = with_quality_score(chunks, content_col)
    joined = scored.join(entity_counts, on="chunk_id", how="left").fillna(
        {"entity_count": 0, "relationship_count": 0}
    )
    keep = ~(
        (
            (F.col("quality_score") < 0.2)
            & (F.col("entity_count") == 0)
            & (F.col("relationship_count") == 0)
        )
        | (
            (F.length(F.trim(F.col(content_col))) < 30)
            & (F.col("entity_count") == 0)
        )
    )
    return joined.where(keep).drop("quality_score", "entity_count", "relationship_count")
