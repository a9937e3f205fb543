"""T10: document summary / classification + category propagation to chunks.

Reference:
- core/document_summarizer.py:183-320 (extract_summary): first
  ``summarization_batch_size`` (20) chunks joined by "\\n\\n"; content over
  15000 chars truncated to the first 12000 with a sentence-boundary trim
  when the last period falls after char 10000; LLM returns
  {summary, document_type, hashtags} with document_type drawn from the
  DOCUMENT_TYPES list (document_summarizer.py:14-60).
- ingestion/document_processor.py:813-903 (classify_document_categories):
  LLM returns {categories, confidence, keywords, difficulty} from the first
  1200 chars.
- ingestion/document_processor.py:1508-1554: the applied category is
  categories[0] when confidence >= classification_confidence_threshold
  (0.7, settings.py:344) else classification_default_category ('general',
  settings.py:348), then propagated onto every chunk's metadata.

Spark shape (same seam pattern as C7/T8): per-document content assembly is
pure JVM — a bounded per-doc collect_list (<= batch_size rows, no skew) +
concat + the truncation rules as column expressions — and the LLM is an
injectable BATCH callable crossing to Python once per Arrow batch via
mapInPandas. The default callables are deterministic, network-free
stand-ins; a real LLM client drops into the identical seam.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# core/document_summarizer.py:14-60 — the classification ontology the
# reference prompts with (behavioral constant, copied by necessity).
DOCUMENT_TYPES = [
    "quote", "invoice", "receipt", "purchase_order", "contract",
    "agreement", "report", "financial_report", "research_report",
    "business_report", "technical_report", "resume", "cv", "cover_letter",
    "insurance_document", "insurance_policy", "claim_form", "medical_record",
    "prescription", "legal_document", "court_document", "deed", "will",
    "power_of_attorney", "academic_paper", "thesis", "dissertation",
    "article", "blog_post", "news_article", "press_release", "other",
]

# (summary, document_type, hashtags) per document content
DocSummarizerFn = Callable[[list[str]], list[dict]]
# (categories, confidence, keywords, difficulty) per document content
DocClassifierFn = Callable[[list[str]], list[dict]]


def assemble_document_content(
    chunks: DataFrame,
    doc_col: str = "document_id",
    content_col: str = "content",
    index_col: str = "chunk_index",
    batch_size: int = 20,
) -> DataFrame:
    """(document_id, content): first ``batch_size`` chunks joined by \\n\\n,
    then the reference's smart truncation (document_summarizer.py:248-258).

    All JVM: the per-doc collect_list is bounded by batch_size so no
    aggregation-buffer skew; truncation is substring/instr expressions.
    """
    assembled = (
        chunks.where(F.col(index_col) < batch_size)
        .groupBy(F.col(doc_col).alias("document_id"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col(index_col).alias("i"), F.col(content_col).alias("c"))
                        )
                    ),
                    lambda s: s["c"],
                ),
                "\n\n",
            ).alias("full_content")
        )
    )
    prefix = F.substring("full_content", 1, 12000)
    # last '.' position inside the 12000-char prefix via reverse+instr
    rev_pos = F.instr(F.reverse(prefix), ".")
    last_period = F.lit(12001) - rev_pos
    truncated = F.when(
        (rev_pos > 0) & (last_period > 10000),
        F.substring("full_content", 1, last_period.cast("int")),
    ).otherwise(prefix)
    content = F.when(F.length("full_content") > 15000, truncated).otherwise(
        F.col("full_content")
    )
    return assembled.select("document_id", content.alias("content"))


def _md5_lower64(text: str) -> int:
    """Little-endian uint64 of md5 bytes 8..16 — bit-identical to DuckDB's
    md5_number_lower, so the deterministic stand-ins below admit exact SQL
    oracles (same trick as operators/dedup.simhash_fingerprints)."""
    return int.from_bytes(
        hashlib.md5(text.encode("utf-8", "replace")).digest()[8:], "little"
    )


def _hash_pick(text: str, options: list[str]) -> str:
    return options[_md5_lower64(text) % len(options)]


def deterministic_doc_summarizer(contents: list[str]) -> list[dict]:
    """LLM stand-in: summary = leading sentences up to 1000 chars,
    document_type = content-hash pick from DOCUMENT_TYPES, hashtags = the 5
    longest distinct lowercased words. Pure in content."""
    out = []
    for c in contents:
        c = c or ""
        summary = c[:1000]
        cut = summary.rfind(".")
        if cut > 200:
            summary = summary[: cut + 1]
        words = sorted({w.lower().strip(".,;:!?") for w in c.split() if len(w) > 5})
        tags = [f"#{w}" for w in sorted(words, key=lambda w: (-len(w), w))[:5]]
        out.append(
            {
                "summary": summary,
                "document_type": _hash_pick(c, DOCUMENT_TYPES),
                "hashtags": tags,
            }
        )
    return out


def deterministic_doc_classifier(contents: list[str]) -> list[dict]:
    """LLM stand-in mirroring classify_document_categories' output contract
    (document_processor.py:813-903): first 1200 chars drive a deterministic
    category + confidence. Confidence lands in [0.5, 1.0) so fixtures can
    exercise both sides of the 0.7 gate."""
    out = []
    for c in contents:
        head = (c or "")[:1200]
        h = _md5_lower64(head)
        categories = [_hash_pick(head, ["install", "admin", "security", "api", "general"])]
        out.append(
            {
                "categories": categories,
                "confidence": 0.5 + (h % 50) / 100.0,
                "keywords": sorted({w.lower() for w in head.split()[:40] if len(w) > 6})[:6],
                "difficulty": _hash_pick(head + "d", ["beginner", "intermediate", "advanced"]),
            }
        )
    return out


_SUMMARY_SCHEMA = (
    "document_id string, summary string, document_type string, hashtags array<string>"
)
_CLASSIFY_SCHEMA = (
    "document_id string, categories array<string>, confidence double, "
    "keywords array<string>, difficulty string"
)


def summarize_documents(
    chunks: DataFrame,
    summarizer: DocSummarizerFn = deterministic_doc_summarizer,
    batch_size: int = 20,
) -> DataFrame:
    """T10 summary leg → (document_id, summary, document_type, hashtags)."""
    docs = assemble_document_content(chunks, batch_size=batch_size)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            res = summarizer(pdf["content"].fillna("").tolist())
            yield pd.DataFrame(
                {
                    "document_id": pdf["document_id"].values,
                    "summary": [r["summary"] for r in res],
                    "document_type": [r["document_type"] for r in res],
                    "hashtags": [r["hashtags"] for r in res],
                }
            )

    return docs.mapInPandas(_run, _SUMMARY_SCHEMA)


def classify_documents(
    chunks: DataFrame,
    classifier: DocClassifierFn = deterministic_doc_classifier,
    batch_size: int = 20,
) -> DataFrame:
    """T10 classification leg → (document_id, categories, confidence,
    keywords, difficulty)."""
    docs = assemble_document_content(chunks, batch_size=batch_size)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            res = classifier(pdf["content"].fillna("").tolist())
            yield pd.DataFrame(
                {
                    "document_id": pdf["document_id"].values,
                    "categories": [r["categories"] for r in res],
                    "confidence": [r["confidence"] for r in res],
                    "keywords": [r["keywords"] for r in res],
                    "difficulty": [r["difficulty"] for r in res],
                }
            )

    return docs.mapInPandas(_run, _CLASSIFY_SCHEMA)


def propagate_category(
    chunks: DataFrame,
    classified: DataFrame,
    doc_col: str = "document_id",
    confidence_threshold: float = 0.7,
    default_category: str = "general",
) -> DataFrame:
    """document_processor.py:1531-1545: doc_category = categories[0] when
    confidence >= threshold else the default; joined onto every chunk as a
    ``category`` column (the reference mutates each chunk's metadata dict —
    a column IS chunk metadata here). Plain equi-join on document_id; the
    doc-level side is one row per doc, broadcastable when small."""
    doc_cat = classified.select(
        F.col("document_id").alias(doc_col),
        F.when(
            (F.col("confidence") >= confidence_threshold)
            & (F.size("categories") > 0),
            F.col("categories")[0],
        )
        .otherwise(F.lit(default_category))
        .alias("category"),
    )
    out = chunks.join(doc_cat, doc_col, "left")
    return out.withColumn("category", F.coalesce("category", F.lit(default_category)))
