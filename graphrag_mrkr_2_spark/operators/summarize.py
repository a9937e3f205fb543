"""C7: entity/relationship description summarization (Phase 4).

Reference: core/description_summarizer.py:99-373 — LLM-compresses long
accumulated descriptions when an entity is mentioned often; gated by
``_should_summarize`` (:347-373): non-empty, mention_count >= 3,
len(description) >= 200 (settings summarization_min_mentions/_min_length).
Claimed 50-70% compression; does not affect (subj, pred, obj) triples.

Spark shape: the gate is a cheap column predicate evaluated JVM-side so the
expensive summarizer UDF only sees qualifying rows; the summarizer itself is
an injectable batch callable (texts -> summaries) — the deterministic
default keeps the first sentences up to a target length (network-free), and
an LLM client drops into the same seam.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SummarizerFn = Callable[[list[str]], list[str]]


def deterministic_summarizer(texts: list[str], target_chars: int = 300) -> list[str]:
    """Stand-in for the LLM: keep leading description lines up to the target
    length (descriptions accumulate as sorted newline-joined sets, so a
    prefix is a deterministic, meaningful digest)."""
    out = []
    for t in texts:
        if len(t) <= target_chars:
            out.append(t)
            continue
        kept: list[str] = []
        used = 0
        for line in t.split("\n"):
            if used + len(line) + 1 > target_chars and kept:
                break
            kept.append(line)
            used += len(line) + 1
        out.append("\n".join(kept)[:target_chars])
    return out


def should_summarize_col(desc_col, mentions_col, min_mentions: int = 3, min_length: int = 200):
    """description_summarizer.py:347-373 (_should_summarize) as a predicate."""
    return (
        desc_col.isNotNull()
        & (F.length(F.trim(desc_col)) > 0)
        & (mentions_col >= min_mentions)
        & (F.length(desc_col) >= min_length)
    )


def summarize_descriptions(
    nodes: DataFrame,
    summarizer: SummarizerFn = deterministic_summarizer,
    desc_col: str = "description",
    mentions_col: str = "mention_count",
    min_mentions: int = 3,
    min_length: int = 200,
) -> DataFrame:
    """Rewrite qualifying descriptions through the summarizer seam.

    Gate runs JVM-side; only gated rows pay the Python crossing. The output
    schema equals the input (description replaced in place), so this drops
    into the pipeline between build_nodes and persistence.
    """
    gate = should_summarize_col(
        F.col(desc_col), F.col(mentions_col), min_mentions, min_length
    )
    marked = nodes.withColumn("__summarize", gate)

    schema = nodes.schema

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mask = pdf["__summarize"].fillna(False)
            if mask.any():
                pdf.loc[mask, desc_col] = summarizer(pdf.loc[mask, desc_col].tolist())
            yield pdf.drop(columns=["__summarize"])

    return marked.mapInPandas(_run, schema)
