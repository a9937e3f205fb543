"""Text analysis operators: language-ID, token counts, fingerprints.

Corpus-analysis layer for training-data pipelines (task brief). All pure
column expressions — whole-stage codegen, no Python in the hot path — with
ANSI-SQL oracle equivalents in __spark_entry__.oracle_sql().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Small, fixed stopword profiles. Word-boundary regex counting keeps the
# heuristic SQL-portable (same regexes run in the DuckDB oracle).
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "for", "with", "that", "are"],
    "it": ["il", "la", "di", "che", "e", "per", "con", "del", "una", "sono"],
    "de": ["der", "die", "und", "das", "ist", "mit", "von", "für", "ein", "nicht"],
}


def _stopword_hits(text_col, words: list[str]):
    pattern = r"\b(?:" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text_col), F.lit(pattern), F.lit(0)))


def with_lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-profile language ID: argmax over per-language hit counts.

    Ties or zero hits → 'und'. Deterministic tie-break: en > it > de priority
    only when strictly greater, else 'und'.
    """
    c = F.col(text_col)
    scores = {lang: _stopword_hits(c, ws) for lang, ws in LANG_PROFILES.items()}
    en, it, de = scores["en"], scores["it"], scores["de"]
    pred = (
        F.when((en > it) & (en > de), F.lit("en"))
        .when((it > en) & (it > de), F.lit("it"))
        .when((de > en) & (de > it), F.lit("de"))
        .otherwise(F.lit("und"))
    )
    return df.withColumn(out_col, pred)


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + approx BPE tokens (ceil(chars/4), the reference's
    tiktoken-less approximation, core/token_counter.py:49) + word-ish tokens
    from a BPE-flavored regex (letters runs / digit runs / single symbols)."""
    c = F.trim(F.col(text_col))
    ws_tokens = F.when(F.length(c) == 0, F.lit(0)).otherwise(F.size(F.split(c, r"\s+")))
    approx = F.greatest((F.length(c) / F.lit(4)).cast("long"), F.lit(1))
    bpe_ish = F.size(
        F.filter(F.split(c, r"(?<=[^\p{L}\p{N}])|(?=[^\p{L}\p{N}])"), lambda t: F.trim(t) != "")
    )
    return (
        df.withColumn("ws_tokens", ws_tokens.cast("long"))
        .withColumn("approx_tokens", approx)
        .withColumn("regex_tokens", bpe_ish.cast("long"))
    )


def with_fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Document fingerprint: md5 over the whitespace-normalized, lowercased
    text — the canonical-form hash used for near-exact dedup grouping."""
    normalized = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return df.withColumn(out_col, F.md5(normalized))


def corpus_language_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    return (
        with_lang_id(df, text_col)
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
