"""Deduplication suite for large-scale text corpora.

Not present in the reference (its dedup is entity-level canonicalization);
these are the corpus-level operators a 100 TB training-data pipeline needs
(task brief) — each designed around Spark shuffle behavior:

- exact_duplicates:      one groupBy on md5(text) — partial agg, no skew.
- ngram_jaccard_pairs:   explode shingles → pair-count join. Hot shingles
  are capped by document frequency (stop-shingle filter) so the self-join
  can't quadratically explode on boilerplate (the classic web-dedup trap).
- minhash_signatures / minhash_lsh_pairs: k xxhash64 permutations (JVM-side,
  whole-stage codegen — no Python), banded into b buckets; candidate pairs
  come from an equi-join on (band, bucket-hash), verified with exact
  Jaccard. O(n·k) map work + one shuffle keyed by bucket.
- simhash_pairs:         64-bit fingerprint via per-word hash bit voting,
  near-dups joined on rotated bands (hamming ≤ r within band equality).
- embedding_near_dupes:  cosine ≥ τ pairs over an embedding column; exact
  (self-join) at small n, LSH-bucketed (random hyperplanes) at scale.

All operators key pairs as (id_small, id_big) to halve the join output and
make results order-insensitive.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shingling (shared by jaccard + minhash)
# ---------------------------------------------------------------------------


def with_shingles(
    df: DataFrame, text_col: str = "text", n: int = 3, out_col: str = "shingles"
) -> DataFrame:
    """Distinct word n-gram shingles, built with JVM higher-order functions.

    words = split(trim(text), '\\s+'); shingle_i = words[i..i+n-1] joined by
    ' '. Docs with fewer than n words get their whole text as one shingle.
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1)))
    shingles = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))
    )
    return df.withColumn(out_col, shingles)


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup groups: md5(text) → group size + representative (min id)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(F.col(id_col)).alias("representative"),
        )
        .where(F.col("n_docs") > 1)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs (doc1 < doc2, jaccard >= τ).

    Shuffles: one explode+groupBy per pair. ``max_shingle_df`` drops
    shingles appearing in more than that many docs before pairing —
    boilerplate protection; at web scale always set it (a shingle present in
    m docs yields m² pair rows).
    """
    sh = with_shingles(df, text_col, n).select(
        F.col(id_col).alias("doc"), F.col("shingles")
    )
    sizes = sh.select("doc", F.size("shingles").alias("n_shingles"))
    exploded = sh.select("doc", F.explode("shingles").alias("shingle"))

    if max_shingle_df is not None:
        hot = (
            exploded.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        exploded = exploded.join(hot, "shingle", "left_anti")

    a = exploded.alias("a")
    b = exploded.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc1"), F.col("b.doc").alias("doc2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc", "doc1").withColumnRenamed("n_shingles", "n1"), "doc1")
        .join(sizes.withColumnRenamed("doc", "doc2").withColumnRenamed("n_shingles", "n2"), "doc2")
        .withColumn("jaccard", F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter")))
        .where(F.col("jaccard") >= threshold)
        .select("doc1", "doc2", "jaccard")
    )
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """k-permutation MinHash signature, entirely JVM-side.

    h_i(s) = xxhash64(shingle, seed=i); sig[i] = min over shingles.
    One narrow projection — no shuffle, no Python.
    """
    sh = with_shingles(df, text_col, n)

    def _minhash(i: int):
        # closure factory — a `lambda s, i=i:` would be treated by pyspark as
        # a 2-arg (element, index) lambda, silently shadowing the seed
        return F.array_min(F.transform(F.col("shingles"), lambda s: F.xxhash64(s, F.lit(i))))

    sig = F.array(*[_minhash(i) for i in range(num_hashes)])
    return sh.select(F.col(id_col).alias("doc"), sig.alias("signature"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    verify: bool = True,
) -> DataFrame:
    """Near-dup pairs via banded MinHash-LSH, optionally verified exactly.

    rows_per_band = num_hashes // bands; candidate pairs share ≥1 band
    bucket (equi-join on (band, xxhash64(band slice)) — one shuffle keyed by
    bucket, AQE handles bucket skew). With verify=True candidates are
    re-checked with exact Jaccard ≥ τ, making the output identical to
    ngram_jaccard_pairs up to LSH recall.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes)

    band_entries = sigs.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[F.col("signature")[b * r + j].cast("string") for j in range(r)],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")

    a = band_entries.alias("a")
    b = band_entries.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc1"), F.col("b.doc").alias("doc2"))
        .distinct()
    )
    if not verify:
        return candidates

    sh = with_shingles(df, text_col, n).select(F.col(id_col).alias("doc"), "shingles")
    verified = (
        candidates.join(sh.withColumnRenamed("doc", "doc1").withColumnRenamed("shingles", "s1"), "doc1")
        .join(sh.withColumnRenamed("doc", "doc2").withColumnRenamed("shingles", "s2"), "doc2")
        .withColumn("inter", F.size(F.array_intersect("s1", "s2")))
        .withColumn(
            "jaccard",
            F.col("inter") / (F.size("s1") + F.size("s2") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc1", "doc2", "jaccard")
    )
    return verified


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash via vectorized bit voting in an Arrow-batched UDF.

    bit_k(doc) = 1 if sum over distinct words of sign(bit_k(sha1(word))) > 0.

    Implementation note: this was first written as 64 JVM aggregate() folds,
    but Catalyst/codegen choked on the 64 giant expression trees (minutes of
    driver-side plan compilation) -- a numpy bit-matrix per Arrow batch is
    both faster and constant-size in the plan. The downstream banding join
    stays JVM-side.
    """
    import hashlib

    import numpy as np

    @F.pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            words = set((t or "").strip().split())
            if not words:
                continue
            hs = np.frombuffer(
                b"".join(
                    hashlib.sha1(w.encode("utf-8", "replace")).digest()[:8]
                    for w in words
                ),
                dtype="<u8",
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int32)
            votes = (2 * bits - 1).sum(axis=0)
            fp = ((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64)
            out[i] = fp
        return pd.Series(out.astype(np.int64))

    return df.select(F.col(id_col).alias("doc"), _simhash(F.col(text_col)).alias("simhash"))



def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= r via 4-band blocking.

    Pigeonhole: fingerprints within hamming r<=3 agree on at least one of 4
    16-bit bands → equi-join per band, then exact popcount verify
    (bit_count of xor).
    """
    fp = simhash_fingerprints(df, id_col, text_col)
    bands = fp.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc", "simhash", "bb.band", "bb.chunk")

    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc1"),
            F.col("b.doc").alias("doc2"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dups
# ---------------------------------------------------------------------------


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def embedding_near_dupes(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Exact cosine-similar pairs (id1 < id2, cosine >= τ) via self-join.

    Quadratic — correct baseline for tests/small n. The scale path buckets
    by random-hyperplane LSH first (see ann.hyperplane_buckets) and runs
    this join within buckets.
    """
    v = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    )
    a, b = v.alias("a"), v.alias("b")
    cos = _dot(F.col("a.vec"), F.col("b.vec")) / (
        _norm(F.col("a.vec")) * _norm(F.col("b.vec"))
    )
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
