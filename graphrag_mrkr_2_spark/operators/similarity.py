"""S9: embeddings + SIMILAR_TO edges (J1 chunk-chunk, J2 entity-entity).

Reference semantics:
- embeddings: OpenAI ada-002 in the reference (core/embeddings.py:152-330);
  here a deterministic hash embedding via mapInPandas (tests/bench), with the
  same seam taking a real client at deployment.
- chunk-chunk similarity (J1, core/graph_db.py:2030-2088): within-document
  all-pairs cosine, keep pairs >= similarity_threshold (0.7), per source
  chunk top max_similarity_connections (5) by similarity with rank,
  persisted as undirected SIMILAR_TO {score, rank} (:1992-2011).
- entity-entity similarity (J2, core/graph_db.py:2134-2286): same pattern
  over entity embeddings, skipping identical (name, type) pairs, MERGE
  SIMILAR_TO {similarity}.

Spark shape: a within-document self-join is shuffle-partitioned by
document_id (docs are small → no skew blowup); the global entity variant is
quadratic and therefore gated behind LSH bucketing (bucket column from
ann.hyperplane_buckets) — at 10^12 docs J1 stays per-doc (linear), J2 runs
bucketed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType
from pyspark.sql.window import Window

from ..functions.embeddings import DEFAULT_DIM, pseudo_embed_many


def with_embeddings(
    df: DataFrame, text_col: str = "content", out_col: str = "embedding", dim: int = DEFAULT_DIM
) -> DataFrame:
    """T8 — deterministic pseudo-embedding (FIXTURES.md F5) via pandas UDF."""

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(texts: pd.Series) -> pd.Series:
        mat = pseudo_embed_many(texts.fillna("").tolist(), dim)
        return pd.Series(list(mat))

    return df.withColumn(out_col, _embed(F.col(text_col)))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def _cosine(a, b):
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    return _dot(da, db) / (_norm(da) * _norm(db))


def chunk_similarity_edges(
    chunks: DataFrame,
    threshold: float = 0.7,
    max_connections: int = 5,
    id_col: str = "chunk_id",
    doc_col: str = "document_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """J1 — within-document SIMILAR_TO edges with per-source rank.

    Directed top-k per source first (rank semantics of graph_db.py:2056-2083),
    then undirected canonicalization (least/greatest) keeping the best
    (score, min rank) per pair — matching the MERGE-undirected persistence.
    """
    left = chunks.select(
        F.col(doc_col).alias("doc"), F.col(id_col).alias("src"), F.col(vec_col).alias("v1")
    )
    right = chunks.select(
        F.col(doc_col).alias("doc"), F.col(id_col).alias("dst"), F.col(vec_col).alias("v2")
    )
    pairs = (
        left.join(right, "doc")
        .where(F.col("src") != F.col("dst"))
        .withColumn("score", _cosine(F.col("v1"), F.col("v2")))
        .where(F.col("score") >= threshold)
    )
    w = Window.partitionBy("doc", "src").orderBy(F.desc("score"), F.asc("dst"))
    ranked = pairs.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= max_connections
    )
    return (
        ranked.select(
            F.col("doc").alias("document_id"),
            F.least(F.col("src"), F.col("dst")).alias("id1"),
            F.greatest(F.col("src"), F.col("dst")).alias("id2"),
            F.col("score"),
            F.col("rank"),
        )
        .groupBy("document_id", "id1", "id2")
        .agg(F.max("score").alias("score"), F.min("rank").alias("rank"))
        .withColumn("edge_type", F.lit("SIMILAR_TO"))
    )


def chunk_similarity_edges_grams(
    chunks: DataFrame,
    threshold: float = 0.7,
    max_connections: int = 5,
    id_col: str = "chunk_id",
    doc_col: str = "document_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """J1 via per-document NumPy gram matrices — the plan SURVEY §2.5
    prescribes: documents are small (tens of chunks), so the all-pairs
    cosine is one vectorized matmul per group instead of a self-join with
    interpreted per-pair array folds (~10× at bench scale).

    Physical shape (r8): repartition by document + sortWithinPartitions +
    ONE ``mapInPandas`` pass that walks document groups inside each Arrow
    batch (carrying the split tail group across batch boundaries). The
    r3-r7 ``groupBy(doc).applyInPandas`` shape paid a per-GROUP Python
    call + pandas-frame construction for every document — at web scale
    documents are tiny groups, and that per-group overhead dominated the
    stage 3:1 over the actual math (measured r8: 7.0 s -> 2.2 s at sf0.1,
    byte-identical output). Output contract identical to
    chunk_similarity_edges (tests assert it).
    """
    import numpy as np

    def _gram_rows(doc, ids, vecs, out):
        n = len(ids)
        if n < 2:
            return
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0
        unit = mat / norms[:, None]
        sims = unit @ unit.T
        np.fill_diagonal(sims, -np.inf)
        best: dict[tuple[str, str], tuple[float, int]] = {}
        for i in range(n):
            row = sims[i]
            # per-source top-k by similarity, ties broken by id asc
            order = sorted(range(n), key=lambda j: (-row[j], ids[j]))
            rank = 0
            for j in order:
                if row[j] < threshold:
                    break
                rank += 1
                if rank > max_connections:
                    break
                key = (min(ids[i], ids[j]), max(ids[i], ids[j]))
                score = float(row[j])
                prev = best.get(key)
                if prev is None or (score, -rank) > (prev[0], -prev[1]):
                    cur_rank = rank if prev is None else min(rank, prev[1])
                    best[key] = (max(score, prev[0]) if prev else score, cur_rank)
                else:
                    best[key] = (prev[0], min(prev[1], rank))
        for k, v in best.items():
            out.append((doc, k[0], k[1], v[0], v[1]))

    def _run(batches):
        # one task handles MANY documents: groups are contiguous because the
        # input is hash-partitioned AND sorted by doc; a group split across
        # two Arrow batches is carried over in pend_* until the doc changes
        pend_doc = None
        pend_ids: list = []
        pend_vecs: list = []
        started = False

        def flush(out):
            _gram_rows(pend_doc, pend_ids, pend_vecs, out)

        for pdf in batches:
            if not len(pdf):
                continue
            docs = pdf[doc_col].to_numpy()
            ids_col = pdf[id_col]
            vec_col_s = pdf[vec_col]
            out: list[tuple] = []
            start = 0
            for k in range(1, len(docs) + 1):
                if k == len(docs) or docs[k] != docs[start]:
                    d = docs[start]
                    if started and d == pend_doc:
                        pend_ids.extend(ids_col.iloc[start:k])
                        pend_vecs.extend(vec_col_s.iloc[start:k])
                    else:
                        if started:
                            flush(out)
                        started = True
                        pend_doc = d
                        pend_ids = list(ids_col.iloc[start:k])
                        pend_vecs = list(vec_col_s.iloc[start:k])
                    start = k
            if out:
                yield pd.DataFrame(
                    out, columns=["document_id", "id1", "id2", "score", "rank"]
                )
        if started:
            out = []
            flush(out)
            if out:
                yield pd.DataFrame(
                    out, columns=["document_id", "id1", "id2", "score", "rank"]
                )

    # explicit partition count: the per-row payload here is tiny (id + a
    # 32-float vector), so an AQE-coalescible un-numbered repartition would
    # collapse to one partition by bytes and serialize the CPU-bound gram
    # kernel; the session's shuffle parallelism is the scale-adaptive knob
    n_shuffle = int(chunks.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    src = (
        chunks.select(doc_col, id_col, vec_col)
        .repartition(n_shuffle, F.col(doc_col))
        .sortWithinPartitions(doc_col)
    )
    out = src.mapInPandas(
        _run,
        "document_id string, id1 string, id2 string, score double, rank int",
    )
    return out.withColumn("edge_type", F.lit("SIMILAR_TO"))


def entity_similarity_edges(
    nodes: DataFrame,
    threshold: float = 0.7,
    max_connections: int = 5,
    id_col: str = "entity_id",
    vec_col: str = "embedding",
    bucket_col: str | None = None,
    method: str = "lsh",
    bands: int = 12,
    planes_per_band: int = 4,
    seed: int = 7,
) -> DataFrame:
    """J2 — entity SIMILAR_TO edges (global).

    method="lsh" (DEFAULT — the scale path): candidates from banded
    random-hyperplane buckets (equi-join keyed by (band, bucket), AQE covers
    bucket skew) then exact cosine verification, so false positives are
    impossible and recall is the only approximation (P(miss) ≈ 1% for a
    pair at exactly τ=0.7 with 12×4 bands, less above it). The quadratic
    crossJoin is reachable only as the explicitly named method="exact"
    baseline (round-1's trap default, now inverted — same posture as
    dedup.embedding_near_dupes).

    ``bucket_col``: a precomputed coarse bucket (e.g. ann.hyperplane_buckets)
    restricts the join to that bucketing instead (overrides method).
    """
    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("v")] + (
        [F.col(bucket_col).alias("b")] if bucket_col else []
    )
    v = nodes.select(*cols)
    a, b = v.alias("a"), v.alias("b")
    cond = F.col("a.id") != F.col("b.id")
    if bucket_col:
        join = a.join(b, F.col("a.b") == F.col("b.b")).where(cond)
    elif method == "exact":
        join = a.crossJoin(b).where(cond)
    elif method == "lsh":
        from .dedup import _multiband_hyperplane_buckets

        bb = _multiband_hyperplane_buckets(
            nodes, id_col, vec_col, bands, planes_per_band, seed
        ).localCheckpoint(eager=True)  # read from both band-join sides (r8)
        cand = (
            bb.alias("ba")
            .join(
                bb.alias("bb"),
                (F.col("ba.band") == F.col("bb.band"))
                & (F.col("ba.bucket") == F.col("bb.bucket"))
                & (F.col("ba.id") != F.col("bb.id")),
            )
            .select(F.col("ba.id").alias("cid1"), F.col("bb.id").alias("cid2"))
            .distinct()
        )
        join = (
            cand.join(v.select(F.col("id").alias("cid1"), F.col("v").alias("v1")), "cid1")
            .join(v.select(F.col("id").alias("cid2"), F.col("v").alias("v2")), "cid2")
            .select(
                F.struct(F.col("cid1").alias("id"), F.col("v1").alias("v")).alias("a"),
                F.struct(F.col("cid2").alias("id"), F.col("v2").alias("v")).alias("b"),
            )
        )
    else:
        raise ValueError(f"unknown method {method!r} (use 'lsh' or 'exact')")
    pairs = join.select(
        F.col("a.id").alias("src"),
        F.col("b.id").alias("dst"),
        _cosine(F.col("a.v"), F.col("b.v")).alias("similarity"),
    ).where(F.col("similarity") >= threshold)
    w = Window.partitionBy("src").orderBy(F.desc("similarity"), F.asc("dst"))
    ranked = pairs.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= max_connections
    )
    return (
        ranked.select(
            F.least(F.col("src"), F.col("dst")).alias("id1"),
            F.greatest(F.col("src"), F.col("dst")).alias("id2"),
            F.col("similarity"),
        )
        .groupBy("id1", "id2")
        .agg(F.max("similarity").alias("similarity"))
        .withColumn("edge_type", F.lit("SIMILAR_TO"))
    )
