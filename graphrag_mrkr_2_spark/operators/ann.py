"""Similarity search over embedding columns (brute-force + LSH-bucketed).

Covers the reference's vector top-k (Q1, core/graph_db.py:2288-2360 — Neo4j
vector index with a brute-force Python cosine fallback) re-expressed for
Spark, plus the scale path a 100 TB corpus needs:

- brute_force_topk: exact cosine top-k for one query vector. The dot
  product is a JVM higher-order fold (zip_with + aggregate) — no Python —
  and TakeOrderedAndProject gives a global top-k without a full sort.
- knn_join: exact top-k for a *table* of query vectors via crossJoin of a
  broadcast query side + per-query window top-k.
- hyperplane_buckets / lsh_topk: random-hyperplane signs (seeded,
  deterministic) bucket vectors; queries probe only their bucket — the IVF
  flavor of ANN with recall traded via number of planes / multiprobe.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_to_query(df: DataFrame, query_vec: list[float], vec_col: str = "embedding") -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = _as_double(F.col(vec_col))
    cos = _dot(v, q) / (_norm(v) * _norm(q))
    return df.withColumn("cosine", cos)


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine (ties broken by id asc for determinism)."""
    return (
        cosine_to_query(df, query_vec, vec_col)
        .select(F.col(id_col), F.col("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def knn_join(
    items: DataFrame,
    queries: DataFrame,
    k: int = 5,
    item_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact k-NN join: for each query row, top-k items by cosine.

    Broadcast the (small) query side; per-query window top-k. Exact but
    O(|items|·|queries|) — the correctness baseline for lsh_topk.
    """
    q = queries.select(
        F.col(query_id), _as_double(F.col(vec_col)).alias("qvec")
    )
    it = items.select(F.col(item_id), _as_double(F.col(vec_col)).alias("ivec"))
    scored = it.crossJoin(F.broadcast(q)).select(
        query_id,
        item_id,
        (_dot(F.col("ivec"), F.col("qvec")) / (_norm(F.col("ivec")) * _norm(F.col("qvec")))).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(item_id))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).astype(float)


def hyperplane_signature(vec_col, planes: np.ndarray):
    """Bit-sign signature as a long, built from JVM dot products."""
    sig = None
    for k, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(_as_double(vec_col), p) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        contrib = bit * F.lit(1 << k).cast("long")
        sig = contrib if sig is None else sig + contrib
    return sig


def hyperplane_buckets(
    df: DataFrame, dim: int, n_planes: int = 8, vec_col: str = "embedding", seed: int = 7
) -> DataFrame:
    planes = _hyperplanes(dim, n_planes, seed)
    return df.withColumn("bucket", hyperplane_signature(F.col(vec_col), planes))


def lsh_topk(
    items: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    item_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """ANN top-k: score only items sharing the query's hyperplane bucket.

    One shuffle keyed by bucket; recall < 1 by design (raise via fewer
    planes or multiprobe). At 10^12 scale add multiprobe neighbors of the
    bucket id (hamming-1 flips) — same join shape.
    """
    bi = hyperplane_buckets(items, dim, n_planes, vec_col, seed).select(
        F.col(item_id), F.col(vec_col).alias("ivec"), "bucket"
    )
    bq = hyperplane_buckets(queries, dim, n_planes, vec_col, seed).select(
        F.col(query_id), F.col(vec_col).alias("qvec"), "bucket"
    )
    scored = bi.join(bq, "bucket").select(
        query_id,
        item_id,
        (
            _dot(_as_double(F.col("ivec")), _as_double(F.col("qvec")))
            / (_norm(_as_double(F.col("ivec"))) * _norm(_as_double(F.col("qvec"))))
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(item_id))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
