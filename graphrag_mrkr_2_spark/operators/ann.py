"""Similarity search over embedding columns (brute force, LSH, IVF).

Covers the reference's vector top-k (Q1, core/graph_db.py:2288-2360 — Neo4j
vector index with a brute-force Python cosine fallback) re-expressed for
Spark, plus the scale paths a 100 TB corpus needs:

- brute_force_topk: exact cosine top-k for one query vector. The dot
  product is a JVM higher-order fold (zip_with + aggregate) — no Python —
  and TakeOrderedAndProject gives a global top-k without a full sort.
- knn_join: exact top-k for a *table* of query vectors via crossJoin of a
  broadcast query side + per-query window top-k.
- hyperplane_buckets / lsh_topk: random-hyperplane signs (seeded,
  deterministic) bucket vectors; queries probe only their bucket — recall
  traded via number of planes / multiprobe.
- ivf_train / ivf_topk: inverted-file ANN — spherical k-means coarse
  quantizer (trained with JVM map-side partial sums; only the k x dim
  centroid matrix ever reaches the driver), items partitioned into lists,
  queries probe the ``nprobe`` nearest lists and rescore exactly.  With
  ``nprobe == n_lists`` the result is EXACTLY knn_join's (the property the
  driver oracle pins); recall at nprobe < n_lists is the tested tradeoff.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType
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


# ---------------------------------------------------------------------------
# IVF (inverted file) — coarse k-means quantizer + probed exact rescoring
# ---------------------------------------------------------------------------


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def ivf_train(
    items: DataFrame,
    n_lists: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_iter: int = 5,
    seed: int = 7,
    sample_fraction: float = None,
) -> np.ndarray:
    """Spherical k-means centroids, (n_lists, dim) float64, rows L2-normal.

    100-TB shape: initialization is a hash-ordered bounded sample
    (n_lists rows), each Lloyd iteration is ONE map-side-combined groupBy —
    the per-dimension sums are plain JVM ``F.sum(vec[i])`` aggregates, so
    the shuffle carries n_lists x dim doubles, and only the centroid matrix
    is collected.  Pass ``sample_fraction`` to train on a sample (standard
    IVF practice — the quantizer does not need the full corpus).
    """
    if sample_fraction is not None:
        items = items.sample(fraction=sample_fraction, seed=seed)
    init = (
        items.select(_as_double(F.col(vec_col)).alias("v"))
        .orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)))
        .limit(n_lists)
        .collect()
    )
    if len(init) < n_lists:
        raise ValueError(f"need >= {n_lists} vectors to train {n_lists} lists")
    centroids = _normalize_rows(np.array([r["v"] for r in init], dtype=np.float64))
    dim = centroids.shape[1]
    # persist the projected vectors: each Lloyd iteration re-reads them,
    # and re-scanning the full upstream lineage max_iter times is the
    # dominant cost at corpus scale (review r5 finding #7)
    vecs = items.select(_as_double(F.col(vec_col)).alias("v")).persist()
    try:
        for _ in range(max_iter):
            assign = _assign_udf(centroids)
            sums = (
                vecs.withColumn("list_id", assign(F.col("v")))
                .groupBy("list_id")
                .agg(*[F.sum(F.col("v")[i]).alias(f"s{i}") for i in range(dim)])
                .collect()
            )
            new = centroids.copy()  # empty lists keep their previous centroid
            for r in sums:
                new[r["list_id"]] = [r[f"s{i}"] for i in range(dim)]
            centroids = _normalize_rows(new)
    finally:
        vecs.unpersist()
    return centroids


def _assign_udf(centroids: np.ndarray):
    """Arrow-batched argmax of cosine against the (broadcast) centroids."""
    c = np.ascontiguousarray(centroids)

    @F.pandas_udf("int")
    def assign(vs: pd.Series) -> pd.Series:
        m = _normalize_rows(np.array(vs.tolist(), dtype=np.float64))
        return pd.Series(np.argmax(m @ c.T, axis=1).astype(np.int32))

    return assign


def _probe_udf(centroids: np.ndarray, nprobe: int):
    c = np.ascontiguousarray(centroids)

    @F.pandas_udf(ArrayType(IntegerType()))
    def probe(vs: pd.Series) -> pd.Series:
        m = _normalize_rows(np.array(vs.tolist(), dtype=np.float64))
        scores = m @ c.T
        order = np.argsort(-scores, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    return probe


def ivf_assign(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Attach the IVF ``list_id`` column (nearest centroid by cosine)."""
    return df.withColumn(
        "list_id", _assign_udf(centroids)(_as_double(F.col(vec_col)))
    )


def ivf_topk(
    items: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    item_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: queries score only items in their ``nprobe`` nearest
    lists; survivors are rescored with the exact JVM cosine.

    One equi-join shuffle keyed by list_id — each query reads ~nprobe /
    n_lists of the corpus instead of all of it.  Skew is bounded by list
    balance (k-means keeps lists comparable; a pathological corpus shows up
    as a hot list_id, fixable by raising n_lists).  ``nprobe == n_lists``
    degenerates to the exact knn_join result — the correctness anchor."""
    bi = ivf_assign(items, centroids, vec_col).select(
        F.col(item_id), F.col(vec_col).alias("ivec"), "list_id"
    )
    bq = (
        queries.select(
            F.col(query_id),
            F.col(vec_col).alias("qvec"),
            _probe_udf(centroids, nprobe)(_as_double(F.col(vec_col))).alias("probes"),
        )
        .select(query_id, "qvec", F.explode("probes").alias("list_id"))
    )
    scored = bi.join(bq, "list_id").select(
        query_id,
        item_id,
        (
            _dot(_as_double(F.col("ivec")), _as_double(F.col("qvec")))
            / (_norm(_as_double(F.col("ivec"))) * _norm(_as_double(F.col("qvec"))))
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(item_id))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
