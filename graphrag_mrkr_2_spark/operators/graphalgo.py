"""Distributed graph algorithms: connected components (large-star/small-star).

The reference has no distributed graph code (clustering pulls the whole graph
into one process, core/graph_clustering.py:25-75). At 10^12-document scale
entity resolution and community pre-partitioning need a shuffle-based
connected-components — implemented here as the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) as a DataFrame loop:

  large-star: for every node u, link every *larger* neighbor to u's minimum
              neighborhood label;
  small-star: link every *smaller-or-equal* neighbor (and u) to the minimum.

Each round is two hash aggregations + a join; converges in O(log n) rounds
even on path graphs. Works on any orderable id type (we use the node id
strings directly — no global re-indexing shuffle needed). Every k rounds the
edge list is localCheckpoint()-ed to truncate lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetric(edges: DataFrame) -> DataFrame:
    # explode instead of self-union: one map-side pass, and it avoids a
    # Spark optimizer defect (Union constraint rewrite hitting "key not
    # found" on self-union lineage during localCheckpoint planning)
    both = F.array(
        F.struct(F.col("u").alias("u"), F.col("v").alias("v")),
        F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
    )
    return (
        edges.select(F.explode(both).alias("e"))
        .select("e.u", "e.v")
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u over its SYMMETRIC neighborhood N(u):
    m = min(N(u) ∪ {u}); emit (v, m) for every strictly larger neighbor
    v > u. (Kiveris et al. §3, Algorithm 2.)

    Skew-safe formulation: m is a plain partial-aggregated min (one row per
    (partition, key) map-side, one reduced row per key) joined back onto the
    edge list — a mega-hub with 10^8 neighbors never materializes its
    neighborhood in a single aggregation buffer the way collect_set would.
    """
    sym = _symmetric(edges)
    # renamed join key: `mins` derives from `sym`, and a raw self-join of a
    # DataFrame with its own aggregate trips Catalyst attribute resolution
    mins = (
        sym.groupBy("u")
        .agg(F.least(F.min("v"), F.first("u")).alias("m"))
        .select(F.col("u").alias("mu"), "m")
    )
    return (
        sym.join(mins, sym["u"] == mins["mu"])
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient every edge (big → small); for each node u over its smaller
    neighborhood: m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u) ∪ {u}.
    (Kiveris et al. §3, Algorithm 3.)

    Same skew-safe min-aggregate + join-back shape as _large_star; after
    orientation every neighbor v < u, so m = min(v) directly.
    """
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = (
        oriented.groupBy("u")
        .agg(F.min("v").alias("m"))
        .select(F.col("u").alias("mu"), "m")
    )
    linked = oriented.join(mins, oriented["u"] == mins["mu"]).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_link = mins.select(F.col("mu").alias("u"), F.col("m").alias("v"))
    return (
        linked.unionByName(self_link)
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _local_components(edges: DataFrame) -> DataFrame:
    """Driver-side union-find for small edge lists.

    The alternating-star loop costs ~10-20 Spark jobs of fixed scheduling
    latency — pure waste on a graph that fits in one collect. Component ids
    (min node id) are identical to the distributed result by construction.
    """
    return _local_components_rows(edges.collect(), edges.sparkSession)


def _local_components_rows(rows, spark) -> DataFrame:
    """Union-find over already-collected (u, v) rows. Tolerates directed,
    duplicated and self-loop-free-or-not input — the result is the same
    (node, component=min id) mapping the symmetric-distinct loop computes."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        u, v = r["u"], r["v"]
        if u is None or v is None or u == v:
            # pure self-loops and null endpoints never enter the
            # symmetric-distinct loop either (its SQL u != v filter is
            # null-rejecting) — identical node coverage matters: callers
            # left-join this and coalesce(component, node)
            continue
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by keeping the smaller id as root → component = min id
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    out = [(n, find(n)) for n in parent]
    return spark.createDataFrame(out, "node string, component string")


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
    max_iterations: int = 10,
) -> DataFrame:
    """Weighted synchronous label propagation → (node, label).

    The distributed community-detection path for components too large for
    in-executor Louvain (core/graph_clustering.py:158-176 hands whatever it
    gets to igraph in ONE process — the reference's scale ceiling). Each
    round is the same skew-safe shape as the CC star steps:

      score(u, L) = Σ weight(u, v) over neighbors v with label(v) = L
      label(u)   ← argmax_L score(u, L), ties to the smallest label

    — a join (edge × label), a partial-aggregated groupBy(node, label), and
    a per-node top-1 window. No neighbor-set materialization, so a mega-hub
    is bounded by its distinct neighbor-label count after the partial agg.
    Synchronous updates with min-label tie-break are deterministic; the loop
    stops early when no label changes (checked via count, an action, so each
    round is localCheckpoint-ed to truncate lineage).

    Synchronous LPA famously oscillates on automorphic structures (two
    symmetric nodes swap labels forever — GraphX/GraphFrames LPA document
    the same caveat). The loop detects a period-2 cycle via a label-set
    checksum and resolves it deterministically: each node takes the MIN of
    its two oscillating labels, which maps both sides of a swapping pair to
    the same label (found live by a verification probe on a 2-node edge).
    """
    e = edges.select(
        F.col(src_col).alias("u"),
        F.col(dst_col).alias("v"),
        F.col(weight_col).cast("double").alias("w"),
    )
    both = F.array(
        F.struct(F.col("u").alias("u"), F.col("v").alias("v"), F.col("w").alias("w")),
        F.struct(F.col("v").alias("u"), F.col("u").alias("v"), F.col("w").alias("w")),
    )
    sym = (
        e.select(F.explode(both).alias("x"))
        .select("x.u", "x.v", "x.w")
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.max("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    from pyspark.sql.window import Window

    def _checksum(lbl: DataFrame) -> tuple[int, int]:
        row = lbl.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("node", "label")), F.lit(0)).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"])

    history = [_checksum(labels)]
    for _ in range(max_iterations):
        msgs = sym.join(
            labels.select(F.col("node").alias("v"), "label"), "v"
        ).select("u", "label", "w")
        scores = msgs.groupBy("u", "label").agg(F.sum("w").alias("score"))
        w_top = Window.partitionBy("u").orderBy(F.desc("score"), F.asc("label"))
        new_labels = (
            scores.withColumn("rn", F.row_number().over(w_top))
            .where(F.col("rn") == 1)
            .select(F.col("u").alias("node"), "label")
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(
                labels.select("node", F.col("label").alias("old")), "node"
            )
            .where(F.col("label") != F.col("old"))
            .count()
        )
        if changed == 0:
            labels = new_labels
            break
        cs = _checksum(new_labels)
        if len(history) >= 2 and cs == history[-2]:
            # period-2 oscillation: per-node min of the two swapping states
            labels = (
                new_labels.join(
                    labels.select("node", F.col("label").alias("old")), "node"
                )
                .select("node", F.least("label", "old").alias("label"))
                .localCheckpoint(eager=True)
            )
            break
        history.append(cs)
        labels = new_labels
    return labels


def connected_components(
    edges: DataFrame,
    src_col: str = "u",
    dst_col: str = "v",
    max_iterations: int = 20,
    local_threshold: int = 100_000,
) -> DataFrame:
    """Edge list → (node, component) with component = min node id (orderable).

    Input may be directed/undirected/duplicated; isolated nodes (no edges)
    are the caller's concern (left-join the node table afterwards and
    coalesce(component, node)).

    ``local_threshold``: edge lists at or below this size are solved with
    driver-side union-find (one collect) instead of the distributed loop —
    the loop's per-iteration job latency dwarfs the work for small graphs.
    Set 0 to force the distributed path (tests do). At 10^12-document scale
    the global match graph far exceeds any sane threshold, so the
    large-star/small-star path is the one that runs.

    Every distributed iteration materializes via localCheckpoint: the loop's
    convergence check is an action, so without truncation each iteration
    would recompute the whole upstream lineage (and the plan would double
    per round).
    """
    raw = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    if local_threshold > 0:
        # checkpoint the RAW edges (one evaluation of the possibly
        # expensive lineage), then count + collect the materialized blocks.
        # The r1-r7 shape symmetrized + distinct-exchanged BEFORE the
        # checkpoint, paying a full explode+shuffle+dedup even when the
        # graph then fit in one collect; union-find is insensitive to
        # direction/duplicates, so feeding it the raw rows yields the
        # identical (node, component) mapping. (An incremental limit-probe
        # was tried first and rejected: CollectLimit's scale-up rounds cost
        # more scheduling latency than the count they avoid.)
        raw_ckpt = raw.localCheckpoint(eager=True)
        if raw_ckpt.count() <= local_threshold:
            return _local_components_rows(raw_ckpt.collect(), edges.sparkSession)
        e = _symmetric(raw_ckpt).localCheckpoint(eager=True)
    else:
        e = _symmetric(raw).localCheckpoint(eager=True)
    prev = None
    for _ in range(max_iterations):
        e = _large_star(e)
        e = _small_star(e).localCheckpoint(eager=True)
        cur = _checksum(e)
        if prev == cur:
            break
        prev = cur

    # after convergence every edge points a node at its component minimum
    comp = e.groupBy("u").agg(F.min("v").alias("component"))
    comp = comp.withColumn(
        "component", F.least(F.col("component"), F.col("u"))
    ).select(F.col("u").alias("node"), "component")
    # roots that only ever appear as targets
    roots = (
        e.select(F.col("v").alias("node"))
        .distinct()
        .join(comp, "node", "left_anti")
        .withColumn("component", F.col("node"))
    )
    return comp.unionByName(roots)
