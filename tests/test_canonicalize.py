"""F4 canonicalization/dedup cases (mirrors reference test_entity_graph.py)
against BOTH the sequential port and the Spark aggregations."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from graphrag_mrkr_2_spark.functions.reference_pipeline import SequentialEntityGraph

ENT_SCHEMA = StructType(
    [
        StructField("chunk_id", StringType()),
        StructField("document_id", StringType()),
        StructField("name", StringType()),
        StructField("type", StringType()),
        StructField("description", StringType()),
        StructField("importance_score", DoubleType()),
        StructField("source_chunks", ArrayType(StringType())),
    ]
)
REL_SCHEMA = StructType(
    [
        StructField("chunk_id", StringType()),
        StructField("document_id", StringType()),
        StructField("source_entity", StringType()),
        StructField("target_entity", StringType()),
        StructField("relationship_type", StringType()),
        StructField("description", StringType()),
        StructField("strength", DoubleType()),
        StructField("source_chunks", ArrayType(StringType())),
    ]
)


# --- sequential graph semantics (entity_graph.py) ---------------------------


def test_case_insensitive_merge():
    g = SequentialEntityGraph()
    g.add_entity("Admin Panel", "COMPONENT", "d1", 0.8, ["c1"])
    g.add_entity("ADMIN PANEL", "Component", "d2", 0.6, ["c2"])
    assert len(g.nodes) == 1
    node = next(iter(g.nodes.values()))
    assert node["mention_count"] == 2
    assert node["source_chunks"] == ["c1", "c2"]


def test_description_sorted_set_union():
    g = SequentialEntityGraph()
    g.add_entity("X Entity", "SERVICE", "zebra desc", 0.8, [])
    g.add_entity("x entity", "service", "alpha desc", 0.6, [])
    g.add_entity("X ENTITY", "SERVICE", "alpha desc", 0.5, [])  # dup ignored
    node = next(iter(g.nodes.values()))
    assert node["description"] == "alpha desc\nzebra desc"


def test_importance_running_mean():
    g = SequentialEntityGraph()
    for s in (0.8, 0.6, 0.4):
        g.add_entity("M Entity", "SERVICE", "", s, [])
    node = next(iter(g.nodes.values()))
    assert node["importance_score"] == pytest.approx(0.6)


def test_strength_sum_and_edge_merge():
    g = SequentialEntityGraph()
    g.add_entity("A Src", "SERVICE", "", 0.8, [])
    g.add_entity("B Tgt", "SERVICE", "", 0.8, [])
    g.add_relationship("A Src", "B Tgt", "USES", "d1", 0.5, ["c1"])
    g.add_relationship("A Src", "B Tgt", "USES", "d2", 0.7, ["c2"])
    g.add_relationship("A Src", "B Tgt", "CALLS", "d3", 0.4, ["c3"])
    assert len(g.edges) == 2  # keyed by (src, tgt, type)
    uses = [e for (s, t, ty), e in g.edges.items() if ty == "USES"][0]
    assert uses["strength"] == pytest.approx(1.2)  # sums past 1.0
    assert uses["mention_count"] == 2
    assert uses["source_chunks"] == ["c1", "c2"]


def test_orphan_by_name_any_type():
    g = SequentialEntityGraph()
    g.add_entity("Known X", "SERVICE", "", 0.8, [])
    g.add_relationship("Known X", "Unknown Y", "USES", "", 0.5, [])
    # Known X resolved by name despite empty type; Unknown Y is an orphan
    orphans = [n for n in g.nodes.values() if n["is_orphan"]]
    assert len(orphans) == 1 and orphans[0]["name"] == "Unknown Y"
    assert orphans[0]["importance_score"] == 0.0 and orphans[0]["mention_count"] == 0
    triples = g.triples()
    assert triples == {("Known X", "USES", "Unknown Y")}


def test_directed_edges_not_merged_across_directions():
    g = SequentialEntityGraph()
    g.add_entity("A Src", "SERVICE", "", 0.8, [])
    g.add_entity("B Tgt", "SERVICE", "", 0.8, [])
    g.add_relationship("A Src", "B Tgt", "USES", "", 0.5, [])
    g.add_relationship("B Tgt", "A Src", "USES", "", 0.5, [])
    assert len(g.edges) == 2


# --- Spark aggregation equivalents ------------------------------------------


@pytest.mark.spark
def test_spark_consolidation_matches_graph_semantics(spark):
    from graphrag_mrkr_2_spark.operators.triples import (
        build_edges,
        build_nodes,
        build_triples,
        consolidate_entities_per_doc,
        consolidate_relationships_per_doc,
    )

    ents = spark.createDataFrame(
        [
            ("c1", "d1", "ADMIN PANEL", "COMPONENT", "zebra desc", 0.8, ["c1"]),
            ("c2", "d1", "ADMIN PANEL", "COMPONENT", "alpha desc", 0.6, ["c2"]),
            ("c1", "d1", "USER DATABASE", "SERVICE", "store", 0.7, ["c1"]),
        ],
        ENT_SCHEMA,
    )
    rels = spark.createDataFrame(
        [
            ("c1", "d1", "ADMIN PANEL", "USER DATABASE", "DEPENDS_ON", "q1", 0.5, ["c1"]),
            ("c2", "d1", "ADMIN PANEL", "USER DATABASE", "DEPENDS_ON", "q2", 0.7, ["c2"]),
            ("c2", "d1", "ADMIN PANEL", "MISSING TARGET", "USES", "x", 0.9, ["c2"]),
            ("c2", "d1", "ADMIN PANEL", "USER DATABASE", "WEAK", "w", 0.3, ["c2"]),
        ],
        REL_SCHEMA,
    )
    e_doc = consolidate_entities_per_doc(ents)
    rows = {r["name"]: r for r in e_doc.collect()}
    ap = rows["ADMIN PANEL"]
    assert ap["importance_score"] == pytest.approx(0.7)
    assert ap["mention_count"] == 2
    assert sorted(ap["source_chunks"]) == ["c1", "c2"]

    r_doc = consolidate_relationships_per_doc(rels, e_doc)
    rrows = r_doc.collect()
    # MISSING TARGET dropped (endpoint check), WEAK dropped (strength<0.4)
    assert len(rrows) == 1
    r0 = rrows[0]
    assert r0["strength"] == pytest.approx(1.2)
    assert r0["mention_count"] == 2
    assert r0["description"] == "q1\nq2"

    nodes = build_nodes(e_doc.withColumn("is_orphan", F.lit(False)))
    n = {r["name"]: r for r in nodes.collect()}
    assert n["ADMIN PANEL"]["entity_id"] == __import__("hashlib").md5(
        b"admin panel"
    ).hexdigest()[:16]

    triples = build_triples(build_edges(r_doc))
    assert {(t["subj"], t["pred"], t["obj"]) for t in triples.collect()} == {
        ("ADMIN PANEL", "DEPENDS_ON", "USER DATABASE")
    }


@pytest.mark.spark
def test_spark_orphans(spark):
    from graphrag_mrkr_2_spark.operators.triples import orphan_entities_per_doc

    e_doc = spark.createDataFrame(
        [("d1", "KNOWN X", "SERVICE", "", 0.8, ["c1"], 1)],
        "document_id string, name string, type string, description string, importance_score double, source_chunks array<string>, mention_count long",
    )
    r_doc = spark.createDataFrame(
        [("d1", "KNOWN X", "UNKNOWN Y", "USES", 0.5, ["c1"], 1, "")],
        "document_id string, source_entity string, target_entity string, relationship_type string, strength double, source_chunks array<string>, mention_count long, description string",
    )
    orphans = orphan_entities_per_doc(r_doc, e_doc).collect()
    assert len(orphans) == 1
    assert orphans[0]["name"] == "UNKNOWN Y" and orphans[0]["is_orphan"]


@pytest.mark.spark
def test_description_summarization_gate(spark):
    """C7 — only long, frequently-mentioned descriptions are rewritten
    (description_summarizer.py:347-373)."""
    from graphrag_mrkr_2_spark.operators.summarize import summarize_descriptions

    long_desc = "\n".join(f"line number {i} with some description text" for i in range(12))
    rows = [
        ("E LONG HOT", long_desc, 5),   # qualifies
        ("E LONG COLD", long_desc, 2),  # too few mentions
        ("E SHORT HOT", "short", 9),    # too short
    ]
    df = spark.createDataFrame(rows, "name string, description string, mention_count long")
    out = {r["name"]: r["description"] for r in summarize_descriptions(df).collect()}
    assert len(out["E LONG HOT"]) < len(long_desc)  # compressed
    assert out["E LONG COLD"] == long_desc          # untouched
    assert out["E SHORT HOT"] == "short"            # untouched
