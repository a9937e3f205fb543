"""Per-chunk extraction semantics: low-value filter + dedup + gleaning."""

from graphrag_mrkr_2_spark.functions.extraction import (
    deduplicate_entities,
    extract_chunk_with_gleaning,
    parse_extraction_response,
)


def test_parse_filters_low_value_entities():
    text = "\n".join(
        [
            '("entity"<|>the<|>CONCEPT<|>article<|>0.9)',
            '("entity"<|>Low Importance Thing<|>PRODUCT<|>d<|>0.2)',
            '("entity"<|>Admin Panel<|>COMPONENT<|>d<|>0.9)',
        ]
    )
    ents, rels = parse_extraction_response(text, "c1")
    assert [e["name"] for e in ents] == ["ADMIN PANEL"]


def test_parse_applies_type_mapping_and_paren_strip():
    text = '("entity"<|>Widget (Legacy)<|>GADGET_FRAMEWORK<|>d<|>0.7)'
    ents, _ = parse_extraction_response(text, "c1")
    assert ents[0]["name"] == "WIDGET"  # parenthetical removed
    assert ents[0]["type"] == "CONCEPT"  # unknown type -> CONCEPT


def test_dedup_merges_same_key():
    ents = [
        {"name": "ADMIN PANEL", "type": "COMPONENT", "description": "short", "importance_score": 0.8, "source_chunks": ["c1"]},
        {"name": "Admin  Panel", "type": "COMPONENT", "description": "a longer description", "importance_score": 0.6, "source_chunks": ["c2"]},
    ]
    out = deduplicate_entities(ents)
    assert len(out) == 1
    e = out[0]
    assert e["description"] == "a longer description"  # keep longer (:506-507)
    assert e["importance_score"] == 0.7  # pairwise average (:508-511)
    assert sorted(e["source_chunks"]) == ["c1", "c2"]


def test_dedup_distinct_types_not_merged():
    ents = [
        {"name": "X NAME", "type": "SERVICE", "description": "", "importance_score": 0.5, "source_chunks": []},
        {"name": "X NAME", "type": "PRODUCT", "description": "", "importance_score": 0.5, "source_chunks": []},
    ]
    # SERVICE maps to PRODUCT (legacy cleanup) -> same key -> merged
    out = deduplicate_entities(ents)
    assert len(out) == 1 and out[0]["type"] == "PRODUCT"


def test_gleaning_accumulates_and_dedups():
    responses = {
        0: '("entity"<|>Ent Alpha<|>COMPONENT<|>d<|>0.8)\n("relationship"<|>Ent Alpha<|>Ent Beta<|>USES<|>d<|>0.6)',
        1: '("entity"<|>Ent Beta<|>SERVICE<|>d<|>0.7)\n("entity"<|>Ent Alpha<|>COMPONENT<|>dd<|>0.6)',
        2: "",
    }
    ents, rels = extract_chunk_with_gleaning(
        "text", "c1", lambda t, c, p: responses[p], max_gleanings=5
    )
    names = sorted(e["name"] for e in ents)
    assert names == ["ENT ALPHA", "ENT BETA"]
    alpha = [e for e in ents if e["name"] == "ENT ALPHA"][0]
    assert alpha["importance_score"] == 0.7  # merged across passes
    assert len(rels) == 1


def test_gleaning_zero_passes():
    calls = []

    def llm(t, c, p):
        calls.append(p)
        return '("entity"<|>Solo Entity<|>COMPONENT<|>d<|>0.8)'

    ents, _ = extract_chunk_with_gleaning("text", "c1", llm, max_gleanings=0)
    assert calls == [0]
    assert len(ents) == 1


def test_pipe_fallback_parser():
    """X5 — tuple parse finds nothing, response looks pipe-formatted ->
    fallback (entity_extraction.py:612-615, :623-725)."""
    from graphrag_mrkr_2_spark.functions.extraction import parse_extraction_response

    pipe = (
        "ENTITIES:\n"
        "- Name: Admin Panel | Type: COMPONENT | Description: web ui | Importance: 0.9\n"
        "- Name: the | Type: CONCEPT | Description: junk | Importance: 0.9\n"
        "- Name: Widget (Legacy) | Type: UNKNOWN | Description: d | Importance: 0.7\n"
        "RELATIONSHIPS:\n"
        "- Source: Admin Panel | Target: User Database | Type: WEIRD_TYPE | Description: d | Strength: 0.7\n"
        "- Source: Admin Panel | Target: User Database | Type: MENTIONS | Description: d | Strength: 0.6\n"
    )
    ents, rels = parse_extraction_response(pipe, "c1")
    names = {(e["name"], e["type"]) for e in ents}
    assert ("Admin Panel", "COMPONENT") in names
    assert ("Widget", "CONCEPT") in names  # paren strip + unknown type
    assert not any(e["name"] == "the" for e in ents)  # low-value filtered
    assert rels[0]["relationship_type"] == "RELATED_TO"  # unknown predicate
    assert rels[1]["relationship_type"] == "MENTIONS"  # known kept


def test_pipe_fallback_not_triggered_when_tuples_parse():
    from graphrag_mrkr_2_spark.functions.extraction import parse_extraction_response

    mixed = (
        '("entity"<|>Real Entity<|>COMPONENT<|>d<|>0.8)\n'
        "- Name: Should Not Appear | Type: COMPONENT | Description: x | Importance: 0.9\n"
    )
    ents, _ = parse_extraction_response(mixed, "c1")
    assert [e["name"] for e in ents] == ["REAL ENTITY"]
