"""Parser semantics mirrored from the reference's parser tests
(/root/reference/tests/integration/test_tuple_parser.py — pure unit
assertions on parse behavior, SURVEY §5)."""

from graphrag_mrkr_2_spark.functions.tuple_parser import parse_tuples


def test_basic_entity():
    r = parse_tuples('("entity"<|>Admin Panel<|>COMPONENT<|>Web UI<|>0.9)', "c1")
    assert len(r.entities) == 1
    e = r.entities[0]
    assert e["name"] == "ADMIN PANEL"  # upper + collapse (tuple_parser.py:346-370)
    assert e["type"] == "COMPONENT"
    assert e["description"] == "Web UI"
    assert e["importance_score"] == 0.9
    assert e["source_chunks"] == ["c1"]


def test_importance_default_and_clamp():
    r = parse_tuples(
        '("entity"<|>A Name X<|>COMPONENT<|>desc)\n("entity"<|>B Name Y<|>COMPONENT<|>desc<|>1.7)'
    )
    assert r.entities[0]["importance_score"] == 0.5  # missing -> 0.5 (:242)
    assert r.entities[1]["importance_score"] == 0.5  # out of range -> 0.5 (:256-260)


def test_importance_blank_field_defaults():
    r = parse_tuples('("entity"<|>A Name X<|>TYPE<|>desc<|>)')
    assert r.entities[0]["importance_score"] == 0.5


def test_non_numeric_importance_is_parse_error():
    r = parse_tuples('("entity"<|>A Name X<|>TYPE<|>desc<|>high)')
    assert not r.entities
    assert len(r.parse_errors) == 1  # ValueError caught per line (:147-151)


def test_entity_needs_two_fields():
    r = parse_tuples('("entity"<|>ONLY NAME)')
    assert not r.entities
    assert r.parse_errors  # insufficient fields (:231-236)


def test_relationship_basic_and_type_normalization():
    r = parse_tuples(
        '("relationship"<|>admin panel<|>user database<|>depends on<|>auth queries<|>0.7)'
    )
    rel = r.relationships[0]
    assert rel["source_entity"] == "ADMIN PANEL"
    assert rel["target_entity"] == "USER DATABASE"
    assert rel["relationship_type"] == "DEPENDS_ON"  # upper + underscores (:320)
    assert rel["strength"] == 0.7


def test_relationship_strength_default():
    r = parse_tuples('("relationship"<|>A B<|>C D<|>links)')
    assert r.relationships[0]["strength"] == 0.5


def test_relationship_needs_three_fields():
    r = parse_tuples('("relationship"<|>A B<|>C D)')
    assert not r.relationships
    assert r.parse_errors


def test_garbage_lines_skipped_silently():
    text = "Here are the extractions:\nnot a tuple at all\n# comment\n\n"
    r = parse_tuples(text)
    assert not r.entities and not r.relationships and not r.parse_errors


def test_empty_input():
    r = parse_tuples("   ")
    assert r.parse_errors == ["Empty input text"]
    assert r.invalid_count == 1


def test_whitespace_collapse_in_names():
    r = parse_tuples('("entity"<|>  spaced   Name  <|>TYPE<|>d<|>0.8)')
    assert r.entities[0]["name"] == "SPACED NAME"


def test_unknown_tuple_type_is_error():
    r = parse_tuples('("thing"<|>A<|>B<|>C)')
    assert r.parse_errors == ["Line 1: Unknown tuple type 'thing'"]


def test_mixed_valid_invalid_recovers():
    text = "\n".join(
        [
            '("entity"<|>Good One<|>COMPONENT<|>d<|>0.8)',
            '("entity"<|>BAD)',
            '("relationship"<|>Good One<|>Other Two<|>USES<|>d<|>0.6)',
        ]
    )
    r = parse_tuples(text)
    assert len(r.entities) == 1 and len(r.relationships) == 1
    assert len(r.parse_errors) == 1
