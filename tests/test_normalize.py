"""Normalization + low-value filter semantics (entity_extraction.py:393-468)."""

from graphrag_mrkr_2_spark.functions.normalize import (
    canonical_key,
    entity_id,
    extractor_normalize_name,
    is_low_value_entity,
    normalize_entity_type,
)


def test_extractor_name_strips_punct_keeps_allowed():
    assert extractor_normalize_name("Foo,;:!? Bar-Baz.Q/(x)") == "Foo Bar-Baz.Q/"


def test_extractor_name_removes_parentheticals():
    assert extractor_normalize_name("WIDGET (LEGACY)") == "WIDGET"
    assert extractor_normalize_name("A (x) B (y) C") == "A B C"


def test_extractor_name_domain_rewrites():
    assert extractor_normalize_name("the Sub-Floor area") == "the subfloor area"
    assert extractor_normalize_name("SUB STRUCTURE") == "substructure"


def test_type_mapping_overrides():
    assert normalize_entity_type("MAILSTORE") == "COMPONENT"
    assert normalize_entity_type("class of service") == "CLASS_OF_SERVICE"
    assert normalize_entity_type("SERVICE") == "PRODUCT"  # legacy cleanup
    assert normalize_entity_type("SECTION") == "CONCEPT"


def test_type_parenthetical_base():
    assert normalize_entity_type("COMPONENT (CORE)") == "COMPONENT"
    # base not in defaults -> CONCEPT
    assert normalize_entity_type("WHATEVER (X)") == "CONCEPT"


def test_type_starred_and_unknown():
    assert normalize_entity_type("**CONCEPT**") == "CONCEPT"
    assert normalize_entity_type("GADGET_FRAMEWORK") == "CONCEPT"
    assert normalize_entity_type("person") == "PERSON"


def test_low_value_importance_gate():
    assert is_low_value_entity("VALID NAME", "COMPONENT", 0.2)
    assert not is_low_value_entity("VALID NAME", "COMPONENT", 0.3)


def test_low_value_patterns():
    assert is_low_value_entity("the", "CONCEPT", 0.9)
    assert is_low_value_entity("THIS", "COMPONENT", 0.9)  # case-insensitive
    assert is_low_value_entity("123", "COMPONENT", 0.9)
    assert is_low_value_entity("AB", "COMPONENT", 0.9)  # <=2 chars
    assert is_low_value_entity("ABC2", "COMPONENT", 0.9)  # [A-Z]{1,3}\d*
    assert not is_low_value_entity("ADMIN PANEL", "COMPONENT", 0.9)


def test_low_value_generic_concept():
    assert is_low_value_entity("management", "CONCEPT", 0.5)
    assert not is_low_value_entity("management", "CONCEPT", 0.6)
    assert not is_low_value_entity("management", "COMPONENT", 0.5)


def test_canonical_key():
    assert canonical_key(" Admin  Panel ", "component") == ("ADMIN PANEL", "COMPONENT")
    assert canonical_key("x", None) == ("X", "")


def test_entity_id_name_only_md5():
    import hashlib

    assert entity_id("Admin Panel") == hashlib.md5(b"admin panel").hexdigest()[:16]
    assert entity_id("ADMIN PANEL") == entity_id("admin panel")
