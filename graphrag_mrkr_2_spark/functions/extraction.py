"""Per-chunk extraction semantics: parse -> low-value filter -> dedup -> glean.

Reimplements the chunk-local part of the reference's extraction flow:

- ``_parse_tuple_response``  core/entity_extraction.py:726-775
  (TupleParser.parse, then low-value filter, then per-chunk dedup)
- ``_deduplicate_entities``  core/entity_extraction.py:470-513
  (extractor-level name/type normalization, key (name.lower(), type);
  merge: union provenance, keep longer description, pairwise-average
  importance)
- gleaning loop              core/entity_extraction.py:879-1044
  (pass 1 + up to max_gleanings continuation passes; early stop when a
  pass yields neither entities nor relationships; final dedup over all
  passes; relationships accumulated un-deduplicated)

The LLM is injected as a callable ``(chunk_text, chunk_id, pass_index) ->
str`` so tests/bench use the deterministic mock in ``mock_llm.py`` while a
real deployment plugs an API client into the same seam.

Everything here is chunk-local (no cross-chunk state) by construction, which
is what makes the Spark mapInPandas parallelization in
``operators/extract.py`` semantically exact.
"""

from __future__ import annotations

from collections.abc import Callable

from .normalize import (
    extractor_normalize_name,
    is_low_value_entity,
    normalize_entity_type,
)
from .tuple_parser import parse_tuples

LlmFn = Callable[[str, str, int], str]


def deduplicate_entities(entities: list[dict]) -> list[dict]:
    """core/entity_extraction.py:470-513 (_deduplicate_entities).

    Applies extractor-level normalization and merges duplicates keyed on
    ``(normalized_name.lower(), normalized_type)``. Keeps first-seen entity
    identity; merge = union source_chunks, keep longer description,
    running pairwise average of importance (order-dependent in the
    reference; irrelevant to (subj,pred,obj) identity — see SURVEY §7.4).
    """
    seen: dict[tuple[str, str], dict] = {}
    deduplicated: list[dict] = []
    for entity in entities:
        normalized_name = extractor_normalize_name(entity["name"])
        normalized_type = normalize_entity_type(entity["type"])
        key = (normalized_name.lower(), normalized_type)
        if key not in seen:
            merged = {
                "name": normalized_name,
                "type": normalized_type,
                "description": entity["description"],
                "importance_score": entity["importance_score"],
                "source_chunks": list(entity.get("source_chunks") or []),
            }
            seen[key] = merged
            deduplicated.append(merged)
        else:
            existing = seen[key]
            if entity.get("source_chunks"):
                merged_units = set(existing["source_chunks"])
                merged_units.update(entity["source_chunks"])
                existing["source_chunks"] = sorted(merged_units)
            if len(entity["description"]) > len(existing["description"]):
                existing["description"] = entity["description"]
            existing["importance_score"] = (
                existing["importance_score"] + entity["importance_score"]
            ) / 2
    return deduplicated


def parse_extraction_response(
    response: str, chunk_id: str
) -> tuple[list[dict], list[dict]]:
    """core/entity_extraction.py:726-775 (_parse_tuple_response).

    Parse tuple_v1 text, drop low-value entities (importance<0.3, pattern
    blocklist, generic CONCEPT<0.6), then per-response dedup. Relationships
    pass through with parser normalization only.
    """
    result = parse_tuples(response, chunk_id=chunk_id)
    filtered = [
        e
        for e in result.entities
        if not is_low_value_entity(e["name"], e["type"], e["importance_score"])
    ]
    return deduplicate_entities(filtered), result.relationships


def extract_chunk_with_gleaning(
    chunk_text: str,
    chunk_id: str,
    llm: LlmFn,
    max_gleanings: int = 1,
) -> tuple[list[dict], list[dict]]:
    """core/entity_extraction.py:879-1044 (extract_from_chunk_with_gleaning).

    Pass 1 extraction, then up to ``max_gleanings`` continuation passes.
    A pass producing neither entities nor relationships stops the loop early
    (:1018-1022). Entities are deduplicated across passes at the end;
    relationships accumulate raw.
    """
    all_entities: list[dict] = []
    all_relationships: list[dict] = []

    response = llm(chunk_text, chunk_id, 0)
    entities, relationships = parse_extraction_response(response, chunk_id)
    all_entities.extend(entities)
    all_relationships.extend(relationships)

    if max_gleanings == 0:
        return deduplicate_entities(all_entities), all_relationships

    for gleaning_iteration in range(max_gleanings):
        response = llm(chunk_text, chunk_id, gleaning_iteration + 1)
        gleaned_entities, gleaned_relationships = parse_extraction_response(
            response, chunk_id
        )
        if not gleaned_entities and not gleaned_relationships:
            break
        all_entities.extend(gleaned_entities)
        all_relationships.extend(gleaned_relationships)

    return deduplicate_entities(all_entities), all_relationships
