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
)  # noqa: F401 — extractor_normalize_name also used by parse_pipe_response
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


# core/entity_extraction.py:305-330 (RELATION_TYPE_SUGGESTIONS) — the pipe
# parser validates predicates against this list; unknown -> RELATED_TO (:699-703)
RELATION_TYPE_SUGGESTIONS = [
    "COMPONENT_RUNS_ON_NODE", "COMPONENT_DEPENDS_ON_COMPONENT",
    "SERVICE_DEPENDS_ON_COMPONENT", "COMPONENT_PROVIDES_FEATURE",
    "DOMAIN_HAS_COS", "COS_APPLIES_TO_ACCOUNT_TYPE", "ACCOUNT_BELONGS_TO_DOMAIN",
    "ACCOUNT_HAS_ROLE", "ACCOUNT_HAS_QUOTA", "BACKUP_COVERS_ITEM",
    "ITEM_STORED_ON_STORAGE_OBJECT", "HSM_POLICY_APPLIES_TO_STORAGE_OBJECT",
    "CERTIFICATE_APPLIES_TO_DOMAIN", "CONFIG_OPTION_AFFECTS_COMPONENT",
    "SECURITY_FEATURE_PROTECTS_COMPONENT", "MIGRATION_PROCEDURE_TARGETS_COMPONENT",
    "MIGRATION_PROCEDURE_TARGETS_DOMAIN", "CLI_COMMAND_CONFIGURES_OBJECT",
    "TASK_OPERATES_ON_OBJECT", "PROCEDURE_INCLUDES_TASK", "MENTIONS",
    "REFERENCES", "ASSOCIATED_WITH", "RELATED_TO",
]

_PIPE_ENTITY_RE = None
_PIPE_REL_RE = None


def parse_pipe_response(response: str, chunk_id: str) -> tuple[list[dict], list[dict]]:
    """X5 — pipe-format fallback parser (entity_extraction.py:623-725).

    ``- Name: .. | Type: .. | Description: .. | Importance: ..`` entities and
    ``- Source: .. | Target: .. | Type: .. | Description: .. | Strength: ..``
    relationships; sections split on RELATIONSHIPS: / **RELATIONSHIPS**;
    low-value filter + extractor normalization applied inline; unknown rel
    type -> RELATED_TO; importance/strength clamped to [0,1]; final dedup.
    """
    import re as _re

    global _PIPE_ENTITY_RE, _PIPE_REL_RE
    if _PIPE_ENTITY_RE is None:
        _PIPE_ENTITY_RE = _re.compile(
            r"- Name: ([^|]+) \| Type: ([^|]+) \| Description: ([^|]+) \| Importance: ([\d.]+)"
            r"(?: \| TextUnits: \[([^\]]*)\])?"
        )
        _PIPE_REL_RE = _re.compile(
            r"- Source: ([^|]+) \| Target: ([^|]+) \| Type: ([^|]+) \| Description: ([^|]+)"
            r" \| Strength: ([\d.]+)(?: \| TextUnits: \[([^\]]*)\])?"
        )

    from .normalize import extractor_normalize_name

    entities: list[dict] = []
    relationships: list[dict] = []
    try:
        if "**RELATIONSHIPS**" in response:
            sections = response.split("**RELATIONSHIPS**")
            entities_section = sections[0].replace("**ENTITIES**", "").strip()
            relationships_section = sections[1].strip() if len(sections) > 1 else ""
        else:
            sections = response.split("RELATIONSHIPS:")
            entities_section = sections[0].replace("ENTITIES:", "").strip()
            relationships_section = sections[1].strip() if len(sections) > 1 else ""

        for match in _PIPE_ENTITY_RE.finditer(entities_section):
            name = match.group(1).strip()
            entity_type = match.group(2).strip().upper()
            description = match.group(3).strip()
            importance = float(match.group(4))
            text_units_raw = match.group(5)
            text_units = (
                [u.strip() for u in text_units_raw.split(",") if u.strip()]
                if text_units_raw
                else []
            )
            normalized_name = extractor_normalize_name(name)
            normalized_type = normalize_entity_type(entity_type)
            if is_low_value_entity(normalized_name, normalized_type, importance):
                continue
            entities.append(
                {
                    "name": normalized_name,
                    "type": normalized_type,
                    "description": description,
                    "importance_score": min(max(importance, 0.0), 1.0),
                    "source_chunks": text_units or [chunk_id],
                }
            )

        for match in _PIPE_REL_RE.finditer(relationships_section):
            source = match.group(1).strip()
            target = match.group(2).strip()
            rel_type = match.group(3).strip().upper()
            description = match.group(4).strip()
            strength = float(match.group(5))
            text_units_raw = match.group(6)
            text_units = (
                [u.strip() for u in text_units_raw.split(",") if u.strip()]
                if text_units_raw
                else []
            )
            relationships.append(
                {
                    "source_entity": extractor_normalize_name(source),
                    "target_entity": extractor_normalize_name(target),
                    "relationship_type": (
                        rel_type if rel_type in RELATION_TYPE_SUGGESTIONS else "RELATED_TO"
                    ),
                    "description": description,
                    "strength": min(max(strength, 0.0), 1.0),
                    "source_chunks": text_units or [chunk_id],
                }
            )
    except Exception:  # noqa: BLE001 — parity: log-and-continue (:718-721)
        pass

    return deduplicate_entities(entities), relationships


def parse_extraction_response(
    response: str, chunk_id: str
) -> tuple[list[dict], list[dict]]:
    """core/entity_extraction.py:604-621 (_parse_extraction_response).

    tuple_v1 primary (:726-775): parse, drop low-value entities
    (importance<0.3, pattern blocklist, generic CONCEPT<0.6), per-response
    dedup — relationships pass through with parser normalization only. If
    the tuple parse yields nothing and the response looks pipe-formatted
    (ENTITIES:/- Name:), fall back to the pipe parser (:612-615).
    """
    result = parse_tuples(response, chunk_id=chunk_id)
    filtered = [
        e
        for e in result.entities
        if not is_low_value_entity(e["name"], e["type"], e["importance_score"])
    ]
    entities, relationships = deduplicate_entities(filtered), result.relationships
    if (
        not entities
        and not relationships
        and response
        and ("ENTITIES:" in response or "- Name:" in response)
    ):
        return parse_pipe_response(response, chunk_id)
    return entities, relationships


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
