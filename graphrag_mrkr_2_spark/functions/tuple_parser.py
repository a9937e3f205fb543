"""Tuple-delimited (tuple_v1) extraction parser.

Faithful reimplementation of the reference's ``core/tuple_parser.py:69-344``
(TupleParser). Returns plain dicts (not dataclasses) so the output can be
handed to Arrow without conversion. Semantics preserved exactly:

- line-oriented; a tuple line must start with ``("`` and end with ``)``
  (tuple_parser.py:181)
- fields split on ``<|>``; every field stripped (tuple_parser.py:210-213)
- entity needs >=2 fields (name, type); description optional; importance
  parsed from field 4, default 0.5 when missing/blank, reset to 0.5 when
  outside [0,1]; non-numeric importance raises -> whole line becomes a parse
  error (tuple_parser.py:231-261 + the except at :147-151)
- relationship needs >=3 fields (source, target, type); strength default
  0.5 / clamp-to-default outside [0,1] (tuple_parser.py:294-327)
- names: strip + collapse whitespace + UPPER (tuple_parser.py:346-370)
- rel type: upper + spaces->underscores (tuple_parser.py:320)
- comment lines (#...), blank lines, non-tuple lines skipped silently
- empty input yields one parse error "Empty input text" (tuple_parser.py:94-102)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .normalize import normalize_rel_type, parser_normalize_name


@dataclass
class ParseResult:
    entities: list[dict] = field(default_factory=list)
    relationships: list[dict] = field(default_factory=list)
    parse_errors: list[str] = field(default_factory=list)

    @property
    def valid_count(self) -> int:
        return len(self.entities) + len(self.relationships)

    @property
    def invalid_count(self) -> int:
        return len(self.parse_errors)


def _parse_tuple_line(line: str) -> tuple[str, list[str]] | None:
    """tuple_parser.py:169-215 (_parse_tuple_line)."""
    if not (line.startswith('("') and line.endswith(")")):
        return None
    inner = line[1:-1]
    if not inner.startswith('"'):
        return None
    type_end = inner.find('"', 1)
    if type_end == -1:
        return None
    tuple_type = inner[1:type_end].strip().lower()
    remaining = inner[type_end + 1 :]
    if not remaining.startswith("<|>"):
        return None
    remaining = remaining[3:]
    fields = [f.strip() for f in remaining.split("<|>")]
    return (tuple_type, fields)


def _parse_entity_tuple(fields: list[str], chunk_id: str | None) -> dict | None:
    """tuple_parser.py:217-274 (_parse_entity_tuple)."""
    if len(fields) < 2:
        return None
    name = fields[0].strip()
    entity_type = fields[1].strip() if len(fields) > 1 else ""
    description = fields[2].strip() if len(fields) > 2 else ""
    # NB: float() may raise ValueError -> handled by caller as a parse error,
    # matching the reference's try/except around the whole line (:147-151).
    importance = float(fields[3]) if len(fields) > 3 and fields[3].strip() else 0.5
    if not name:
        return None
    name = parser_normalize_name(name)
    entity_type = entity_type.upper()
    if importance < 0.0 or importance > 1.0:
        importance = 0.5
    return {
        "name": name,
        "type": entity_type,
        "description": description,
        "importance_score": importance,
        "source_chunks": [chunk_id] if chunk_id else [],
    }


def _parse_relationship_tuple(fields: list[str], chunk_id: str | None) -> dict | None:
    """tuple_parser.py:276-344 (_parse_relationship_tuple)."""
    if len(fields) < 3:
        return None
    source = fields[0].strip()
    target = fields[1].strip()
    rel_type = fields[2].strip()
    description = fields[3].strip() if len(fields) > 3 else ""
    strength = float(fields[4]) if len(fields) > 4 and fields[4].strip() else 0.5
    if not source or not target:
        return None
    source = parser_normalize_name(source)
    target = parser_normalize_name(target)
    rel_type = normalize_rel_type(rel_type)
    if strength < 0.0 or strength > 1.0:
        strength = 0.5
    return {
        "source_entity": source,
        "target_entity": target,
        "relationship_type": rel_type,
        "description": description,
        "strength": strength,
        "source_chunks": [chunk_id] if chunk_id else [],
    }


def parse_tuples(text: str, chunk_id: str | None = None) -> ParseResult:
    """Parse tuple_v1 text. tuple_parser.py:69-167 (TupleParser.parse)."""
    result = ParseResult()
    if not text or not text.strip():
        result.parse_errors.append("Empty input text")
        return result

    for line_num, raw_line in enumerate(text.strip().split("\n"), start=1):
        line = raw_line.strip()
        if not line or line.startswith("#"):
            continue
        try:
            parsed = _parse_tuple_line(line)
            if parsed is None:
                continue  # non-tuple prose: skipped silently (:118-120)
            tuple_type, fields = parsed
            if tuple_type == "entity":
                entity = _parse_entity_tuple(fields, chunk_id)
                if entity:
                    result.entities.append(entity)
                else:
                    result.parse_errors.append(
                        f"Line {line_num}: Failed to parse entity tuple"
                    )
            elif tuple_type == "relationship":
                rel = _parse_relationship_tuple(fields, chunk_id)
                if rel:
                    result.relationships.append(rel)
                else:
                    result.parse_errors.append(
                        f"Line {line_num}: Failed to parse relationship tuple"
                    )
            else:
                result.parse_errors.append(
                    f"Line {line_num}: Unknown tuple type '{tuple_type}'"
                )
        except Exception as e:  # noqa: BLE001 — parity with reference :147-151
            result.parse_errors.append(f"Line {line_num}: {e}")
            continue

    return result
