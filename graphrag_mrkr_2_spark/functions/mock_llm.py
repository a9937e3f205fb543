"""Deterministic mock "LLM" emitting tuple_v1 extraction text.

Stands in for the reference's OpenAI call (core/entity_extraction.py:776-842)
so that both this engine and the reference's pure-Python parse/normalize path
consume *identical* responses, making (subj, pred, obj) P/R measurable with
no network (SURVEY §5, FIXTURES.md F3).

Contract: ``mock_llm_response(chunk_text, chunk_id, pass_index)`` is a pure
function of ``(chunk_text, pass_index)`` — chunk_id only flows into
provenance, never into the response — so any execution plan (reference
asyncio loop, Spark mapInPandas, plain map) produces the same triple set for
the same chunks.

Behavior:
- scans the chunk for mentions of a fixed entity vocabulary (the synthetic
  page generator in sources/pages.py plants these mentions);
- pass 0 emits entities at even vocabulary indices + relationships between
  consecutive found entities; pass 1 (the gleaning pass) emits the withheld
  odd-index entities + a closing relationship (disjoint from pass 0,
  mirroring the reference's "extract ONLY NEW entities" prompt,
  entity_extraction.py:844-867); pass >=2 emits nothing, exercising the
  early-stop at entity_extraction.py:1018-1022;
- deterministically sprinkles the malformed/low-value/threshold edge cases
  from FIXTURES.md F3 so every parser and filter branch is exercised.
"""

from __future__ import annotations

import hashlib

# (display_name, type_as_emitted, description, importance)
# Types include unmapped ones (-> CONCEPT), mapped overrides, and parenthetical
# names so the normalize/type-mapping branches all fire on real data.
ENTITY_VOCAB: list[tuple[str, str, str, float]] = [
    ("Admin Panel", "COMPONENT", "Web-based administration interface", 0.9),
    ("User Database", "SERVICE", "Stores user authentication data", 0.8),
    ("Auth Gateway", "COMPONENT", "Issues and validates session tokens", 0.85),
    ("Mailstore", "MAILSTORE", "Message storage backend", 0.8),
    ("Proxy", "PROXY", "Reverse proxy fronting all services", 0.7),
    ("Backup Engine", "BACKUP", "Scheduled backup orchestrator", 0.75),
    ("Primary Volume", "PRIMARY VOLUME", "Fast storage tier", 0.6),
    ("HSM Policy", "HSM POLICY", "Tiering policy for volumes", 0.55),
    ("Directory Replica", "DIRECTORY REPLICA", "LDAP replica node", 0.65),
    ("Video Server", "VIDEO SERVER", "Realtime media component", 0.6),
    ("Global Admin", "GLOBAL ADMIN", "Role with full privileges", 0.7),
    ("Migration Flow", "MIGRATION FLOW", "Procedure for moving mailboxes", 0.6),
    ("TLS Certificate", "TLS CERTIFICATE", "Certificate for public endpoints", 0.65),
    ("DoS Filter", "DOS FILTER", "Rate limiting security feature", 0.6),
    ("Widget (Legacy)", "GADGET_FRAMEWORK", "Legacy widget subsystem", 0.7),
    ("Config Loader", "UNKNOWN_KIND", "Reads layered configuration", 0.62),
    ("Event Streaming", "EVENT STREAMING", "Message bus for platform events", 0.7),
    ("Quota Manager", "QUOTA_OBJECT", "Tracks per-account quotas", 0.55),
    ("Smart Scan", "SMART SCAN", "Incremental backup scanner", 0.6),
    ("Retention Policy", "RETENTION POLICY", "Controls item retention", 0.58),
    ("Object Storage", "OBJECT STORAGE", "S3-compatible blob tier", 0.72),
    ("Carbonio Node", "CARBONIO NODE", "A server in the mesh", 0.66),
    ("Mesh & Directory", "MESH & DIRECTORY", "Service discovery layer", 0.68),
    ("Sub-Floor Sensor", "TECHNOLOGY", "Environmental monitor", 0.52),
    ("OTP", "OTP", "One-time password mechanism", 0.64),
]

# Predicates reuse the reference's suggestion list flavor
# (core/entity_extraction.py:305-330).
_PREDICATES = [
    "DEPENDS_ON",
    "COMPONENT_RUNS_ON_NODE",
    "CONFIG_OPTION_AFFECTS_COMPONENT",
    "SECURITY_FEATURE_PROTECTS_COMPONENT",
    "ASSOCIATED_WITH",
    "REFERENCES",
    "RELATED_TO",
    "PROCEDURE_INCLUDES_TASK",
]

# FIXTURES.md F3 edge-case lines, keyed by the hash bucket that triggers them.
_EDGE_CASE_LINES = [
    '("entity"<|>the<|>CONCEPT<|>low-value, must be filtered<|>0.9)',
    '("entity"<|>low importance<|>PRODUCT<|>dropped: importance < 0.3<|>0.2)',
    '("entity"<|>MALFORMED ONLY ONE FIELD)',
    "garbage line that must be skipped silently",
    '("entity"<|>Bad Importance<|>PRODUCT<|>non-numeric importance<|>high)',
    '("relationship"<|>Admin Panel<|>Orphan Target<|>references<|>missing endpoint<|>0.6)',
    '("relationship"<|>Weak Link A<|>Weak Link B<|>RELATED_TO<|>dropped: strength < 0.4<|>0.3)',
    '("entity"<|>  spaced   Name  <|>approach (detailed)<|>whitespace collapse check<|>)',
    '("relationship"<|>Admin Panel<|>User Database<|>depends on<|>lowercase predicate<|>)',
    '("entity"<|>management<|>CONCEPT<|>generic concept below 0.6<|>0.5)',
]


def _found_entities(chunk_text: str) -> list[int]:
    """Vocabulary indices mentioned in the chunk, in vocabulary order."""
    upper = chunk_text.upper()
    return [i for i, (name, _, _, _) in enumerate(ENTITY_VOCAB) if name.upper() in upper]


def _strength(i: int, j: int) -> float:
    """Deterministic per-pair strength in [0.40, 0.95] (above the 0.4 gate)."""
    h = hashlib.sha1(f"s:{i}:{j}".encode()).digest()[0]
    return round(0.40 + (h / 255.0) * 0.55, 2)


def _predicate(i: int, j: int) -> str:
    h = hashlib.sha1(f"p:{i}:{j}".encode()).digest()[0]
    return _PREDICATES[h % len(_PREDICATES)]


def mock_llm_response(chunk_text: str, chunk_id: str, pass_index: int) -> str:
    """Return tuple_v1 text for a chunk; pure in (chunk_text, pass_index)."""
    if pass_index >= 2:
        return ""  # third pass always empty -> early stop

    found = _found_entities(chunk_text)
    digest = hashlib.sha1(chunk_text.encode("utf-8", "replace")).digest()
    lines: list[str] = []

    if pass_index == 0:
        mine = [i for k, i in enumerate(found) if k % 2 == 0]
    else:
        mine = [i for k, i in enumerate(found) if k % 2 == 1]

    for i in mine:
        name, etype, desc, imp = ENTITY_VOCAB[i]
        lines.append(f'("entity"<|>{name}<|>{etype}<|>{desc}<|>{imp})')

    # relationships between consecutive found mentions; pass 0 takes even
    # pairs, pass 1 the odd pairs, so gleaning genuinely adds triples.
    for k in range(len(found) - 1):
        if k % 2 != pass_index:
            continue
        i, j = found[k], found[k + 1]
        src, _, _, _ = ENTITY_VOCAB[i]
        tgt, _, _, _ = ENTITY_VOCAB[j]
        pred = _predicate(i, j)
        lines.append(
            f'("relationship"<|>{src}<|>{tgt}<|>{pred}<|>{src} {pred.lower().replace("_", " ")} {tgt}<|>{_strength(i, j)})'
        )

    # deterministic edge-case injection: pass 0 only, two cases per chunk
    if pass_index == 0:
        lines.append(_EDGE_CASE_LINES[digest[0] % len(_EDGE_CASE_LINES)])
        lines.append(_EDGE_CASE_LINES[digest[1] % len(_EDGE_CASE_LINES)])

    if not lines:
        return ""
    header = f"Extracted tuples for {('pass ' + str(pass_index + 1))}:"
    return header + "\n" + "\n".join(lines)
