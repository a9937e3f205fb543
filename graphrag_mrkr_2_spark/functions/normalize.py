"""Entity/relationship name & type normalization and low-value filtering.

Reimplements, with identical observable behavior, the normalization stack of
the reference (cited per function):

- parser-level name normalization   -> core/tuple_parser.py:346-370
- extractor-level name normalization-> core/entity_extraction.py:393-416
- entity type normalization         -> core/entity_extraction.py:418-441
- low-value entity filter           -> core/entity_extraction.py:443-468
  with pattern lists at core/entity_extraction.py:273-292

These functions define triple identity, so they are ported semantically
byte-for-byte (same regexes, same ordering of rules) and are exercised by
unit tests against hand-computed expectations.
"""

from __future__ import annotations

import re

# --- ontology ---------------------------------------------------------------
# core/entity_extraction.py:114-146 (DEFAULT_ENTITY_TYPES)
DEFAULT_ENTITY_TYPES = [
    "COMPONENT", "SERVICE", "NODE", "DOMAIN", "CLASS_OF_SERVICE", "ACCOUNT",
    "ACCOUNT_TYPE", "ROLE", "RESOURCE", "QUOTA_OBJECT", "BACKUP_OBJECT",
    "ITEM", "STORAGE_OBJECT", "MIGRATION_PROCEDURE", "CERTIFICATE",
    "CONFIG_OPTION", "SECURITY_FEATURE", "CLI_COMMAND", "API_OBJECT", "TASK",
    "PROCEDURE", "CONCEPT", "DOCUMENT", "PERSON", "ORGANIZATION", "LOCATION",
    "EVENT", "TECHNOLOGY", "PRODUCT", "DATE", "MONEY", "ARTICLE",
]
_DEFAULT_ENTITY_TYPE_SET = frozenset(DEFAULT_ENTITY_TYPES)

# core/entity_extraction.py:148-270 (CARBONIO_ENTITY_TYPE_OVERRIDES)
CARBONIO_ENTITY_TYPE_OVERRIDES = {
    "CLASS OF SERVICE": "CLASS_OF_SERVICE",
    "CLASS OF SERVICES": "CLASS_OF_SERVICE",
    "CLASS OF SERVICES (COS)": "CLASS_OF_SERVICE",
    "COS": "CLASS_OF_SERVICE",
    "DOMAIN": "DOMAIN",
    "E-MAIL DOMAIN": "DOMAIN",
    "MAIL DOMAIN": "DOMAIN",
    "REGULAR USER": "ACCOUNT_TYPE",
    "USER ACCOUNT": "ACCOUNT_TYPE",
    "END USER": "ACCOUNT_TYPE",
    "FUNCTIONAL ACCOUNT": "ACCOUNT_TYPE",
    "SHARED ACCOUNT": "ACCOUNT_TYPE",
    "RESOURCE ACCOUNT": "RESOURCE",
    "SYSTEM ACCOUNT": "ACCOUNT_TYPE",
    "EXTERNAL ACCOUNT": "ACCOUNT_TYPE",
    "RESOURCE": "RESOURCE",
    "GLOBAL ADMIN": "ROLE",
    "GLOBAL ADMINISTRATOR": "ROLE",
    "DELEGATED ADMIN": "ROLE",
    "DELEGATED ADMINISTRATOR": "ROLE",
    "DOMAIN ADMIN": "ROLE",
    "MTA": "COMPONENT",
    "MTA AV/AS": "COMPONENT",
    "MAILSTORE": "COMPONENT",
    "MAILSTORE & PROVISIONING": "COMPONENT",
    "PROXY": "COMPONENT",
    "FILES": "COMPONENT",
    "CHATS": "COMPONENT",
    "DOCS": "COMPONENT",
    "DOCS & EDITOR": "COMPONENT",
    "TASKS": "COMPONENT",
    "VIDEO SERVER": "COMPONENT",
    "MONITORING": "COMPONENT",
    "BACKUP": "COMPONENT",
    "MESH & DIRECTORY": "SERVICE",
    "DIRECTORY": "SERVICE",
    "DIRECTORY REPLICA": "SERVICE",
    "EVENT STREAMING": "SERVICE",
    "NODE": "NODE",
    "SERVER NODE": "NODE",
    "CARBONIO NODE": "NODE",
    "ITEM": "ITEM",
    "BACKUP ITEM": "ITEM",
    "SMARTSCAN": "BACKUP_OBJECT",
    "SMART SCAN": "BACKUP_OBJECT",
    "REALTIME SCANNER": "BACKUP_OBJECT",
    "REAL TIME SCANNER": "BACKUP_OBJECT",
    "BACKUP PATH": "BACKUP_OBJECT",
    "RETENTION POLICY": "BACKUP_OBJECT",
    "LEGAL HOLD": "BACKUP_OBJECT",
    "VOLUME": "STORAGE_OBJECT",
    "PRIMARY VOLUME": "STORAGE_OBJECT",
    "SECONDARY VOLUME": "STORAGE_OBJECT",
    "HSM VOLUME": "STORAGE_OBJECT",
    "OBJECT STORAGE": "STORAGE_OBJECT",
    "STORAGE TIER": "STORAGE_OBJECT",
    "DOMAIN CERTIFICATE": "CERTIFICATE",
    "WILDCARD CERTIFICATE": "CERTIFICATE",
    "INFRASTRUCTURE CERTIFICATE": "CERTIFICATE",
    "TLS CERTIFICATE": "CERTIFICATE",
    "CERTIFICATE": "CERTIFICATE",
    "PUBLIC SERVICE HOSTNAME": "CONFIG_OPTION",
    "VIRTUAL HOST NAME": "CONFIG_OPTION",
    "PUBLIC HOSTNAME": "CONFIG_OPTION",
    "HSM POLICY": "CONFIG_OPTION",
    "HSM SETTINGS": "CONFIG_OPTION",
    "DOS FILTER": "SECURITY_FEATURE",
    "DENIAL OF SERVICE FILTER": "SECURITY_FEATURE",
    "OTP": "SECURITY_FEATURE",
    "ONE-TIME PASSWORD": "SECURITY_FEATURE",
    "S/MIME": "SECURITY_FEATURE",
    "SMIME": "SECURITY_FEATURE",
    "AUTHENTICATION METHOD": "SECURITY_FEATURE",
    "MIGRATION PROCEDURE": "MIGRATION_PROCEDURE",
    "MIGRATION FLOW": "MIGRATION_PROCEDURE",
    "MIGRATION PATH": "MIGRATION_PROCEDURE",
    "CLI COMMAND": "CLI_COMMAND",
    "CARBONIO CLI COMMAND": "CLI_COMMAND",
    "API OBJECT": "API_OBJECT",
    "FILES API OBJECT": "API_OBJECT",
    "TASK": "TASK",
    "ADMIN TASK": "TASK",
    "MAINTENANCE TASK": "TASK",
    "PROCEDURE": "PROCEDURE",
    "ADMIN PROCEDURE": "PROCEDURE",
    "MAINTENANCE PROCEDURE": "PROCEDURE",
    "RPO": "CONCEPT",
    "RTO": "CONCEPT",
    "BACKUP STRATEGY": "CONCEPT",
    "USER MANAGEMENT": "CONCEPT",
}

# core/entity_extraction.py:294-303 — legacy cleanups merged under overrides
ENTITY_TYPE_MAPPING = {
    "SECTION": "CONCEPT",
    "SERVICE": "PRODUCT",
    "CONTACT": "TECHNOLOGY",
    **CARBONIO_ENTITY_TYPE_OVERRIDES,
}

# core/entity_extraction.py:273-292 (LOW_VALUE_PATTERNS)
LOW_VALUE_PATTERNS = [
    r"^(?:the|and|or|but|with|from|for|at|by|on|in|to|of|a|an)$",
    r"^(?:this|that|these|those|here|there|where|when|what|who|how|why)$",
    r"^(?:company|organization|group|team|department|division|system|process|method|approach|way|means)$",
    r"^(?:data|information|content|text|document|report|file|item|thing|stuff)$",
    r"^(?:new|old|first|last|next|previous|current|recent|good|bad|big|small|high|low|major|minor)$",
    r"^\d{1,3}$",
    r"^[a-zA-Z]$",
    r"^.{1,2}$",
    r"^\.[a-z]{2,4}$",
    r"^[A-Z]{1,3}\d*$",
]
_LOW_VALUE_RES = [re.compile(p, re.IGNORECASE) for p in LOW_VALUE_PATTERNS]

# core/entity_extraction.py:457-464 — extra gates for generic CONCEPTs
_GENERIC_CONCEPT_PATTERNS = [
    r"^(?:management|system|program|process|method|approach|solution)$",
    r"^(?:inspection|treatment|damage|condition|presence|lack)$",
    r"^(?:area|areas|location|locations|structure|structures)$",
]
_GENERIC_CONCEPT_RES = [re.compile(p, re.IGNORECASE) for p in _GENERIC_CONCEPT_PATTERNS]

_WS_RE = re.compile(r"\s+")
_PUNCT_RE = re.compile(r"[^\w\s\-\.\(\)\/]")
_SUBFLOOR_RE = re.compile(r"\b(?:sub[\-\s]?floor)\b", re.IGNORECASE)
_SUBSTRUCTURE_RE = re.compile(r"\b(?:sub[\-\s]?structure)\b", re.IGNORECASE)
_PAREN_RE = re.compile(r"\s*\([^)]*\)\s*")
_STARRED_TYPE_RE = re.compile(r"^\*+([A-Z]+)\*+$")


def parser_normalize_name(name: str) -> str:
    """Parser-level normalization: strip, collapse whitespace, UPPER.

    core/tuple_parser.py:346-370 (_normalize_entity_name).
    """
    return _WS_RE.sub(" ", name.strip()).upper()


def normalize_rel_type(rel_type: str) -> str:
    """core/tuple_parser.py:320 — upper + spaces→underscores."""
    return rel_type.strip().upper().replace(" ", "_")


def extractor_normalize_name(name: str) -> str:
    """Extractor-level normalization (applied at dedup time).

    core/entity_extraction.py:393-416: collapse ws, strip punctuation except
    word chars / whitespace / - . ( ) /, domain rewrites
    subfloor/substructure, drop parenthetical content, collapse ws again.
    """
    normalized = _WS_RE.sub(" ", name.strip())
    normalized = _PUNCT_RE.sub("", normalized)
    normalized = _SUBFLOOR_RE.sub("subfloor", normalized)
    normalized = _SUBSTRUCTURE_RE.sub("substructure", normalized)
    normalized = _PAREN_RE.sub(" ", normalized)
    normalized = _WS_RE.sub(" ", normalized).strip()
    return normalized


def normalize_entity_type(entity_type: str) -> str:
    """core/entity_extraction.py:418-441 (_normalize_entity_type)."""
    cleaned_type = entity_type.strip().upper()
    if cleaned_type in ENTITY_TYPE_MAPPING:
        return ENTITY_TYPE_MAPPING[cleaned_type]
    if "(" in cleaned_type and ")" in cleaned_type:
        base_type = cleaned_type.split("(")[0].strip()
        if base_type in _DEFAULT_ENTITY_TYPE_SET:
            return base_type
    cleaned_type = _STARRED_TYPE_RE.sub(r"\1", cleaned_type)
    if cleaned_type not in _DEFAULT_ENTITY_TYPE_SET:
        return "CONCEPT"
    return cleaned_type


def is_low_value_entity(name: str, entity_type: str, importance: float) -> bool:
    """core/entity_extraction.py:443-468 (_is_low_value_entity)."""
    if importance < 0.3:
        return True
    name_lower = name.lower().strip()
    for pattern in _LOW_VALUE_RES:
        if pattern.match(name_lower):
            return True
    if entity_type == "CONCEPT" and importance < 0.6:
        for pattern in _GENERIC_CONCEPT_RES:
            if pattern.match(name_lower):
                return True
    return False


def canonical_key(name: str, type_: str) -> tuple[str, str]:
    """EntityGraph canonical key: strip, collapse ws, UPPER on both fields.

    core/entity_graph.py:76-96 (_canonical_key).
    """
    return (
        _WS_RE.sub(" ", (name or "").strip()).upper(),
        _WS_RE.sub(" ", (type_ or "").strip()).upper(),
    )


def entity_id(name: str) -> str:
    """Stable entity id: md5(lower(name))[:16] — name-only.

    core/entity_graph.py:400-404 / ingestion/document_processor.py:323-325.
    """
    import hashlib

    return hashlib.md5((name or "").lower().encode()).hexdigest()[:16]
