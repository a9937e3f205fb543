"""robots.txt parsing and URL permission evaluation (RFC 9309).

A crawl-curation pipeline needs to re-evaluate robots permissions at
scale: retroactive honoring of rule changes, per-domain crawlability
stats, filtering a 100 TB corpus down to what today's rules allow. This
is a from-scratch RFC 9309 implementation — group selection by
user-agent product token, longest-match precedence with allow winning
length ties, ``*`` and ``$`` wildcards, percent-encoding normalization —
plus the de-facto extensions every large crawler honors (sitemap lines,
crawl-delay).

Two independent checks in tests/test_robots.py: the RFC's own worked
examples as goldens, and a differential A/B against CPython's
urllib.robotparser on generated wildcard-free rule sets (the 1996-draft
subset where both dialects agree; robotparser predates RFC 9309 and
treats ``*`` in paths literally, so wildcard rules are goldens-only).

The reference has no crawling layer at all — its ingestion starts from
provided files (ingestion/).
"""

from __future__ import annotations

import re

_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~")
_HEX = set("0123456789abcdefABCDEF")


def _normalize_path(path: str) -> str:
    """Percent-normalize per RFC 9309 §2.2.2: decode ONLY unreserved
    octets, uppercase the hex of escapes that stay encoded, pass invalid
    escapes through literally. Reserved escapes are NOT decoded — %2F is
    not a path slash, %2A in a rule is not a wildcard, and two distinct
    invalid escapes must not collide (review r7 findings). Applied
    identically to rules and URL paths so comparisons are stable."""
    if not path:
        return "/"
    out = []
    i = 0
    n = len(path)
    while i < n:
        c = path[i]
        if c == "%" and i + 2 < n and path[i + 1] in _HEX \
                and path[i + 2] in _HEX:
            decoded = chr(int(path[i + 1:i + 3], 16))
            if decoded in _UNRESERVED:
                out.append(decoded)
            else:
                out.append("%" + path[i + 1:i + 3].upper())
            i += 3
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _match_rule(parts: list[str], anchored: bool, path: str) -> bool:
    """Linear-time wildcard match: ``parts`` are the rule split on '*'.
    Leftmost-greedy two-pointer scan — no regex, so a hostile
    many-wildcard rule cannot trigger catastrophic backtracking (review
    r7: a 14-star rule hung a regex matcher for minutes)."""
    first = parts[0]
    if not path.startswith(first):
        return False
    pos = len(first)
    if len(parts) == 1:  # no '*': only '$'-anchored rules land here
        return path == first if anchored else True
    for part in parts[1:-1]:
        if part:
            found = path.find(part, pos)
            if found < 0:
                return False
            pos = found + len(part)
    last = parts[-1]
    if anchored:
        return path.endswith(last) and len(path) - len(last) >= pos
    if not last:
        return True
    return path.find(last, pos) >= 0


class RobotsGroup:
    __slots__ = ("agents", "rules", "crawl_delay")

    def __init__(self):
        self.agents: list[str] = []
        # (allow, rule_length, parts-or-None, anchored, prefix)
        self.rules: list[tuple] = []
        self.crawl_delay: float | None = None

    def is_allowed(self, path: str) -> bool:
        """§2.2.2 most-specific-match over this (merged) group."""
        path = _normalize_path(path)
        best_len = -1
        best_allow = True
        for allow, length, parts, anchored, prefix in self.rules:
            if parts is None:
                if not path.startswith(prefix):
                    continue
            elif not _match_rule(parts, anchored, path):
                continue
            if length > best_len or (length == best_len and allow
                                     and not best_allow):
                best_len, best_allow = length, allow
        return best_allow if best_len >= 0 else True


class RobotsPolicy:
    """Parsed robots.txt: pick the group for a user agent, evaluate
    paths against it."""

    def __init__(self, groups: list[RobotsGroup], sitemaps: list[str]):
        self.groups = groups
        self.sitemaps = sitemaps

    def group_for(self, user_agent: str) -> RobotsGroup | None:
        """§2.2.1: the group whose agent token is the LONGEST prefix
        match of the product token; '*' only when nothing matches.
        Groups tied at the winning specificity MUST be merged (the spec's
        combine rule — sites repeat 'User-agent: x' sections). Hot-loop
        callers (evaluate_robots) cache the returned merged group and
        call its ``is_allowed`` directly — this scan runs once per
        (robots.txt, agent), not once per URL."""
        token = re.split(r"[/\s]", user_agent.strip().lower(), 1)[0]
        best_len = -1
        for g in self.groups:
            for agent in g.agents:
                if agent != "*" and token.startswith(agent):
                    best_len = max(best_len, len(agent))
        merged = RobotsGroup()
        for g in self.groups:
            agents = g.agents
            hit = (any(a != "*" and token.startswith(a) and
                       len(a) == best_len for a in agents)
                   if best_len >= 0 else "*" in agents)
            if hit:
                merged.agents = agents
                merged.rules.extend(g.rules)
                if merged.crawl_delay is None:
                    merged.crawl_delay = g.crawl_delay
        return merged if merged.agents else None

    def is_allowed(self, user_agent: str, path: str) -> bool:
        """§2.2.2 via the matched group; no group → allowed. The literal
        /robots.txt resource is always allowed (exactly that path, not
        prefixes of it — review r7)."""
        if path == "/robots.txt":
            return True
        group = self.group_for(user_agent)
        if group is None:
            return True
        return group.is_allowed(path)

    def crawl_delay(self, user_agent: str) -> float | None:
        group = self.group_for(user_agent)
        return group.crawl_delay if group else None


def _compile_rule(allow: bool, raw_rule: str) -> tuple:
    """Rule → (allow, length, parts, anchored, prefix): split on raw '*'
    FIRST (so a %2A escape can never become a wildcard), then
    percent-normalize each literal segment; plain prefix rules keep
    parts=None for the cheap startswith path."""
    anchored = raw_rule.endswith("$")
    body = raw_rule[:-1] if anchored else raw_rule
    if "*" not in body and not anchored:
        rule = _normalize_path(body)
        return (allow, len(rule), None, False, rule)
    parts = [_normalize_path(p) if p else "" for p in body.split("*")]
    # length for specificity uses the normalized text length
    length = sum(len(p) for p in parts) + (len(parts) - 1) + anchored
    return (allow, length, parts, anchored, None)


def parse_robots_txt(text: str) -> RobotsPolicy:
    """Line-oriented parse per RFC 9309 §2.2: groups start at runs of
    user-agent lines; rules before any user-agent line are ignored;
    unknown directives are skipped; comments stripped at '#'."""
    groups: list[RobotsGroup] = []
    sitemaps: list[str] = []
    current: RobotsGroup | None = None
    collecting_agents = False
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, value = line.split(":", 1)
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not value:
                continue  # malformed empty agent must not shadow '*'
            if not collecting_agents:
                current = RobotsGroup()
                groups.append(current)
                collecting_agents = True
            current.agents.append(value.lower())
            continue
        if field == "sitemap":
            if value:
                sitemaps.append(value)
            collecting_agents = False
            continue
        collecting_agents = False
        if current is None:
            continue  # rules before any user-agent line
        if field in ("allow", "disallow"):
            if not value:
                continue  # empty rule value contributes no rule
            current.rules.append(_compile_rule(field == "allow", value))
        elif field == "crawl-delay":
            try:
                current.crawl_delay = float(value)
            except ValueError:
                pass
    return RobotsPolicy(groups, sitemaps)


def robots_allowed(robots_txt: str, user_agent: str, path: str) -> bool:
    """One-shot convenience for columnar evaluation."""
    return parse_robots_txt(robots_txt).is_allowed(user_agent, path)
