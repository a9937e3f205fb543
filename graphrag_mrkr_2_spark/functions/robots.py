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
from urllib.parse import quote, unquote


def _normalize_path(path: str) -> str:
    """Percent-normalize a rule or URL path per RFC 9309 §2.2.2: decode
    unreserved octets, uppercase remaining escapes, keep everything else.
    quote(unquote(x)) with a generous safe set approximates the RFC's
    octet rules over ASCII paths and, critically, is applied IDENTICALLY
    to rules and URLs so comparisons are stable."""
    if not path:
        return "/"
    return quote(unquote(path), safe="/$*%?=&;:@+,()[]!'~")


class RobotsGroup:
    __slots__ = ("agents", "rules", "crawl_delay")

    def __init__(self):
        self.agents: list[str] = []
        self.rules: list[tuple[bool, str, re.Pattern | None]] = []
        self.crawl_delay: float | None = None


class RobotsPolicy:
    """Parsed robots.txt: pick the group for a user agent, evaluate
    paths against it."""

    def __init__(self, groups: list[RobotsGroup], sitemaps: list[str]):
        self.groups = groups
        self.sitemaps = sitemaps

    def _group_for(self, user_agent: str) -> RobotsGroup | None:
        """§2.2.1: the group whose agent token is the LONGEST prefix
        match of the product token; '*' only when nothing matches.
        Groups tied at the winning specificity MUST be merged (the spec's
        combine rule — sites repeat 'User-agent: x' sections)."""
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
        """§2.2.2: most-specific (longest) rule wins; allow wins equal
        lengths; no matching rule or no group → allowed. /robots.txt
        itself is always allowed."""
        if path.startswith("/robots.txt"):
            return True
        group = self._group_for(user_agent)
        if group is None:
            return True
        path = _normalize_path(path)
        best_len = -1
        best_allow = True
        for allow, rule, pattern in group.rules:
            if pattern is not None:
                m = pattern.match(path)
                if not m:
                    continue
                length = len(rule)
            else:
                if not path.startswith(rule):
                    continue
                length = len(rule)
            if length > best_len or (length == best_len and allow
                                     and not best_allow):
                best_len, best_allow = length, allow
        return best_allow if best_len >= 0 else True

    def crawl_delay(self, user_agent: str) -> float | None:
        group = self._group_for(user_agent)
        return group.crawl_delay if group else None


def _compile_rule(rule: str) -> re.Pattern | None:
    """'*' → any run, trailing '$' → end anchor; a rule without either
    stays a plain prefix (None pattern, cheaper startswith)."""
    if "*" not in rule and not rule.endswith("$"):
        return None
    anchored = rule.endswith("$")
    body = rule[:-1] if anchored else rule
    parts = [re.escape(p) for p in body.split("*")]
    return re.compile(".*".join(parts) + ("$" if anchored else ""))


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
                if field == "disallow":
                    continue  # empty Disallow: allow-all marker, no rule
                continue
            rule = _normalize_path(value)
            current.rules.append(
                (field == "allow", rule, _compile_rule(rule)))
        elif field == "crawl-delay":
            try:
                current.crawl_delay = float(value)
            except ValueError:
                pass
    return RobotsPolicy(groups, sitemaps)


def robots_allowed(robots_txt: str, user_agent: str, path: str) -> bool:
    """One-shot convenience for columnar evaluation."""
    return parse_robots_txt(robots_txt).is_allowed(user_agent, path)
