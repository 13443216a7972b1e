"""robots.txt parsing and matching, from RFC 9309 (Robots Exclusion
Protocol). A crawl-derived training corpus has to be filterable by the
rules that governed the crawl, so this is a first-class curation
operator, not an afterthought.

Semantics implemented (RFC 9309 §2):

- groups: one or more ``User-agent`` lines followed by ``Allow`` /
  ``Disallow`` rules; later user-agent lines between rules start a new
  group; rules before any user-agent line are ignored,
- group selection: the group whose agent token is the LONGEST
  case-insensitive prefix match of the client's product token wins;
  ``*`` is the fallback; if no group matches, everything is allowed,
- rule matching: the rule with the LONGEST pattern that matches the
  path wins; on a length tie, ``Allow`` wins (§2.2.2),
- patterns: ``*`` matches any sequence, ``$`` anchors the end,
- an empty ``Disallow:`` value matches nothing (i.e. allows all),
- comments (``#``) and unknown directives are ignored; directive names
  are case-insensitive.

The Spark operator ships the (host, robots_txt) table as a broadcast
join against the URL stream and evaluates the match in an Arrow batch
UDF with a per-robots parse cache — robots bodies number one per host
(thousands), URLs number billions; parsing cost is O(hosts), matching
is O(urls x rules-per-host).
"""

from __future__ import annotations

import re
from functools import lru_cache


def _pattern_to_regex(pattern: str) -> re.Pattern:
    parts = []
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    for piece in body.split("*"):
        parts.append(re.escape(piece))
    rx = ".*".join(parts)
    if anchored:
        rx += r"\Z"
    return re.compile(rx)


class RobotsRules:
    """Parsed robots.txt: group selection + longest-match evaluation."""

    __slots__ = ("groups",)

    def __init__(self, groups: list[tuple[list[str], list[tuple[bool, str, re.Pattern]]]]):
        self.groups = groups

    def _group_for(self, agent: str):
        agent = agent.lower()

        def match_len(a: str) -> int:
            if a == "*":
                return 0  # fallback: loses to any specific token
            return len(a) if agent.startswith(a) else -1

        best_len = max(
            (match_len(a) for agents, _ in self.groups for a in agents),
            default=-1,
        )
        if best_len < 0:
            return None
        # groups of equal best specificity merge (RFC 9309 §2.2.1)
        merged = []
        for agents, rules in self.groups:
            if any(match_len(a) == best_len for a in agents):
                merged.extend(rules)
        return merged

    def is_allowed(self, agent: str, path: str) -> bool:
        rules = self._group_for(agent)
        if rules is None:
            return True
        if not path.startswith("/"):
            path = "/" + path
        verdict, best_len = True, -1
        for allow, pattern, rx in rules:
            if len(pattern) > best_len and rx.match(path):
                verdict, best_len = allow, len(pattern)
            elif len(pattern) == best_len and rx.match(path) and allow:
                verdict = allow  # tie: Allow wins (RFC 9309 §2.2.2)
        return verdict


def parse_robots(text: str) -> RobotsRules:
    groups: list = []
    agents: list[str] = []
    rules: list = []
    in_agents = False  # consecutive user-agent lines extend one group

    def flush():
        nonlocal agents, rules
        if agents:
            groups.append((agents, rules))
        agents, rules = [], []

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agents:
                flush()
                in_agents = True
            agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_agents = False
            if not agents:
                continue  # rules before any user-agent line: ignored
            if value == "":
                if field == "disallow":
                    continue  # empty Disallow matches nothing
                continue  # empty Allow likewise matches nothing
            rules.append((field == "allow", value, _pattern_to_regex(value)))
        else:
            in_agents = False  # unknown directive: ignored, ends UA run
    flush()
    return RobotsRules(groups)


@lru_cache(maxsize=4096)
def _cached_rules(text: str) -> RobotsRules:
    return parse_robots(text)


def is_allowed(robots_txt: str, agent: str, path: str) -> bool:
    """One-shot convenience over a parse cache keyed on the body —
    the per-batch evaluation path of the Spark operator."""
    return _cached_rules(robots_txt).is_allowed(agent, path)
