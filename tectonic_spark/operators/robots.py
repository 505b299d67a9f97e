"""robots.txt parsing + URL evaluation (RFC 9309, the Robots Exclusion
Protocol) — the gatekeeper a crawl frontier consults before every
fetch; URL filtering by robots rules is a standard crawl-corpus
curation step.

Scope (spec-derivable from the public RFC 9309 grammar):

* **Line grammar**: ``field: value`` records, ``#`` comments, blank
  lines end a group's user-agent cluster; fields are case-insensitive.
* **Group selection** (§2.2.1): the group(s) whose user-agent token
  best matches the crawler product token — exact (case-insensitive)
  match wins over ``*``; multiple adjacent ``User-agent`` lines share
  one group; all groups matching the same specificity merge.
* **Rule matching** (§2.2.2): ``Allow``/``Disallow`` path patterns
  with ``*`` wildcards and the ``$`` end anchor; the MOST SPECIFIC
  match (longest pattern in octets) wins; on a tie between allow and
  disallow, ALLOW wins. An empty ``Disallow:`` value matches nothing.
* **Non-group records**: ``Sitemap`` (global), ``Crawl-delay``
  (per-group, de-facto standard — not in the RFC, parsed as an
  extension the way real crawlers do).

Error taxonomy: this format is famously forgiving — RFC 9309 §2.2.3
requires unknown lines be IGNORED, so the parser never raises on
content; only non-UTF-8 input is a ``ValueError``.
"""

from __future__ import annotations

import re

__all__ = ["parse_robots", "robots_allowed"]


def parse_robots(data: bytes | str) -> dict:
    """Parse robots.txt → {groups: [{agents, rules, crawl_delay}],
    sitemaps: [...]}; rules are (allow: bool, pattern: str) in file
    order. Unknown fields are ignored per RFC 9309 §2.2.3."""
    if isinstance(data, bytes):
        try:
            text = data.decode("utf-8")
        except UnicodeDecodeError as e:
            raise ValueError(f"robots.txt is not UTF-8: {e.reason}") from None
    else:
        text = data
    groups: list[dict] = []
    sitemaps: list[str] = []
    cur: dict | None = None
    agents_open = False  # True while consuming adjacent User-agent lines
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        field, sep, value = line.partition(":")
        if not sep:
            continue  # ignored per §2.2.3
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if cur is None or not agents_open:
                cur = {"agents": [], "rules": [], "crawl_delay": None}
                groups.append(cur)
                agents_open = True
            cur["agents"].append(value.lower())
            continue
        if field == "sitemap":
            sitemaps.append(value)  # global record, group-independent
            agents_open = False
            continue
        if cur is None:
            continue  # rule before any User-agent line: ignored
        agents_open = False
        if field in ("allow", "disallow"):
            cur["rules"].append((field == "allow", value))
        elif field == "crawl-delay":
            try:
                cur["crawl_delay"] = float(value)
            except ValueError:
                pass  # malformed extension value: ignored
    return {"groups": groups, "sitemaps": sitemaps}


def _pattern_matches(pattern: str, path: str) -> bool:
    """RFC 9309 path-pattern match: ``*`` spans any octets, ``$``
    (final only) anchors the end; otherwise prefix semantics."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    rx = ".*".join(parts) + ("$" if anchored else "")
    return re.match(rx, path) is not None


def _select_group(groups: list[dict], agent: str) -> dict | None:
    """§2.2.1: exact product-token match beats ``*``; all groups at the
    winning specificity MERGE."""
    agent = agent.lower()
    exact = [g for g in groups if agent in g["agents"]]
    chosen = exact or [g for g in groups if "*" in g["agents"]]
    if not chosen:
        return None
    merged = {"rules": [], "crawl_delay": None}
    for g in chosen:
        merged["rules"].extend(g["rules"])
        if merged["crawl_delay"] is None:
            merged["crawl_delay"] = g["crawl_delay"]
    return merged


def robots_allowed(robots: dict, agent: str, path: str) -> bool:
    """§2.2.2 longest-match evaluation: the most specific matching rule
    decides; allow wins ties; no matching rule (or no matching group)
    means allowed."""
    g = _select_group(robots["groups"], agent)
    if g is None:
        return True
    best_len = -1
    best_allow = True
    for allow, pattern in g["rules"]:
        if not pattern:
            continue  # empty Disallow/Allow matches nothing
        if _pattern_matches(pattern, path):
            plen = len(pattern)
            if plen > best_len or (plen == best_len and allow and not best_allow):
                best_len = plen
                best_allow = allow
    return best_allow if best_len >= 0 else True
