"""Composable index templates (V2) + component templates.

Reference: ``cluster/metadata/MetadataIndexTemplateService.java`` —
``findV2Template`` (candidate templates = any index_pattern simple-match;
winner = highest ``priorityOrZero``), ``resolveSettings`` (component
templates merge in ``composed_of`` order, later wins; the index
template's own settings override all components) and the equivalent
mappings resolution; ``put`` rejects a new template whose patterns
overlap an existing template AT THE SAME priority (ambiguous match,
``addIndexTemplateV2`` overlap check). Pattern syntax is
``Regex.simpleMatch``: ``*`` is the only metacharacter.

Driver-side cluster-state logic, no Spark jobs — the resolved config is
what an index build consumes (analyzer, shards, field types), exactly the
role templates play at index-creation time in the reference.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field


def simple_match(pattern: str, name: str) -> bool:
    """Regex.simpleMatch: '*' matches any run, everything else literal.
    Delegates to the manual matcher in index/mapping.py — the old
    per-call regex here had drifted semantics ('$' matched before a
    trailing newline, '.*' did not cross newlines; round-4 review)."""
    from opensearch_spark.index.mapping import simple_match as _sm

    return _sm(pattern, name)


def _deep_merge(base: dict, extra: dict) -> dict:
    """Recursive dict merge, later wins per leaf — the reference's
    resolveSettings/collectMappings composition. A shallow update would
    let a later component wholesale REPLACE a shared nested section
    (e.g. mappings.properties), dropping earlier components' fields
    (round-4 review)."""
    out = dict(base)
    for k, v in extra.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def globs_intersect(p1: str, p2: str) -> bool:
    """EXACT non-emptiness of the intersection of two '*'-glob languages
    (memoized DP over suffix pairs): some concrete index name matches
    both patterns. A star consumes the other side's literals one at a
    time or drops out; literals must agree. This is the overlap test
    put_template needs — heuristics (e.g. matching one pattern against
    the other with stars substituted) miss pairs like '*-logs' vs
    'logs-*', which both match 'logs-logs'."""
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def f(i: int, j: int) -> bool:
        if i == len(p1) and j == len(p2):
            return True
        if i < len(p1) and p1[i] == "*":
            return f(i + 1, j) or (j < len(p2) and f(i, j + 1))
        if j < len(p2) and p2[j] == "*":
            return f(i, j + 1) or (i < len(p1) and f(i + 1, j))
        return (i < len(p1) and j < len(p2) and p1[i] == p2[j]
                and f(i + 1, j + 1))

    return f(0, 0)


@dataclass
class ComponentTemplate:
    settings: dict = dc_field(default_factory=dict)
    mappings: dict = dc_field(default_factory=dict)


@dataclass
class IndexTemplate:
    index_patterns: tuple
    priority: int = 0  # priorityOrZero
    composed_of: tuple = ()
    settings: dict = dc_field(default_factory=dict)
    mappings: dict = dc_field(default_factory=dict)


class TemplateRegistry:
    """The templatesV2 + componentTemplates slice of cluster state."""

    def __init__(self) -> None:
        self.components: dict[str, ComponentTemplate] = {}
        self.templates: dict[str, IndexTemplate] = {}

    def put_component(self, name: str, tpl: ComponentTemplate) -> None:
        self.components[name] = tpl

    def put_template(self, name: str, tpl: IndexTemplate) -> None:
        """addIndexTemplateV2's overlap check: same-priority templates
        with overlapping patterns make index creation ambiguous →
        rejected at put time (the reference raises on validation)."""
        for other_name, other in self.templates.items():
            if other_name == name or other.priority != tpl.priority:
                continue
            for p1 in tpl.index_patterns:
                for p2 in other.index_patterns:
                    # exact glob-language intersection: any concrete name
                    # matching both patterns makes same-priority
                    # resolution ambiguous
                    if globs_intersect(p1, p2):
                        raise ValueError(
                            f"template [{name}] has index patterns "
                            f"{list(tpl.index_patterns)} matching patterns "
                            f"of template [{other_name}] with the same "
                            f"priority [{tpl.priority}], multiple index "
                            f"templates may not match during index "
                            f"creation")
        missing = [c for c in tpl.composed_of if c not in self.components]
        if missing:
            raise ValueError(
                f"index template [{name}] specifies component templates "
                f"{missing} that do not exist")
        self.templates[name] = tpl

    def find_template(self, index_name: str) -> str | None:
        """findV2Template: all pattern-matching templates, highest
        priority wins (put-time validation guarantees no tie among
        overlapping patterns)."""
        matched = [(name, t) for name, t in self.templates.items()
                   if any(simple_match(p, index_name)
                          for p in t.index_patterns)]
        if not matched:
            return None
        # priority desc; name asc as a deterministic secondary key (the
        # put-time exact-intersection check makes same-priority matches
        # impossible, but resolution must never depend on put order)
        return sorted(matched, key=lambda nt: (-nt[1].priority, nt[0]))[0][0]

    def resolve(self, index_name: str) -> dict | None:
        """Effective settings/mappings for a to-be-created index:
        component templates in composed_of order (later wins), then the
        index template's own section overrides everything
        (resolveSettings / collectMappings order)."""
        name = self.find_template(index_name)
        if name is None:
            return None
        t = self.templates[name]
        settings: dict = {}
        mappings: dict = {}
        for comp in t.composed_of:
            c = self.components[comp]
            settings = _deep_merge(settings, c.settings)
            mappings = _deep_merge(mappings, c.mappings)
        settings = _deep_merge(settings, t.settings)
        mappings = _deep_merge(mappings, t.mappings)
        return {"template": name, "settings": settings,
                "mappings": mappings}
