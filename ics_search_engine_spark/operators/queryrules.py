"""Query rules — the ES ``_query_rules`` API (8.10+).

Business-rule curation on top of organic ranking: a RULESET is an
ordered list of rules, each with match CRITERIA over request metadata
(the query string, locale, user segment, …) and an action — pin
documents to the top or exclude them.  The search request carries
``match_criteria``; every criterion of a rule must match (AND) for the
rule to fire; fired rules' doc lists accumulate in ruleset order.  A
doc that is both pinned and excluded is EXCLUDED (ES precedence).

The reference engine has no curation surface at all (its UI shows raw
blend order, /root/reference/main.py); this module adds the verb on
the packed engine's pinned/organic machinery (operators/querydsl.
pinned_topk is the no-rules core of the same ranking contract).

Scale: rule evaluation is driver-side string work over a config-sized
ruleset; the organic ranking is the unchanged packed top-k plan with a
bounded over-fetch of k + |pins| + |excludes| rows — exclusion never
rescans, it drops rows from an already-collected ≤ k+c list.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.aggs import scored_matches

_CRITERIA_TYPES = (
    "always", "exact", "contains", "prefix", "suffix",
    "gt", "gte", "lt", "lte",
)


@dataclass(frozen=True)
class Criterion:
    """One match criterion over request metadata."""

    type: str
    metadata: str | None = None
    values: tuple = ()

    def __post_init__(self):
        if self.type not in _CRITERIA_TYPES:
            raise ValueError(f"unknown criterion type {self.type!r}")
        if self.type != "always" and self.metadata is None:
            raise ValueError(f"criterion {self.type!r} needs metadata key")
        if self.type in ("gt", "gte", "lt", "lte") and not self.values:
            raise ValueError(
                f"numeric criterion {self.type!r} needs a bound value"
            )

    def matches(self, meta: dict) -> bool:
        if self.type == "always":
            return True
        v = meta.get(self.metadata)
        if v is None:
            return False
        s = str(v)
        if self.type == "exact":
            return any(s == str(x) for x in self.values)
        if self.type == "contains":
            return any(str(x) in s for x in self.values)
        if self.type == "prefix":
            return any(s.startswith(str(x)) for x in self.values)
        if self.type == "suffix":
            return any(s.endswith(str(x)) for x in self.values)
        # ES query-rule criteria simply don't fire on type mismatch —
        # a string segment matched against a numeric rule must not
        # fail the whole search request (r3 advisor finding).
        try:
            num = float(v)
            bound = float(self.values[0])
        except (TypeError, ValueError):
            return False
        return {
            "gt": num > bound, "gte": num >= bound,
            "lt": num < bound, "lte": num <= bound,
        }[self.type]


@dataclass
class Rule:
    """``action`` ∈ {'pinned', 'exclude'}; ``docs`` are engine doc
    keys ((conv_id, turn_idx) tuples)."""

    rule_id: str
    action: str
    criteria: list[Criterion] = field(default_factory=list)
    docs: list = field(default_factory=list)

    def __post_init__(self):
        if self.action not in ("pinned", "exclude"):
            raise ValueError(f"unknown rule action {self.action!r}")


def apply_rules(
    rules: list[Rule], metadata: dict
) -> tuple[list, set]:
    """Fired rules → (pinned doc keys in rule order, excluded key set).
    Exclusion beats pinning (ES precedence); duplicate pins keep their
    first (highest-priority) position."""
    pins: list = []
    seen: set = set()
    excluded: set = set()
    for rule in rules:
        if not all(c.matches(metadata) for c in rule.criteria):
            continue
        if rule.action == "exclude":
            excluded.update(tuple(d) for d in rule.docs)
        else:
            for d in rule.docs:
                key = tuple(d)
                if key not in seen:
                    seen.add(key)
                    pins.append(key)
    return [p for p in pins if p not in excluded], excluded


def rules_topk(
    spark: SparkSession,
    pidx,
    query: str,
    rules: list[Rule],
    k: int = 10,
    metadata: dict | None = None,
) -> DataFrame:
    """Top-k (conv_id, turn_idx, score, pinned) under the fired rules:
    pinned keys first in rule order (score NULL — unearned, the
    pinned_topk convention), then the organic ranking minus pinned AND
    excluded docs.  ``metadata`` defaults to {'user_query': query} and
    always carries that key."""
    meta = {"user_query": query, **(metadata or {})}
    pins, excluded = apply_rules(rules, meta)
    pins = pins[:k]
    rows: list[tuple] = [(c, t, None, True) for c, t in pins]
    need = k - len(rows)
    if need > 0:
        drop = set(pins) | excluded
        organic = (
            scored_matches(spark, pidx, query)
            .join(
                pidx.docmap.select("doc_ord", "conv_id", "turn_idx"),
                "doc_ord",
            )
            .orderBy(F.desc("score"), F.asc("conv_id"), F.asc("turn_idx"))
            .limit(k + len(drop))
            .collect()
        )
        for r in organic:
            if (r["conv_id"], r["turn_idx"]) in drop:
                continue
            rows.append((r["conv_id"], r["turn_idx"], r["score"], False))
            if len(rows) == k:
                break
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, score double, pinned boolean"
    )
