"""Search applications — the ES Search Applications surface: ONE named
endpoint that bundles a stored search template, a query ruleset, and a
rescorer, so client code sends only ``(app, params)`` and every piece
of ranking policy lives server-side.

This is pure composition of already-gated parts — what the module owns
is the ORDER and the contracts between them:

    1. render the app's template with the call's params
       (operators/templates — mustache subset, body schema)
    2. evaluate the app's query rules against the request metadata
       (operators/queryrules — the rendered query string is the
       ``user_query`` criterion input, matching ES, where rules see
       the final query)
    3. organic ranking = the rendered qlang query over the packed
       index (operators/qlang), with pinned docs first (score NULL)
       and excluded docs dropped — rules_topk's contract, but the
       organic leg here is the FULL qlang grammar, not a bare term
       bag
    4. optional LTR rescore of the organic leg (operators/ltr) BEFORE
       pinning — pins outrank everything by definition, so the model
       only re-orders earned results (ES rescore-then-pin order).
       The rescore CANDIDATE WINDOW is the qlang result itself
       (qlang.bm25_topk_qlang_ords → ltr.ltr_rescore_candidates), so
       +required / -excluded / phrase / wildcard operators keep their
       meaning under an LTR model; a candidate outside the plain-term
       feature frame (e.g. wildcard-only match) scores bias-only
       rather than being dropped

Scale: steps 1-2 are driver-side config work; 3-4 are the unchanged
engine plans with the bounded over-fetch rules_topk documents.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.ltr import ltr_rescore_candidates
from ics_search_engine_spark.operators.qlang import (
    bm25_topk_qlang,
    bm25_topk_qlang_ords,
)
from ics_search_engine_spark.operators.queryrules import Rule, apply_rules
from ics_search_engine_spark.operators.templates import render_body


@dataclass
class SearchApplication:
    """One named search app: template source + ruleset + optional
    linear LTR model (window for its first pass)."""

    name: str
    template: str
    rules: list[Rule] = field(default_factory=list)
    ltr_model: dict[str, float] | None = None
    ltr_window: int = 100

    def search(
        self,
        spark: SparkSession,
        pidx,
        params: dict,
        k: int = 10,
        metadata: dict | None = None,
    ) -> DataFrame:
        """Top-k (conv_id, turn_idx, score, pinned) under the app's
        full policy chain."""
        body = render_body(self.template, params)
        query = str(body["query"])
        kk = int(k if k is not None else body.get("k", 10))
        meta = {"user_query": query, **(metadata or {})}
        pins, excluded = apply_rules(self.rules, meta)
        pins = pins[:kk]
        rows: list[tuple] = [(c, t, None, True) for c, t in pins]
        need = kk - len(rows)
        if need > 0:
            drop = set(pins) | excluded
            fetch = kk + len(drop)
            if self.ltr_model is not None:
                # candidate window = the FULL qlang result, so query
                # operators survive the model rescore (module § 4)
                cand = bm25_topk_qlang_ords(
                    spark, pidx, query,
                    k=max(self.ltr_window, fetch),
                )
                organic = ltr_rescore_candidates(
                    spark, pidx, query, self.ltr_model,
                    cand.select("doc_ord"), k=fetch,
                ).collect()
            else:
                organic = bm25_topk_qlang(
                    spark, pidx, query, k=fetch
                ).collect()
            for r in organic:
                if (r["conv_id"], r["turn_idx"]) in drop:
                    continue
                rows.append(
                    (r["conv_id"], r["turn_idx"], r["score"], False)
                )
                if len(rows) == kk:
                    break
        return spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, score double, pinned boolean",
        )


class SearchAppRegistry:
    """Named search applications (the ES ``_application/search_application``
    store — driver-side dict, same posture as TemplateRegistry)."""

    def __init__(self) -> None:
        self._apps: dict[str, SearchApplication] = {}

    def put(self, app: SearchApplication) -> None:
        from ics_search_engine_spark.operators.templates import (
            render_template,
        )

        # structural validation only: malformed sections fail here;
        # JSON validity depends on params, so it is checked per call
        render_template(app.template, {})
        self._apps[app.name] = app

    def get(self, name: str) -> SearchApplication:
        if name not in self._apps:
            raise KeyError(f"no search application {name!r}")
        return self._apps[name]

    def search(
        self,
        spark: SparkSession,
        pidx,
        name: str,
        params: dict,
        k: int = 10,
        metadata: dict | None = None,
    ) -> DataFrame:
        return self.get(name).search(
            spark, pidx, params, k=k, metadata=metadata
        )
