"""Search templates — ES ``_search/template`` on this engine.

An ES search template is a mustache STRING rendered with per-call
params and then parsed as the search body; storing one gives an
application a named, parameterized search whose shape is fixed
server-side (the "don't let every client hand-roll query DSL"
pattern).  The reference engine has no template surface — its UI
interpolates the raw user string into one fixed query
(/root/reference/main.py); this module adds the stored-search verb on
the engine's native query language (operators/qlang — the analog of
the JSON body here, since qlang IS this engine's search body grammar).

Mustache subset (the part ES's own docs exercise for search
templates):

* ``{{var}}``                 — substitute ``params[var]`` (missing →
                                empty string, mustache semantics).
* ``{{#var}}...{{/var}}``     — render the block iff ``params[var]``
                                is truthy; for a LIST, render once per
                                element with ``{{.}}`` bound to it.
* ``{{^var}}...{{/var}}``     — inverted section: render iff falsy /
                                missing (the default-value idiom
                                ``{{v}}{{^v}}fallback{{/v}}``).
* ``{{#toJson}}var{{/toJson}}`` — JSON-encode ``params[var]``.

Rendering happens BEFORE JSON parsing, exactly like ES (the template
source is text, not a JSON AST).  The rendered body is

    {"query": "<qlang string>", "k": <int>, "max_expansions": <int>}

with ``query`` required.  Sections nest; delimiters inside rendered
VALUES are never re-scanned (single-pass, no template injection via
params).

Scale: rendering is driver-side string work on a ≤KB template; the
search it produces is the unchanged qlang plan (packed index, pruned
term scan, TakeOrderedAndProject).
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession

from ics_search_engine_spark.operators.qlang import bm25_topk_qlang

_TAG_RE = re.compile(r"\{\{([#^/])?\s*([\w.]+)\s*\}\}")


def _render(source: str, scopes: list) -> str:
    """Recursive-descent renderer over the tag stream.  ``scopes`` is
    the context stack (innermost last) — list sections push each
    element as ``.``."""

    def lookup(name):
        if name == ".":
            return scopes[-1]
        for scope in reversed(scopes):
            if isinstance(scope, dict) and name in scope:
                return scope[name]
        return None

    out: list[str] = []
    pos = 0
    while True:
        m = _TAG_RE.search(source, pos)
        if not m:
            out.append(source[pos:])
            return "".join(out)
        out.append(source[pos : m.start()])
        sigil, name = m.group(1), m.group(2)
        if sigil is None:
            v = lookup(name)
            out.append("" if v is None else
                       json.dumps(v) if isinstance(v, bool) else str(v))
            pos = m.end()
            continue
        if sigil == "/":
            raise ValueError(f"unopened section close {{{{/{name}}}}}")
        # section open: find the MATCHING close, tracking nesting
        depth, scan = 1, m.end()
        while depth:
            m2 = _TAG_RE.search(source, scan)
            if not m2:
                raise ValueError(f"unclosed section {{{{{sigil}{name}}}}}")
            if m2.group(1) == "#" or m2.group(1) == "^":
                depth += 1
            elif m2.group(1) == "/":
                depth -= 1
                if depth == 0 and m2.group(2) != name:
                    raise ValueError(
                        f"section mismatch: {name} closed by {m2.group(2)}"
                    )
            scan = m2.end()
        body = source[m.end() : m2.start()]
        pos = m2.end()
        if sigil == "#" and name == "toJson":
            out.append(json.dumps(lookup(body.strip())))
            continue
        v = lookup(name)
        if sigil == "#":
            if isinstance(v, list):
                for item in v:
                    out.append(_render(body, scopes + [item]))
            elif v:
                out.append(_render(body, scopes))
        else:  # '^' inverted
            if not v:
                out.append(_render(body, scopes))
    raise AssertionError("unreachable")


def render_template(source: str, params: dict) -> str:
    """Render mustache ``source`` with ``params`` (see module doc)."""
    return _render(source, [dict(params or {})])


def render_body(source: str, params: dict) -> dict:
    """Render then JSON-parse; validates the body contract."""
    rendered = render_template(source, params)
    try:
        body = json.loads(rendered)
    except json.JSONDecodeError as e:
        raise ValueError(
            f"rendered template is not valid JSON: {e}\n{rendered}"
        ) from e
    if not isinstance(body, dict) or "query" not in body:
        raise ValueError(f"rendered body must have a 'query' key: {body}")
    return body


def search_template(
    spark: SparkSession,
    pidx,
    source: str,
    params: dict,
    k: int | None = None,
) -> DataFrame:
    """Render + run: top-k (conv_id, turn_idx, score) of the rendered
    qlang query.  ``k`` overrides the body's (caller wins, ES
    precedence for explicit request params)."""
    body = render_body(source, params)
    return bm25_topk_qlang(
        spark,
        pidx,
        str(body["query"]),
        k=int(k if k is not None else body.get("k", 10)),
        max_expansions=int(body.get("max_expansions", 1024)),
    )


class TemplateRegistry:
    """Stored search templates (ES ``_scripts/<id>`` cluster state —
    here a driver-side dict; persisting it is a one-line JSON dump,
    deliberately not baked in)."""

    def __init__(self) -> None:
        self._stored: dict[str, str] = {}

    def put(self, template_id: str, source: str) -> None:
        # fail fast on malformed sections (renders with no params)
        render_template(source, {})
        self._stored[template_id] = source

    def get(self, template_id: str) -> str:
        if template_id not in self._stored:
            raise KeyError(f"no stored template {template_id!r}")
        return self._stored[template_id]

    def delete(self, template_id: str) -> None:
        self._stored.pop(template_id, None)

    def search(
        self,
        spark: SparkSession,
        pidx,
        template_id: str,
        params: dict,
        k: int | None = None,
    ) -> DataFrame:
        return search_template(
            spark, pidx, self.get(template_id), params, k=k
        )
