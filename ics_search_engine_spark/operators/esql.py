"""ES|QL-lite: Elastic's piped query language, compiled to Catalyst.

The reference engine answers one fixed query shape
(/root/reference/search/search.py — tokenize, look up, rank); Elastic's
modern answer to "let users compose analytics" is ES|QL:

    FROM events
    | WHERE event_type == "error"
    | EVAL hour = DATE_TRUNC(1 hour, ts)
    | STATS n = COUNT(*), users = COUNT_DISTINCT(user_id) BY hour
    | SORT n DESC
    | LIMIT 10

This module is that surface, Spark-first: the pipeline is PARSED (a
real tokenizer that respects strings and parentheses — not a
str.split), each command becomes one declarative DataFrame
transformation, and the whole pipe compiles to a single Catalyst plan
— filters still push down to the scan, STATS keeps map-side partial
aggregation, SORT+LIMIT becomes TakeOrderedAndProject.  Nothing
executes at parse time and the driver never sees rows, so a pipe over
a 100 TB table plans exactly like the hand-written DataFrame program.

Scalar expressions inside commands are Spark-SQL expressions plus a
compat shim for the ES|QL spellings that differ (`==`, `!=` on
strings, `DATE_TRUNC(1 hour, ts)`, `LIKE "wildcard*"`); the supported
command surface is FROM, WHERE, EVAL, STATS..BY, SORT, LIMIT, KEEP,
DROP, RENAME..AS, MV_EXPAND, DISSECT, GROK, ENRICH..ON..WITH,
INLINESTATS..BY, LOOKUP JOIN..ON, SAMPLE, CHANGE_POINT..ON,
FORK (branch sub-pipes) / FUSE (rrf-combine the branches), and ROW.
Unknown commands raise with the offending pipe segment.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


class EsqlError(ValueError):
    pass


# ---------------------------------------------------------------- lexing


def split_pipes(query: str) -> list[str]:
    """Split on top-level ``|`` only — pipes inside single/double
    quotes or parentheses belong to expressions."""
    parts, buf, depth, quote = [], [], 0, None
    for ch in query:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "\"'":
            quote = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == "|" and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    if quote or depth:
        raise EsqlError(f"unterminated {'string' if quote else 'parens'}")
    parts.append("".join(buf).strip())
    return [p for p in parts if p]


def split_commas(s: str) -> list[str]:
    """Top-level comma split (same quoting/paren rules)."""
    out, buf, depth, quote = [], [], 0, None
    for ch in s:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "\"'":
            quote = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return out


# ------------------------------------------------------ expression shim

_DATE_TRUNC = re.compile(
    r"DATE_TRUNC\s*\(\s*(\d+)\s+"
    r"(millisecond|second|minute|hour|day|week|month|quarter|year)s?"
    r"\s*,",
    re.IGNORECASE,
)


_MATCH_FN = re.compile(
    r"\bMATCH\s*\(\s*([A-Za-z_][\w.]*)\s*,\s*\"((?:[^\"\\]|\\.)*)\"\s*\)",
    re.IGNORECASE,
)


def _shim_match(s: str) -> str:
    """ES|QL ``MATCH(field, "query")`` → the engine's analyzer:
    query text is tokenized DRIVER-SIDE with the reference query
    analyzer (stop words dropped, stemmed) and the predicate becomes
    ``arrays_overlap(ics_tokenize(field), array(...))`` — OR
    semantics over analyzed terms, exactly ES's default ``match``.
    Requires functions.sqlreg registration (esql_query does it
    lazily when a pipe uses MATCH)."""
    from ics_search_engine_spark.textproc.tokenizer import tokenize

    def sub(m: re.Match) -> str:
        terms = tokenize(m.group(2), for_query=True)
        if not terms:
            return "FALSE"
        arr = ", ".join("'" + t.replace("'", "\\'") + "'" for t in terms)
        return f"arrays_overlap(ics_tokenize({m.group(1)}), array({arr}))"

    return _MATCH_FN.sub(sub, s)


def _shim_expr(expr: str) -> str:
    """ES|QL spellings → Spark SQL.  Conservative, token-aware for the
    operators; string literals pass through untouched."""
    expr = _shim_match(expr)
    # protect string literals from operator rewriting
    lits: list[str] = []

    def stash(m: re.Match) -> str:
        lits.append(m.group(0))
        return f"\x00{len(lits) - 1}\x00"

    s = re.sub(r"\"(?:[^\"\\]|\\.)*\"|'(?:[^'\\]|\\.)*'", stash, expr)
    s = s.replace("==", "=")
    # ES|QL DATE_TRUNC(1 hour, ts) -> date_trunc('hour', ts); only the
    # 1-unit form is supported (multi-unit needs bucketing: use EVAL
    # with window arithmetic instead)
    s = _DATE_TRUNC.sub(lambda m: f"date_trunc('{m.group(2).lower()}',", s)

    def unstash(m: re.Match) -> str:
        return lits[int(m.group(1))]

    s = re.sub(r"\x00(\d+)\x00", unstash, s)
    # ES|QL string equality uses double quotes; Spark SQL wants single
    s = re.sub(
        r"\"((?:[^\"\\]|\\.)*)\"",
        lambda m: "'" + m.group(1).replace("'", "\\'") + "'",
        s,
    )
    # LIKE "a*b?" (ES|QL wildcard) -> Spark LIKE with %/_
    def wc(m: re.Match) -> str:
        pat = m.group(1).replace("%", "\\%").replace("_", "\\_")
        pat = pat.replace("*", "%").replace("?", "_")
        return f"LIKE '{pat}'"

    s = re.sub(r"LIKE\s+'((?:[^'\\]|\\.)*)'", wc, s, flags=re.IGNORECASE)
    return s


_AGG_FNS = {
    "count": "count",
    "count_distinct": "count_distinct",
    "sum": "sum",
    "avg": "avg",
    "min": "min",
    "max": "max",
    "median": "median",
    "percentile": "percentile",
    "values": "values",
}


def _agg_expr(spec: str) -> tuple[str, str]:
    """``name = FUNC(args) [WHERE cond]`` or bare ``FUNC(args)`` →
    (alias, spark sql agg expr).  The trailing WHERE is ES|QL's
    per-aggregate filter, compiled to SQL's ``FILTER (WHERE ...)`` —
    still one pass, still map-side partial."""
    m = re.match(r"^\s*([A-Za-z_][\w.]*)\s*=\s*(.+)$", spec, re.DOTALL)
    if m:
        alias, call = m.group(1), m.group(2).strip()
    else:
        alias, call = None, spec.strip()
    filt = None
    wm = re.match(r"^(.*\))\s+WHERE\s+(.+)$", call, re.DOTALL | re.IGNORECASE)
    if wm:
        call, filt = wm.group(1).strip(), wm.group(2).strip()
    cm = re.match(r"^([A-Za-z_]\w*)\s*\((.*)\)$", call, re.DOTALL)
    if not cm:
        raise EsqlError(f"STATS expects FUNC(...) aggregates, got {spec!r}")
    fn, args = cm.group(1).lower(), cm.group(2).strip()
    if fn not in _AGG_FNS:
        raise EsqlError(
            f"unsupported STATS function {cm.group(1)!r} "
            f"(supported: {sorted(_AGG_FNS)})"
        )
    if fn == "count" and args in ("", "*"):
        sql = "count(*)"
    elif fn == "count_distinct":
        sql = f"count(DISTINCT {_shim_expr(args)})"
    elif fn == "percentile":
        parts = split_commas(args)
        if len(parts) != 2:
            raise EsqlError("PERCENTILE(field, p) takes two args")
        # ES|QL percentiles are 0-100; Spark percentile() takes 0-1
        sql = (
            f"percentile({_shim_expr(parts[0])}, "
            f"({_shim_expr(parts[1])}) / 100.0)"
        )
    elif fn == "values":
        # ES|QL VALUES: the set of values; deterministic sorted form
        sql = f"sort_array(collect_set({_shim_expr(args)}))"
    else:
        sql = f"{fn}({_shim_expr(args)})"
    if filt is not None:
        sql = f"{sql} FILTER (WHERE {_shim_expr(filt)})"
    if alias is None:
        alias = re.sub(r"\W+", "_", call.strip()).strip("_").lower()
    return alias, sql


# ------------------------------------------------------------- commands


def _cmd_where(df: DataFrame, body: str) -> DataFrame:
    return df.filter(F.expr(_shim_expr(body)))


def _cmd_eval(df: DataFrame, body: str) -> DataFrame:
    # sequential: a later EVAL item may reference an earlier one (the
    # ES|QL contract); an existing name is replaced in place
    for item in split_commas(body):
        m = re.match(r"^([A-Za-z_][\w.]*)\s*=\s*(.+)$", item, re.DOTALL)
        if not m:
            raise EsqlError(f"EVAL expects name = expr, got {item!r}")
        name, e = m.group(1), F.expr(_shim_expr(m.group(2)))
        df = df.withColumn(name, e)
    return df


def _cmd_stats(df: DataFrame, body: str) -> DataFrame:
    m = re.split(r"\bBY\b", body, maxsplit=1, flags=re.IGNORECASE)
    aggs = [_agg_expr(a) for a in split_commas(m[0])]
    agg_cols = [F.expr(sql).alias(alias) for alias, sql in aggs]
    if len(m) == 1:
        return df.agg(*agg_cols)
    keys = []
    for kspec in split_commas(m[1]):
        km = re.match(r"^([A-Za-z_][\w.]*)\s*=\s*(.+)$", kspec, re.DOTALL)
        if km:
            keys.append(F.expr(_shim_expr(km.group(2))).alias(km.group(1)))
        else:
            keys.append(F.expr(_shim_expr(kspec)))
    return df.groupBy(*keys).agg(*agg_cols)


def _cmd_sort(df: DataFrame, body: str) -> DataFrame:
    orders = []
    for item in split_commas(body):
        m = re.match(
            r"^(.*?)(?:\s+(ASC|DESC))?(?:\s+NULLS\s+(FIRST|LAST))?\s*$",
            item,
            re.IGNORECASE | re.DOTALL,
        )
        col = F.expr(_shim_expr(m.group(1).strip()))
        desc = (m.group(2) or "ASC").upper() == "DESC"
        nulls = (m.group(3) or ("LAST" if desc else "FIRST")).upper()
        if desc:
            col = col.desc_nulls_first() if nulls == "FIRST" else col.desc_nulls_last()
        else:
            col = col.asc_nulls_first() if nulls == "FIRST" else col.asc_nulls_last()
        orders.append(col)
    return df.orderBy(*orders)


def _cmd_keep(df: DataFrame, body: str) -> DataFrame:
    want = [c.strip() for c in split_commas(body)]
    missing = [c for c in want if c not in df.columns]
    if missing:
        raise EsqlError(f"KEEP: unknown columns {missing}")
    return df.select(*want)


def _cmd_drop(df: DataFrame, body: str) -> DataFrame:
    return df.drop(*[c.strip() for c in split_commas(body)])


def _cmd_rename(df: DataFrame, body: str) -> DataFrame:
    for item in split_commas(body):
        m = re.match(
            r"^([A-Za-z_][\w.]*)\s+AS\s+([A-Za-z_][\w.]*)$",
            item.strip(),
            re.IGNORECASE,
        )
        if not m:
            raise EsqlError(f"RENAME expects old AS new, got {item!r}")
        df = df.withColumnRenamed(m.group(1), m.group(2))
    return df


def _cmd_mv_expand(df: DataFrame, body: str) -> DataFrame:
    col = body.strip()
    if col not in df.columns:
        raise EsqlError(f"MV_EXPAND: unknown column {col!r}")
    return df.withColumn(col, F.explode(col))


_DISSECT_TOKEN = re.compile(r"%\{(\??)([\w.]*)\}")


def dissect_to_regex(pattern: str) -> tuple[str, list[str]]:
    """ES dissect pattern → (anchored regex, captured key names).
    ``%{key}`` captures lazily, ``%{}``/``%{?skip}`` match without
    capturing; everything between tokens is literal."""
    keys: list[str] = []
    out: list[str] = []
    pos = 0
    for m in _DISSECT_TOKEN.finditer(pattern):
        out.append(re.escape(pattern[pos : m.start()]))
        skip, name = m.group(1), m.group(2)
        if skip or not name:
            out.append(r"(?:.*?)")
        else:
            keys.append(name)
            out.append(r"(.*?)")
        pos = m.end()
    out.append(re.escape(pattern[pos:]))
    # final lazy capture must still reach end-of-string
    return "^" + "".join(out) + "$", keys


def _cmd_dissect(df: DataFrame, body: str) -> DataFrame:
    m = re.match(
        r"^([A-Za-z_][\w.]*)\s+\"((?:[^\"\\]|\\.)*)\"\s*$", body.strip()
    )
    if not m:
        raise EsqlError(f'DISSECT expects: DISSECT col "pattern", got {body!r}')
    col, pattern = m.group(1), m.group(2)
    rx, keys = dissect_to_regex(pattern)
    out = df
    for i, k in enumerate(keys, start=1):
        extracted = F.regexp_extract(F.col(col), rx, i)
        # non-matching rows get NULL (dissect semantics), not ''
        out = out.withColumn(
            k, F.when(F.col(col).rlike(rx), extracted)
        )
    return out


# grok base patterns (the commonly-used subset; composite patterns
# like COMBINEDAPACHELOG are compositions callers can inline)
_GROK_PATTERNS = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "LOGLEVEL": r"TRACE|DEBUG|INFO|WARN|ERROR|FATAL",
    "UUID": r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
            r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}"
                         r"(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
}
_GROK_TOKEN = re.compile(r"%\{(\w+)(?::(\w+))?(?::(\w+))?\}")
_GROK_TYPES = {"int": "long", "long": "long", "float": "double",
               "double": "double"}


def grok_to_regex(pattern: str) -> tuple[str, list[tuple[str, str | None]]]:
    """Grok pattern → (regex, [(capture name, cast type or None)]).
    ``%{SYNTAX:name}`` captures, ``%{SYNTAX}`` matches anonymously,
    ``%{SYNTAX:name:int}`` casts.  Literal text between tokens is
    escaped."""
    caps: list[tuple[str, str | None]] = []
    out: list[str] = []
    pos = 0
    for m in _GROK_TOKEN.finditer(pattern):
        out.append(re.escape(pattern[pos : m.start()]))
        syntax, name, typ = m.group(1), m.group(2), m.group(3)
        if syntax not in _GROK_PATTERNS:
            raise EsqlError(
                f"unknown grok pattern %{{{syntax}}} "
                f"(supported: {sorted(_GROK_PATTERNS)})"
            )
        body = _GROK_PATTERNS[syntax]
        if name:
            if typ is not None and typ not in _GROK_TYPES:
                raise EsqlError(f"unknown grok cast type {typ!r}")
            caps.append((name, _GROK_TYPES.get(typ or "")))
            out.append(f"({body})")
        else:
            out.append(f"(?:{body})")
        pos = m.end()
    out.append(re.escape(pattern[pos:]))
    return "^" + "".join(out) + "$", caps


def _cmd_grok(df: DataFrame, body: str) -> DataFrame:
    m = re.match(
        r"^([A-Za-z_][\w.]*)\s+\"((?:[^\"\\]|\\.)*)\"\s*$", body.strip()
    )
    if not m:
        raise EsqlError(f'GROK expects: GROK col "pattern", got {body!r}')
    col, pattern = m.group(1), m.group(2)
    rx, caps = grok_to_regex(pattern)
    matched = F.col(col).rlike(rx)
    for i, (name, typ) in enumerate(caps, start=1):
        e = F.when(matched, F.regexp_extract(F.col(col), rx, i))
        if typ is not None:
            e = e.cast(typ)
        df = df.withColumn(name, e)
    return df


def _cmd_limit(df: DataFrame, body: str) -> DataFrame:
    try:
        n = int(body.strip())
    except ValueError:
        raise EsqlError(f"LIMIT expects an integer, got {body!r}") from None
    return df.limit(n)


def _cmd_enrich(
    df: DataFrame, body: str, enrich: dict | None
) -> DataFrame:
    """``ENRICH policy ON field [WITH a, b = src_b]`` — ES|QL's lookup
    join.  The policy table is BROADCAST (enrich indexes are dimension
    -sized by construction), the join is a left join on the match
    field, and only the requested fields land (all non-key fields
    without WITH) — so the plan is one BroadcastHashJoin, no shuffle
    of the big side."""
    m = re.match(
        r"^(\w+)\s+ON\s+([A-Za-z_][\w.]*)(?:\s+WITH\s+(.+))?$",
        body.strip(),
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise EsqlError(
            f"ENRICH expects: ENRICH policy ON field [WITH ...], got {body!r}"
        )
    policy, on, with_clause = m.group(1), m.group(2), m.group(3)
    if not enrich or policy not in enrich:
        raise EsqlError(
            f"unknown enrich policy {policy!r} "
            f"(available: {sorted(enrich or {})})"
        )
    pol_df, match_field = enrich[policy]
    picks: list[tuple[str, str]] = []  # (out name, policy column)
    if with_clause:
        for item in split_commas(with_clause):
            am = re.match(
                r"^([A-Za-z_][\w.]*)\s*(?:=\s*([A-Za-z_][\w.]*))?$",
                item.strip(),
            )
            if not am:
                raise EsqlError(f"ENRICH WITH expects name [= src], got {item!r}")
            picks.append((am.group(1), am.group(2) or am.group(1)))
    else:
        picks = [
            (c, c) for c in pol_df.columns if c != match_field
        ]
    missing = [src for _, src in picks if src not in pol_df.columns]
    if missing:
        raise EsqlError(f"ENRICH: policy lacks columns {missing}")
    right = pol_df.select(
        F.col(match_field).alias("__enrich_key"),
        *[F.col(src).alias(out) for out, src in picks],
    )
    return (
        df.join(
            F.broadcast(right),
            df[on] == right["__enrich_key"],
            "left",
        )
        .drop("__enrich_key")
    )


def _cmd_inlinestats(df: DataFrame, body: str) -> DataFrame:
    """``INLINESTATS name = FUNC(x), ... [BY keys]`` — ES|QL's
    join-the-aggregate-back form: every input row survives and gains
    the group's aggregate columns.

    Plan shape: with BY keys it is ONE window exchange on the keys
    (partial aggregation doesn't apply to windows, but the shuffle is
    the same one a STATS-then-self-join would pay — minus the join).
    WITHOUT keys a global window would collapse to a single partition,
    so that form instead broadcasts the one-row global aggregate and
    cross-joins it — no shuffle of the big side at all."""
    from pyspark.sql.window import Window

    m = re.split(r"\bBY\b", body, maxsplit=1, flags=re.IGNORECASE)
    aggs = [_agg_expr(a) for a in split_commas(m[0])]
    for _, sql in aggs:
        if "FILTER (WHERE" in sql:
            raise EsqlError(
                "INLINESTATS does not support per-aggregate WHERE"
            )
    if len(m) == 1:
        one = df.agg(*[F.expr(sql).alias(alias) for alias, sql in aggs])
        return df.crossJoin(F.broadcast(one))
    keys = [k.strip() for k in split_commas(m[1])]
    missing = [k for k in keys if k not in df.columns]
    if missing:
        raise EsqlError(f"INLINESTATS BY: unknown columns {missing}")
    w = Window.partitionBy(*keys)
    for alias, sql in aggs:
        df = df.withColumn(alias, F.expr(sql).over(w))
    return df


def _cmd_lookup_join(
    df: DataFrame, body: str, tables: dict | None
) -> DataFrame:
    """``LOOKUP JOIN table ON field`` — left join against a lookup
    table on the shared field name; the lookup side's columns are
    added, OVERWRITING same-named input columns (the ES|QL contract).
    Lookup indexes are dimension-sized by contract, so the plan is one
    BroadcastHashJoin — the big side never shuffles."""
    m = re.match(
        r"^([A-Za-z_][\w.]*)\s+ON\s+([A-Za-z_][\w.]*)\s*$",
        body.strip(),
        re.IGNORECASE,
    )
    if not m:
        raise EsqlError(
            f"LOOKUP JOIN expects: LOOKUP JOIN table ON field, got {body!r}"
        )
    name, on = m.group(1), m.group(2)
    if tables and name in tables:
        right = tables[name]
    else:
        right = df.sparkSession.table(name)
    if on not in df.columns or on not in right.columns:
        raise EsqlError(f"LOOKUP JOIN: {on!r} must exist on both sides")
    clobbered = [c for c in right.columns if c != on and c in df.columns]
    return df.drop(*clobbered).join(F.broadcast(right), on, "left")


def _cmd_sample(df: DataFrame, body: str) -> DataFrame:
    """``SAMPLE p`` — Bernoulli row sample at probability p (Spark's
    sample, fixed seed).  Extension: ``SAMPLE p BY col`` makes the
    decision a pure md5-hash function of ``col`` — deterministic
    across runs, cluster sizes, and corpus growth (the datapipe
    sampling convention), and the form the correctness gate uses."""
    m = re.match(
        r"^([0-9.]+)(?:\s+BY\s+([A-Za-z_][\w.]*))?\s*$",
        body.strip(),
        re.IGNORECASE,
    )
    if not m:
        raise EsqlError(f"SAMPLE expects: SAMPLE p [BY col], got {body!r}")
    p = float(m.group(1))
    if not 0.0 <= p <= 1.0:
        raise EsqlError(f"SAMPLE probability must be in [0, 1], got {p}")
    if m.group(2):
        from ics_search_engine_spark.operators.datapipe import (
            HASH_SPACE,
            md5_32,
        )

        return df.filter(
            md5_32(F.col(m.group(2)).cast("string"))
            < F.lit(int(p * HASH_SPACE))
        )
    return df.sample(fraction=p, seed=0)


def _cmd_change_point(df: DataFrame, body: str) -> DataFrame:
    """``CHANGE_POINT value ON key`` — detect the strongest
    standardized mean shift in the (key-ordered) value series; shares
    the kernel with operators/aggs.change_point."""
    from ics_search_engine_spark.operators.aggs import change_point

    m = re.match(
        r"^([A-Za-z_][\w.]*)\s+ON\s+([A-Za-z_][\w.]*)\s*$",
        body.strip(),
        re.IGNORECASE,
    )
    if not m:
        raise EsqlError(
            f"CHANGE_POINT expects: CHANGE_POINT value ON key, got {body!r}"
        )
    value, key = m.group(1), m.group(2)
    missing = [c for c in (value, key) if c not in df.columns]
    if missing:
        raise EsqlError(f"CHANGE_POINT: unknown columns {missing}")
    return change_point(df, key, value)


_COMMANDS = {
    "WHERE": _cmd_where,
    "EVAL": _cmd_eval,
    "STATS": _cmd_stats,
    "SORT": _cmd_sort,
    "KEEP": _cmd_keep,
    "DROP": _cmd_drop,
    "RENAME": _cmd_rename,
    "MV_EXPAND": _cmd_mv_expand,
    "DISSECT": _cmd_dissect,
    "GROK": _cmd_grok,
    "LIMIT": _cmd_limit,
    "INLINESTATS": _cmd_inlinestats,
    "SAMPLE": _cmd_sample,
    "CHANGE_POINT": _cmd_change_point,
}


# ------------------------------------------------------------- pipeline


def esql_query(
    spark: SparkSession,
    query: str,
    tables: dict[str, DataFrame] | None = None,
    enrich: dict[str, tuple[DataFrame, str]] | None = None,
) -> DataFrame:
    """Compile an ES|QL pipe into one DataFrame (nothing executes
    here).  ``FROM name`` resolves through ``tables`` first, then the
    session catalog; ``ROW a = 1, b = "x"`` builds a literal row;
    ``enrich`` maps policy name -> (dimension DataFrame, match
    field) for the ENRICH command."""
    parts = split_pipes(query)
    if not parts:
        raise EsqlError("empty query")
    if re.search(r"\bMATCH\s*\(", query, re.IGNORECASE):
        # MATCH compiles to the engine's ics_tokenize UDF — make sure
        # it exists in this session (idempotent)
        from ics_search_engine_spark.functions.sqlreg import (
            register_sql_functions,
        )

        register_sql_functions(spark)
    head = parts[0]
    hm = re.match(r"^(FROM|ROW)\b\s*(.*)$", head, re.IGNORECASE | re.DOTALL)
    if not hm:
        raise EsqlError(f"query must start with FROM or ROW, got {head!r}")
    if hm.group(1).upper() == "FROM":
        names = [t.strip() for t in split_commas(hm.group(2))]
        dfs = []
        for t in names:
            if tables and t in tables:
                dfs.append(tables[t])
            else:
                dfs.append(spark.table(t))
        df = dfs[0]
        for other in dfs[1:]:
            df = df.unionByName(other, allowMissingColumns=True)
    else:
        exprs = []
        for item in split_commas(hm.group(2)):
            m = re.match(r"^([A-Za-z_][\w.]*)\s*=\s*(.+)$", item, re.DOTALL)
            if not m:
                raise EsqlError(f"ROW expects name = literal, got {item!r}")
            exprs.append(F.expr(_shim_expr(m.group(2))).alias(m.group(1)))
        df = spark.range(1).select(*exprs)

    for seg in parts[1:]:
        df = _apply_segment(df, seg, tables, enrich)
    return df


def _apply_segment(
    df: DataFrame,
    seg: str,
    tables: dict | None,
    enrich: dict | None,
) -> DataFrame:
    """Dispatch one pipe segment — shared by the top-level pipe and
    FORK branches."""
    cm = re.match(r"^([A-Za-z_]+)\b\s*(.*)$", seg, re.DOTALL)
    cmd = cm.group(1).upper() if cm else ""
    if cmd == "ENRICH":
        return _cmd_enrich(df, cm.group(2).strip(), enrich)
    if cmd == "LOOKUP":
        jm = re.match(r"^JOIN\b\s*(.*)$", cm.group(2).strip(),
                      re.IGNORECASE | re.DOTALL)
        if not jm:
            raise EsqlError(f"expected LOOKUP JOIN, got {seg!r}")
        return _cmd_lookup_join(df, jm.group(1).strip(), tables)
    if cmd == "FORK":
        return _cmd_fork(df, cm.group(2).strip(), tables, enrich)
    if cmd == "FUSE":
        return _cmd_fuse(df, cm.group(2).strip())
    if cmd in _COMMANDS:
        return _COMMANDS[cmd](df, cm.group(2).strip())
    raise EsqlError(f"unsupported command in segment {seg!r}")


def _split_parens(body: str) -> list[str]:
    """Split ``( ... ) ( ... )`` into branch strings (quote-aware)."""
    out, buf, depth, quote = [], [], 0, None
    for ch in body:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "\"'":
            quote = ch
            buf.append(ch)
        elif ch == "(":
            if depth > 0:
                buf.append(ch)
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                out.append("".join(buf).strip())
                buf = []
            else:
                buf.append(ch)
        elif depth > 0:
            buf.append(ch)
        elif ch.strip():
            raise EsqlError(
                f"FORK expects only parenthesized branches, got {body!r}"
            )
    if depth != 0 or quote:
        raise EsqlError("unterminated FORK branch")
    return out


def _cmd_fork(
    df: DataFrame, body: str, tables: dict | None, enrich: dict | None
) -> DataFrame:
    """``FORK ( sub | pipe ) ( sub | pipe ) ...`` — ES|QL 9's branch
    verb: each parenthesized sub-pipe runs on the INPUT frame, rows
    gain ``_fork`` = "fork1", "fork2", ... and the branches union
    (by name, missing columns null).  Catalyst still sees ONE plan —
    branches share the scan subtree, so a fork is never N re-reads
    declared at this layer."""
    branches = _split_parens(body)
    if len(branches) < 2:
        raise EsqlError("FORK needs at least two branches")
    outs = []
    for i, br in enumerate(branches, start=1):
        b = df
        for seg in split_pipes(br):
            b = _apply_segment(b, seg, tables, enrich)
        outs.append(b.withColumn("_fork", F.lit(f"fork{i}")))
    merged = outs[0]
    for other in outs[1:]:
        merged = merged.unionByName(other, allowMissingColumns=True)
    return merged


def _cmd_fuse(df: DataFrame, body: str) -> DataFrame:
    """``FUSE key_col BY score_col [WITH rank_constant]`` — rrf-combine
    FORK branches: within each ``_fork`` leg rows rank by (score DESC,
    key ASC), then legs fuse as Σ 1/(rank_constant + rank) per key.

    Adaptation note (documented delta from ES): ES's FUSE keys on the
    implicit ``_id``/``_score`` metadata columns; these frames carry no
    hidden metadata, so the key and score columns are explicit."""
    from pyspark.sql.window import Window

    m = re.match(
        r"^([A-Za-z_][\w.]*)\s+BY\s+([A-Za-z_][\w.]*)"
        r"(?:\s+WITH\s+(\d+))?\s*$",
        body.strip(),
        re.IGNORECASE,
    )
    if not m:
        raise EsqlError(
            f"FUSE expects: FUSE key_col BY score_col [WITH k], got {body!r}"
        )
    key, score, k = m.group(1), m.group(2), int(m.group(3) or 60)
    if "_fork" not in df.columns:
        raise EsqlError("FUSE requires a preceding FORK")
    missing = [c for c in (key, score) if c not in df.columns]
    if missing:
        raise EsqlError(f"FUSE: unknown columns {missing}")
    w = Window.partitionBy("_fork").orderBy(
        F.desc(score), F.asc(key)
    )
    ranked = df.withColumn("_r", F.row_number().over(w))
    return (
        ranked.groupBy(key)
        .agg(
            F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("_r"))).alias(
                "fused"
            ),
            F.count("*").alias("n_forks"),
        )
    )
