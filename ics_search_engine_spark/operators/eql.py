"""EQL-style sequence queries over event / transcript streams.

The reference engine indexes isolated documents and cannot ask the
questions a multi-turn corpus invites: "find conversations where the
user asked, the assistant called a tool, and the user asked AGAIN",
or over a clickstream, "view then cart then purchase within an hour".
Elastic ships this as EQL ``sequence`` queries; Flink as CEP.  This
module is that verb, Spark-first.

Semantics (deterministic, documented — the SQL oracle mirrors them
exactly):

* events are totally ordered inside each ``by`` key by
  ``(order_col, id_col)`` — the id column breaks timestamp ties, so
  matching never depends on partition layout;
* every event matching ``stages[0]`` is an anchor;
* stage ``i+1`` matches the EARLIEST event strictly after the stage-i
  event (same key) satisfying ``stages[i+1]`` — greedy
  earliest-completion, i.e. Flink CEP's "skip to next" strategy.  A
  greedy chain that dead-ends does NOT backtrack to a later stage-i
  candidate (EQL's state machine behaves the same way for its head
  event; we apply it at every stage so the result is a pure function
  of the event set);
* ``maxspan`` (seconds) bounds last.ts - first.ts, like EQL's
  ``with maxspan``.

Scale contract: ONE window pass computes, for every event, the
earliest following match of each later stage — a single exchange on
the ``by`` key + one sort, all ``n_stages - 1`` window expressions
sharing the same WindowExec.  Chaining then reads the stage-(i+1)
pointer AT the stage-i row via a 1:1 equi-join on (key, rn) — the
join can't fan out (rn is unique per key) and its right side is
pre-filtered to rows that match the stage, so a dense key (a user
with thousands of 'view's) never produces a cross product the way a
naive per-stage theta-join would.  Driver sees nothing; the result is
anchor-sized.

The windowed event relation is consumed by every chain join (left
side + n-1 right sides), so it is persisted once (MEMORY_AND_DISK —
spills, never OOMs) instead of recomputed per branch; at corpus
scales where even spilled materialization is unwanted, write the
window output to a table first and chain over that (same plan shape).
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def sequence_matches(
    events: DataFrame,
    by: str,
    stages: list[Column],
    order_col: str = "ts",
    id_col: str = "event_id",
    maxspan_s: float | None = None,
    until: Column | None = None,
    forbid: dict[int, Column] | None = None,
) -> DataFrame:
    """Match ``stages`` (boolean Columns over the event schema) as an
    in-order sequence per ``by`` key → one row per completed anchor:

        (<by>, ts_1, id_1, ..., ts_n, id_n)

    ordered deterministically by (<by>, ts_1, id_1).

    ``until`` is EQL's expiry clause: a pending sequence dies when an
    until-event occurs, so an anchor only emits if the first
    until-event after it comes AFTER the completing event (an event
    matching both the final stage and ``until`` completes — the
    sequence finishes before the expiry is considered).  Costs one
    more expression in the same shared WindowExec, nothing else.

    ``forbid`` is per-gap negation (Flink CEP's notFollowedBy):
    ``{i: predicate}`` invalidates a match when an event satisfying
    the predicate lies STRICTLY between the stage-i and stage-(i+1)
    events — "view then purchase with no error in between".  Each
    entry is one more expression in the shared WindowExec plus a
    filter on the corresponding chain join.
    """
    n = len(stages)
    if n < 2:
        raise ValueError("a sequence needs at least two stages")
    forbid = forbid or {}
    if any(i < 1 or i >= n for i in forbid):
        raise ValueError(f"forbid keys must be gap indexes 1..{n - 1}")

    base = events.select(
        F.col(by).alias("k"),
        F.col(order_col).alias("ts"),
        F.col(id_col).alias("id"),
        *[s.alias(f"f{i + 1}") for i, s in enumerate(stages)],
        *([until.alias("fu")] if until is not None else []),
        *[p.alias(f"fb{i}") for i, p in forbid.items()],
    )
    wo = Window.partitionBy("k").orderBy("ts", "id")
    base = base.withColumn("rn", F.row_number().over(wo))
    # earliest FOLLOWING row matching stage i, for every row — one
    # WindowExec serves all stages (same partitioning + ordering;
    # emitted in a single projection so Catalyst plans ONE Window
    # node, not a chain — plan-audited in tests/test_plans.py)
    wf = wo.rowsBetween(1, Window.unboundedFollowing)
    base = base.select(
        "*",
        *[
            F.min(F.when(F.col(f"f{i}"), F.col("rn")))
            .over(wf)
            .alias(f"nx{i}")
            for i in range(2, n + 1)
        ],
        *(
            [F.min(F.when(F.col("fu"), F.col("rn"))).over(wf).alias("nxu")]
            if until is not None
            else []
        ),
        *[
            F.min(F.when(F.col(f"fb{i}"), F.col("rn")))
            .over(wf)
            .alias(f"nf{i}")
            for i in forbid
        ],
    ).cache()

    seq = base.filter(F.col("f1")).select(
        "k",
        F.col("ts").alias("ts_1"),
        F.col("id").alias("id_1"),
        *([F.col("nxu").alias("_until_rn")] if until is not None else []),
        *([F.col("nf1").alias("_nf1")] if 1 in forbid else []),
        F.col("nx2").alias("_want"),
    )
    for i in range(2, n + 1):
        # resolve the rn pointer: 1:1 join (rn unique per key); the
        # right side keeps only stage-i rows — that's where every
        # valid pointer lands, so this is a filter, not a fan-out
        right_cols = ["k", F.col("rn").alias("_want"),
                      F.col("ts").alias(f"ts_{i}"),
                      F.col("id").alias(f"id_{i}")]
        if i < n:
            right_cols.append(F.col(f"nx{i + 1}").alias("_next"))
            if i in forbid:
                right_cols.append(F.col(f"nf{i}").alias(f"_nf{i}"))
        elif until is not None:
            right_cols.append(F.col("rn").alias("_rn_last"))
        right = base.filter(F.col(f"f{i}")).select(*right_cols)
        seq = seq.join(right, ["k", "_want"])
        if (i - 1) in forbid:
            # no forbidden event strictly between stage i-1 and stage
            # i: the first one after stage i-1 must be at/after rn_i
            seq = seq.filter(
                F.col(f"_nf{i - 1}").isNull()
                | (F.col(f"_nf{i - 1}") >= F.col("_want"))
            ).drop(f"_nf{i - 1}")
        seq = seq.drop("_want")
        if i < n:
            seq = seq.withColumnRenamed("_next", "_want")

    if until is not None:
        seq = seq.filter(
            F.col("_until_rn").isNull()
            | (F.col("_until_rn") >= F.col("_rn_last"))
        )

    if maxspan_s is not None:
        # exact integer microseconds (matches the oracle's epoch_us);
        # session tz is UTC so the ntz->ltz cast is identity
        us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
        span = us(F.col(f"ts_{n}")) - us(F.col("ts_1"))
        seq = seq.filter(span <= int(maxspan_s * 1_000_000))

    out_cols = [F.col("k").alias(by)]
    for i in range(1, n + 1):
        out_cols += [F.col(f"ts_{i}"), F.col(f"id_{i}")]
    return seq.select(*out_cols).orderBy(by, "ts_1", "id_1")


def sequence_matches_sql(
    table: str,
    by: str,
    stage_preds: list[str],
    order_col: str = "ts",
    id_col: str = "event_id",
    maxspan_s: float | None = None,
    select: str | None = None,
    until_pred: str | None = None,
    forbid_preds: dict[int, str] | None = None,
) -> str:
    """The ANSI-SQL mirror of :func:`sequence_matches` (same window
    construction, same greedy pointer chase, same until-expiry and
    per-gap forbid rules) for DuckDB oracles.  ``stage_preds`` /
    ``until_pred`` / ``forbid_preds`` are SQL boolean expressions
    over ``table``."""
    n = len(stage_preds)
    forbid_preds = forbid_preds or {}
    flag_cols = ",\n    ".join(
        f"({p}) AS f{i + 1}" for i, p in enumerate(stage_preds)
    )
    if until_pred is not None:
        flag_cols += f",\n    ({until_pred}) AS fu"
    for i, p in forbid_preds.items():
        flag_cols += f",\n    ({p}) AS fb{i}"
    wspec = (
        "(PARTITION BY k ORDER BY ts, id "
        "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)"
    )
    nx_cols = ",\n    ".join(
        f"min(CASE WHEN f{i} THEN rn END) OVER {wspec} AS nx{i}"
        for i in range(2, n + 1)
    )
    if until_pred is not None:
        nx_cols += (
            f",\n    min(CASE WHEN fu THEN rn END) OVER {wspec} AS nxu"
        )
    for i in forbid_preds:
        nx_cols += (
            f",\n    min(CASE WHEN fb{i} THEN rn END) OVER {wspec} AS nf{i}"
        )
    u1 = ", nxu AS until_rn" if until_pred is not None else ""
    if 1 in forbid_preds:
        u1 += ", nf1"
    sql = f"""WITH ev AS (
  SELECT {by} AS k, {order_col} AS ts, {id_col} AS id,
    {flag_cols},
    row_number() OVER (PARTITION BY {by} ORDER BY {order_col}, {id_col})
      AS rn
  FROM {table}
),
ptr AS (
  SELECT *,
    {nx_cols}
  FROM ev
),
s1 AS (
  SELECT k, ts AS ts_1, id AS id_1{u1}, nx2 AS want FROM ptr WHERE f1
)"""
    prev = "s1"
    for i in range(2, n + 1):
        if i < n:
            nxt = f", r.nx{i + 1} AS want"
            if i in forbid_preds:
                nxt += f", r.nf{i}"
        elif until_pred is not None:
            nxt = ", r.rn AS rn_last"
        else:
            nxt = ""
        gap = (
            f"\n    AND ({prev}.nf{i - 1} IS NULL"
            f" OR {prev}.nf{i - 1} >= r.rn)"
            if (i - 1) in forbid_preds
            else ""
        )
        sql += f""",
s{i} AS (
  SELECT {prev}.* EXCLUDE (want), r.ts AS ts_{i}, r.id AS id_{i}{nxt}
  FROM {prev} JOIN ptr r ON r.k = {prev}.k AND r.rn = {prev}.want
  WHERE r.f{i}{gap}
)"""
        prev = f"s{i}"
    conds = []
    if until_pred is not None:
        conds.append("(until_rn IS NULL OR until_rn >= rn_last)")
    if maxspan_s is not None:
        conds.append(
            f"epoch_us(ts_{n}) - epoch_us(ts_1) "
            f"<= {int(maxspan_s * 1_000_000)}"
        )
    span = f"WHERE {' AND '.join(conds)}" if conds else ""
    cols = select or (
        f"k AS {by}, "
        + ", ".join(f"ts_{i}, id_{i}" for i in range(1, n + 1))
    )
    sql += f"\nSELECT {cols} FROM {prev} {span} ORDER BY {by}, ts_1, id_1"
    return sql


class EqlParseError(ValueError):
    pass


_MAXSPAN_UNITS = {"ms": 0.001, "s": 1.0, "m": 60.0, "h": 3600.0,
                  "d": 86400.0}


def _split_blocks(body: str) -> list[tuple[bool, str]]:
    """Scan ``[...]`` blocks (quote-aware), each optionally prefixed
    with ``!`` (EQL missing-event negation) → [(negated, content)]."""
    out: list[tuple[bool, str]] = []
    i, n = 0, len(body)
    while i < n:
        ch = body[i]
        if ch.isspace():
            i += 1
            continue
        neg = False
        if ch == "!":
            neg = True
            i += 1
            while i < n and body[i].isspace():
                i += 1
            if i >= n or body[i] != "[":
                raise EqlParseError("'!' must prefix a [...] block")
            ch = body[i]
        if ch != "[":
            raise EqlParseError(
                f"expected '[' at {body[i:i+20]!r} in sequence body"
            )
        depth, quote = 0, None
        j = i
        while j < n:
            c = body[j]
            if quote:
                if c == quote:
                    quote = None
            elif c in "\"'":
                quote = c
            elif c == "[":
                depth += 1
            elif c == "]":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        if depth != 0:
            raise EqlParseError("unterminated [...] block")
        out.append((neg, body[i + 1 : j].strip()))
        i = j + 1
    return out


def _block_pred(content: str, category_col: str) -> Column:
    """``category [where condition]`` → boolean Column.  ``any`` (or
    ``*``) matches every event; the condition reuses the ES|QL
    expression shim (==, double-quoted strings, wildcard LIKE)."""
    from ics_search_engine_spark.operators.esql import _shim_expr

    m = re.match(
        r"^([\w.*]+)(?:\s+where\s+(.+))?$", content.strip(),
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise EqlParseError(f"bad event block: [{content}]")
    cat, cond = m.group(1), m.group(2)
    pred = None
    if cat not in ("any", "*"):
        pred = F.col(category_col) == cat
    if cond:
        c = F.expr(_shim_expr(cond))
        pred = c if pred is None else (pred & c)
    if pred is None:
        return F.lit(True)  # bare [any]: every event matches
    return pred


def eql_text_query(
    events: DataFrame,
    query: str,
    category_col: str = "event_type",
    order_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """EQL text frontend over the CEP engine: parse

        sequence by <f1[, f2]> [with maxspan=<N><ms|s|m|h|d>]
          [cat1 where cond] ![forbidden] [cat2] ...
          [until [cat where cond]]

    into a ``sequence_matches`` call (``![...]`` between stages is the
    missing-event negation → per-gap forbid).  A plain single block
    ``cat where cond`` is the degenerate one-event query — a filter.
    Multiple ``by`` fields are joined into a synthesized ``_by`` key
    column (the engine keys sequences on one column).
    """
    q = query.strip()
    hm = re.match(
        r"^sequence(?:\s+by\s+([\w.,\s]+?))?"
        r"(?:\s+with\s+maxspan\s*=\s*(\d+)(ms|s|m|h|d))?\s*(\[.*)$",
        q,
        re.IGNORECASE | re.DOTALL,
    )
    if not hm:
        # single-event form: "category where condition"
        if "[" in q or q.lower().startswith("sequence"):
            raise EqlParseError(f"cannot parse EQL query: {query!r}")
        return events.filter(_block_pred(q, category_col))
    by_raw, span_n, span_u, body = (
        hm.group(1), hm.group(2), hm.group(3), hm.group(4),
    )
    if not by_raw:
        raise EqlParseError("sequence requires a by field")
    by_fields = [f.strip() for f in by_raw.split(",") if f.strip()]
    maxspan_s = (
        int(span_n) * _MAXSPAN_UNITS[span_u.lower()] if span_n else None
    )

    until_pred = None
    um = re.search(r"\buntil\s*(\[.*)$", body, re.IGNORECASE | re.DOTALL)
    if um:
        ub = _split_blocks(um.group(1))
        if len(ub) != 1 or ub[0][0]:
            raise EqlParseError("until takes exactly one [...] block")
        until_pred = _block_pred(ub[0][1], category_col)
        body = body[: um.start()]

    blocks = _split_blocks(body)
    stages: list[Column] = []
    forbid: dict[int, Column] = {}
    for neg, content in blocks:
        pred = _block_pred(content, category_col)
        if neg:
            if not stages:
                raise EqlParseError("![...] cannot precede the first stage")
            gap = len(stages)  # forbidden between stage len(stages)-1 and next
            if gap in forbid:
                raise EqlParseError("one ![...] per gap")
            forbid[gap] = pred
        else:
            stages.append(pred)
    if len(stages) < 2:
        raise EqlParseError("sequence needs at least two event blocks")
    if max(forbid, default=0) >= len(stages):
        raise EqlParseError("![...] must sit between two stages")

    df = events
    by = by_fields[0]
    if len(by_fields) > 1:
        df = df.withColumn("_by", F.concat_ws("\x00", *by_fields))
        by = "_by"
    return sequence_matches(
        df,
        by=by,
        stages=stages,
        order_col=order_col,
        id_col=id_col,
        maxspan_s=maxspan_s,
        until=until_pred,
        forbid=forbid or None,
    )
