"""Ingest pipelines — the ES ``_ingest/pipeline`` processor chain.

ES transforms documents at write time with an ordered list of
PROCESSORS (set, rename, gsub, split, convert, date, dissect, grok,
…), each a small declarative JSON spec.  The reference engine has a
single hard-coded cleaning pass (/root/reference/components/
document_processor.py); this module adds the configurable chain — and
because every supported processor is a pure column expression, a whole
pipeline COMPILES TO ONE Catalyst projection: processors chain as
column substitutions, whole-stage codegen fuses them, and the write
path stays map-only at any corpus size (contrast ES, which runs the
chain row-at-a-time per ingest node).

Supported processors (the ES spec-dict shape, one key per processor):

    {"set":       {"field", "value" | "copy_from"}}
    {"remove":    {"field" | "fields": [...]}}
    {"rename":    {"field", "target_field"}}
    {"gsub":      {"field", "pattern", "replacement", "target_field"?}}
    {"split":     {"field", "separator", "target_field"?}}   # regex
    {"join":      {"field", "separator", "target_field"?}}
    {"lowercase" | "uppercase" | "trim": {"field", "target_field"?}}
    {"convert":   {"field", "type", "target_field"?}}
    {"date":      {"field", "formats": [...], "target_field"?}}
    {"dissect":   {"field", "pattern"}}
    {"grok":      {"field", "pattern"}}

Failure posture: data-level failures yield NULL (``try_cast`` /
``try_to_timestamp`` / non-matching regex → NULL, explicitly — Spark 4
runs ANSI-on, where plain cast/to_timestamp would fail the JOB on one
bad row), which is exactly ES's ``on_failure``-set-null idiom; a
processor referencing a MISSING FIELD raises at compile time
(configuration error, not data error).

``simulate`` mirrors ``_ingest/pipeline/_simulate``: run the compiled
pipeline over literal docs and return plain dicts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ics_search_engine_spark.operators.esql import (
    dissect_to_regex,
    grok_to_regex,
)

_CONVERT_TYPES = {
    "integer": "int", "long": "long", "float": "float",
    "double": "double", "boolean": "boolean", "string": "string",
}


def _need(spec: dict, *keys: str) -> list:
    missing = [k for k in keys if k not in spec]
    if missing:
        raise ValueError(f"processor spec missing {missing}: {spec}")
    return [spec[k] for k in keys]


def _have(df: DataFrame, field: str, ptype: str) -> None:
    if field not in df.columns:
        raise ValueError(
            f"{ptype} processor references missing field {field!r}"
        )


def apply_processor(df: DataFrame, proc: dict) -> DataFrame:
    """One processor spec → transformed DataFrame (a column
    substitution — no shuffle, no action)."""
    if len(proc) != 1:
        raise ValueError(f"processor must have exactly one key: {proc}")
    ptype, spec = next(iter(proc.items()))

    if ptype == "set":
        (field,) = _need(spec, "field")
        if "copy_from" in spec:
            _have(df, spec["copy_from"], ptype)
            return df.withColumn(field, F.col(spec["copy_from"]))
        return df.withColumn(field, F.lit(spec["value"]))

    if ptype == "remove":
        fields = spec.get("fields") or [spec["field"]]
        for f_ in fields:
            _have(df, f_, ptype)
        return df.drop(*fields)

    if ptype == "rename":
        field, target = _need(spec, "field", "target_field")
        _have(df, field, ptype)
        if target in df.columns:
            raise ValueError(f"rename target {target!r} already exists")
        return df.withColumnRenamed(field, target)

    def io_cols() -> tuple[str, str]:
        (field,) = _need(spec, "field")
        _have(df, field, ptype)
        return field, spec.get("target_field", field)

    if ptype == "gsub":
        field, out = io_cols()
        return df.withColumn(
            out,
            F.regexp_replace(
                F.col(field), spec["pattern"], spec["replacement"]
            ),
        )
    if ptype == "split":
        field, out = io_cols()
        return df.withColumn(out, F.split(F.col(field), spec["separator"]))
    if ptype == "join":
        field, out = io_cols()
        return df.withColumn(
            out, F.concat_ws(spec["separator"], F.col(field))
        )
    if ptype in ("lowercase", "uppercase", "trim"):
        field, out = io_cols()
        fn = {"lowercase": F.lower, "uppercase": F.upper, "trim": F.trim}[
            ptype
        ]
        return df.withColumn(out, fn(F.col(field)))
    if ptype == "convert":
        field, out = io_cols()
        typ = _CONVERT_TYPES.get(spec.get("type"))
        if typ is None:
            raise ValueError(f"convert: unknown type {spec.get('type')!r}")
        return df.withColumn(out, F.col(field).try_cast(typ))
    if ptype == "date":
        (field,) = _need(spec, "field")
        _have(df, field, ptype)
        out = spec.get("target_field", "@timestamp")
        parsed: Column | None = None
        for fmt in _need(spec, "formats")[0]:
            p = F.try_to_timestamp(F.col(field), F.lit(fmt))
            parsed = p if parsed is None else F.coalesce(parsed, p)
        return df.withColumn(out, parsed)
    if ptype == "dissect":
        field, _ = io_cols()
        rx, keys = dissect_to_regex(spec["pattern"])
        out_df = df
        matched = F.col(field).rlike(rx)
        for i, k in enumerate(keys, start=1):
            out_df = out_df.withColumn(
                k, F.when(matched, F.regexp_extract(F.col(field), rx, i))
            )
        return out_df
    if ptype == "grok":
        field, _ = io_cols()
        rx, caps = grok_to_regex(spec["pattern"])
        matched = F.col(field).rlike(rx)
        out_df = df
        for i, (name, typ) in enumerate(caps, start=1):
            e = F.when(matched, F.regexp_extract(F.col(field), rx, i))
            if typ is not None:
                e = e.cast(typ)
            out_df = out_df.withColumn(name, e)
        return out_df

    raise ValueError(f"unknown processor type {ptype!r}")


def run_pipeline(df: DataFrame, processors: list[dict]) -> DataFrame:
    """The full chain — still one lazy projection over ``df``."""
    for proc in processors:
        df = apply_processor(df, proc)
    return df


def simulate(spark, processors: list[dict], docs: list[dict]) -> list[dict]:
    """ES ``_ingest/pipeline/_simulate``: run the pipeline over literal
    docs, return plain dicts (for pipeline authoring/tests)."""
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame(docs))
    return [
        r.asDict(recursive=True)
        for r in run_pipeline(df, processors).collect()
    ]
