"""Geo search: distance filter/sort, bounding box, and grid/range
aggregations over per-doc (lat, lon) doc values.

ES attaches geo semantics to a ``geo_point`` field: ``geo_distance``
and ``geo_bounding_box`` queries restrict the match set in FILTER
context (relevance scores unchanged), ``_geo_distance`` sort orders
hits by distance from an origin, and ``geotile_grid`` /
``geo_distance`` aggregations bucket the match set for maps.  The
reference has no geo at all — its doc store is url/simhash/token_count
(/root/reference/indexer.py:121-127) — so this is an engine extension
over the same doc-values join that powers faceting and function
scoring: the transcript-keyed ``attrs`` frame IS the geo_point store.

Semantics pinned here:

* distance is great-circle haversine on a sphere, R = 6371.0 km;
* ``geo_distance_topk`` / ``geo_bounding_box_topk`` are filter
  context — surviving docs keep their exact BM25 scores (ES filter
  clauses contribute no score), cut top-k by (score desc, conv, turn);
* ``geo_sort_topk`` is the ``_geo_distance`` sort: ascending distance,
  (conv_id, turn_idx) tie-break, score carried along (ES reports it);
* ``geotile_grid`` keys cells "z/x/y" with web-mercator tile math
  (x from linear lon, y from ln(tan φ + sec φ)) — ES's map-tile agg;
* ``geo_distance_agg`` counts matched docs per [from, to) ring around
  the origin; like ``range_agg``, overlapping rings each count a doc.

Scale: every verb is matched-set → docmap join → attrs join (all
doc-count-sized, co-keyed on (conv_id, turn_idx)) with the geo math as
codegen'd column expressions — no UDF, no collect.  The filter verbs
end in TakeOrderedAndProject; the aggs end in a hash rollup of
|cells| / |rings| rows.  A 1000-executor corpus pays one shuffle for
the match set and co-partitioned joins after it, the same plan shape
as operators/facets (which see) — geo adds zero new shuffle stages.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from ics_search_engine_spark.operators.aggs import scored_matches
from ics_search_engine_spark.operators.facets import matched_docs
from ics_search_engine_spark.operators.packed_index import PackedIndex

EARTH_RADIUS_KM = 6371.0


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km between two (lat, lon) pairs in
    degrees — 2R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2))),
    entirely built-in functions so it stays inside codegen and is
    reproducible in ANSI SQL (the DuckDB gates run the same formula)."""
    dlat = F.radians(lat2 - lat1) / 2.0
    dlon = F.radians(lon2 - lon1) / 2.0
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlon) * F.sin(dlon)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def _scored_attrs(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    lat_col: str,
    lon_col: str,
) -> DataFrame:
    """(conv_id, turn_idx, score, lat, lon) for every matched doc —
    the shared front half of the scored geo verbs."""
    scored = scored_matches(spark, pidx, query)
    return (
        pidx.docmap.select("doc_ord", "conv_id", "turn_idx")
        .join(scored, "doc_ord")
        .join(attrs, ["conv_id", "turn_idx"])
        .select(
            "conv_id", "turn_idx", "score",
            F.col(lat_col).cast("double").alias("_lat"),
            F.col(lon_col).cast("double").alias("_lon"),
        )
    )


def geo_distance_topk(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    lat_col: str,
    lon_col: str,
    origin: tuple[float, float],
    radius_km: float,
    k: int = 10,
) -> DataFrame:
    """ES ``geo_distance`` query in filter context: BM25 top-k over
    matched docs within ``radius_km`` of ``origin`` (lat, lon) →
    (conv_id, turn_idx, score), surviving scores identical to the
    unfiltered ranking.  Docs with no attrs row (no geo point) are
    excluded — ES's missing-field behavior for geo filters."""
    if radius_km < 0:
        raise ValueError(f"negative radius_km: {radius_km}")
    olat, olon = float(origin[0]), float(origin[1])
    dist = haversine_km(
        F.col("_lat"), F.col("_lon"), F.lit(olat), F.lit(olon)
    )
    return (
        _scored_attrs(spark, pidx, query, attrs, lat_col, lon_col)
        .filter(dist <= F.lit(float(radius_km)))
        .select("conv_id", "turn_idx", "score")
        .orderBy(
            F.desc("score"), F.asc("conv_id"), F.asc("turn_idx")
        )
        .limit(k)
    )


def geo_bounding_box_topk(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    lat_col: str,
    lon_col: str,
    top_left: tuple[float, float],
    bottom_right: tuple[float, float],
    k: int = 10,
) -> DataFrame:
    """ES ``geo_bounding_box`` filter: BM25 top-k over matched docs
    inside the box (corners as (lat, lon); edges inclusive, matching
    ES).  A box crossing the antimeridian (left lon > right lon)
    wraps, selecting lon ≥ left OR lon ≤ right."""
    (t, left), (b, right) = top_left, bottom_right
    if b > t:
        raise ValueError(f"bottom lat {b} above top lat {t}")
    lat_ok = (F.col("_lat") <= F.lit(float(t))) & (
        F.col("_lat") >= F.lit(float(b))
    )
    if left <= right:
        lon_ok = (F.col("_lon") >= F.lit(float(left))) & (
            F.col("_lon") <= F.lit(float(right))
        )
    else:  # antimeridian crossing
        lon_ok = (F.col("_lon") >= F.lit(float(left))) | (
            F.col("_lon") <= F.lit(float(right))
        )
    return (
        _scored_attrs(spark, pidx, query, attrs, lat_col, lon_col)
        .filter(lat_ok & lon_ok)
        .select("conv_id", "turn_idx", "score")
        .orderBy(
            F.desc("score"), F.asc("conv_id"), F.asc("turn_idx")
        )
        .limit(k)
    )


def geo_sort_topk(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    lat_col: str,
    lon_col: str,
    origin: tuple[float, float],
    k: int = 10,
) -> DataFrame:
    """ES ``_geo_distance`` sort: the k matched docs NEAREST to
    ``origin`` → (conv_id, turn_idx, score, distance_km), distance
    ascending, (conv_id, turn_idx) tie-break.  Relevance score is
    carried (ES still computes and reports it); docs without a geo
    point are excluded (ES requires ``ignore_unmapped``-style handling
    and sorts missing last — here the attrs join IS the mapping)."""
    olat, olon = float(origin[0]), float(origin[1])
    dist = haversine_km(
        F.col("_lat"), F.col("_lon"), F.lit(olat), F.lit(olon)
    )
    return (
        _scored_attrs(spark, pidx, query, attrs, lat_col, lon_col)
        .withColumn("distance_km", dist)
        .select("conv_id", "turn_idx", "score", "distance_km")
        .orderBy(
            F.asc("distance_km"), F.asc("conv_id"), F.asc("turn_idx")
        )
        .limit(k)
    )


def geotile_topleft(zoom: int, x: int, y: int) -> tuple[float, float]:
    """(lat, lon) of a web-mercator tile's top-left corner — the
    inverse of the ``geotile_grid`` key math, for rendering."""
    n = 2 ** zoom
    lon = x / n * 360.0 - 180.0
    lat = math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * y / n))))
    return (lat, lon)


def geotile_grid(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    lat_col: str,
    lon_col: str,
    zoom: int = 5,
    conjunctive: bool = False,
) -> DataFrame:
    """ES ``geotile_grid`` aggregation: matched-doc count per
    web-mercator map tile → (tile "z/x/y", n_docs), tile key asc.

    Tile math (slippy-map standard, what ES emits): with φ the
    latitude in radians and n = 2^zoom,
    ``x = ⌊(lon + 180)/360 · n⌋``,
    ``y = ⌊(1 − ln(tan φ + 1/cos φ)/π)/2 · n⌋``, both clamped to
    [0, n−1] (the +90/−90 poles are outside mercator; ES clamps the
    same way).  Pure column math — ln/tan/cos/floor — so the rollup is
    one hash-agg of |occupied tiles| rows."""
    if not 0 <= zoom <= 29:
        raise ValueError(f"zoom {zoom} outside [0, 29]")
    n = 2 ** zoom
    docs = matched_docs(spark, pidx, query, conjunctive=conjunctive)
    keyed = (
        pidx.docmap.join(docs, "doc_ord")
        .join(attrs, ["conv_id", "turn_idx"])
        .select(
            F.col(lat_col).cast("double").alias("_lat"),
            F.col(lon_col).cast("double").alias("_lon"),
        )
    )
    xt = F.floor((F.col("_lon") + 180.0) / 360.0 * n)
    phi = F.radians(F.col("_lat"))
    yt = F.floor(
        (1.0 - F.ln(F.tan(phi) + 1.0 / F.cos(phi)) / math.pi)
        / 2.0 * n
    )
    clamp = lambda c: F.greatest(  # noqa: E731
        F.lit(0), F.least(c, F.lit(n - 1))
    ).cast("long")
    return (
        keyed.select(
            F.concat_ws(
                "/", F.lit(str(zoom)), clamp(xt), clamp(yt)
            ).alias("tile")
        )
        .groupBy("tile")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.asc("tile"))
    )


def geo_centroid(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    lat_col: str,
    lon_col: str,
    conjunctive: bool = False,
) -> DataFrame:
    """ES ``geo_centroid`` aggregation: arithmetic mean of the matched
    docs' coordinates → one row (lat, lon, n_docs); all-NULL coords
    with n_docs 0 on an empty match set (ES omits the centroid then).
    One hash-agg — the cheapest possible rollup."""
    docs = matched_docs(spark, pidx, query, conjunctive=conjunctive)
    return (
        pidx.docmap.join(docs, "doc_ord")
        .join(attrs, ["conv_id", "turn_idx"])
        .agg(
            F.avg(F.col(lat_col).cast("double")).alias("lat"),
            F.avg(F.col(lon_col).cast("double")).alias("lon"),
            F.count("*").alias("n_docs"),
        )
    )


def geo_bounds(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    lat_col: str,
    lon_col: str,
    conjunctive: bool = False,
) -> DataFrame:
    """ES ``geo_bounds`` aggregation: the bounding box of the matched
    docs' points → one row (top, left, bottom, right) = (max lat,
    min lon, min lat, max lon); all-NULL on an empty match set.
    Non-wrapping box (ES's ``wrap_longitude: false`` form — the
    antimeridian-crossing minimal box is a presentation refinement)."""
    docs = matched_docs(spark, pidx, query, conjunctive=conjunctive)
    return (
        pidx.docmap.join(docs, "doc_ord")
        .join(attrs, ["conv_id", "turn_idx"])
        .agg(
            F.max(F.col(lat_col).cast("double")).alias("top"),
            F.min(F.col(lon_col).cast("double")).alias("left"),
            F.min(F.col(lat_col).cast("double")).alias("bottom"),
            F.max(F.col(lon_col).cast("double")).alias("right"),
        )
    )


def geo_distance_agg(
    spark: SparkSession,
    pidx: PackedIndex,
    query: str,
    attrs: DataFrame,
    lat_col: str,
    lon_col: str,
    origin: tuple[float, float],
    ranges: list[tuple[float | None, float | None]],
    conjunctive: bool = False,
) -> DataFrame:
    """ES ``geo_distance`` aggregation: matched-doc count per
    [from_km, to_km) ring around ``origin`` → (range_ord, range_key,
    n_docs) in the caller's ring order.  ``None`` opens an end; like
    ``aggs.range_agg`` (whose single-pass shape this mirrors),
    overlapping rings each count the doc, each ring is an independent
    0/1 sum in ONE pass over the matched set, and empty rings report
    doc_count 0 (ES semantics)."""
    if not ranges:
        return spark.createDataFrame(
            [], "range_ord int, range_key string, n_docs long"
        )
    olat, olon = float(origin[0]), float(origin[1])
    docs = matched_docs(spark, pidx, query, conjunctive=conjunctive)
    keyed = (
        pidx.docmap.join(docs, "doc_ord")
        .join(attrs, ["conv_id", "turn_idx"])
        .select(
            haversine_km(
                F.col(lat_col).cast("double"),
                F.col(lon_col).cast("double"),
                F.lit(olat), F.lit(olon),
            ).alias("_dist")
        )
    )
    conds, labels = [], []
    for lo, hi in ranges:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("_dist") >= float(lo))
        if hi is not None:
            cond = cond & (F.col("_dist") < float(hi))
        conds.append(cond)
        lo_s = "*" if lo is None else f"{float(lo):g}"
        hi_s = "*" if hi is None else f"{float(hi):g}"
        labels.append(f"{lo_s}-{hi_s}")
    row = keyed.agg(
        *[
            F.coalesce(F.sum(F.when(c, 1).otherwise(0)), F.lit(0)).alias(
                f"_r{i}"
            )
            for i, c in enumerate(conds)
        ]
    )
    return row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("range_ord"),
                        F.lit(labels[i]).alias("range_key"),
                        F.col(f"_r{i}").alias("n_docs"),
                    )
                    for i in range(len(conds))
                ]
            )
        ).alias("kv")
    ).select("kv.range_ord", "kv.range_key", "kv.n_docs").orderBy("range_ord")
