"""Geo verbs (distance filter/sort, bounding box, geotile/distance
aggs) vs pure-Python transcriptions of the same great-circle math on
the stemmed corpus."""

import math

import pytest

from oracle import bm25 as oracle
from ics_search_engine_spark.operators.geo import (
    geo_bounding_box_topk,
    geo_distance_agg,
    geo_distance_topk,
    geo_sort_topk,
    geotile_grid,
    geotile_topleft,
)
from ics_search_engine_spark.operators.packed_index import (
    PackedIndex,
    build_packed_index,
)

QUERY = "machine learning"
ORIGIN = (37.77, -122.42)


def _hav_km(lat1, lon1, lat2, lon2):
    dlat = math.radians(lat2 - lat1) / 2.0
    dlon = math.radians(lon2 - lon1) / 2.0
    a = (
        math.sin(dlat) ** 2
        + math.cos(math.radians(lat1))
        * math.cos(math.radians(lat2))
        * math.sin(dlon) ** 2
    )
    return 2.0 * 6371.0 * math.asin(math.sqrt(a))


def _points(small_rows):
    """Deterministic (lat, lon) per doc, shared by engine and oracle:
    a pseudo-random spread over the globe away from the poles."""
    pts = {}
    for i, (cid, tidx, _) in enumerate(
        sorted((r[0], r[1], r[2]) for r in small_rows)
    ):
        pts[(cid, tidx)] = (
            ((i * 7919) % 1600) / 10.0 - 80.0,
            ((i * 104729) % 3600) / 10.0 - 180.0,
        )
    return pts


@pytest.fixture(scope="module")
def setup(spark, small_df, small_rows, corpus_dir):
    out = f"{corpus_dir}/geo_idx"
    build_packed_index(spark, small_df, out, range_bits=9)
    pts = _points(small_rows)
    attrs = spark.createDataFrame(
        [(c, t, lat, lon) for (c, t), (lat, lon) in pts.items()],
        "conv_id string, turn_idx int, lat double, lon double",
    )
    return PackedIndex(spark, out), small_rows, pts, attrs


def _scored(rows, query):
    idx = oracle.build_index(rows)
    return {
        (c, t): s for c, t, s in oracle.search(idx, query, k=len(rows) + 1)
    }


class TestGeoDistance:
    def test_filter_context_matches_oracle(self, spark, setup):
        pidx, rows, pts, attrs = setup
        radius = 6000.0
        got = geo_distance_topk(
            spark, pidx, QUERY, attrs, "lat", "lon", ORIGIN, radius, k=15
        ).collect()
        scores = _scored(rows, QUERY)
        expect = sorted(
            (
                (k, s)
                for k, s in scores.items()
                if _hav_km(*pts[k], *ORIGIN) <= radius
            ),
            key=lambda kv: (-kv[1], kv[0]),
        )[:15]
        assert [((r[0], r[1])) for r in got] == [k for k, _ in expect]
        # filter context: surviving scores EXACTLY the unfiltered ones
        for r, (k, s) in zip(got, expect):
            assert r["score"] == pytest.approx(s, abs=1e-9)

    def test_radius_zero_and_negative(self, spark, setup):
        pidx, rows, pts, attrs = setup
        assert (
            geo_distance_topk(
                spark, pidx, QUERY, attrs, "lat", "lon", ORIGIN, 0.0, k=5
            ).count()
            == 0
        )
        with pytest.raises(ValueError):
            geo_distance_topk(
                spark, pidx, QUERY, attrs, "lat", "lon", ORIGIN, -1.0
            )

    def test_empty_query(self, spark, setup):
        pidx, rows, pts, attrs = setup
        assert (
            geo_distance_topk(
                spark, pidx, "the of and", attrs, "lat", "lon", ORIGIN,
                1e9, k=5,
            ).count()
            == 0
        )


class TestBoundingBox:
    def test_matches_oracle(self, spark, setup):
        pidx, rows, pts, attrs = setup
        tl, br = (60.0, -100.0), (-20.0, 100.0)
        got = geo_bounding_box_topk(
            spark, pidx, QUERY, attrs, "lat", "lon", tl, br, k=15
        ).collect()
        scores = _scored(rows, QUERY)
        expect = sorted(
            (
                (k, s)
                for k, s in scores.items()
                if br[0] <= pts[k][0] <= tl[0]
                and tl[1] <= pts[k][1] <= br[1]
            ),
            key=lambda kv: (-kv[1], kv[0]),
        )[:15]
        assert [(r[0], r[1]) for r in got] == [k for k, _ in expect]

    def test_antimeridian_wrap(self, spark, setup):
        pidx, rows, pts, attrs = setup
        tl, br = (80.0, 150.0), (-80.0, -150.0)  # left lon > right lon
        got = geo_bounding_box_topk(
            spark, pidx, QUERY, attrs, "lat", "lon", tl, br, k=5000
        ).collect()
        scores = _scored(rows, QUERY)
        expect = {
            k
            for k in scores
            if -80.0 <= pts[k][0] <= 80.0
            and (pts[k][1] >= 150.0 or pts[k][1] <= -150.0)
        }
        assert {(r[0], r[1]) for r in got} == expect

    def test_invalid_box(self, spark, setup):
        pidx, rows, pts, attrs = setup
        with pytest.raises(ValueError):
            geo_bounding_box_topk(
                spark, pidx, QUERY, attrs, "lat", "lon",
                (-10.0, 0.0), (10.0, 20.0),
            )


class TestGeoSort:
    def test_nearest_k_matches_oracle(self, spark, setup):
        pidx, rows, pts, attrs = setup
        got = geo_sort_topk(
            spark, pidx, QUERY, attrs, "lat", "lon", ORIGIN, k=12
        ).collect()
        scores = _scored(rows, QUERY)
        expect = sorted(
            scores, key=lambda k: (_hav_km(*pts[k], *ORIGIN), k)
        )[:12]
        assert [(r[0], r[1]) for r in got] == expect
        dists = [r["distance_km"] for r in got]
        assert dists == sorted(dists)
        for r in got:
            assert r["distance_km"] == pytest.approx(
                _hav_km(*pts[(r[0], r[1])], *ORIGIN), abs=1e-6
            )
            assert r["score"] == pytest.approx(
                scores[(r[0], r[1])], abs=1e-9
            )


class TestGeotileGrid:
    def _tile(self, lat, lon, zoom):
        n = 2 ** zoom
        x = math.floor((lon + 180.0) / 360.0 * n)
        phi = math.radians(lat)
        y = math.floor(
            (1.0 - math.log(math.tan(phi) + 1.0 / math.cos(phi)) / math.pi)
            / 2.0 * n
        )
        return f"{zoom}/{max(0, min(x, n - 1))}/{max(0, min(y, n - 1))}"

    def test_matches_oracle(self, spark, setup):
        pidx, rows, pts, attrs = setup
        for zoom in (0, 3, 6):
            got = {
                r["tile"]: r["n_docs"]
                for r in geotile_grid(
                    spark, pidx, QUERY, attrs, "lat", "lon", zoom=zoom
                ).collect()
            }
            expect: dict[str, int] = {}
            for k in _scored(rows, QUERY):
                t = self._tile(*pts[k], zoom)
                expect[t] = expect.get(t, 0) + 1
            assert got == expect

    def test_polar_clamp(self, spark, setup):
        """Latitudes beyond the mercator limit clamp into [0, n-1] —
        y would be negative at the north pole without the clamp."""
        pidx, rows, pts, attrs = setup
        polar = attrs.sparkSession.createDataFrame(
            [(c, t, 89.9, lon) for (c, t), (_, lon) in pts.items()],
            "conv_id string, turn_idx int, lat double, lon double",
        )
        got = geotile_grid(
            spark, pidx, QUERY, polar, "lat", "lon", zoom=2
        ).collect()
        assert all(0 <= int(r["tile"].split("/")[2]) <= 3 for r in got)

    def test_zoom_validation(self, spark, setup):
        pidx, rows, pts, attrs = setup
        with pytest.raises(ValueError):
            geotile_grid(spark, pidx, QUERY, attrs, "lat", "lon", zoom=30)

    def test_topleft_inverse(self):
        lat, lon = geotile_topleft(3, 1, 2)
        assert lon == pytest.approx(-135.0)
        assert self._tile(lat - 1.0, lon + 1.0, 3) == "3/1/2"


class TestGeoDistanceAgg:
    def test_rings_match_oracle(self, spark, setup):
        pidx, rows, pts, attrs = setup
        rings = [(None, 3000.0), (3000.0, 9000.0), (6000.0, None)]
        got = geo_distance_agg(
            spark, pidx, QUERY, attrs, "lat", "lon", ORIGIN, rings
        ).collect()
        dists = [_hav_km(*pts[k], *ORIGIN) for k in _scored(rows, QUERY)]
        expect = [
            sum(1 for d in dists if d < 3000.0),
            sum(1 for d in dists if 3000.0 <= d < 9000.0),
            sum(1 for d in dists if d >= 6000.0),  # overlapping ring
        ]
        assert [r["n_docs"] for r in got] == expect
        assert [r["range_key"] for r in got] == [
            "*-3000", "3000-9000", "6000-*",
        ]

    def test_empty_ring_reports_zero(self, spark, setup):
        pidx, rows, pts, attrs = setup
        got = geo_distance_agg(
            spark, pidx, QUERY, attrs, "lat", "lon", ORIGIN,
            [(0.0, 0.001), (None, None)],
        ).collect()
        assert got[0]["n_docs"] == 0
        assert got[1]["n_docs"] > 0

    def test_empty_ranges(self, spark, setup):
        pidx, rows, pts, attrs = setup
        assert (
            geo_distance_agg(
                spark, pidx, QUERY, attrs, "lat", "lon", ORIGIN, []
            ).count()
            == 0
        )


class TestGeoCentroidBounds:
    def test_centroid_matches_mean(self, spark, setup):
        from ics_search_engine_spark.operators.geo import geo_centroid

        pidx, rows, pts, attrs = setup
        row = geo_centroid(
            spark, pidx, QUERY, attrs, "lat", "lon"
        ).collect()[0]
        matched = list(_scored(rows, QUERY))
        assert row["n_docs"] == len(matched)
        assert row["lat"] == pytest.approx(
            sum(pts[k][0] for k in matched) / len(matched), abs=1e-9
        )
        assert row["lon"] == pytest.approx(
            sum(pts[k][1] for k in matched) / len(matched), abs=1e-9
        )

    def test_centroid_empty_match(self, spark, setup):
        from ics_search_engine_spark.operators.geo import geo_centroid

        pidx, rows, pts, attrs = setup
        row = geo_centroid(
            spark, pidx, "zzzqqq", attrs, "lat", "lon"
        ).collect()[0]
        assert row["lat"] is None and row["lon"] is None
        assert row["n_docs"] == 0

    def test_bounds_match_minmax(self, spark, setup):
        from ics_search_engine_spark.operators.geo import geo_bounds

        pidx, rows, pts, attrs = setup
        row = geo_bounds(
            spark, pidx, QUERY, attrs, "lat", "lon"
        ).collect()[0]
        matched = list(_scored(rows, QUERY))
        assert row["top"] == max(pts[k][0] for k in matched)
        assert row["bottom"] == min(pts[k][0] for k in matched)
        assert row["left"] == min(pts[k][1] for k in matched)
        assert row["right"] == max(pts[k][1] for k in matched)
