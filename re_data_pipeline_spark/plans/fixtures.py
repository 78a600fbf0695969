"""Deterministic domain fixtures (FIXTURES.md) for the reference pipelines.

Everything is generated from ``seed=42``-style arithmetic on row indices —
no RNG state, no wall clock — so pipeline outputs are bit-stable across runs
and engines.  Shapes mirror the reference's raw inputs (three broker-listing
source variants with source-specific column names, nested liv.rent buildings,
POIs at pinned distances, partially-covering zone tiles).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession

# Edmonton-ish planar origin for synthetic projected coords (meters).
GRID_ORIGIN_X = -16000.0
GRID_ORIGIN_Y = -16000.0
CELL_SIZE = 500.0
GRID_CELLS = 64


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _coord(i: int, salt: str) -> float:
    """Deterministic coordinate in the 32 km box (meters, planar)."""
    return GRID_ORIGIN_X + (_h(f"{salt}:{i}") % 32000)


AV_SCHEMA = (
    "name string, city string, status string, "
    "location struct<lat:string,lng:string>, external_url string, "
    "image_path string, transaction string, address string, price string"
)


def av_payload(n: int = 40) -> list[dict]:
    """The AV endpoint's JSON rows — shared between the fixture DataFrame and
    the mock HTTP server in ``plans/acquisition.py`` so the in-engine
    acquisition path (S1) ingests byte-identical rows."""
    rows = []
    for i in range(n):
        city = "Edmonton" if i % 5 != 4 else "Calgary"
        status = ["active", "escrow", "closed"][i % 3]
        rows.append(
            {
                "name": f"AV Property {i}",
                "city": city,
                "status": status,
                "location": {
                    "lat": f"{53.4 + (i % 40) * 0.005:.10f}",
                    "lng": f"{-113.7 + (i % 40) * 0.005:.10f}",
                },
                "external_url": f"https://av.example/p/{i}",
                "image_path": f"/img/{i}.jpg",
                "transaction": "For Sale" if i % 2 == 0 else "For Lease",
                "address": f"{100 + i} Jasper Ave",
                "price": str(1000 + i * 10),
            }
        )
    return rows


def raw_av_listings(spark: SparkSession, n: int = 40) -> DataFrame:
    """AV-style source rows (``get_AV_listings.py:94-100`` rename shape):
    nested location strings, city filter column, CDN-relative image path."""
    names = [f.strip().split(" ")[0] for f in AV_SCHEMA.split(", ")]
    rows = [tuple(r[k] for k in names) for r in av_payload(n)]
    return spark.createDataFrame(rows, AV_SCHEMA)


OMADA_SCHEMA = (
    "title struct<rendered:string>, address string, city string, "
    "status string, _listing_sqft_min string, _listing_sqft_max string, "
    "_listing_acre_min string, _listing_acre_max string, "
    "transaction string, latitude string, longitude string"
)


def omada_payload(n: int = 30) -> list[dict]:
    """WordPress REST rows served by the mock WP endpoint (S3).  All rows are
    ``publish`` here; the acquisition-path mock server adds ``draft`` rows on
    top and filters them with the ``status=publish`` query param, mirroring
    the WP API contract where status filtering happens at the endpoint."""
    rows = []
    for i in range(n):
        sqft_min = str(500 + i * 10) if i % 3 != 2 else None
        sqft_max = str(900 + i * 10) if i % 3 == 0 else None
        acre_min = str(1 + i % 4) if i % 3 == 2 else None
        rows.append(
            {
                "title": {"rendered": f"Omada Listing {i}"},
                "address": f"{200 + i} Whyte Ave",
                "city": "Edmonton",
                "status": "publish",
                "_listing_sqft_min": sqft_min,
                "_listing_sqft_max": sqft_max,
                "_listing_acre_min": acre_min,
                "_listing_acre_max": None,
                "transaction": "Sale or Lease"
                if i % 4 == 0
                else ("Sublease" if i % 4 == 1 else "For Lease"),
                "latitude": f"{53.40 + (i % 30) * 0.006:.10f}",
                "longitude": f"{-113.65 + (i % 30) * 0.006:.10f}",
            }
        )
    return rows


def raw_omada_listings(spark: SparkSession, n: int = 30) -> DataFrame:
    """Omada-style rows: title.rendered nesting, sqft/acre min/max size CASE
    inputs (``get_omada_listings.py:86-120``)."""
    names = [f.strip().split(" ")[0] for f in OMADA_SCHEMA.split(", ")]
    rows = [tuple(r[k] for k in names) for r in omada_payload(n)]
    return spark.createDataFrame(rows, OMADA_SCHEMA)


ROYAL_PARK_SCHEMA = (
    "building string, address string, city string, latitude string, "
    "longitude string, transaction string, price string"
)


def royal_park_payload(n: int = 20) -> list[dict]:
    """Rows the Royal-Park admin-ajax POST endpoint returns (S4)."""
    rows = []
    for i in range(n):
        rows.append(
            {
                "building": f"RP Building {i}",
                "address": f"{300 + i} 104 St NW",
                "city": "Edmonton",
                "latitude": f"{53.45 + (i % 20) * 0.004:.10f}",
                "longitude": f"{-113.60 + (i % 20) * 0.004:.10f}",
                "transaction": "For Lease",
                "price": str(2000 + i * 25),
            }
        )
    return rows


def raw_royal_park_listings(spark: SparkSession, n: int = 20) -> DataFrame:
    """Royal-Park-style rows (``get_royal_park_listings.py:80-107``)."""
    names = [f.strip().split(" ")[0] for f in ROYAL_PARK_SCHEMA.split(", ")]
    rows = [tuple(r[k] for k in names) for r in royal_park_payload(n)]
    return spark.createDataFrame(rows, ROYAL_PARK_SCHEMA)


def osm_pois(spark: SparkSession) -> DataFrame:
    """POIs at pinned planar offsets from hash-derived anchor points
    (FIXTURES §8): 500 / 999 / 1001 / 2000 m offsets pin the ≤1000 m
    radius boundary RELATIVE TO EACH ANCHOR.  Note the anchors are not the
    listing coordinates the pipelines derive from lat/lng — the exact
    boundary semantics are pinned in ``test_spatial.py`` against controlled
    geometry; here the POIs exercise the join mechanics (cell bucketing,
    null enrichment for out-of-range listings) over arbitrary layouts."""
    rows = []
    k = 0
    for i in range(30):
        x, y = _coord(i, "px"), _coord(i, "py")
        for dist, kind, name_t in [
            (500.0, "business", "shop"),
            (999.0, "business", "cafe"),
            (1001.0, "amenity", "school"),
            (2000.0, "amenity", "library"),
        ]:
            rows.append((k, kind, f"{name_t}-{i}", x + dist, y, name_t))
            k += 1
        # excluded category (get_osm_data.py:132-133)
        rows.append((k, "amenity", f"worship-{i}", x, y + 400.0, "place_of_worship"))
        k += 1
    return spark.createDataFrame(
        rows, "poi_id long, kind string, name string, x double, y double, poi_type string"
    )


def zone_polygons(spark: SparkSession) -> DataFrame:
    """Non-overlapping rectangular zone tiles covering ~70% of the box
    (FIXTURES §7) as array<struct<x,y>> rings."""
    rows = []
    zid = 0
    for gx in range(0, 8):
        for gy in range(0, 8):
            if (gx + gy) % 3 == 2:  # ~1/3 gap → left join yields null zones
                continue
            x0 = GRID_ORIGIN_X + gx * 4000.0
            y0 = GRID_ORIGIN_Y + gy * 4000.0
            ring = [
                {"x": x0, "y": y0},
                {"x": x0 + 4000.0, "y": y0},
                {"x": x0 + 4000.0, "y": y0 + 4000.0},
                {"x": x0, "y": y0 + 4000.0},
            ]
            rows.append((f"Z{zid:03d}", f"zone {zid} description", ring))
            zid += 1
    return spark.createDataFrame(
        rows, "zoning string, description string, ring array<struct<x:double,y:double>>"
    )


def raw_liv_buildings(spark: SparkSession, n: int = 25) -> DataFrame:
    """Nested liv.rent GraphQL feed (``get_liv_data.py:174-192``): building
    rows with a listings array to explode; some units have junk rates."""
    rows = []
    for i in range(n):
        units = []
        for u in range(1 + i % 4):
            rate = str(900 + 50 * ((i + u) % 20)) if (i + u) % 7 != 6 else "N/A"
            units.append(
                {
                    "price": rate,
                    "bedrooms": (i + u) % 5,
                    "bathrooms": 1 + (i + u) % 2,
                    "size": str(400 + 25 * u),
                }
            )
        rows.append(
            (
                f"Liv Tower {i}",
                "apartment",
                f"{400 + i} 109 St",
                "Edmonton",
                "AB",
                {"x": _coord(i, "lx"), "y": _coord(i, "ly")},
                units,
            )
        )
    return spark.createDataFrame(
        rows,
        "building_name string, building_type string, full_street_name string, "
        "city string, state string, location struct<x:double,y:double>, "
        "listings array<struct<price:string,bedrooms:int,bathrooms:int,size:string>>",
    )


def council_transcripts(spark: SparkSession) -> DataFrame:
    """Transcript rows with snippet counts pinning the chunk rule
    (FIXTURES §9: {10, 29, 35, 36, 64, 70, 100}), unsorted keys, state
    flags, >90-day date spread."""
    counts = [10, 29, 35, 36, 64, 70, 100]
    rows = []
    for i, cnt in enumerate(counts):
        snippets = {}
        for j in reversed(range(cnt)):
            snippets[str(j * 6)] = f"t{i} snippet {j}"
        rows.append(
            (
                i,
                f"2024-0{1 + i % 6}-1{i % 3}",
                1704067200 + i * 86400 * 20,  # epoch start_time, 20-day spacing
                "City Council" if i % 2 == 0 else "Committee",
                f"Meeting {i}",
                f"https://youtube.example/watch?v=vid{i}",
                snippets,
                1 if i == 0 else 0,  # one already vectorized
                0,
            )
        )
    return spark.createDataFrame(
        rows,
        "council_transcript_id long, date string, start_time_epoch long, "
        "meeting_type string, title string, video_url string, "
        "timestamped_transcript map<string,string>, vectorized int, summarized int",
    )
