"""GeoJSON FeatureCollection reader (S9): points + MultiPolygon with a hole
parsed into the ring-struct model and consumed by the point-in-polygon join
(the reference's gpd.read_file + sjoin flow, get_osm_data.py:13-25 /
get_zoning_data.py:33-60)."""

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from re_data_pipeline_spark.sources.geojson import read_geojson


@pytest.fixture()
def gj_dir():
    d = tempfile.mkdtemp(prefix="geojson_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write(d, name, obj):
    p = os.path.join(d, name)
    with open(p, "w") as f:
        json.dump(obj, f)
    return p


POIS = {
    "type": "FeatureCollection",
    "features": [
        {"type": "Feature", "properties": {"name": "cafe", "amenity": "cafe"},
         "geometry": {"type": "Point", "coordinates": [1.5, 2.5]}},
        {"type": "Feature", "properties": {"name": "bank", "amenity": "bank"},
         "geometry": {"type": "Point", "coordinates": [25.0, 5.0]}},
    ],
}

ZONES = {
    "type": "FeatureCollection",
    "features": [
        # donut zone: outer ring + hole (GeoJSON Polygon ring list)
        {"type": "Feature", "properties": {"name": "donut", "amenity": None},
         "geometry": {"type": "Polygon", "coordinates": [
             [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
             [[3, 3], [7, 3], [7, 7], [3, 7], [3, 3]]]}},
        # two-part MultiPolygon
        {"type": "Feature", "properties": {"name": "twins", "amenity": None},
         "geometry": {"type": "MultiPolygon", "coordinates": [
             [[[20, 0], [30, 0], [30, 10], [20, 10], [20, 0]]],
             [[[40, 0], [50, 0], [50, 10], [40, 10], [40, 0]]]]}},
    ],
}


def test_read_points_and_polygons(spark, gj_dir):
    _write(gj_dir, "pois.geojson", POIS)
    pois = read_geojson(spark, os.path.join(gj_dir, "pois.geojson"),
                        "name string, amenity string")
    got = {r.name: (r.geometry_type, r.x, r.y, r.rings) for r in pois.collect()}
    assert got["cafe"] == ("Point", 1.5, 2.5, None)
    assert got["bank"][1:3] == (25.0, 5.0)

    _write(gj_dir, "zones.geojson", ZONES)
    zones = read_geojson(spark, os.path.join(gj_dir, "zones.geojson"),
                         "name string, amenity string")
    rings = {r.name: r.rings for r in zones.collect()}
    assert len(rings["donut"]) == 2  # outer + hole
    assert len(rings["twins"]) == 2  # two parts flattened
    assert rings["donut"][0][1] == (10.0, 0.0)  # vertex order preserved


def test_parsed_rings_drive_pip_join(spark, gj_dir):
    """End-to-end S9→J2: parsed GeoJSON zones classify parsed GeoJSON
    points, holes excluded, even-odd across parts."""
    from re_data_pipeline_spark.operators.spatial import point_in_polygon_join

    _write(gj_dir, "zones.geojson", ZONES)
    zones = read_geojson(spark, os.path.join(gj_dir, "zones.geojson"),
                         "name string, amenity string").select(
        F.col("name").alias("zone"), "rings"
    )
    pts = spark.createDataFrame(
        [(1, 1.5, 1.5),   # donut ring
         (2, 5.0, 5.0),   # donut hole -> none
         (3, 25.0, 5.0),  # twins part 1
         (4, 45.0, 5.0),  # twins part 2
         (5, 35.0, 5.0)], # nowhere
        "pid long, x double, y double",
    )
    got = {
        r.pid: r.zone
        for r in point_in_polygon_join(pts, zones, ("x", "y"), "rings", how="left").collect()
    }
    assert got == {1: "donut", 2: None, 3: "twins", 4: "twins", 5: None}
