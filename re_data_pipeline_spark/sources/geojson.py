"""GeoJSON FeatureCollection reader (SURVEY §2.1 S9).

The reference loads GeoJSON with ``gpd.read_file`` (businesses/amenities,
``get_osm_data.py:13-25``) and builds shapely geometries from Socrata
``geometry_multipolygon`` JSON (``get_zoning_data.py:33-34``).  Spark has no
geo reader, so this parses FeatureCollections natively into the engine's
ring-struct geometry model (``functions/geo.py``):

- the file is read by Spark's JSON source (``multiLine``) with an explicit
  schema in which ``geometry.coordinates`` is typed **string** — the JSON
  parser then preserves the raw coordinates subtree as text, sidestepping
  the heterogeneous nesting depth across geometry types;
- per-row ``from_json`` re-parses that text at the depth its geometry type
  requires (Point / Polygon / MultiPolygon), all as Column expressions;
- polygonal output is ``rings array<array<struct<x,y>>>`` — outer rings,
  holes, and MultiPolygon parts flattened into one even-odd ring list,
  exactly what ``point_in_polygon_join`` consumes; points output x/y.

Feature properties are declared by the caller (explicit-schema rule, S8) —
no sampled inference.  The whole parse is expressions (codegen-resident);
one file = one input split, many files glob/partition like any JSON scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_GEOM = "struct<type:string, coordinates:string>"


def _feature_schema(properties_ddl: str) -> str:
    return (
        "type string, features array<struct<"
        f"type:string, properties:struct<{properties_ddl}>, geometry:{_GEOM}"
        ">>"
    )


def _rings_from(coords_json: Column, geom_type: Column) -> Column:
    poly = F.from_json(coords_json, "array<array<array<double>>>")
    mpoly = F.from_json(coords_json, "array<array<array<array<double>>>>")

    def ring(r: Column) -> Column:
        return F.transform(r, lambda c: F.struct(c[0].alias("x"), c[1].alias("y")))

    return (
        F.when(geom_type == "Polygon", F.transform(poly, ring))
        .when(geom_type == "MultiPolygon", F.transform(F.flatten(mpoly), ring))
        .otherwise(F.lit(None))
    )


def read_geojson(
    spark: SparkSession, path: str, properties_ddl: str
) -> DataFrame:
    """Parse GeoJSON FeatureCollection file(s) at ``path`` (globs fine).

    ``properties_ddl`` declares the feature property fields, e.g.
    ``"name string, amenity string"``.  Output columns:

    - one column per declared property;
    - ``geometry_type`` (``Point`` / ``Polygon`` / ``MultiPolygon`` / …);
    - ``x``/``y`` for points (NULL otherwise);
    - ``rings`` for polygonal geometries (NULL otherwise) — feed directly
      to ``point_in_polygon_join``.
    """
    raw = spark.read.schema(_feature_schema(properties_ddl)).option(
        "multiLine", True
    ).json(path)
    f = raw.select(F.explode("features").alias("f"))
    coords = F.col("f.geometry.coordinates")
    gtype = F.col("f.geometry.type")
    pt = F.from_json(coords, "array<double>")
    return f.select(
        F.col("f.properties.*"),
        gtype.alias("geometry_type"),
        F.when(gtype == "Point", pt[0]).alias("x"),
        F.when(gtype == "Point", pt[1]).alias("y"),
        _rings_from(coords, gtype).alias("rings"),
    )
