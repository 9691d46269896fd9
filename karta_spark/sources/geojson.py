"""GeoJSON ingest (reference vector/read.py:52-134 semantics).

Parses GeoJSON (stdlib json — no external parser) into geometry-array
DataFrames:

- points:   (geom_id, x, y, properties map)
- lines:    (geom_id, vertices array<struct<x,y>>, properties)
- polygons: (geom_id, outer array<struct<x,y>>, holes array<array<struct>>,
             properties)

Multi* features explode to one row per member (the Spark data model — a
Multipart *is* a DataFrame of members, SURVEY §1.5).  The reference's
properties/data split-by-length (read.py:103-149) collapses here: per-member
rows carry the feature properties directly.

Scale note: driver-side parse is for broadcast-scale reference layers
(the join side we broadcast anyway); bulk GeoJSON at TB scale would come
through spark.read.json with a schema.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

POINT_SCHEMA = ("geom_id long, x double, y double, "
                "properties map<string,string>")
LINE_SCHEMA = ("geom_id long, vertices array<struct<x:double,y:double>>, "
               "properties map<string,string>")
POLY_SCHEMA = ("geom_id long, outer array<struct<x:double,y:double>>, "
               "holes array<array<struct<x:double,y:double>>>, "
               "properties map<string,string>")


def _props(feature) -> dict:
    return {str(k): str(v) for k, v in (feature.get("properties") or {}).items()}


def _xy(coords):
    return [{"x": float(c[0]), "y": float(c[1])} for c in coords]


def _ring(coords):
    """GeoJSON rings are explicitly closed; karta's are not
    (geometry.py:1022-1027) — drop the closing vertex if present."""
    if len(coords) > 1 and coords[0] == coords[-1]:
        coords = coords[:-1]
    return _xy(coords)


def read_geojson(spark: SparkSession, path_or_str: str):
    """Returns dict with 'points', 'lines', 'polygons' DataFrames."""
    if path_or_str.lstrip().startswith("{"):
        doc = json.loads(path_or_str)
    else:
        with open(path_or_str) as f:
            doc = json.load(f)

    feats = doc["features"] if doc.get("type") == "FeatureCollection" else [doc]
    pts, lines, polys = [], [], []
    gid = 0
    for feat in feats:
        geom = feat.get("geometry", feat)
        props = _props(feat)
        t = geom["type"]
        cc = geom["coordinates"]
        if t == "Point":
            pts.append((gid, float(cc[0]), float(cc[1]), props)); gid += 1
        elif t == "MultiPoint":
            for c in cc:
                pts.append((gid, float(c[0]), float(c[1]), props)); gid += 1
        elif t == "LineString":
            lines.append((gid, _xy(cc), props)); gid += 1
        elif t == "MultiLineString":
            for line in cc:
                lines.append((gid, _xy(line), props)); gid += 1
        elif t == "Polygon":
            polys.append((gid, _ring(cc[0]), [_ring(h) for h in cc[1:]], props)); gid += 1
        elif t == "MultiPolygon":
            for p in cc:
                polys.append((gid, _ring(p[0]), [_ring(h) for h in p[1:]], props)); gid += 1
        else:
            raise ValueError(f"unsupported GeoJSON type {t!r}")

    return {
        "points": spark.createDataFrame(pts or [], POINT_SCHEMA),
        "lines": spark.createDataFrame(lines or [], LINE_SCHEMA),
        "polygons": spark.createDataFrame(polys or [], POLY_SCHEMA),
    }


def to_geojson(points: DataFrame | None = None, lines: DataFrame | None = None,
               polygons: DataFrame | None = None) -> str:
    """Serialize geometry DataFrames back to a FeatureCollection string
    (reference _geojson.py:72-133 shape). Driver-side; for layer-scale
    output only."""
    feats = []
    if points is not None:
        for r in points.collect():
            feats.append({"type": "Feature",
                          "geometry": {"type": "Point", "coordinates": [r["x"], r["y"]]},
                          "properties": dict(r["properties"] or {})})
    if lines is not None:
        for r in lines.collect():
            feats.append({"type": "Feature",
                          "geometry": {"type": "LineString",
                                       "coordinates": [[v["x"], v["y"]] for v in r["vertices"]]},
                          "properties": dict(r["properties"] or {})})
    if polygons is not None:
        for r in polygons.collect():
            rings = [[[v["x"], v["y"]] for v in r["outer"]]]
            rings[0].append(rings[0][0])
            for h in r["holes"] or []:
                hh = [[v["x"], v["y"]] for v in h]
                hh.append(hh[0])
                rings.append(hh)
            feats.append({"type": "Feature",
                          "geometry": {"type": "Polygon", "coordinates": rings},
                          "properties": dict(r["properties"] or {})})
    return json.dumps({"type": "FeatureCollection", "features": feats})


def from_shapes(spark: SparkSession, objs, properties: list[dict] | None = None):
    """Ingest objects exposing the python ``__geo_interface__`` protocol
    (reference ``from_shape``, read.py:18-48) — shapely geometries, other
    karta objects, or plain geo-interface dicts.  Returns the same
    points/lines/polygons DataFrame dict as read_geojson."""
    feats = []
    for k, o in enumerate(objs):
        gi = getattr(o, "__geo_interface__", o)
        if not isinstance(gi, dict) or "type" not in gi:
            raise TypeError(f"object {k} does not expose __geo_interface__")
        if gi.get("type") == "Feature":
            feats.append(gi)
        else:
            props = (properties[k] if properties else {}) or {}
            feats.append({"type": "Feature", "geometry": gi, "properties": props})
    return read_geojson(spark, json.dumps(
        {"type": "FeatureCollection", "features": feats}))


def polygon_specs(polygons: DataFrame, crs: str = "lonlat"):
    """Collect a (broadcast-scale) polygons DataFrame into PolygonSpec
    objects for point_in_polygon_join — the bridge from ingested layers to
    the broadcast join side."""
    from karta_spark.operators.pip_join import PolygonSpec
    import numpy as _np
    out = []
    for r in polygons.collect():
        outer = _np.array([[v["x"], v["y"]] for v in r["outer"]])
        holes = tuple(_np.array([[v["x"], v["y"]] for v in h])
                      for h in (r["holes"] or []))
        out.append(PolygonSpec(str(r["geom_id"]), outer, holes, crs=crs))
    return out
