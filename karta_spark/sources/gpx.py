"""GPX read/write (reference vector/read.py:214-233 + _gpx.py semantics):
waypoints -> points DataFrame, track segments -> lines DataFrame (one row
per trkseg, as the reference emits one Line per segment).

stdlib ElementTree; GPX 1.1 namespace; waypoint/trackpoint child elements
(ele, time, name, ...) land in the properties map as strings.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

from karta_spark.sources.geojson import LINE_SCHEMA, POINT_SCHEMA

NS = "{http://www.topografix.com/GPX/1/1}"


def _props(el) -> dict:
    out = {}
    for child in el:
        tag = child.tag.split("}")[-1]
        if tag not in ("trkpt", "trkseg", "extensions") and child.text:
            out[tag] = child.text.strip()
    return out


def read_gpx(spark: SparkSession, path_or_str: str):
    """Returns {'waypoints': points DF, 'tracks': lines DF (one per trkseg)}."""
    if path_or_str.lstrip().startswith("<"):
        root = ET.fromstring(path_or_str)
    else:
        root = ET.parse(path_or_str).getroot()

    pts = []
    gid = 0
    for wpt in root.iter(NS + "wpt"):
        pts.append((gid, float(wpt.get("lon")), float(wpt.get("lat")), _props(wpt)))
        gid += 1

    lines = []
    for trk in root.iter(NS + "trk"):
        trk_props = _props(trk)
        for seg in trk.iter(NS + "trkseg"):
            verts = [{"x": float(p.get("lon")), "y": float(p.get("lat"))}
                     for p in seg.iter(NS + "trkpt")]
            if verts:
                lines.append((gid, verts, trk_props))
                gid += 1

    return {
        "waypoints": spark.createDataFrame(pts or [], POINT_SCHEMA),
        "tracks": spark.createDataFrame(lines or [], LINE_SCHEMA),
    }


def to_gpx(waypoints: DataFrame | None = None, tracks: DataFrame | None = None) -> str:
    """Serialize points/lines DataFrames to a GPX 1.1 document string."""
    ET.register_namespace("", "http://www.topografix.com/GPX/1/1")
    root = ET.Element(NS + "gpx", attrib={"version": "1.1", "creator": "karta_spark"})
    if waypoints is not None:
        for r in waypoints.collect():
            w = ET.SubElement(root, NS + "wpt",
                              attrib={"lon": repr(r["x"]), "lat": repr(r["y"])})
            for k, v in sorted((r["properties"] or {}).items()):
                ET.SubElement(w, NS + k).text = str(v)
    if tracks is not None:
        for r in tracks.collect():
            trk = ET.SubElement(root, NS + "trk")
            for k, v in sorted((r["properties"] or {}).items()):
                ET.SubElement(trk, NS + k).text = str(v)
            seg = ET.SubElement(trk, NS + "trkseg")
            for v in r["vertices"]:
                ET.SubElement(seg, NS + "trkpt",
                              attrib={"lon": repr(v["x"]), "lat": repr(v["y"])})
    return ET.tostring(root, encoding="unicode")
