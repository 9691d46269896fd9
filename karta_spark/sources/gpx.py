"""GPX read/write (reference vector/read.py:214-233 + _gpx.py semantics):
waypoints -> points DataFrame, track segments -> lines DataFrame (one row
per trkseg, as the reference emits one Line per segment), routes -> lines
DataFrame (one row per <rte>, reference _gpx.py Route namedtuple).

stdlib ElementTree; GPX 1.1 namespace; waypoint/trackpoint child elements
(ele, time, name, ...) land in the properties map as strings.  GPX
``<extensions>`` blobs (reference _gpx.py:66-73 _readextensions) round-trip
through the same map under an ``ext:`` key prefix — the reference carries
them as a separate dict; a prefixed flat map is the Spark-native shape
(one map column, no schema fork) and is bijective with it.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

from karta_spark.sources.geojson import LINE_SCHEMA, POINT_SCHEMA

NS = "{http://www.topografix.com/GPX/1/1}"


def _props(el) -> dict:
    """Child elements -> properties map; <extensions> children land under
    ``ext:`` keys (reference _gpx.py _readproperties + _readextensions)."""
    out = {}
    for child in el:
        tag = child.tag.split("}")[-1]
        if tag in ("trkpt", "trkseg", "rtept"):
            continue
        if tag == "extensions":
            for ext in child:
                etag = ext.tag.split("}")[-1]
                if ext.text:
                    out["ext:" + etag] = ext.text.strip()
            continue
        if child.text:
            out[tag] = child.text.strip()
    return out


def read_gpx(spark: SparkSession, path_or_str: str):
    """Returns {'waypoints': points DF, 'tracks': lines DF (one per
    trkseg), 'routes': lines DF (one per rte)}."""
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

    routes = []
    for rte in root.iter(NS + "rte"):
        verts = [{"x": float(p.get("lon")), "y": float(p.get("lat"))}
                 for p in rte.iter(NS + "rtept")]
        if verts:
            routes.append((gid, verts, _props(rte)))
            gid += 1

    return {
        "waypoints": spark.createDataFrame(pts or [], POINT_SCHEMA),
        "tracks": spark.createDataFrame(lines or [], LINE_SCHEMA),
        "routes": spark.createDataFrame(routes or [], LINE_SCHEMA),
    }


def _write_props(parent, props: dict):
    """properties map -> child elements; ``ext:`` keys go inside one
    <extensions> block (reference _gpx.py _dict2gpx/_extensions2gpx)."""
    ext = {k[4:]: v for k, v in (props or {}).items()
           if k.startswith("ext:")}
    for k, v in sorted((props or {}).items()):
        if not k.startswith("ext:"):
            ET.SubElement(parent, NS + k).text = str(v)
    if ext:
        block = ET.SubElement(parent, NS + "extensions")
        for k, v in sorted(ext.items()):
            ET.SubElement(block, NS + k).text = str(v)


def to_gpx(waypoints: DataFrame | None = None,
           tracks: DataFrame | None = None,
           routes: DataFrame | None = None) -> str:
    """Serialize points/lines DataFrames to a GPX 1.1 document string."""
    ET.register_namespace("", "http://www.topografix.com/GPX/1/1")
    root = ET.Element(NS + "gpx", attrib={"version": "1.1", "creator": "karta_spark"})
    if waypoints is not None:
        for r in waypoints.collect():
            w = ET.SubElement(root, NS + "wpt",
                              attrib={"lon": repr(r["x"]), "lat": repr(r["y"])})
            _write_props(w, r["properties"])
    if routes is not None:
        for r in routes.collect():
            rte = ET.SubElement(root, NS + "rte")
            _write_props(rte, r["properties"])
            for v in r["vertices"]:
                ET.SubElement(rte, NS + "rtept",
                              attrib={"lon": repr(v["x"]), "lat": repr(v["y"])})
    if tracks is not None:
        for r in tracks.collect():
            trk = ET.SubElement(root, NS + "trk")
            _write_props(trk, r["properties"])
            seg = ET.SubElement(trk, NS + "trkseg")
            for v in r["vertices"]:
                ET.SubElement(seg, NS + "trkpt",
                              attrib={"lon": repr(v["x"]), "lat": repr(v["y"])})
    return ET.tostring(root, encoding="unicode")
