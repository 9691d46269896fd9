"""Minimal ESRI Shapefile read/write (pure python, public format spec).

Covers the geometry types the reference round-trips through OGR
(vector/read.py:167-190, _shp.py:106-361): Point (1), PolyLine (3),
Polygon (5), + their Z/M-less multipart forms, with DBF attributes
(C/N/F fields).  Intended for broadcast-scale reference layers; bulk
vector data should live in parquet.

Outputs match the GeoJSON reader's DataFrames: points / lines / polygons
with per-member rows (multiparts explode) and karta's open-ring convention
(closing vertex dropped, reference geometry.py:1022-1027). Ring roles
follow the shapefile spec: clockwise = outer, counterclockwise = hole.
"""

from __future__ import annotations

import os
import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from karta_spark.sources.geojson import LINE_SCHEMA, POINT_SCHEMA, POLY_SCHEMA


def _ring_is_cw(ring: np.ndarray) -> bool:
    x, y = ring[:, 0], ring[:, 1]
    return float(np.sum((np.roll(x, -1) - x) * (np.roll(y, -1) + y))) > 0


def _read_dbf(path: str):
    """DBF III attribute table -> list of dicts (C/N/F/L/D types as str)."""
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        header = f.read(32)
        n_records = struct.unpack("<I", header[4:8])[0]
        header_size, record_size = struct.unpack("<HH", header[8:12])
        fields = []
        while True:
            fd = f.read(32)
            if fd[0:1] == b"\r" or len(fd) < 32:
                break
            name = fd[:11].split(b"\x00")[0].decode("ascii", "ignore")
            ftype = fd[11:12].decode("ascii")
            flen = fd[16]
            fields.append((name, ftype, flen))
        f.seek(header_size)
        records = []
        for _ in range(n_records):
            raw = f.read(record_size)
            if not raw or raw[0:1] == b"*":  # deleted
                continue
            pos = 1
            rec = {}
            for name, ftype, flen in fields:
                val = raw[pos:pos + flen].decode("ascii", "ignore").strip()
                rec[name] = val
                pos += flen
            records.append(rec)
    return records


def read_shapefile(spark: SparkSession, stem: str):
    """Read <stem>.shp (+ optional .dbf) -> dict of DataFrames
    (points/lines/polygons), mirroring read_geojson's output."""
    if stem.endswith(".shp"):
        stem = stem[:-4]
    with open(stem + ".shp", "rb") as f:
        data = f.read()
    (file_len,) = struct.unpack(">I", data[24:28])
    attrs = _read_dbf(stem + ".dbf") or []

    pts, lines, polys = [], [], []
    gid = 0
    pos = 100
    rec_no = 0
    while pos < file_len * 2:
        _, content_len = struct.unpack(">II", data[pos:pos + 8])
        body = data[pos + 8: pos + 8 + content_len * 2]
        pos += 8 + content_len * 2
        props = {k: str(v) for k, v in (attrs[rec_no].items() if rec_no < len(attrs) else [])}
        rec_no += 1
        (shp_type,) = struct.unpack("<i", body[:4])
        if shp_type == 0:
            continue
        if shp_type == 1:  # Point
            x, y = struct.unpack("<dd", body[4:20])
            pts.append((gid, x, y, props)); gid += 1
        elif shp_type in (3, 5):  # PolyLine / Polygon
            n_parts, n_points = struct.unpack("<ii", body[36:44])
            parts = struct.unpack(f"<{n_parts}i", body[44:44 + 4 * n_parts])
            coords = np.frombuffer(
                body[44 + 4 * n_parts:44 + 4 * n_parts + 16 * n_points],
                dtype="<f8").reshape(n_points, 2)
            bounds = list(parts) + [n_points]
            rings = [coords[bounds[i]:bounds[i + 1]] for i in range(n_parts)]
            if shp_type == 3:
                for r in rings:
                    lines.append((gid, [{"x": float(a), "y": float(b)} for a, b in r],
                                  props)); gid += 1
            else:
                # group rings into polygons: cw ring opens a polygon, ccw
                # rings are holes of the last opened polygon (shapefile spec)
                current = None
                for r in rings:
                    if len(r) > 1 and (r[0] == r[-1]).all():
                        r = r[:-1]  # karta open-ring convention
                    verts = [{"x": float(a), "y": float(b)} for a, b in r]
                    if current is None or _ring_is_cw(np.array([[v["x"], v["y"]] for v in verts])):
                        if current is not None:
                            polys.append(current)
                        current = (gid, verts, [], props); gid += 1
                    else:
                        current[2].append(verts)
                if current is not None:
                    polys.append(current)
        else:
            raise NotImplementedError(f"shapefile type {shp_type} not supported")

    return {
        "points": spark.createDataFrame(pts or [], POINT_SCHEMA),
        "lines": spark.createDataFrame(lines or [], LINE_SCHEMA),
        "polygons": spark.createDataFrame(polys or [], POLY_SCHEMA),
    }


def _shp_record(shp_type: int, body: bytes, rec_no: int) -> bytes:
    return struct.pack(">II", rec_no, len(body) // 2) + body


def write_shapefile(stem: str, points: DataFrame | None = None,
                    lines: DataFrame | None = None,
                    polygons: DataFrame | None = None):
    """Write one geometry layer to <stem>.shp/.shx/.dbf (one type per file,
    as the format requires). Properties become C(64) DBF fields."""
    if sum(x is not None for x in (points, lines, polygons)) != 1:
        raise ValueError("write exactly one layer per shapefile")

    records = []
    all_props = []
    if points is not None:
        shp_type = 1
        for r in points.collect():
            body = struct.pack("<idd", 1, r["x"], r["y"])
            records.append(body)
            all_props.append(dict(r["properties"] or {}))
        xs = [struct.unpack("<idd", b)[1] for b in records]
        ys = [struct.unpack("<idd", b)[2] for b in records]
    else:
        df, shp_type, closed = (lines, 3, False) if lines is not None else (polygons, 5, True)
        xs, ys = [], []
        for r in df.collect():
            if shp_type == 3:
                rings = [[(v["x"], v["y"]) for v in r["vertices"]]]
            else:
                outer = [(v["x"], v["y"]) for v in r["outer"]]
                outer_arr = np.array(outer)
                if not _ring_is_cw(outer_arr):
                    outer = outer[::-1]
                rings = [outer + [outer[0]]]
                for h in r["holes"] or []:
                    hole = [(v["x"], v["y"]) for v in h]
                    if _ring_is_cw(np.array(hole)):
                        hole = hole[::-1]
                    rings.append(hole + [hole[0]])
            flat = [p for ring in rings for p in ring]
            rx = [p[0] for p in flat]; ry = [p[1] for p in flat]
            xs += rx; ys += ry
            parts = []
            acc = 0
            for ring in rings:
                parts.append(acc); acc += len(ring)
            body = struct.pack("<i4d", shp_type, min(rx), min(ry), max(rx), max(ry))
            body += struct.pack("<ii", len(rings), len(flat))
            body += struct.pack(f"<{len(parts)}i", *parts)
            body += b"".join(struct.pack("<dd", x, y) for x, y in flat)
            records.append(body)
            all_props.append(dict(r["properties"] or {}))
        _ = closed

    # .shp + .shx
    contents = b"".join(_shp_record(shp_type, b, i + 1) for i, b in enumerate(records))
    bbox = (min(xs or [0.0]), min(ys or [0.0]), max(xs or [0.0]), max(ys or [0.0]))
    header = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)

    def file_header(length_words):
        return (header + struct.pack(">i", length_words)
                + struct.pack("<ii4d4d", 1000, shp_type, *bbox, 0, 0, 0, 0))

    with open(stem + ".shp", "wb") as f:
        f.write(file_header((100 + len(contents)) // 2))
        f.write(contents)
    with open(stem + ".shx", "wb") as f:
        idx = b""
        off = 100
        for i, b in enumerate(records):
            idx += struct.pack(">II", off // 2, len(b) // 2)
            off += 8 + len(b)
        f.write(file_header((100 + len(idx)) // 2))
        f.write(idx)

    # .dbf
    keys = sorted({k for p in all_props for k in p}) or ["id"]
    flen = 64
    with open(stem + ".dbf", "wb") as f:
        n = len(records)
        hsize = 32 + 32 * len(keys) + 1
        rsize = 1 + flen * len(keys)
        f.write(struct.pack("<4BIHH20x", 3, 95, 7, 26, n, hsize, rsize))
        for k in keys:
            name = k.encode("ascii", "ignore")[:11].ljust(11, b"\x00")
            f.write(name + b"C" + b"\x00" * 4 + bytes([flen]) + b"\x00" * 15)
        f.write(b"\r")
        for p in all_props:
            f.write(b" ")
            for k in keys:
                f.write(str(p.get(k, "")).encode("ascii", "ignore")[:flen].ljust(flen))
