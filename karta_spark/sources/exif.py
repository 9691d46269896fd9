"""EXIF metadata (JPEG APP1) — the image -> geospatial bridge.

Web-crawled photos carry camera GPS in an EXIF APP1 segment: a TIFF
IFD (the same structure sources/geotiff.py parses at file scope)
embedded behind an ``Exif\\x00\\x00`` header.  Extracting
GPSLatitude/GPSLongitude turns an image corpus into a point table the
geospatial operators (tile assign, PIP, kNN) consume directly — the
core join between this engine's two corpora.  The reference reads EXIF
through GDAL/PIL metadata (beyond-reference at this layer; karta's
raster georeferencing is _gdal.py:114-188).

Implemented from the public EXIF 2.3 / TIFF 6.0 layout: IFD0
(Orientation tag 274, GPS-IFD pointer 34853) and the GPS IFD
(LatitudeRef 1, Latitude 2, LongitudeRef 3, Longitude 4, AltitudeRef
5, Altitude 6; coordinates are deg/min/sec RATIONAL triplets).  Both
byte orders.  Writer emits micro-degree-exact rationals
((microdeg, 1e6) in the degrees slot) so extracted doubles are
bit-reproducible across engines.
"""

from __future__ import annotations

import struct


def exif_app1(lon_micro: int, lat_micro: int, *, orientation: int = 1,
              alt_mm: int | None = None) -> bytes:
    """Build an APP1 EXIF segment with GPS (micro-degree ints) and
    orientation.  Little-endian TIFF body."""
    # GPS IFD: 5-6 entries
    gps_entries = []
    ext = bytearray()  # external values, offsets fixed up later

    def rat3(micro: int):
        return struct.pack("<6I", abs(micro), 1000000, 0, 1, 0, 1)

    def add(tag, typ, cnt, payload: bytes, inline: bytes | None = None):
        gps_entries.append([tag, typ, cnt, payload, inline])

    add(1, 2, 2, b"", (b"N\x00\x00\x00" if lat_micro >= 0
                       else b"S\x00\x00\x00"))
    add(2, 5, 3, rat3(lat_micro))
    add(3, 2, 2, b"", (b"E\x00\x00\x00" if lon_micro >= 0
                       else b"W\x00\x00\x00"))
    add(4, 5, 3, rat3(lon_micro))
    if alt_mm is not None:
        add(5, 1, 1, b"", (b"\x01\x00\x00\x00" if alt_mm < 0
                           else b"\x00\x00\x00\x00"))
        add(6, 5, 1, struct.pack("<2I", abs(alt_mm), 1000))

    # layout: TIFF header(8) + IFD0 + GPS IFD + external values
    n0 = 2
    ifd0_size = 2 + n0 * 12 + 4
    gps_off = 8 + ifd0_size
    gps_size = 2 + len(gps_entries) * 12 + 4
    ext_off = gps_off + gps_size
    body = bytearray()
    body += b"II*\x00" + struct.pack("<I", 8)
    body += struct.pack("<H", n0)
    body += struct.pack("<HHI", 274, 3, 1) + struct.pack("<HH",
                                                         orientation, 0)
    body += struct.pack("<HHI", 34853, 4, 1) + struct.pack("<I", gps_off)
    body += struct.pack("<I", 0)
    body += struct.pack("<H", len(gps_entries))
    pos = ext_off
    ext = bytearray()
    for tag, typ, cnt, payload, inline in gps_entries:
        body += struct.pack("<HHI", tag, typ, cnt)
        if inline is not None:
            body += inline
        else:
            body += struct.pack("<I", pos)
            ext += payload
            pos += len(payload)
    body += struct.pack("<I", 0)
    body += ext
    seg = b"Exif\x00\x00" + bytes(body)
    return b"\xff\xe1" + struct.pack(">H", len(seg) + 2) + seg


def insert_exif(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment right after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    return jpeg[:2] + app1 + jpeg[2:]


def _ifd_entries(body: bytes, off: int, e: str):
    (n,) = struct.unpack_from(e + "H", body, off)
    out = {}
    for k in range(n):
        tag, typ, cnt = struct.unpack_from(e + "HHI", body,
                                           off + 2 + 12 * k)
        val = body[off + 2 + 12 * k + 8: off + 2 + 12 * k + 12]
        out[tag] = (typ, cnt, val)
    return out


def _rationals(body: bytes, e: str, cnt: int, val4: bytes):
    (off,) = struct.unpack(e + "I", val4)
    return [struct.unpack_from(e + "II", body, off + 8 * i)
            for i in range(cnt)]


def parse_exif(jpeg: bytes) -> dict:
    """Extract ``orientation, lon, lat, alt_m`` from a JPEG's EXIF.
    Coordinates are D + M/60 + S/3600 as IEEE doubles (micro-degree
    rationals reproduce exactly).  Missing fields come back None."""
    out = dict(orientation=None, lon=None, lat=None, alt_m=None)
    pos = 2
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            break
        marker = jpeg[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", jpeg[pos + 2:pos + 4])
        if marker == 0xE1 and jpeg[pos + 4:pos + 10] == b"Exif\x00\x00":
            body = jpeg[pos + 10:pos + 2 + seglen]
            e = "<" if body[:2] == b"II" else ">"
            (ifd0_off,) = struct.unpack(e + "I", body[4:8])
            ifd0 = _ifd_entries(body, ifd0_off, e)
            if 274 in ifd0:
                out["orientation"] = struct.unpack(
                    e + "H", ifd0[274][2][:2])[0]
            if 34853 in ifd0:
                (gps_off,) = struct.unpack(e + "I", ifd0[34853][2])
                gps = _ifd_entries(body, gps_off, e)

                def coord(ref_tag, val_tag):
                    if ref_tag not in gps or val_tag not in gps:
                        return None
                    ref = gps[ref_tag][2][:1]
                    d, m, s = _rationals(body, e, 3, gps[val_tag][2])
                    v = (d[0] / d[1] + m[0] / m[1] / 60.0
                         + s[0] / s[1] / 3600.0)
                    return -v if ref in (b"S", b"W") else v

                out["lat"] = coord(1, 2)
                out["lon"] = coord(3, 4)
                if 6 in gps:
                    (num, den), = _rationals(body, e, 1, gps[6][2])
                    alt = num / den
                    if 5 in gps and gps[5][2][:1] == b"\x01":
                        alt = -alt
                    out["alt_m"] = alt
            return out
        if marker == 0xDA:  # SOS: no EXIF before scan -> none present
            break
        pos += 2 + seglen
    return out


def normalize_orientation(pix, orientation: int | None):
    """Transform decoded pixels upright per the EXIF orientation tag
    (PIL ``exif_transpose`` semantics): 1 identity, 2 mirror-H,
    3 rotate-180, 4 mirror-V, 5 transpose, 6 rotate-90-CW,
    7 transverse, 8 rotate-90-CCW.  Works on (h, w) or (h, w, c)."""
    import numpy as np
    a = np.asarray(pix)
    o = orientation or 1
    if o == 1:
        return a
    if o == 2:
        return a[:, ::-1]
    if o == 3:
        return a[::-1, ::-1]
    if o == 4:
        return a[::-1, :]
    if o == 5:
        return np.swapaxes(a, 0, 1)
    if o == 6:
        return np.rot90(a, k=-1)
    if o == 7:
        return np.swapaxes(a[::-1, ::-1], 0, 1)
    if o == 8:
        return np.rot90(a, k=1)
    raise ValueError(f"EXIF orientation {orientation} invalid")
