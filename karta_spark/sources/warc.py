"""WARC (ISO 28500) reader/writer — the web-crawl container format.

Training-data pipelines start from WARC: Common Crawl publishes
raw crawls as `.warc.gz` (one gzip member per record, so readers can
split), extracted text as WET (`conversion` records) and metadata as
WAT.  This module implements the container from scratch (stdlib zlib):

- ``parse_warc(data)`` — iterate records from plain or gzipped bytes
  (multi-member gzip handled; BAD gzip members surface as errors, not
  silent truncation).  HTTP ``response`` records split status line /
  headers / body; ``conversion`` (WET) and other types pass payloads
  through.
- ``write_warc(records)`` — WARC/1.0 writer, per-record gzip members
  (the splittable layout), deterministic record IDs for fixtures.
- ``read_warc_distributed(spark, paths)`` — `binaryFile` scan +
  ``mapInPandas`` parse: one task per WARC file, the production shape
  (a Common Crawl snapshot is ~64k files, so file-level parallelism
  saturates any cluster; no driver bytes).

The reference has no web-archive layer (beyond-reference op; its
source surface is geospatial formats via GDAL, _gdal.py:114-188).
"""

from __future__ import annotations

import zlib

import numpy as np  # noqa: F401  (kept for parity with sibling sources)
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = ("path string, record_idx long, warc_type string, "
               "target_uri string, warc_date string, content_type string, "
               "http_status int, http_content_type string, payload binary")


# ---------------------------------------------------------------------------
# bytes-level parse
# ---------------------------------------------------------------------------

def _gunzip_members(data: bytes) -> bytes:
    """Decompress ALL members of a multi-member gzip stream.  Corrupt
    members raise ValueError (uniform error type — crawl archives are
    routinely truncated/corrupt and callers key on ValueError).
    ``.warc.zst`` archives (zstd frames, possibly concatenated) are
    sniffed on the frame magic and decompressed via pyarrow's bundled
    zstd streaming reader; skippable dictionary frames (0x184D2A5x,
    the warc-zstd convention) are not supported and raise."""
    if data[:4] == b"\x28\xb5\x2f\xfd":  # zstd frame magic
        import pyarrow as pa
        try:
            return pa.input_stream(pa.BufferReader(data),
                                   compression="zstd").read()
        except OSError as exc:
            raise ValueError(f"corrupt zstd WARC stream: {exc}") from exc
    if data[:4] in (b"\x50\x2a\x4d\x18", b"\x51\x2a\x4d\x18",
                    b"\x52\x2a\x4d\x18", b"\x53\x2a\x4d\x18"):
        raise ValueError("warc-zstd dictionary (skippable frame) "
                         "archives not supported")
    out = bytearray()
    rest = data
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=47)
        try:
            out += d.decompress(rest)
            out += d.flush()
        except zlib.error as exc:
            raise ValueError(f"corrupt gzip member: {exc}") from exc
        if not d.eof:
            raise ValueError("truncated gzip member in WARC stream")
        rest = d.unused_data
    if rest.strip(b"\x00"):
        if not out:
            return data  # not gzip at all: plain WARC
        raise ValueError("trailing garbage after gzip members")
    return bytes(out)


def _dechunk(body: bytes) -> bytes:
    """HTTP/1.1 chunked transfer coding -> raw body.  Raises ValueError
    on malformed chunk framing."""
    out = bytearray()
    pos = 0
    n = len(body)
    while pos < n:
        eol = body.index(b"\r\n", pos)
        size_tok = body[pos:eol].split(b";")[0].strip()  # drop extensions
        size = int(size_tok, 16)
        pos = eol + 2
        if size == 0:
            break  # trailers (if any) are not payload
        out += body[pos:pos + size]
        pos += size
        if body[pos:pos + 2] != b"\r\n":
            raise ValueError("chunked body missing chunk CRLF")
        pos += 2
    return bytes(out)


def decode_http_body(body: bytes, content_encoding: str | None,
                     transfer_encoding: str | None = None) -> bytes:
    """Undo Transfer-Encoding (chunked) then Content-Encoding (gzip /
    deflate — both zlib-wrapped and raw — / br via pyarrow's bundled
    brotli / identity).  Raises ValueError on anything it can't undo;
    callers in the crawl path catch and keep the raw bytes (one
    mis-encoded response must not kill an archive task)."""
    if transfer_encoding and "chunked" in transfer_encoding.lower():
        try:
            body = _dechunk(body)
        except (ValueError, IndexError) as exc:
            raise ValueError(f"bad chunked body: {exc}") from exc
    if not content_encoding:
        return body
    # comma lists apply encodings in order; decode in reverse
    for enc in [e.strip().lower()
                for e in content_encoding.split(",")][::-1]:
        try:
            if enc in ("gzip", "x-gzip"):
                body = zlib.decompress(body, 47)  # auto gzip/zlib header
            elif enc == "deflate":
                try:
                    body = zlib.decompress(body)  # RFC-correct zlib wrap
                except zlib.error:
                    body = zlib.decompress(body, -15)  # wild raw deflate
            elif enc == "br":
                import pyarrow as pa  # streaming: size is unknown
                body = pa.input_stream(pa.BufferReader(body),
                                       compression="brotli").read()
            elif enc in ("identity", ""):
                pass
            else:
                raise ValueError(f"unsupported Content-Encoding {enc!r}")
        except (zlib.error, OSError) as exc:
            raise ValueError(f"bad {enc} body: {exc}") from exc
    return body


def _parse_http(payload: bytes):
    """Split an HTTP/1.x response payload -> (status, content_type, body);
    returns (None, None, payload) when it isn't HTTP.  The body is
    de-chunked and content-decoded (gzip/deflate/br) when the headers
    say so; if that decoding fails the raw body is kept — the
    crawl-scale contract (cf. multimodal.decode_any)."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        return None, None, payload
    lines = head.split(b"\r\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        return None, None, payload
    ctype = cenc = tenc = None
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        key = k.strip().lower()
        if key == b"content-type":
            ctype = v.strip().decode("latin-1")
        elif key == b"content-encoding":
            cenc = v.strip().decode("latin-1")
        elif key == b"transfer-encoding":
            tenc = v.strip().decode("latin-1")
    if cenc or tenc:
        try:
            body = decode_http_body(body, cenc, tenc)
        except ValueError:
            pass  # keep raw bytes; downstream sniffers handle or skip
    return status, ctype, body


def parse_warc(data: bytes) -> list[dict]:
    """Parse a WARC file (gzipped or plain) into record dicts with keys
    ``warc_type target_uri warc_date content_type http_status
    http_content_type payload headers``."""
    raw = _gunzip_members(data)
    records = []
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and raw[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not raw.startswith(b"WARC/", pos):
            raise ValueError(f"expected WARC/ header at offset {pos}")
        hdr_end = raw.index(b"\r\n\r\n", pos)
        head = raw[pos:hdr_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        fields = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError(f"bad WARC Content-Length: {exc}") from exc
        body_start = hdr_end + 4
        payload = raw[body_start:body_start + length]
        pos = body_start + length
        status, http_ct, body = _parse_http(payload) \
            if fields.get("warc-type") == "response" else (None, None,
                                                           payload)
        records.append(dict(
            warc_type=fields.get("warc-type", ""),
            target_uri=fields.get("warc-target-uri", ""),
            warc_date=fields.get("warc-date", ""),
            content_type=fields.get("content-type", ""),
            http_status=status,
            http_content_type=http_ct,
            payload=body,
            headers=fields,
        ))
    return records


def warc_cdx(data: bytes) -> list[dict]:
    """CDX index rows for one WARC file — the Common Crawl index
    convention that enables O(1) range-request access into petabyte
    archives without re-reading them.  Per record: ``target_uri``,
    ``warc_type``, ``http_status``, ``offset``, ``length`` (for
    ``.warc.gz`` these address the gzip MEMBER, the published
    splittable layout; for plain WARC the record bytes), and
    ``digest`` (base32 sha1 of the decoded payload).  Raises
    ValueError on corrupt input (uniform contract)."""
    import base64
    import hashlib

    def row(rec, off, length):
        return dict(target_uri=rec["target_uri"],
                    warc_type=rec["warc_type"],
                    http_status=rec["http_status"], offset=off,
                    length=length,
                    digest=base64.b32encode(
                        hashlib.sha1(bytes(rec["payload"])).digest()
                    ).decode("ascii"))

    data = bytes(data)
    out: list[dict] = []
    if data[:2] == b"\x1f\x8b":
        pos = 0
        n = len(data)
        while pos < n and data[pos:pos + 2] == b"\x1f\x8b":
            d = zlib.decompressobj(wbits=47)
            try:
                plain = d.decompress(data[pos:]) + d.flush()
            except zlib.error as exc:
                raise ValueError(f"corrupt gzip member: {exc}") from exc
            if not d.eof:
                raise ValueError("truncated gzip member in WARC stream")
            clen = (n - pos) - len(d.unused_data)
            for rec in parse_warc(plain):
                out.append(row(rec, pos, clen))
            pos += clen
        if data[pos:].strip(b"\x00"):
            raise ValueError("trailing garbage after gzip members")
        return out
    pos = 0
    n = len(data)
    while pos < n:
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"expected WARC/ header at offset {pos}")
        hdr_end = data.index(b"\r\n\r\n", pos)
        head = data[pos:hdr_end].decode("utf-8", "replace")
        length = None
        for ln in head.split("\r\n")[1:]:
            k, _, v = ln.partition(":")
            if k.strip().lower() == "content-length":
                length = int(v.strip())
        if length is None:
            raise ValueError("WARC record missing Content-Length")
        end = hdr_end + 4 + length + 4  # record + the two CRLFs
        for rec in parse_warc(data[pos:end]):
            out.append(row(rec, pos, end - pos))
        pos = end
    return out


CDX_SCHEMA = ("path string, target_uri string, warc_type string, "
              "http_status int, offset long, length long, digest string")


def warc_cdx_distributed(spark: SparkSession, path: str,
                         on_error: str = "fail") -> DataFrame:
    """One task per archive file -> CDX rows (binaryFile scan, zero
    driver bytes) — building the crawl index IS a corpus-scale job."""
    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def run(batches):
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                try:
                    cdx = warc_cdx(bytes(content))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                for r in cdx:
                    rows.append((p, r["target_uri"], r["warc_type"],
                                 r["http_status"], r["offset"],
                                 r["length"], r["digest"]))
            yield pd.DataFrame(rows, columns=[
                "path", "target_uri", "warc_type", "http_status",
                "offset", "length", "digest"])

    return files.mapInPandas(run, CDX_SCHEMA)


# ---------------------------------------------------------------------------
# writer (fixtures + interchange)
# ---------------------------------------------------------------------------

def write_warc(records: list[dict], gzip_members: bool = True,
               compression: str | None = None) -> bytes:
    """Serialize records to WARC/1.0 bytes.  Each record dict:
    ``warc_type`` (default ``conversion``), ``target_uri``,
    ``warc_date`` (ISO-8601), ``content_type``, ``payload`` (bytes),
    optional ``record_id``.  ``gzip_members=True`` (the default)
    emits one gzip member per record — the splittable `.warc.gz`
    layout crawlers publish; ``compression='zstd'`` emits one zstd
    frame per record (`.warc.zst`, no dictionary frame)."""
    zstd_codec = None
    if compression == "zstd":
        import pyarrow as pa
        zstd_codec = pa.Codec("zstd")
        gzip_members = False
    elif compression not in (None, "gzip"):
        raise ValueError(f"unknown WARC compression {compression!r}")
    out = bytearray()
    for i, r in enumerate(records):
        payload = bytes(r["payload"])
        rid = r.get("record_id", f"<urn:uuid:{i:032d}>")
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {r.get('warc_type', 'conversion')}\r\n"
            f"WARC-Record-ID: {rid}\r\n"
            f"WARC-Date: {r.get('warc_date', '2024-01-01T00:00:00Z')}\r\n"
            f"WARC-Target-URI: {r.get('target_uri', '')}\r\n"
            f"Content-Type: {r.get('content_type', 'text/plain')}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode("utf-8")
        rec = head + payload + b"\r\n\r\n"
        if zstd_codec is not None:
            out += bytes(zstd_codec.compress(rec))  # one frame/record
        elif gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            out += co.compress(rec) + co.flush()
        else:
            out += rec
    return bytes(out)


def http_response_payload(body: bytes, content_type: str = "text/html",
                          status: int = 200,
                          content_encoding: str | None = None,
                          chunked: bool = False) -> bytes:
    """Wrap a body as an HTTP/1.1 response (the payload shape of WARC
    ``response`` records).  ``content_encoding`` gzip/deflate/br
    compresses the body; ``chunked`` emits chunked transfer coding —
    fixture shapes for what real crawls store."""
    body = bytes(body)
    extra = ""
    if content_encoding:
        if content_encoding in ("gzip", "x-gzip"):
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            body = co.compress(body) + co.flush()
        elif content_encoding == "deflate":
            body = zlib.compress(body, 6)
        elif content_encoding == "br":
            import pyarrow as pa
            body = bytes(pa.Codec("brotli").compress(body))
        else:
            raise ValueError(f"unknown content_encoding {content_encoding!r}")
        extra += f"Content-Encoding: {content_encoding}\r\n"
    if chunked:
        out = bytearray()
        for k in range(0, len(body), 41):  # odd size: multi-chunk bodies
            part = body[k:k + 41]
            out += f"{len(part):x}\r\n".encode() + part + b"\r\n"
        out += b"0\r\n\r\n"
        body = bytes(out)
        extra += "Transfer-Encoding: chunked\r\n"
        head = (f"HTTP/1.1 {status} OK\r\n"
                f"Content-Type: {content_type}\r\n"
                f"{extra}\r\n").encode("latin-1")
    else:
        head = (f"HTTP/1.1 {status} OK\r\n"
                f"Content-Type: {content_type}\r\n{extra}"
                f"Content-Length: {len(body)}\r\n\r\n").encode("latin-1")
    return head + body


# ---------------------------------------------------------------------------
# distributed scan
# ---------------------------------------------------------------------------

def read_warc_distributed(spark: SparkSession, path: str,
                          on_error: str = "fail") -> DataFrame:
    """One task per WARC file: `binaryFile` scan (no driver bytes) +
    mapInPandas parse.  Production shape: a crawl snapshot is tens of
    thousands of `.warc.gz` files, so file-level parallelism saturates
    the cluster; per-record gzip members keep memory bounded per task.
    Returns ``WARC_SCHEMA`` rows (binary payload + typed metadata —
    the multimodal-column convention)."""
    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def run(batches):
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                try:
                    recs = parse_warc(bytes(content))
                except (ValueError, NotImplementedError):
                    if on_error == "skip":  # drop the bad archive file
                        continue
                    raise
                for i, r in enumerate(recs):
                    rows.append((p, i, r["warc_type"], r["target_uri"],
                                 r["warc_date"], r["content_type"],
                                 r["http_status"], r["http_content_type"],
                                 bytearray(r["payload"])))
            yield pd.DataFrame(rows, columns=[
                "path", "record_idx", "warc_type", "target_uri",
                "warc_date", "content_type", "http_status",
                "http_content_type", "payload"])

    return files.mapInPandas(run, WARC_SCHEMA)
