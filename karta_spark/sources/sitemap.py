"""Sitemap parsing (sitemaps.org protocol) — the crawl-frontier seed
source that pairs with robots.txt (sources/robots.py).

Covers what real sitemaps serve:

- XML ``<urlset>`` entries: loc, lastmod, changefreq, priority
- XML ``<sitemapindex>`` (nested sitemap references)
- plain-text sitemaps (one URL per line — valid per the protocol)
- gzip-compressed variants of all three (``sitemap.xml.gz``)
- namespace-agnostic tag matching (real sitemaps mix default and
  prefixed namespaces)

Raises ValueError on malformed input (the uniform container-parser
contract).  The reference has no crawl layer (beyond-reference op).
"""

from __future__ import annotations

import gzip
import io
import xml.etree.ElementTree as ET


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap(data: bytes) -> dict:
    """-> {"kind": "urlset"|"sitemapindex"|"text",
           "entries": [{"loc": ..., "lastmod": ..., "changefreq": ...,
                        "priority": float|None}]}"""
    data = bytes(data)
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
        except (OSError, EOFError) as exc:
            raise ValueError(f"corrupt gzip sitemap: {exc}") from exc
    stripped = data.lstrip()
    if not stripped.startswith(b"<"):
        # plain-text sitemap: one absolute URL per line
        entries = []
        for line in data.decode("utf-8", "replace").splitlines():
            line = line.strip()
            if line and "://" in line:
                entries.append({"loc": line, "lastmod": None,
                                "changefreq": None, "priority": None})
        if not entries:
            raise ValueError("no URLs in text sitemap")
        return {"kind": "text", "entries": entries}
    try:
        root = ET.fromstring(stripped)
    except ET.ParseError as exc:
        raise ValueError(f"malformed sitemap XML: {exc}") from exc
    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        raise ValueError(f"not a sitemap document: <{kind}>")
    child_tag = "url" if kind == "urlset" else "sitemap"
    entries = []
    for el in root:
        if _local(el.tag) != child_tag:
            continue
        fields = {"loc": None, "lastmod": None, "changefreq": None,
                  "priority": None}
        for f in el:
            name = _local(f.tag)
            if name in fields:
                fields[name] = (f.text or "").strip() or None
        if fields["priority"] is not None:
            try:
                fields["priority"] = float(fields["priority"])
            except ValueError:
                fields["priority"] = None
        if fields["loc"]:
            entries.append(fields)
    return {"kind": kind, "entries": entries}


def write_sitemap(urls: list[dict | str], index: bool = False,
                  compress: bool = False) -> bytes:
    """Fixture/interchange writer: urlset (or sitemapindex) XML."""
    root_tag = "sitemapindex" if index else "urlset"
    child = "sitemap" if index else "url"
    out = [b'<?xml version="1.0" encoding="UTF-8"?>\n',
           f'<{root_tag} xmlns="http://www.sitemaps.org/schemas/'
           f'sitemap/0.9">\n'.encode()]
    for u in urls:
        if isinstance(u, str):
            u = {"loc": u}
        out.append(f"  <{child}>\n".encode())
        for k in ("loc", "lastmod", "changefreq", "priority"):
            v = u.get(k)
            if v is not None:
                out.append(f"    <{k}>{v}</{k}>\n".encode())
        out.append(f"  </{child}>\n".encode())
    out.append(f"</{root_tag}>\n".encode())
    blob = b"".join(out)
    if compress:
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
            g.write(blob)
        return buf.getvalue()
    return blob


def sitemap_urls_distributed(spark, path: str, on_error: str = "fail"):
    """binaryFile scan + mapInPandas parse: one task per sitemap file
    (a large site publishes an index of thousands of shards — the
    same file-level parallelism shape as WARC/WebDataset)."""
    import pandas as pd
    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")
    schema = ("path string, kind string, loc string, lastmod string, "
              "changefreq string, priority double")

    def run(batches):
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                try:
                    sm = parse_sitemap(bytes(content))
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                for e in sm["entries"]:
                    rows.append((p, sm["kind"], e["loc"], e["lastmod"],
                                 e["changefreq"], e["priority"]))
            yield pd.DataFrame(rows, columns=["path", "kind", "loc",
                                              "lastmod", "changefreq",
                                              "priority"])

    return files.mapInPandas(run, schema)
