"""EPUB text extraction — stdlib zip + XML + the shared HTML chain.

Ebooks are a major pretraining-text source; EPUB (IDPF/W3C) is a zip
package: ``META-INF/container.xml`` names the OPF package file, whose
``<manifest>`` maps ids to hrefs and ``<spine>`` orders the reading
chapters; each chapter is XHTML.  Chapter text reuses the EXACT
html_to_text regex chain from operators/text.py (run through python
``re`` — the steps carry no engine-specific syntax), so EPUB text and
crawl-HTML text normalize identically.

- ``epub_chapters(data) -> [(href, text)]`` in spine order; raises
  ValueError on malformed packages (uniform contract).
- ``encode_epub(chapters)`` — minimal valid fixture writer.
- ``epub_text_distributed`` — Arrow-batched robust op.
"""

from __future__ import annotations

import io
import posixpath
import re
import xml.etree.ElementTree as ET
import zipfile

from karta_spark.operators.text import _HTML_STEPS


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def html_to_text_py(html: str) -> str:
    """The html_to_text chain (operators/text.py) via python re —
    byte-identical normalization to the Catalyst/DuckDB twins."""
    out = html
    for pat, rep in _HTML_STEPS:
        out = re.sub(pat, rep, out)
    return out.strip()


def epub_chapters(data: bytes) -> list[tuple[str, str]]:
    try:
        zf = zipfile.ZipFile(io.BytesIO(bytes(data)))
    except (zipfile.BadZipFile, OSError) as exc:
        raise ValueError(f"not an epub (bad zip): {exc}") from exc
    with zf:
        names = set(zf.namelist())
        if "META-INF/container.xml" not in names:
            raise ValueError("not an epub (missing container.xml)")
        try:
            cont = ET.fromstring(zf.read("META-INF/container.xml"))
        except ET.ParseError as exc:
            raise ValueError(f"bad container.xml: {exc}") from exc
        opf_path = None
        for el in cont.iter():
            if _local(el.tag) == "rootfile":
                opf_path = el.get("full-path")
                break
        if not opf_path or opf_path not in names:
            raise ValueError("epub container names no readable OPF")
        try:
            opf = ET.fromstring(zf.read(opf_path))
        except ET.ParseError as exc:
            raise ValueError(f"bad OPF: {exc}") from exc
        base = posixpath.dirname(opf_path)
        items: dict[str, str] = {}
        spine: list[str] = []
        for el in opf.iter():
            tag = _local(el.tag)
            if tag == "item":
                items[el.get("id", "")] = el.get("href", "")
            elif tag == "itemref":
                spine.append(el.get("idref", ""))
        if not spine:
            raise ValueError("epub OPF has an empty spine")
        out: list[tuple[str, str]] = []
        for idref in spine:
            href = items.get(idref)
            if not href:
                raise ValueError(f"spine idref {idref!r} not in manifest")
            path = posixpath.normpath(posixpath.join(base, href))
            if path not in names:
                raise ValueError(f"chapter {path!r} missing from package")
            xhtml = zf.read(path).decode("utf-8", "replace")
            # chapter text = body only: the <head> title would
            # duplicate into every chapter otherwise
            xhtml = re.sub(r"(?is)<head\b.*?</head\s*>", " ", xhtml)
            out.append((href, html_to_text_py(xhtml)))
        return out


def encode_epub(chapters: list[tuple[str, str]]) -> bytes:
    """Minimal valid EPUB: mimetype (stored first, per spec),
    container.xml, content.opf with manifest+spine, one XHTML file per
    (title, body_html) chapter.  Deterministic bytes."""
    manifest = []
    spine = []
    files = []
    for k, (title, body_html) in enumerate(chapters):
        href = f"ch{k:03d}.xhtml"
        manifest.append(f'<item id="c{k}" href="{href}" '
                        'media-type="application/xhtml+xml"/>')
        spine.append(f'<itemref idref="c{k}"/>')
        files.append((f"OEBPS/{href}",
                      ('<?xml version="1.0" encoding="utf-8"?>'
                       '<html xmlns="http://www.w3.org/1999/xhtml">'
                       f"<head><title>{title}</title></head>"
                       f"<body>{body_html}</body></html>")))
    opf = ('<?xml version="1.0" encoding="utf-8"?>'
           '<package xmlns="http://www.idpf.org/2007/opf" version="3.0"'
           ' unique-identifier="id"><metadata/>'
           "<manifest>" + "".join(manifest) + "</manifest>"
           "<spine>" + "".join(spine) + "</spine></package>")
    container = ('<?xml version="1.0" encoding="UTF-8"?>'
                 '<container version="1.0" xmlns="urn:oasis:names:tc:'
                 'opendocument:xmlns:container"><rootfiles>'
                 '<rootfile full-path="OEBPS/content.opf" media-type='
                 '"application/oebps-package+xml"/>'
                 "</rootfiles></container>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zi = zipfile.ZipInfo("mimetype", date_time=(1980, 1, 1, 0, 0, 0))
        zi.compress_type = zipfile.ZIP_STORED  # spec: stored, first
        zf.writestr(zi, "application/epub+zip")
        for name, content in ([("META-INF/container.xml", container),
                               ("OEBPS/content.opf", opf)] + files):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, content)
    return buf.getvalue()


def epub_text_distributed(docs, bytes_col: str = "content",
                          id_col: str = "book_id"):
    """Arrow-batched per-chapter extraction, robust err-row contract."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for bid, blob in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    for k, (href, text) in enumerate(
                            epub_chapters(bytes(blob))):
                        rows.append((bid, k, href, text, len(text),
                                     None))
                except ValueError as exc:
                    rows.append((bid, -1, None, None, 0, str(exc)))
            yield pd.DataFrame(rows, columns=[
                "book_id", "chapter", "href", "text", "n_chars",
                "err"])

    return docs.mapInPandas(
        run, "book_id long, chapter int, href string, text string, "
             "n_chars int, err string")
