"""DOCX text extraction — stdlib zipfile + XML, no external libs.

Office documents are a steady fraction of any crawl; their text layer
is fully specified (OOXML, ECMA-376): a zip container whose
``word/document.xml`` holds paragraphs (``w:p``) of runs (``w:r``)
of text nodes (``w:t``), with ``w:tab``/``w:br`` inline breaks and
tables (``w:tbl``/``w:tr``/``w:tc``) wrapping nested paragraphs.

- ``docx_text(data) -> list[str]`` — one string per paragraph,
  document order; table cells contribute their paragraphs in reading
  order (rows joined with tabs); raises ValueError on malformed input
  (the uniform container-parser contract).
- ``encode_docx(paragraphs) -> bytes`` — minimal valid fixture writer
  (the same role as encode_pdf in sources/pdf.py).
- ``docx_text_distributed`` — Arrow-batched robust op.

The reference has no document layer (beyond-reference op, like PDF)."""

from __future__ import annotations

import io
import posixpath
import xml.etree.ElementTree as ET
import zipfile

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def _para_text(p) -> str:
    out = []
    for node in p.iter():
        tag = node.tag
        if tag == _W + "t":
            out.append(node.text or "")
        elif tag == _W + "tab":
            out.append("\t")
        elif tag == _W + "br":
            out.append("\n")
    return "".join(out)


def docx_text(data: bytes) -> list[str]:
    """Paragraph strings in document order.  Top-level table rows are
    flattened to one paragraph per row (cells tab-joined)."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(bytes(data)))
    except (zipfile.BadZipFile, OSError) as exc:
        raise ValueError(f"not a docx (bad zip): {exc}") from exc
    with zf:
        names = {posixpath.normpath(n): n for n in zf.namelist()}
        doc = names.get("word/document.xml")
        if doc is None:
            raise ValueError("not a docx (missing word/document.xml)")
        try:
            root = ET.fromstring(zf.read(doc))
        except (ET.ParseError, zipfile.BadZipFile, OSError) as exc:
            raise ValueError(f"bad document.xml: {exc}") from exc
    body = root.find(_W + "body")
    if body is None:
        raise ValueError("document.xml has no w:body")
    paras: list[str] = []
    for el in body:
        if el.tag == _W + "p":
            paras.append(_para_text(el))
        elif el.tag == _W + "tbl":
            for tr in el.findall(_W + "tr"):
                cells = []
                for tc in tr.findall(_W + "tc"):
                    cells.append("\n".join(
                        _para_text(p) for p in tc.findall(_W + "p")))
                paras.append("\t".join(cells))
    return paras


def encode_docx(paragraphs: list[str]) -> bytes:
    """Minimal valid OOXML package: [Content_Types].xml + rels +
    word/document.xml, one w:p/w:r/w:t per paragraph (fixtures +
    interchange; deterministic bytes — fixed timestamps)."""
    def esc(s: str) -> str:
        return (s.replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;"))

    body = "".join(
        f"<w:p><w:r><w:t xml:space=\"preserve\">{esc(p)}</w:t></w:r></w:p>"
        for p in paragraphs)
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>' + body
        + "</w:body></w:document>")
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/word/document.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.'
        'wordprocessingml.document.main+xml"/></Types>')
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/'
        'package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats'
        '.org/officeDocument/2006/relationships/officeDocument" '
        'Target="word/document.xml"/></Relationships>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, content in (("[Content_Types].xml", content_types),
                              ("_rels/.rels", rels),
                              ("word/document.xml", document)):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, content)
    return buf.getvalue()


def docx_text_distributed(docs, bytes_col: str = "content",
                          id_col: str = "doc_id"):
    """Arrow-batched per-paragraph extraction with the robust err-row
    contract (cf. pdf_page_text)."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    for k, text in enumerate(docx_text(bytes(blob))):
                        rows.append((did, k, text, len(text), None))
                except ValueError as exc:
                    rows.append((did, -1, None, 0, str(exc)))
            yield pd.DataFrame(rows, columns=["doc_id", "para", "text",
                                              "n_chars", "err"])

    return docs.mapInPandas(
        run, "doc_id long, para int, text string, n_chars int, "
             "err string")
