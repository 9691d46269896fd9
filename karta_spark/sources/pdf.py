"""PDF text extraction — pure python, no external libs.

A crawl corpus is full of PDFs; a training pipeline needs their text.
This covers the layouts real PDFs serve:

- classic cross-reference tables (PDF 1.0–1.4) with ``/Prev`` chains
  and incremental updates (newest section wins)
- cross-reference STREAMS (PDF 1.5+, ``/Type/XRef``: W-field rows,
  ``/Index`` subsections, PNG-predictor DecodeParms) and object
  streams (``/Type/ObjStm`` — compressed object storage)
- stream filters: FlateDecode (zlib), ASCIIHexDecode, ASCII85Decode,
  filter arrays, PNG predictors 10–15 (Up is what producers emit)
- text operators ``Tj ' " TJ`` under ``BT/ET`` with ``Td/TD/T*/Tm``
  line tracking and inline-image (``BI..EI``) skipping
- ToUnicode CMaps (``bfchar``/``bfrange``, 1- and 2-byte codes) for
  simple and CID fonts; latin-1 passthrough otherwise

Out of scope (genuinely needs rendering/crypto): encrypted PDFs,
OCR of image-only pages, Type3 glyph programs.

The reference has no document layer (GDAL reads PDFs as rasters
only); this serves the crawl→training pipeline the same way WARC
(sources/warc.py) and WebDataset (sources/webdataset.py) do.
``encode_pdf`` is a fixture writer so tests and gates can pin the
parser against both xref layouts without binary fixtures.
"""

from __future__ import annotations

import base64
import binascii
import re
import zlib

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class Ref:
    """Indirect reference ``num gen R``."""
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num, self.gen = num, gen

    def __repr__(self):
        return f"Ref({self.num},{self.gen})"

    def __eq__(self, o):
        return isinstance(o, Ref) and (self.num, self.gen) == (o.num, o.gen)

    def __hash__(self):
        return hash((self.num, self.gen))


class _Name(str):
    """A PDF /Name (distinct from a decoded string)."""


class _P:
    """Cursor over raw bytes with PDF lexing primitives."""
    __slots__ = ("d", "i")

    def __init__(self, d: bytes, i: int = 0):
        self.d, self.i = d, i

    def skip_ws(self):
        d, n = self.d, len(self.d)
        i = self.i
        while i < n:
            c = d[i]
            if c in _WS:
                i += 1
            elif c == 0x25:  # % comment to EOL
                while i < n and d[i] not in b"\r\n":
                    i += 1
            else:
                break
        self.i = i

    def regular_token(self) -> bytes:
        """Run of non-delimiter, non-whitespace bytes (keyword/number)."""
        d, n = self.d, len(self.d)
        j = self.i
        while j < n and d[j] not in _WS and d[j] not in _DELIM:
            j += 1
        tok = d[self.i:j]
        self.i = j
        return tok


def _parse_name(p: _P) -> _Name:
    p.i += 1  # consume /
    raw = p.regular_token()
    if b"#" in raw:
        raw = re.sub(rb"#([0-9A-Fa-f]{2})",
                     lambda m: bytes([int(m.group(1), 16)]), raw)
    return _Name(raw.decode("latin-1"))


def _parse_literal_string(p: _P) -> bytes:
    d, n = p.d, len(p.d)
    i = p.i + 1  # consume (
    out = bytearray()
    depth = 1
    while i < n:
        c = d[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = d[i]
            if e in b"nrtbf":
                out.append({0x6E: 10, 0x72: 13, 0x74: 9,
                            0x62: 8, 0x66: 12}[e])
                i += 1
            elif e in b"()\\":
                out.append(e)
                i += 1
            elif 0x30 <= e <= 0x37:  # up to 3 octal digits
                oct_ = 0
                k = 0
                while k < 3 and i < n and 0x30 <= d[i] <= 0x37:
                    oct_ = oct_ * 8 + (d[i] - 0x30)
                    i += 1
                    k += 1
                out.append(oct_ & 0xFF)
            elif e in b"\r\n":  # line continuation
                i += 1
                if e == 0x0D and i < n and d[i] == 0x0A:
                    i += 1
            else:
                out.append(e)
                i += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                i += 1
                break
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    p.i = i
    return bytes(out)


def _parse_hex_string(p: _P) -> bytes:
    j = p.d.index(b">", p.i)
    hexs = re.sub(rb"[^0-9A-Fa-f]", b"", p.d[p.i + 1:j])
    p.i = j + 1
    if len(hexs) % 2:
        hexs += b"0"
    return binascii.unhexlify(hexs)


def parse_object(p: _P):
    """One PDF object at the cursor: dict/array/name/string/number/
    ref/bool/null.  Raises ValueError on malformed syntax."""
    p.skip_ws()
    d = p.d
    if p.i >= len(d):
        raise ValueError("unexpected end of PDF data")
    c = d[p.i]
    if c == 0x3C:  # <
        if d[p.i + 1:p.i + 2] == b"<":
            p.i += 2
            out = {}
            while True:
                p.skip_ws()
                if d[p.i:p.i + 2] == b">>":
                    p.i += 2
                    return out
                if d[p.i] != 0x2F:
                    raise ValueError("dict key must be a name")
                k = _parse_name(p)
                out[k] = parse_object(p)
        return _parse_hex_string(p)
    if c == 0x5B:  # [
        p.i += 1
        arr = []
        while True:
            p.skip_ws()
            if d[p.i:p.i + 1] == b"]":
                p.i += 1
                return arr
            arr.append(parse_object(p))
    if c == 0x2F:
        return _parse_name(p)
    if c == 0x28:
        return _parse_literal_string(p)
    tok = p.regular_token()
    if not tok:
        raise ValueError(f"bad PDF token at offset {p.i}")
    if tok == b"true":
        return True
    if tok == b"false":
        return False
    if tok == b"null":
        return None
    try:
        if b"." in tok or b"e" in tok or b"E" in tok:
            return float(tok)
        num = int(tok)
    except ValueError as exc:
        raise ValueError(f"bad PDF token {tok!r}") from exc
    # integer: maybe "num gen R"
    save = p.i
    p.skip_ws()
    tok2 = p.regular_token()
    if tok2.isdigit():
        p.skip_ws()
        tok3 = p.regular_token()
        if tok3 == b"R":
            return Ref(num, int(tok2))
    p.i = save
    return num


# ---------------------------------------------------------------------------
# stream filters
# ---------------------------------------------------------------------------

def _png_unpredict(data: bytes, columns: int, bpp: int) -> bytes:
    """PNG row predictors (10–15 in DecodeParms terms): each row is
    one filter byte + columns*bpp data bytes."""
    rb = columns * bpp
    out = bytearray()
    prev = bytes(rb)
    for r0 in range(0, len(data), rb + 1):
        ft = data[r0]
        row = bytearray(data[r0 + 1:r0 + 1 + rb])
        if ft == 1:    # Sub
            for i in range(bpp, rb):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(rb):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(rb):
                a = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(rb):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                cc = prev[i - bpp] if i >= bpp else 0
                pa, pb, pc = abs(b - cc), abs(a - cc), abs(a + b - 2 * cc)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                row[i] = (row[i] + pr) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG filter {ft}")
        out += row
        prev = bytes(row)
    return bytes(out)


def _apply_filters(raw: bytes, filt, parms) -> bytes:
    filters = [filt] if isinstance(filt, _Name) else (filt or [])
    plist = ([parms] if isinstance(parms, dict) else (parms or []))
    data = raw
    for k, f in enumerate(filters):
        pm = plist[k] if k < len(plist) and isinstance(plist[k], dict) else {}
        if f == "FlateDecode":
            data = zlib.decompress(data)
        elif f == "ASCIIHexDecode":
            h = re.sub(rb"[^0-9A-Fa-f>]", b"", data)
            h = h.split(b">")[0]
            if len(h) % 2:
                h += b"0"
            data = binascii.unhexlify(h)
        elif f == "ASCII85Decode":
            s = bytes(data).strip()
            if s.endswith(b"~>"):
                s = s[:-2]
            if s.startswith(b"<~"):
                s = s[2:]
            data = base64.a85decode(s, ignorechars=b" \t\n\r\x0b\x0c")
        else:
            raise ValueError(f"unsupported PDF filter {f}")
        pred = pm.get("Predictor", 1)
        if pred >= 10:
            cols = pm.get("Columns", 1)
            bpp = max(1, (pm.get("Colors", 1)
                          * pm.get("BitsPerComponent", 8)) // 8)
            data = _png_unpredict(data, cols, bpp)
        elif pred != 1:
            raise ValueError(f"unsupported predictor {pred}")
    return data


# ---------------------------------------------------------------------------
# document
# ---------------------------------------------------------------------------

class PdfDocument:
    """Parsed PDF: xref map (classic or stream), lazy object loading,
    page-tree walk, per-page text extraction."""

    def __init__(self, data: bytes):
        data = bytes(data)
        if not data.startswith(b"%PDF-"):
            raise ValueError("not a PDF (missing %PDF- header)")
        self.data = data
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, dict[int, object]] = {}
        # offset table: objnum -> ("o", byte_offset) | ("c", stm_num, idx)
        self.xref: dict[int, tuple] = {}
        self.trailer: dict = {}
        tail = data[-256:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise ValueError("PDF missing startxref")
        self._load_xref(int(m.group(1)), set())
        if "Root" not in self.trailer:
            raise ValueError("PDF trailer has no /Root")

    # -- xref ---------------------------------------------------------------
    def _load_xref(self, off: int, seen: set):
        if off in seen or not (0 <= off < len(self.data)):
            return
        seen.add(off)
        p = _P(self.data, off)
        p.skip_ws()
        if self.data[p.i:p.i + 4] == b"xref":
            p.i += 4
            self._load_xref_classic(p, seen)
        else:
            self._load_xref_stream(p, seen)

    def _load_xref_classic(self, p: _P, seen: set):
        while True:
            p.skip_ws()
            if self.data[p.i:p.i + 7] == b"trailer":
                p.i += 7
                tr = parse_object(p)
                for k, v in tr.items():
                    self.trailer.setdefault(k, v)
                if "Prev" in tr:
                    self._load_xref(int(tr["Prev"]), seen)
                return
            start = int(p.regular_token())
            p.skip_ws()
            count = int(p.regular_token())
            for k in range(count):
                p.skip_ws()
                o = int(p.regular_token())
                p.skip_ws()
                p.regular_token()  # gen
                p.skip_ws()
                typ = p.regular_token()
                num = start + k
                # newest-section-wins for BOTH entry kinds: a free ('f')
                # entry in a newer incremental update must shadow an older
                # section's in-use offset, or deleted objects resurrect
                if num not in self.xref:
                    self.xref[num] = ("o", o) if typ == b"n" else ("f",)

    def _load_xref_stream(self, p: _P, seen: set):
        p.regular_token()  # obj num
        p.skip_ws()
        p.regular_token()  # gen
        p.skip_ws()
        if p.regular_token() != b"obj":
            raise ValueError("bad xref stream object header")
        dct = parse_object(p)
        body = self._read_stream_body(p, dct)
        if dct.get("Type") != "XRef":
            raise ValueError("startxref does not point at xref data")
        w = [int(x) for x in dct["W"]]
        size = int(dct["Size"])
        index = [int(x) for x in dct.get("Index", [0, size])]
        rowlen = sum(w)
        pos = 0

        def field(row, a, b):
            return int.from_bytes(row[a:b], "big") if b > a else None

        for s in range(0, len(index), 2):
            start, count = index[s], index[s + 1]
            for k in range(count):
                row = body[pos:pos + rowlen]
                pos += rowlen
                f1 = field(row, 0, w[0])
                f2 = field(row, w[0], w[0] + w[1])
                f3 = field(row, w[0] + w[1], rowlen)
                if f1 is None:
                    f1 = 1  # default type when W[0]==0
                num = start + k
                if num in self.xref:
                    continue
                if f1 == 1:
                    self.xref[num] = ("o", f2)
                elif f1 == 2:
                    self.xref[num] = ("c", f2, f3)
                elif f1 == 0:
                    # free entry: record it so it masks older sections
                    self.xref[num] = ("f",)
        for k, v in dct.items():
            if k in ("Root", "Info", "Size", "ID", "Encrypt"):
                self.trailer.setdefault(k, v)
        if "Prev" in dct:
            self._load_xref(int(dct["Prev"]), seen)

    # -- objects ------------------------------------------------------------
    def _read_stream_body(self, p: _P, dct: dict) -> bytes:
        p.skip_ws()
        if self.data[p.i:p.i + 6] != b"stream":
            raise ValueError("expected stream keyword")
        p.i += 6
        if self.data[p.i:p.i + 2] == b"\r\n":
            p.i += 2
        elif self.data[p.i:p.i + 1] == b"\n":
            p.i += 1
        length = self.resolve(dct["Length"])
        raw = self.data[p.i:p.i + int(length)]
        return _apply_filters(raw, dct.get("Filter"),
                              dct.get("DecodeParms", dct.get("DP")))

    def resolve(self, obj):
        while isinstance(obj, Ref):
            obj = self.get_object(obj.num)
        return obj

    def get_object(self, num: int):
        if num in self._cache:
            return self._cache[num]
        ent = self.xref.get(num)
        if ent is None or ent[0] == "f":
            return None
        if ent[0] == "o":
            p = _P(self.data, ent[1])
            p.skip_ws()
            p.regular_token()  # num
            p.skip_ws()
            p.regular_token()  # gen
            p.skip_ws()
            if p.regular_token() != b"obj":
                raise ValueError(f"object {num}: bad obj header")
            obj = parse_object(p)
            if isinstance(obj, dict):
                p.skip_ws()
                if self.data[p.i:p.i + 6] == b"stream":
                    obj = ("__stream__", obj, self._read_stream_body(p, obj))
        else:
            obj = self._objstm_object(ent[1], ent[2])
        self._cache[num] = obj
        return obj

    def _objstm_object(self, stm_num: int, idx: int):
        tbl = self._objstm_cache.get(stm_num)
        if tbl is None:
            stm = self.get_object(stm_num)
            if not (isinstance(stm, tuple) and stm[0] == "__stream__"):
                raise ValueError(f"ObjStm {stm_num} is not a stream")
            dct, body = stm[1], stm[2]
            n, first = int(dct["N"]), int(dct["First"])
            hp = _P(body)
            pairs = []
            for _ in range(n):
                hp.skip_ws()
                onum = int(hp.regular_token())
                hp.skip_ws()
                ooff = int(hp.regular_token())
                pairs.append((onum, ooff))
            tbl = {}
            for k, (onum, ooff) in enumerate(pairs):
                op = _P(body, first + ooff)
                tbl[k] = parse_object(op)
            self._objstm_cache[stm_num] = tbl
        return tbl[idx]

    def stream_bytes(self, obj) -> bytes:
        obj = self.resolve(obj)
        if isinstance(obj, tuple) and obj[0] == "__stream__":
            return obj[2]
        raise ValueError("not a stream object")

    # -- pages --------------------------------------------------------------
    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer["Root"])
        out: list[dict] = []
        seen: set[int] = set()

        def walk(node_ref):
            key = node_ref.num if isinstance(node_ref, Ref) else id(node_ref)
            if key in seen:
                return
            seen.add(key)
            node = self.resolve(node_ref)
            if not isinstance(node, dict):
                return
            if node.get("Type") == "Page":
                out.append(node)
            else:
                for kid in self.resolve(node.get("Kids")) or []:
                    walk(kid)

        walk(root.get("Pages"))
        return out

    def page_text(self, page: dict) -> str:
        contents = self.resolve(page.get("Contents"))
        if contents is None:
            return ""
        if isinstance(contents, tuple):
            body = contents[2]
        else:
            body = b"\n".join(self.stream_bytes(c) for c in contents)
        fonts = {}
        res = self.resolve(page.get("Resources")) or {}
        for fname, fref in (self.resolve(res.get("Font")) or {}).items():
            fd = self.resolve(fref)
            cmap = None
            if isinstance(fd, dict) and "ToUnicode" in fd:
                try:
                    cmap = parse_tounicode(self.stream_bytes(fd["ToUnicode"]))
                except (ValueError, KeyError):
                    cmap = None
            fonts[fname] = cmap
        return extract_content_text(body, fonts)

    def text(self) -> list[str]:
        return [self.page_text(pg) for pg in self.pages()]


# ---------------------------------------------------------------------------
# ToUnicode CMaps
# ---------------------------------------------------------------------------

def parse_tounicode(cmap: bytes):
    """(code_bytes, {code:int -> str}) from bfchar/bfrange sections."""
    width = 1
    m = re.search(rb"begincodespacerange\s*<([0-9A-Fa-f]+)>", cmap)
    if m:
        width = max(1, len(m.group(1)) // 2)
    table: dict[int, str] = {}

    def u(hexs: bytes) -> str:
        b = binascii.unhexlify(hexs)
        if len(b) % 2:
            b = b"\x00" + b
        return b.decode("utf-16-be")

    for sec in re.finditer(rb"beginbfchar(.*?)endbfchar", cmap, re.S):
        for src, dst in re.findall(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", sec.group(1)):
            table[int(src, 16)] = u(dst)
    for sec in re.finditer(rb"beginbfrange(.*?)endbfrange", cmap, re.S):
        body = sec.group(1)
        for lo, hi, dst in re.findall(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>",
                body):
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            base = int(dst, 16)
            for c in range(lo_i, hi_i + 1):
                table[c] = chr(base + (c - lo_i))
        for lo, hi, arr in re.findall(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*\[(.*?)\]",
                body, re.S):
            dsts = re.findall(rb"<([0-9A-Fa-f]+)>", arr)
            for k, c in enumerate(range(int(lo, 16), int(hi, 16) + 1)):
                if k < len(dsts):
                    table[c] = u(dsts[k])
    return width, table


def _decode_text_string(s: bytes, cmap) -> str:
    if cmap is None:
        return s.decode("latin-1")
    width, table = cmap
    out = []
    for k in range(0, len(s), width):
        code = int.from_bytes(s[k:k + width], "big")
        out.append(table.get(code, ""))
    return "".join(out)


# ---------------------------------------------------------------------------
# content-stream text extraction
# ---------------------------------------------------------------------------

def extract_content_text(content: bytes, fonts: dict | None = None) -> str:
    """Text from one page's content stream.  Line breaks on Td/TD/T*/
    Tm/'/"; TJ kerning gaps ≤ -180/1000 em become spaces (the common
    word-gap heuristic).  Unknown operators clear the operand stack."""
    fonts = fonts or {}
    lines: list[str] = [""]
    stack: list = []
    cmap = None
    p = _P(content)
    n = len(content)

    def newline():
        if lines[-1]:
            lines.append("")

    def emit(s: bytes):
        lines[-1] += _decode_text_string(s, cmap)

    while True:
        p.skip_ws()
        if p.i >= n:
            break
        c = content[p.i]
        if c in b"</([" or c == 0x2F or (0x30 <= c <= 0x39) or c in b"+-.":
            try:
                stack.append(parse_object(p))
            except ValueError:
                p.i += 1
                stack.clear()
            continue
        op = p.regular_token()
        if not op:
            p.i += 1
            continue
        if op == b"Tf" and len(stack) >= 2 and isinstance(stack[-2], _Name):
            cmap = fonts.get(stack[-2])
        elif op in (b"Td", b"TD", b"T*", b"Tm"):
            newline()
        elif op == b"Tj" and stack and isinstance(stack[-1], bytes):
            emit(stack[-1])
        elif op == b"'" and stack and isinstance(stack[-1], bytes):
            newline()
            emit(stack[-1])
        elif op == b'"' and stack and isinstance(stack[-1], bytes):
            newline()
            emit(stack[-1])
        elif op == b"TJ" and stack and isinstance(stack[-1], list):
            for item in stack[-1]:
                if isinstance(item, bytes):
                    emit(item)
                elif isinstance(item, (int, float)) and item <= -180:
                    lines[-1] += " "
        elif op == b"BI":  # inline image: skip to EI
            j = content.find(b"EI", p.i)
            p.i = n if j < 0 else j + 2
        stack.clear()
    while lines and not lines[-1]:
        lines.pop()
    return "\n".join(lines)


def extract_text(data: bytes) -> list[str]:
    """Per-page text of a PDF byte blob.  Raises ValueError on
    malformed input (the uniform container-parser contract)."""
    try:
        return PdfDocument(data).text()
    except (ValueError, KeyError, TypeError, IndexError,
            zlib.error, binascii.Error, RecursionError) as exc:
        raise ValueError(f"bad PDF: {type(exc).__name__}: {exc}") from exc


# ---------------------------------------------------------------------------
# distributed op
# ---------------------------------------------------------------------------

PDF_PAGES_SCHEMA = ("doc_id long, page int, text string, "
                    "n_chars int, err string")


def pdf_page_text(docs, bytes_col: str = "content",
                  id_col: str = "doc_id"):
    """Per-page text over a binary PDF column — Arrow-batched
    mapInPandas, one python call per batch (never per row).  Robust
    contract (cf. multimodal.decode_any): a malformed PDF yields one
    ``(page=-1, err=...)`` row instead of killing the task.  At corpus
    scale parallelism is row-level: each task extracts its own batch
    of documents independently, no shuffle."""
    import pandas as pd  # executor-side import keeps module light

    def run(batches):
        for pdf_batch in batches:
            rows = []
            for did, blob in zip(pdf_batch[id_col], pdf_batch[bytes_col]):
                try:
                    for k, text in enumerate(extract_text(bytes(blob))):
                        rows.append((did, k, text, len(text), None))
                except ValueError as exc:
                    rows.append((did, -1, None, 0, str(exc)))
            yield pd.DataFrame(rows, columns=["doc_id", "page", "text",
                                              "n_chars", "err"])

    return docs.mapInPandas(run, PDF_PAGES_SCHEMA)


# ---------------------------------------------------------------------------
# fixture writer
# ---------------------------------------------------------------------------

def _esc(s: str) -> bytes:
    return (s.replace("\\", "\\\\").replace("(", "\\(")
            .replace(")", "\\)").encode("latin-1"))


def _content_stream(page_text: str, compress: bool) -> tuple[dict, bytes]:
    ops = [b"BT /F1 12 Tf 72 720 Td"]
    for k, line in enumerate(page_text.split("\n")):
        if k:
            ops.append(b"0 -14 Td")
        ops.append(b"(" + _esc(line) + b") Tj")
    ops.append(b"ET")
    body = b" ".join(ops)
    if compress:
        return {"Filter": "/FlateDecode"}, zlib.compress(body, 6)
    return {}, body


def _ser(v) -> bytes:
    if isinstance(v, str):  # pre-serialized (names, refs)
        return v.encode("latin-1")
    if isinstance(v, dict):
        return (b"<< " + b" ".join(b"/" + k.encode() + b" " + _ser(x)
                                   for k, x in v.items()) + b" >>")
    if isinstance(v, list):
        return b"[ " + b" ".join(_ser(x) for x in v) + b" ]"
    return str(v).encode()


def encode_pdf(pages: list[str], xref_stream: bool = False,
               compress: bool = True) -> bytes:
    """Minimal valid PDF with one Helvetica text page per entry.
    ``xref_stream=True`` emits the PDF 1.5+ layout — page/catalog
    dicts packed into an /ObjStm and a PNG-Up-predicted /XRef stream
    — exercising the modern parse path end-to-end."""
    objs: dict[int, bytes] = {}   # objnum -> full body (dict [+ stream])
    in_objstm: dict[int, bytes] = {}  # objnum -> dict body only
    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * k} 0 R" for k in range(n_pages))
    cat = _ser({"Type": "/Catalog", "Pages": "2 0 R"})
    pgs = _ser({"Type": "/Pages", "Count": n_pages,
                "Kids": [f"{3 + 2 * k} 0 R" for k in range(n_pages)]})
    assert kids  # keep writer honest for the 0-page case
    simple: dict[int, bytes] = {1: cat, 2: pgs}
    streams: dict[int, tuple[dict, bytes]] = {}
    for k, text in enumerate(pages):
        pnum, cnum = 3 + 2 * k, 4 + 2 * k
        simple[pnum] = _ser({
            "Type": "/Page", "Parent": "2 0 R",
            "MediaBox": [0, 0, 612, 792],
            "Resources": {"Font": {"F1": f"{font_num} 0 R"}},
            "Contents": f"{cnum} 0 R"})
        sd, body = _content_stream(text, compress)
        streams[cnum] = (sd, body)
    simple[font_num] = _ser({"Type": "/Font", "Subtype": "/Type1",
                             "BaseFont": "/Helvetica"})

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n" if xref_stream
                    else b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}

    def put(num: int, dct_bytes: bytes, stream: bytes | None = None):
        offsets[num] = len(out)
        out.extend(f"{num} 0 obj\n".encode())
        out.extend(dct_bytes)
        if stream is not None:
            out.extend(b"\nstream\n")
            out.extend(stream)
            out.extend(b"\nendstream")
        out.extend(b"\nendobj\n")

    if not xref_stream:
        for num in sorted(simple):
            put(num, simple[num])
        for num, (sd, body) in sorted(streams.items()):
            put(num, _ser(dict(sd, Length=len(body))), body)
        size = max(offsets) + 1
        xoff = len(out)
        out.extend(f"xref\n0 {size}\n".encode())
        out.extend(b"0000000000 65535 f \n")
        for num in range(1, size):
            out.extend(f"{offsets[num]:010d} 00000 n \n".encode())
        out.extend(b"trailer\n")
        out.extend(_ser({"Size": size, "Root": "1 0 R"}))
        out.extend(f"\nstartxref\n{xoff}\n%%EOF\n".encode())
        return bytes(out)

    # -- xref-stream layout: dict objects into an ObjStm ----------------
    objstm_num = font_num + 1
    xref_num = font_num + 2
    members = sorted(simple)
    header = []
    body = bytearray()
    for num in members:
        header.append(f"{num} {len(body)}")
        body.extend(simple[num])
        body.extend(b" ")
    hdr = (" ".join(header) + "\n").encode()
    stm_body = zlib.compress(hdr + bytes(body), 6)
    for num, (sd, cbody) in sorted(streams.items()):
        sd = dict(sd, Length=len(cbody))
        put(num, _ser(sd), cbody)
    put(objstm_num, _ser({"Type": "/ObjStm", "N": len(members),
                          "First": len(hdr), "Length": len(stm_body),
                          "Filter": "/FlateDecode"}), stm_body)
    size = xref_num + 1
    # xref rows, W [1 4 2] (4-byte offsets), PNG Up predictor — the
    # layout producers actually emit
    member_idx = {num: k for k, num in enumerate(members)}
    rows = [b"\x00" + bytes(4) + b"\xff\xff"]  # obj 0: free
    for num in range(1, size):
        if num in member_idx:
            rows.append(b"\x02" + objstm_num.to_bytes(4, "big")
                        + member_idx[num].to_bytes(2, "big"))
        else:
            off = offsets.get(num, len(out))  # xref stream = current end
            rows.append(b"\x01" + off.to_bytes(4, "big") + bytes(2))
    rb = 7
    pred = bytearray()
    prev = bytes(rb)
    for row in rows:
        pred.append(2)  # Up
        pred.extend((row[i] - prev[i]) & 0xFF for i in range(rb))
        prev = row
    xbody = zlib.compress(bytes(pred), 6)
    put(xref_num, _ser({"Type": "/XRef", "Size": size,
                        "W": [1, 4, 2], "Root": "1 0 R",
                        "Length": len(xbody), "Filter": "/FlateDecode",
                        "DecodeParms": {"Predictor": 12, "Columns": 7}}),
        xbody)
    out.extend(f"startxref\n{offsets[xref_num]}\n%%EOF\n".encode())
    return bytes(out)
