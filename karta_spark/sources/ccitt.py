"""CCITT Group 3 / Group 4 fax codecs for bilevel TIFF strips.

Scanned-document archives — a major training-data source — are
overwhelmingly CCITT-compressed TIFF (compression tags 2, 3, 4).  The
reference reads them through GDAL/libtiff (reference _gdal.py:114-188);
this module implements the codecs from the public ITU-T specs so the
lazy-window / distributed GeoTIFF path (geotiff.py) can decode them
without native libraries:

- compression 2  — "CCITT RLE": ITU-T T.4 §4.1 one-dimensional Modified
  Huffman run-length coding, each row independently coded and starting
  on a byte boundary (TIFF 6.0 §10).
- compression 3  — Group 3 (T.4): 1D, or mixed 1D/2D when T4Options
  bit 0 is set; rows delimited by EOL codes (000000000001), with an
  optional fill to byte alignment and a 1D/2D tag bit in 2D mode.
- compression 4  — Group 4 (T.6): pure two-dimensional coding, every
  row coded against the previous row (imaginary all-white first
  reference line), terminated by EOFB.

Decoded bits are "is-black" flags per the T.4 colour convention
(first run of every row is white).  Mapping to TIFF sample values is
the caller's job via PhotometricInterpretation: photometric 0
(WhiteIsZero) stores black as 1 -> sample = is_black; photometric 1
(BlackIsZero) stores black as 0 -> sample = 1 - is_black.

The run-length tables below are the published ITU-T T.4 tables 2/3
(terminating + make-up codes, plus the shared extended make-ups to
2560).  An encoder for T.6 and for the RLE flavour is included so the
test suite can roundtrip; independent validation is against fixtures
produced by the JDK ImageIO TIFF writer (tests/test_ccitt.py).
"""
from __future__ import annotations

import numpy as np

# --- ITU-T T.4 table 2: white run lengths -> (bits, code value) -----------

_WHITE = {
    0: (8, 0b00110101), 1: (6, 0b000111), 2: (4, 0b0111), 3: (4, 0b1000),
    4: (4, 0b1011), 5: (4, 0b1100), 6: (4, 0b1110), 7: (4, 0b1111),
    8: (5, 0b10011), 9: (5, 0b10100), 10: (5, 0b00111), 11: (5, 0b01000),
    12: (6, 0b001000), 13: (6, 0b000011), 14: (6, 0b110100),
    15: (6, 0b110101), 16: (6, 0b101010), 17: (6, 0b101011),
    18: (7, 0b0100111), 19: (7, 0b0001100), 20: (7, 0b0001000),
    21: (7, 0b0010111), 22: (7, 0b0000011), 23: (7, 0b0000100),
    24: (7, 0b0101000), 25: (7, 0b0101011), 26: (7, 0b0010011),
    27: (7, 0b0100100), 28: (7, 0b0011000), 29: (8, 0b00000010),
    30: (8, 0b00000011), 31: (8, 0b00011010), 32: (8, 0b00011011),
    33: (8, 0b00010010), 34: (8, 0b00010011), 35: (8, 0b00010100),
    36: (8, 0b00010101), 37: (8, 0b00010110), 38: (8, 0b00010111),
    39: (8, 0b00101000), 40: (8, 0b00101001), 41: (8, 0b00101010),
    42: (8, 0b00101011), 43: (8, 0b00101100), 44: (8, 0b00101101),
    45: (8, 0b00000100), 46: (8, 0b00000101), 47: (8, 0b00001010),
    48: (8, 0b00001011), 49: (8, 0b01010010), 50: (8, 0b01010011),
    51: (8, 0b01010100), 52: (8, 0b01010101), 53: (8, 0b00100100),
    54: (8, 0b00100101), 55: (8, 0b01011000), 56: (8, 0b01011001),
    57: (8, 0b01011010), 58: (8, 0b01011011), 59: (8, 0b01001010),
    60: (8, 0b01001011), 61: (8, 0b00110010), 62: (8, 0b00110011),
    63: (8, 0b00110100),
    # make-up codes
    64: (5, 0b11011), 128: (5, 0b10010), 192: (6, 0b010111),
    256: (7, 0b0110111), 320: (8, 0b00110110), 384: (8, 0b00110111),
    448: (8, 0b01100100), 512: (8, 0b01100101), 576: (8, 0b01101000),
    640: (8, 0b01100111), 704: (9, 0b011001100), 768: (9, 0b011001101),
    832: (9, 0b011010010), 896: (9, 0b011010011), 960: (9, 0b011010100),
    1024: (9, 0b011010101), 1088: (9, 0b011010110), 1152: (9, 0b011010111),
    1216: (9, 0b011011000), 1280: (9, 0b011011001), 1344: (9, 0b011011010),
    1408: (9, 0b011011011), 1472: (9, 0b010011000), 1536: (9, 0b010011001),
    1600: (9, 0b010011010), 1664: (6, 0b011000), 1728: (9, 0b010011011),
}

# --- ITU-T T.4 table 3: black run lengths ---------------------------------

_BLACK = {
    0: (10, 0b0000110111), 1: (3, 0b010), 2: (2, 0b11), 3: (2, 0b10),
    4: (3, 0b011), 5: (4, 0b0011), 6: (4, 0b0010), 7: (5, 0b00011),
    8: (6, 0b000101), 9: (6, 0b000100), 10: (7, 0b0000100),
    11: (7, 0b0000101), 12: (7, 0b0000111), 13: (8, 0b00000100),
    14: (8, 0b00000111), 15: (9, 0b000011000), 16: (10, 0b0000010111),
    17: (10, 0b0000011000), 18: (10, 0b0000001000),
    19: (11, 0b00001100111), 20: (11, 0b00001101000),
    21: (11, 0b00001101100), 22: (11, 0b00000110111),
    23: (11, 0b00000101000), 24: (11, 0b00000010111),
    25: (11, 0b00000011000), 26: (12, 0b000011001010),
    27: (12, 0b000011001011), 28: (12, 0b000011001100),
    29: (12, 0b000011001101), 30: (12, 0b000001101000),
    31: (12, 0b000001101001), 32: (12, 0b000001101010),
    33: (12, 0b000001101011), 34: (12, 0b000011010010),
    35: (12, 0b000011010011), 36: (12, 0b000011010100),
    37: (12, 0b000011010101), 38: (12, 0b000011010110),
    39: (12, 0b000011010111), 40: (12, 0b000001101100),
    41: (12, 0b000001101101), 42: (12, 0b000011011010),
    43: (12, 0b000011011011), 44: (12, 0b000001010100),
    45: (12, 0b000001010101), 46: (12, 0b000001010110),
    47: (12, 0b000001010111), 48: (12, 0b000001100100),
    49: (12, 0b000001100101), 50: (12, 0b000001010010),
    51: (12, 0b000001010011), 52: (12, 0b000000100100),
    53: (12, 0b000000110111), 54: (12, 0b000000111000),
    55: (12, 0b000000100111), 56: (12, 0b000000101000),
    57: (12, 0b000001011000), 58: (12, 0b000001011001),
    59: (12, 0b000000101011), 60: (12, 0b000000101100),
    61: (12, 0b000001011010), 62: (12, 0b000001100110),
    63: (12, 0b000001100111),
    # make-up codes
    64: (10, 0b0000001111), 128: (12, 0b000011001000),
    192: (12, 0b000011001001), 256: (12, 0b000001011011),
    320: (12, 0b000000110011), 384: (12, 0b000000110100),
    448: (12, 0b000000110101), 512: (13, 0b0000001101100),
    576: (13, 0b0000001101101), 640: (13, 0b0000001001010),
    704: (13, 0b0000001001011), 768: (13, 0b0000001001100),
    832: (13, 0b0000001001101), 896: (13, 0b0000001110010),
    960: (13, 0b0000001110011), 1024: (13, 0b0000001110100),
    1088: (13, 0b0000001110101), 1152: (13, 0b0000001110110),
    1216: (13, 0b0000001110111), 1280: (13, 0b0000001010010),
    1344: (13, 0b0000001010011), 1408: (13, 0b0000001010100),
    1472: (13, 0b0000001010101), 1536: (13, 0b0000001011010),
    1600: (13, 0b0000001011011), 1664: (13, 0b0000001100100),
    1728: (13, 0b0000001100101),
}

# extended make-up codes (T.4 table 4), shared by both colours
_EXT_MAKEUP = {
    1792: (11, 0b00000001000), 1856: (11, 0b00000001100),
    1920: (11, 0b00000001101), 1984: (12, 0b000000010010),
    2048: (12, 0b000000010011), 2112: (12, 0b000000010100),
    2176: (12, 0b000000010101), 2240: (12, 0b000000010110),
    2304: (12, 0b000000010111), 2368: (12, 0b000000011100),
    2432: (12, 0b000000011101), 2496: (12, 0b000000011110),
    2560: (12, 0b000000011111),
}


def _decode_table(table):
    """(bits, code) -> run, merged with the shared extended make-ups."""
    out = {(b, c): run for run, (b, c) in table.items()}
    out.update({(b, c): run for run, (b, c) in _EXT_MAKEUP.items()})
    return out

_WHITE_DEC = _decode_table(_WHITE)
_BLACK_DEC = _decode_table(_BLACK)

# T.6 / T.4-2D vertical+pass+horizontal mode codes (T.6 table 1)
_MODE_P, _MODE_H = "P", "H"
_MODES = {
    (1, 0b1): 0,            # V(0)
    (3, 0b011): 1,          # VR(1)
    (6, 0b000011): 2,       # VR(2)
    (7, 0b0000011): 3,      # VR(3)
    (3, 0b010): -1,         # VL(1)
    (6, 0b000010): -2,      # VL(2)
    (7, 0b0000010): -3,     # VL(3)
    (4, 0b0001): _MODE_P,   # pass
    (3, 0b001): _MODE_H,    # horizontal
}

_EOL = (12, 0b000000000001)


class _BitReader:
    """MSB-first bit reader with peeking, for variable-length fax codes."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0                      # bit position
        self.nbits = 8 * len(data)

    def peek(self, n: int) -> int:
        """Next *n* bits MSB-first, zero-padded past the end."""
        out = 0
        p = self.pos
        for _ in range(n):
            byte = self.data[p >> 3] if (p >> 3) < len(self.data) else 0
            out = (out << 1) | ((byte >> (7 - (p & 7))) & 1)
            p += 1
        return out

    def skip(self, n: int):
        self.pos += n

    def align(self):
        self.pos = (self.pos + 7) & ~7

    def exhausted(self) -> bool:
        return self.pos >= self.nbits


def _read_run(br: _BitReader, table) -> int:
    """One complete run length: zero or more make-ups + a terminator."""
    total = 0
    while True:
        for nb in range(2, 15):
            run = table.get((nb, br.peek(nb)))
            if run is not None:
                br.skip(nb)
                total += run
                if run < 64:      # terminating code ends the run
                    return total
                break             # make-up: continue accumulating
        else:
            raise ValueError(
                f"invalid T.4 run-length code at bit {br.pos}")


def _read_mode(br: _BitReader):
    for nb in (1, 3, 4, 6, 7):
        mode = _MODES.get((nb, br.peek(nb)))
        if mode is not None:
            br.skip(nb)
            return mode
    return None


def _transitions_to_row(trans, width) -> np.ndarray:
    """Changing-element positions -> uint8 is-black row via cumsum toggles."""
    toggles = np.zeros(width + 1, dtype=np.uint8)
    for t in trans:
        if t < width:
            toggles[t] ^= 1
    return np.bitwise_and(np.cumsum(toggles[:width], dtype=np.int64), 1
                          ).astype(np.uint8)


def _row_transitions(row: np.ndarray) -> list[int]:
    """Positions where the colour changes (row[0] != white counts pos 0)."""
    d = np.flatnonzero(np.diff(row.astype(np.int8))) + 1
    out = d.tolist()
    if row[0]:
        out.insert(0, 0)
    return out


def _decode_1d_row(br: _BitReader, width: int) -> list[int]:
    """One T.4 1D (Modified Huffman) row -> transition positions."""
    trans, pos, white = [], 0, True
    while pos < width:
        run = _read_run(br, _WHITE_DEC if white else _BLACK_DEC)
        pos += run
        trans.append(min(pos, width))
        white = not white
    return trans


def _decode_2d_row(br: _BitReader, ref: list[int], width: int) -> list[int]:
    """One 2D-coded row (T.6 §2.2 / T.4 §4.2) against reference
    transitions *ref* -> this row's transition positions."""
    trans: list[int] = []
    a0, white = -1, True
    while a0 < width:
        # b1: first ref transition > a0 whose parity makes it a
        # white->black change when we're in white, and vice versa.
        # ref[i] with even i is white->black (rows start white).
        i = 0
        while i < len(ref) and (ref[i] <= a0 or (i & 1) != (0 if white else 1)):
            i += 1
        b1 = ref[i] if i < len(ref) else width
        b2 = ref[i + 1] if i + 1 < len(ref) else width
        mode = _read_mode(br)
        if mode is None:
            # no valid code can start with 8+ zeros: an EOL/EOFB prefix
            # or pure padding ends the row stream
            if br.exhausted() or br.peek(11) == 0:
                break
            raise ValueError(f"invalid 2D mode code at bit {br.pos}")
        if mode == _MODE_P:
            a0 = b2                       # colour unchanged, no transition
        elif mode == _MODE_H:
            start = max(a0, 0)
            r1 = _read_run(br, _WHITE_DEC if white else _BLACK_DEC)
            r2 = _read_run(br, _BLACK_DEC if white else _WHITE_DEC)
            a1, a2 = start + r1, start + r1 + r2
            trans.append(min(a1, width))
            trans.append(min(a2, width))
            a0 = a2                       # colour unchanged
        else:                             # vertical: a1 = b1 + delta
            a1 = b1 + mode
            trans.append(min(max(a1, 0), width))
            a0 = a1
            white = not white
        if a0 >= width:
            break
    return trans


# --- public decoders -------------------------------------------------------

def decode_g4(data: bytes, width: int, height: int) -> np.ndarray:
    """Group 4 (T.6) -> (height, width) uint8 is-black bitmap."""
    br = _BitReader(data)
    ref = [width, width]                  # imaginary all-white reference row
    out = np.zeros((height, width), dtype=np.uint8)
    for y in range(height):
        if br.exhausted():
            break                         # truncated: remaining rows white
        if br.peek(24) == 0x001001:       # EOFB = EOL + EOL
            break
        trans = _decode_2d_row(br, ref, width)
        out[y] = _transitions_to_row(trans, width)
        ref = trans + [width, width]
    return out


def decode_mh_rle(data: bytes, width: int, height: int) -> np.ndarray:
    """TIFF compression 2 (Modified Huffman, byte-aligned rows)."""
    br = _BitReader(data)
    out = np.zeros((height, width), dtype=np.uint8)
    for y in range(height):
        if br.exhausted():
            break
        out[y] = _transitions_to_row(_decode_1d_row(br, width), width)
        br.align()                        # each row starts on a byte boundary
    return out


def decode_g3(data: bytes, width: int, height: int,
              two_d: bool = False) -> np.ndarray:
    """TIFF compression 3 (Group 3, T.4).  Rows are separated by EOL
    codes; in 2D mode (*two_d*, T4Options bit 0) each EOL carries a tag
    bit choosing 1D/2D coding for the following row."""
    br = _BitReader(data)
    out = np.zeros((height, width), dtype=np.uint8)
    ref = [width, width]

    def skip_eol() -> bool:
        """Consume fill bits + one EOL; False if the stream ends."""
        while not br.exhausted():
            if br.peek(12) == _EOL[1]:
                br.skip(12)
                return True
            if br.peek(1) == 0:
                br.skip(1)                # fill bit
            else:
                return True               # data starts without EOL
        return False

    for y in range(height):
        if not skip_eol() or br.exhausted():
            break
        if two_d:
            tag = br.peek(1)
            br.skip(1)
            trans = (_decode_1d_row(br, width) if tag
                     else _decode_2d_row(br, ref, width))
        else:
            trans = _decode_1d_row(br, width)
        out[y] = _transitions_to_row(trans, width)
        ref = trans + [width, width]
    return out


# --- encoders (for roundtrip tests and fixture generation) ----------------

class _BitWriter:
    __slots__ = ("buf", "acc", "nacc")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, nbits: int, value: int):
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nacc += nbits
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)

    def align(self):
        if self.nacc:
            self.write(8 - self.nacc, 0)

    def bytes(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _write_run(bw: _BitWriter, run: int, table):
    while run >= 64:
        step = min((run // 64) * 64, 2560)
        while step not in table and step not in _EXT_MAKEUP:
            step -= 64
        nb, code = table.get(step) or _EXT_MAKEUP[step]
        bw.write(nb, code)
        run -= step
    nb, code = table[run]
    bw.write(nb, code)


_MODE_ENC = {0: (1, 0b1), 1: (3, 0b011), 2: (6, 0b000011), 3: (7, 0b0000011),
             -1: (3, 0b010), -2: (6, 0b000010), -3: (7, 0b0000010)}


def encode_g4(bitmap: np.ndarray) -> bytes:
    """Encode an is-black uint8 bitmap as Group 4 (T.6), EOFB-terminated."""
    h, width = bitmap.shape
    bw = _BitWriter()
    ref = [width, width]
    for y in range(h):
        cur = _row_transitions(bitmap[y]) + [width, width]
        a0, white, ci = -1, True, 0
        while True:
            a1 = next((t for t in cur[ci:] if t > a0), width)
            i = 0
            while i < len(ref) and (ref[i] <= a0
                                    or (i & 1) != (0 if white else 1)):
                i += 1
            b1 = ref[i] if i < len(ref) else width
            b2 = ref[i + 1] if i + 1 < len(ref) else width
            if b2 < a1:                   # pass mode
                bw.write(4, 0b0001)
                a0 = b2
            elif abs(a1 - b1) <= 3:       # vertical mode
                nb, code = _MODE_ENC[a1 - b1]
                bw.write(nb, code)
                a0 = a1
                white = not white
                ci = cur.index(a1) + 1 if a1 < width else len(cur)
            else:                         # horizontal mode
                a2 = next((t for t in cur[ci:] if t > a1), width)
                bw.write(3, 0b001)
                start = max(a0, 0)
                _write_run(bw, a1 - start, _WHITE if white else _BLACK)
                _write_run(bw, a2 - a1, _BLACK if white else _WHITE)
                a0 = a2
                ci = cur.index(a2) + 1 if a2 < width else len(cur)
            if a0 >= width:
                break
        ref = _row_transitions(bitmap[y]) + [width, width]
    bw.write(12, _EOL[1])                 # EOFB
    bw.write(12, _EOL[1])
    return bw.bytes()


def encode_mh_rle(bitmap: np.ndarray) -> bytes:
    """Encode as TIFF compression 2 (per-row Modified Huffman)."""
    h, width = bitmap.shape
    bw = _BitWriter()
    for y in range(h):
        pos, white = 0, True
        for t in _row_transitions(bitmap[y]) + [width]:
            _write_run(bw, t - pos, _WHITE if white else _BLACK)
            pos, white = t, not white
            if pos >= width:
                break
        if white:                         # rows must end on a black code? no:
            pass                          # trailing zero-run already emitted
        bw.align()
    return bw.bytes()
