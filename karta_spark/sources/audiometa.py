"""MP3 and Ogg (Opus/Vorbis) METADATA extraction — pure python.

Full MPEG-audio / Vorbis decode genuinely needs external codecs, but a
crawl pipeline's audio census (duration, bitrate, channels, tags)
only needs the container structure, which is simple and fully
specified:

- **MP3**: ID3v2 tag skip + text-frame extraction (v2.2/2.3/2.4
  syncsafe sizes), MPEG frame-header walk (all versions/layers,
  bitrate + samplerate tables, padding), frame count -> exact
  duration, CBR/VBR detection, trailing ID3v1 tolerated.
- **Ogg**: page walk ("OggS", lacing, CRC-checked optionally),
  OpusHead / \\x01vorbis identification headers (channels, rates,
  pre-skip), duration from the last page's granule position.

Fixture writers emit structurally valid streams (MP3 frames carry
silent zero payloads — the audio itself would need a real encoder;
the METADATA layer, which is what the operators census, is exact).

The reference has no audio layer; this extends the multimodal-column
surface the same way sources/av.py and sources/flac.py do.
"""

from __future__ import annotations

import struct

_BITRATES = {  # kbps; index 1-14 (0=free, 15=bad)
    # (version_group, layer): table — version_group: 1=MPEG1, 2=MPEG2/2.5
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
             384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
             224, 256, 320],
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176,
             192, 224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112,
             128, 144, 160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112,
             128, 144, 160],
}
_RATES = {0: [44100, 48000, 32000],    # MPEG1
          2: [22050, 24000, 16000],    # MPEG2
          3: [11025, 12000, 8000]}     # MPEG2.5


def _syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _id3v2(data: bytes) -> tuple[int, dict[str, str]]:
    """(total tag size incl. header, text frames like TIT2/TPE1)."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0, {}
    ver = data[3]
    size = _syncsafe(data[6:10]) + 10
    tags: dict[str, str] = {}
    pos = 10
    end = min(size, len(data))
    while pos + 10 <= end:
        if ver >= 3:
            fid = data[pos:pos + 4]
            flen = (_syncsafe(data[pos + 4:pos + 8]) if ver >= 4
                    else int.from_bytes(data[pos + 4:pos + 8], "big"))
            hdr = 10
        else:  # v2.2: 3-byte ids and sizes
            fid = data[pos:pos + 3]
            flen = int.from_bytes(data[pos + 3:pos + 6], "big")
            hdr = 6
        if not fid.strip(b"\x00") or flen <= 0:
            break
        body = data[pos + hdr:pos + hdr + flen]
        if fid[:1] == b"T" and body:
            enc = body[0]
            raw = body[1:]
            try:
                if enc == 0:
                    txt = raw.decode("latin-1")
                elif enc == 1:
                    txt = raw.decode("utf-16")
                elif enc == 2:
                    txt = raw.decode("utf-16-be")
                else:
                    txt = raw.decode("utf-8")
                tags[fid.decode("latin-1").strip()] = txt.rstrip("\x00")
            except UnicodeDecodeError:
                pass
        pos += hdr + flen
    return size, tags


def mp3_meta(data: bytes) -> dict:
    """Walk MPEG frame headers -> dict(sample_rate, channels, layer,
    n_frames, duration_s, bitrate_kbps, vbr, tags).  Raises ValueError
    when no valid MPEG frame is found (the uniform contract)."""
    data = bytes(data)
    pos, tags = _id3v2(data)
    n = len(data)
    n_frames = 0
    samples = 0
    rate = channels = layer0 = None
    bitrates = set()
    while pos + 4 <= n:
        if data[pos:pos + 3] == b"TAG":  # ID3v1 trailer
            pos += 128
            continue
        h = int.from_bytes(data[pos:pos + 4], "big")
        if (h >> 21) & 0x7FF != 0x7FF:
            if n_frames:
                break  # trailing garbage after valid audio
            pos += 1  # resync scan before the first frame
            continue
        ver_bits = (h >> 19) & 3   # 0=2.5, 2=MPEG2, 3=MPEG1
        layer = 4 - ((h >> 17) & 3)  # 1..3; bits 00 reserved
        if ver_bits == 1 or layer == 4:
            if n_frames:
                break
            pos += 1
            continue
        bidx = (h >> 12) & 0xF
        ridx = (h >> 10) & 3
        if bidx in (0, 15) or ridx == 3:
            if n_frames:
                break
            pos += 1
            continue
        vgroup = 1 if ver_bits == 3 else 2
        br = _BITRATES[(vgroup, layer)][bidx] * 1000
        sr = _RATES[{3: 0, 2: 2, 0: 3}[ver_bits]][ridx]
        pad = (h >> 9) & 1
        mode = (h >> 6) & 3
        if layer == 1:
            flen = (12 * br // sr + pad) * 4
            spf = 384
        else:
            spf = 1152 if (layer == 2 or vgroup == 1) else 576
            flen = spf // 8 * br // sr + pad
        if flen <= 4 or pos + flen > n:
            break
        if rate is None:
            rate, layer0 = sr, layer
            channels = 1 if mode == 3 else 2
        n_frames += 1
        samples += spf
        bitrates.add(br)
        pos += flen
    if n_frames == 0:
        raise ValueError("no valid MPEG audio frames")
    dur = samples / rate
    return dict(sample_rate=rate, channels=channels, layer=layer0,
                n_frames=n_frames, duration_s=dur,
                bitrate_kbps=(sum(bitrates) // len(bitrates)) // 1000
                if len(bitrates) == 1 else
                int(round(8.0 * (pos - _id3v2(data)[0]) / dur / 1000)),
                vbr=len(bitrates) > 1, tags=tags)


def encode_mp3_frames(n_frames: int, bitrate_kbps: int = 128,
                      sample_rate: int = 44100, stereo: bool = True,
                      tags: dict[str, str] | None = None) -> bytes:
    """Structurally valid MPEG1 Layer III stream with zero (silent)
    payloads — exact for the metadata layer; real audio would need a
    real encoder (documented stub, cf. the multimodal decode
    guidance).  Optional ID3v2.3 text tags."""
    try:
        bidx = _BITRATES[(1, 3)].index(bitrate_kbps)
        ridx = _RATES[0].index(sample_rate)
    except ValueError as exc:
        raise ValueError(f"unsupported MPEG1-L3 combo: {exc}") from exc
    out = bytearray()
    if tags:
        body = bytearray()
        for k, v in tags.items():
            payload = b"\x00" + v.encode("latin-1")
            body += k.encode("latin-1")[:4].ljust(4, b"\x00")
            body += struct.pack(">I", len(payload)) + b"\x00\x00" + payload
        sz = len(body)
        out += b"ID3\x03\x00\x00" + bytes([(sz >> 21) & 0x7F,
                                           (sz >> 14) & 0x7F,
                                           (sz >> 7) & 0x7F, sz & 0x7F])
        out += body
    h = (0x7FF << 21) | (3 << 19) | (1 << 17)  # MPEG1, Layer III
    h |= (bidx << 12) | (ridx << 10)
    h |= (0 if stereo else 3) << 6
    flen = 144 * bitrate_kbps * 1000 // sample_rate
    frame = h.to_bytes(4, "big") + bytes(flen - 4)
    out += frame * n_frames
    return bytes(out)


# ---------------------------------------------------------------------------
# Ogg
# ---------------------------------------------------------------------------

def _ogg_crc_table():
    tbl = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if r & 0x80000000 \
                else (r << 1) & 0xFFFFFFFF
        tbl.append(r)
    return tbl


_OGG_CRC = _ogg_crc_table()


def _ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _OGG_CRC[((crc >> 24) & 0xFF) ^ b]
    return crc


def ogg_meta(data: bytes, check_crc: bool = True) -> dict:
    """Walk Ogg pages -> dict(codec, channels, sample_rate, duration_s,
    n_pages, pre_skip).  Opus duration uses the 48 kHz granule minus
    pre-skip (RFC 7845); Vorbis granule counts samples at the stream
    rate.  Raises ValueError on malformed pages."""
    data = bytes(data)
    pos = 0
    n = len(data)
    n_pages = 0
    codec = None
    channels = rate = None
    pre_skip = 0
    last_granule = 0
    first_payload = True
    while pos + 27 <= n:
        if data[pos:pos + 4] != b"OggS":
            raise ValueError(f"bad Ogg capture pattern at {pos}")
        if data[pos + 4] != 0:
            raise ValueError("unsupported Ogg stream structure version")
        granule = int.from_bytes(data[pos + 6:pos + 14], "little",
                                 signed=True)
        want_crc = int.from_bytes(data[pos + 22:pos + 26], "little")
        nsegs = data[pos + 26]
        lace = data[pos + 27:pos + 27 + nsegs]
        if len(lace) < nsegs:
            raise ValueError("truncated Ogg lacing table")
        body_len = sum(lace)
        page_end = pos + 27 + nsegs + body_len
        if page_end > n:
            raise ValueError("truncated Ogg page body")
        if check_crc:
            page = bytearray(data[pos:page_end])
            page[22:26] = b"\x00\x00\x00\x00"
            if _ogg_crc(bytes(page)) != want_crc:
                raise ValueError("Ogg page CRC mismatch")
        payload = data[pos + 27 + nsegs:page_end]
        if first_payload and payload:
            first_payload = False
            if payload[:8] == b"OpusHead":
                codec = "opus"
                channels = payload[9]
                pre_skip = int.from_bytes(payload[10:12], "little")
                rate = 48000  # Opus always plays out at 48 kHz
            elif payload[:7] == b"\x01vorbis":
                codec = "vorbis"
                channels = payload[11]
                rate = int.from_bytes(payload[12:16], "little")
            else:
                codec = "unknown"
        if granule >= 0:
            last_granule = max(last_granule, granule)
        n_pages += 1
        pos = page_end
    if pos < n:
        raise ValueError("trailing bytes after last whole Ogg page "
                         "(truncated page header)")
    if n_pages == 0:
        raise ValueError("no Ogg pages")
    if codec == "opus":
        dur = max(0, last_granule - pre_skip) / 48000.0
    elif rate:
        dur = last_granule / float(rate)
    else:
        dur = 0.0
    return dict(codec=codec, channels=channels, sample_rate=rate,
                duration_s=dur, n_pages=n_pages, pre_skip=pre_skip)


def write_ogg(packets: list[bytes], serial: int = 1,
              granules: list[int] | None = None) -> bytes:
    """One packet per page (fixture shape), correct lacing + CRC.
    ``granules[i]`` stamps page i (default: page index)."""
    out = bytearray()
    for i, pkt in enumerate(packets):
        gran = granules[i] if granules else i
        htype = 2 if i == 0 else (4 if i == len(packets) - 1 else 0)
        lace = []
        rem = len(pkt)
        while rem >= 255:
            lace.append(255)
            rem -= 255
        lace.append(rem)
        hdr = bytearray(b"OggS\x00")
        hdr.append(htype)
        hdr += gran.to_bytes(8, "little", signed=True)
        hdr += serial.to_bytes(4, "little")
        hdr += i.to_bytes(4, "little")
        hdr += b"\x00\x00\x00\x00"  # crc placeholder
        hdr.append(len(lace))
        hdr += bytes(lace)
        page = bytes(hdr) + pkt
        crc = _ogg_crc(page)
        page = page[:22] + crc.to_bytes(4, "little") + page[26:]
        out += page
    return bytes(out)


def opus_head(channels: int = 2, pre_skip: int = 312,
              input_rate: int = 48000) -> bytes:
    return (b"OpusHead\x01" + bytes([channels])
            + pre_skip.to_bytes(2, "little")
            + input_rate.to_bytes(4, "little") + b"\x00\x00\x00")


def vorbis_id_header(channels: int = 2, rate: int = 44100) -> bytes:
    return (b"\x01vorbis" + (0).to_bytes(4, "little")
            + bytes([channels]) + rate.to_bytes(4, "little")
            + bytes(12) + b"\x01")
