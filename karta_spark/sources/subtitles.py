"""SRT / WebVTT subtitle parsing — the text layer of video corpora.

Subtitle files pair video with aligned transcripts (the classic
weak-supervision source for speech and video-language training).
Both formats are line-oriented and fully deterministic:

- **SRT**: blocks of ``index / HH:MM:SS,mmm --> HH:MM:SS,mmm /
  text...`` separated by blank lines.
- **WebVTT**: ``WEBVTT`` header, optional cue identifiers, ``.``
  instead of ``,`` in timestamps, optional hour field, NOTE/STYLE
  blocks skipped, inline ``<c>``/``<i>`` tags stripped.

``parse_subtitles`` sniffs the format; cue text is whitespace-
normalized with tags removed.  Raises ValueError on malformed input
(the uniform contract).
"""

from __future__ import annotations

import re

_TS_RE = re.compile(
    r"(?:(\d{1,2}):)?(\d{1,2}):(\d{1,2})[.,](\d{3})")


def _ts_ms(m) -> int:
    h = int(m.group(1) or 0)
    return ((h * 60 + int(m.group(2))) * 60 + int(m.group(3))) * 1000 \
        + int(m.group(4))


def _cue_text(lines: list[str]) -> str:
    txt = " ".join(lines)
    txt = re.sub(r"<[^>]*>", "", txt)  # <i>, <c.color>, <v Name> tags
    return " ".join(txt.split())


def parse_subtitles(data: bytes | str) -> list[dict]:
    """-> [{"idx", "start_ms", "end_ms", "text"}] in cue order."""
    if isinstance(data, (bytes, bytearray)):
        text = bytes(data).decode("utf-8-sig", "replace")
    else:
        text = data
    text = text.replace("\r\n", "\n").replace("\r", "\n")
    is_vtt = text.lstrip().startswith("WEBVTT")
    cues: list[dict] = []
    blocks = re.split(r"\n\s*\n", text.strip())
    for block in blocks:
        lines = [ln for ln in block.split("\n") if ln.strip() != ""]
        if not lines:
            continue
        head = lines[0].strip()
        if is_vtt and (head == "WEBVTT" or head.startswith("WEBVTT ")
                       or head.startswith(("NOTE", "STYLE", "REGION"))):
            continue
        # find the timing line (first line containing '-->')
        t_idx = next((i for i, ln in enumerate(lines) if "-->" in ln),
                     None)
        if t_idx is None:
            if is_vtt:
                continue  # stray identifier-only block
            raise ValueError(f"SRT block without timing line: {head!r}")
        times = _TS_RE.findall(lines[t_idx])
        m = list(_TS_RE.finditer(lines[t_idx]))
        if len(m) < 2:
            raise ValueError(f"bad timing line: {lines[t_idx]!r}")
        start, end = _ts_ms(m[0]), _ts_ms(m[1])
        if end < start:
            raise ValueError(f"cue ends before it starts: "
                             f"{lines[t_idx]!r}")
        del times
        cues.append({"idx": len(cues),
                     "start_ms": start, "end_ms": end,
                     "text": _cue_text(lines[t_idx + 1:])})
    if not cues:
        raise ValueError("no subtitle cues found")
    return cues


def write_srt(cues: list[tuple[int, int, str]]) -> bytes:
    """Fixture writer: [(start_ms, end_ms, text)] -> SRT bytes."""
    def fmt(ms):
        s, ms = divmod(ms, 1000)
        m, s = divmod(s, 60)
        h, m = divmod(m, 60)
        return f"{h:02d}:{m:02d}:{s:02d},{ms:03d}"

    out = []
    for k, (a, b, t) in enumerate(cues, start=1):
        out.append(f"{k}\n{fmt(a)} --> {fmt(b)}\n{t}\n")
    return "\n".join(out).encode("utf-8")


def write_vtt(cues: list[tuple[int, int, str]]) -> bytes:
    def fmt(ms):
        s, ms = divmod(ms, 1000)
        m, s = divmod(s, 60)
        h, m = divmod(m, 60)
        return f"{h:02d}:{m:02d}:{s:02d}.{ms:03d}"

    out = ["WEBVTT\n"]
    for a, b, t in cues:
        out.append(f"{fmt(a)} --> {fmt(b)}\n{t}\n")
    return "\n".join(out).encode("utf-8")


def subtitles_distributed(docs, bytes_col: str = "content",
                          id_col: str = "sub_id"):
    """Arrow-batched cue extraction, robust err-row contract."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for sid, blob in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    for c in parse_subtitles(bytes(blob)):
                        rows.append((sid, c["idx"], c["start_ms"],
                                     c["end_ms"], c["text"], None))
                except ValueError as exc:
                    rows.append((sid, -1, 0, 0, None, str(exc)))
            yield pd.DataFrame(rows, columns=[
                "sub_id", "cue", "start_ms", "end_ms", "text", "err"])

    return docs.mapInPandas(
        run, "sub_id long, cue int, start_ms long, end_ms long, "
             "text string, err string")
