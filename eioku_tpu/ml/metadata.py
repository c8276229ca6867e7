"""Container metadata extraction: first-party ISO BMFF (MP4/MOV) box parser.

Capability parity: /root/reference/ml-service/src/services/metadata_extractor.py:13-221,
which shells out to exiftool for 16 composite fields (duration, geometry, codec,
creation date, GPS, camera make/model). exiftool does not exist in this
environment, so this module walks the MP4 box tree directly: mvhd (duration,
creation time), tkhd/stsd (geometry, codecs), stts (frame count -> fps), udta
(C) xyz (ISO 6709 GPS), and falls back to a cv2 probe for non-MP4 containers.
I/O-bound, stays on host (SURVEY.md component table).
"""
from __future__ import annotations

import datetime as _dt
import logging
import os
import re
import struct

log = logging.getLogger(__name__)

_CONTAINER_BOXES = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"udta", b"edts"}
# seconds between 1904-01-01 (MP4 epoch) and 1970-01-01 (unix epoch)
_MP4_EPOCH_OFFSET = 2082844800


def _iter_boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        size, = struct.unpack(">I", data[pos:pos + 4])
        box_type = data[pos + 4:pos + 8]
        header = 8
        if size == 1:  # 64-bit size
            if pos + 16 > end:
                return
            size, = struct.unpack(">Q", data[pos + 8:pos + 16])
            header = 16
        elif size == 0:  # to end of file
            size = end - pos
        if size < header or pos + size > end:
            return
        yield box_type, pos + header, pos + size
        pos += size


def _walk(data: bytes, start: int, end: int, path: tuple = ()):
    for box_type, body_start, body_end in _iter_boxes(data, start, end):
        yield path + (box_type,), body_start, body_end
        if box_type in _CONTAINER_BOXES:
            yield from _walk(data, body_start, body_end, path + (box_type,))


def _mp4_time(seconds_since_1904: int) -> str | None:
    unix = seconds_since_1904 - _MP4_EPOCH_OFFSET
    if unix <= 0:
        return None
    return _dt.datetime.fromtimestamp(unix, _dt.timezone.utc).isoformat()


def _parse_iso6709(s: str) -> dict | None:
    m = re.match(r"([+-]\d+(?:\.\d+)?)([+-]\d+(?:\.\d+)?)([+-]\d+(?:\.\d+)?)?", s)
    if not m:
        return None
    out = {"latitude": float(m.group(1)), "longitude": float(m.group(2))}
    if m.group(3):
        out["altitude"] = float(m.group(3))
    if not (-90 <= out["latitude"] <= 90 and -180 <= out["longitude"] <= 180):
        return None
    return out


def extract_metadata(path: str) -> dict:
    """Return a MetadataV1-shaped payload dict for a video file."""
    out: dict = {"container": os.path.splitext(path)[1].lstrip(".").lower() or None,
                 "extra": {}}
    try:
        with open(path, "rb") as f:
            data = _read_top_level_boxes(f, os.path.getsize(path))
        _parse_mp4(data, out)
    except Exception:
        log.exception("mp4 parse failed", extra={"path": path})
    if out.get("duration_ms") is None or out.get("width") is None:
        _cv2_fallback(path, out)
    if out.get("create_date") is None:
        mtime = os.path.getmtime(path)
        out["create_date"] = _dt.datetime.fromtimestamp(
            mtime, _dt.timezone.utc).isoformat()
        out["extra"]["create_date_source"] = "file_mtime"
    return out


def _read_top_level_boxes(f, filesize: int,
                          max_bytes: int = 256 * 1024 * 1024) -> bytes:
    """Collect every top-level box EXCEPT mdat by seeking through the file.

    Media payloads routinely dwarf any fixed read window (the common
    non-faststart layout puts a multi-GB mdat before the tail moov), so the
    only reliable way to reach moov is to skip mdat via its header size.
    Complete top-level boxes concatenate into a valid box stream for
    _parse_mp4/_walk.
    """
    import struct as _struct

    chunks: list[bytes] = []
    collected = 0
    pos = 0
    while pos + 8 <= filesize and collected < max_bytes:
        f.seek(pos)
        hdr = f.read(16)
        if len(hdr) < 8:
            break
        size, = _struct.unpack(">I", hdr[:4])
        box_type = hdr[4:8]
        hdr_len = 8
        if size == 1 and len(hdr) >= 16:  # 64-bit largesize
            size, = _struct.unpack(">Q", hdr[8:16])
            hdr_len = 16
        elif size == 0:  # box extends to EOF
            size = filesize - pos
        if size < hdr_len:
            break
        if box_type != b"mdat" and size <= max_bytes - collected:
            f.seek(pos)
            chunk = f.read(min(size, filesize - pos))
            chunks.append(chunk)
            collected += len(chunk)
        pos += size
    return b"".join(chunks)


def _parse_mp4(data: bytes, out: dict) -> None:
    # Box order inside mdia is unspecified (mdhd usually precedes hdlr), so
    # collect per-track state first and resolve handler types afterwards.
    tracks: list[dict] = []
    current: dict | None = None
    for path, s, e in _walk(data, 0, len(data)):
        box = path[-1]
        body = data[s:e]
        if box == b"trak":
            current = {}
            tracks.append(current)
            continue
        if box == b"mvhd" and len(body) >= 20:
            version = body[0]
            if version == 1:
                ctime, _, tscale, dur = struct.unpack(">QQIQ", body[4:32])
            else:
                ctime, _, tscale, dur = struct.unpack(">IIII", body[4:20])
            if tscale:
                out["duration_ms"] = int(dur / tscale * 1000)
            out["create_date"] = _mp4_time(ctime)
        elif box == b"\xa9xyz" and len(body) >= 4:
            str_len, = struct.unpack(">H", body[0:2])
            gps = _parse_iso6709(body[4:4 + str_len].decode("latin-1", "replace"))
            if gps:
                out["gps"] = gps
        elif current is not None:
            if box == b"tkhd" and len(body) >= 84:
                version = body[0]
                off = 88 if version == 1 else 76
                if len(body) >= off + 8:
                    w, h = struct.unpack(">II", body[off:off + 8])
                    current["width"], current["height"] = w >> 16, h >> 16
            elif box == b"hdlr" and len(body) >= 12:
                current["handler"] = body[8:12]
            elif box == b"mdhd" and len(body) >= 20:
                version = body[0]
                if version == 1:
                    _, _, tscale, dur = struct.unpack(">QQIQ", body[4:32])
                else:
                    _, _, tscale, dur = struct.unpack(">IIII", body[4:20])
                current["timescale"], current["duration_units"] = tscale, dur
            elif box == b"stsd" and len(body) >= 16:
                current["format"] = body[12:16].decode("latin-1")
                current["stsd_body"] = body[:64]
            elif box == b"stts" and len(body) >= 8:
                n_entries, = struct.unpack(">I", body[4:8])
                total = 0
                for i in range(min(n_entries, 10000)):
                    off = 8 + i * 8
                    if off + 8 > len(body):
                        break
                    count, _delta = struct.unpack(">II", body[off:off + 8])
                    total += count
                current["sample_count"] = total

    for t in tracks:
        handler = t.get("handler")
        if handler == b"vide":
            if t.get("width") and out.get("width") is None:
                out["width"], out["height"] = t["width"], t["height"]
            if out.get("codec") is None and t.get("format"):
                out["codec"] = t["format"]
            fc, ts, du = t.get("sample_count"), t.get("timescale"), t.get(
                "duration_units")
            if fc:
                out["extra"]["frame_count"] = fc
            if fc and ts and du and du > 0:
                out["fps"] = round(fc / (du / ts), 3)
        elif handler == b"soun":
            if t.get("format"):
                out["audio_codec"] = t["format"]
            body = t.get("stsd_body", b"")
            # sample entry: 16 stsd hdr + 8 reserved + 2 ch + 2 bits + 4 + 4 rate16.16
            if len(body) >= 16 + 28:
                ch, = struct.unpack(">H", body[16 + 16:16 + 18])
                rate, = struct.unpack(">I", body[16 + 24:16 + 28])
                out["audio_channels"] = ch
                out["audio_sample_rate"] = rate >> 16


def _cv2_fallback(path: str, out: dict) -> None:
    try:
        from eioku_tpu.ml.video_io import probe
        info = probe(path)
        out.setdefault("width", info.width or None)
        out.setdefault("height", info.height or None)
        if out.get("fps") is None and info.fps:
            out["fps"] = round(info.fps, 3)
        if out.get("duration_ms") is None and info.duration_ms:
            out["duration_ms"] = info.duration_ms
        out["extra"].setdefault("frame_count", info.frame_count)
    except Exception:
        log.warning("cv2 metadata fallback failed", extra={"path": path})
