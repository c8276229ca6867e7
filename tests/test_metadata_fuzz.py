"""Fuzz the hand-written container parsers (ISO-BMFF / EBML / RIFF).

The reference shells out to exiftool/ffprobe for metadata
(ml-service/src/services/metadata_extractor.py:17-54); here the parsers are
first-party (eioku_tpu/ml/metadata.py) and run on untrusted user files, so
they must (a) never raise out of extract_metadata, (b) never hang — every
loop must make progress even on adversarial sizes/vints — and (c) always
return the dict contract. Hypothesis drives random headers, random tails
after each container magic, and byte-level mutations/truncations of valid
files from all three families. A SIGALRM hard deadline converts a
non-progressing parser loop into a test failure instead of a hung suite.
"""
from __future__ import annotations

import signal
import struct

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from eioku_tpu.ml import metadata


@pytest.fixture(autouse=True)
def _no_cv2_fallback(monkeypatch):
    """Garbage files always fall through to the cv2 probe; stub it so the
    fuzz exercises the first-party parsers, not OpenCV's demuxers."""
    monkeypatch.setattr(metadata, "_cv2_fallback", lambda path, out: None)


class _Alarm:
    """Hard per-example deadline: a parser loop that stops making progress
    raises here instead of hanging pytest."""

    def __init__(self, seconds: int = 20):
        self.seconds = seconds

    def __enter__(self):
        def _fire(signum, frame):
            raise AssertionError("parser exceeded hard deadline (hang)")

        self._old = signal.signal(signal.SIGALRM, _fire)
        signal.alarm(self.seconds)

    def __exit__(self, *exc):
        signal.alarm(0)
        signal.signal(signal.SIGALRM, self._old)


def _run(tmp_path, payload: bytes) -> dict:
    p = tmp_path / "fuzz.bin"
    p.write_bytes(payload)
    with _Alarm():
        out = metadata.extract_metadata(str(p))
    assert isinstance(out, dict)
    return out


# ---------------------------------------------------------------- builders
# minimal VALID files per family (mutations of these reach deep branches)


def _box(t: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + t + body


def _valid_mp4() -> bytes:
    mvhd = _box(b"mvhd", bytes(4) + struct.pack(">IIII", 0, 0, 1000, 3000)
                + bytes(80))
    hdlr = _box(b"hdlr", bytes(8) + b"vide" + bytes(12))
    tkhd = _box(b"tkhd", bytes(76) + struct.pack(">II", 320 << 16, 240 << 16))
    trak = _box(b"trak", tkhd + _box(b"mdia", hdlr))
    udta = _box(b"udta", _box(b"\xa9mak", struct.pack(">HH", 5, 0) + b"Apple"))
    return (_box(b"ftyp", b"isom" + bytes(8))
            + _box(b"moov", mvhd + trak + udta))


def _ebml(eid: int, body: bytes) -> bytes:
    enc = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    n = len(body)
    if n < 127:
        return enc + bytes([0x80 | n]) + body
    return enc + bytes([0x40 | (n >> 8), n & 0xFF]) + body  # n < 0x3FFF


def _valid_mkv() -> bytes:
    info = _ebml(0x1549A966, _ebml(0x2AD7B1, struct.pack(">I", 1000000))
                 + _ebml(0x4489, struct.pack(">d", 2000.0)))
    video = _ebml(0xE0, _ebml(0xB0, b"\x01\x40") + _ebml(0xBA, b"\x00\xF0"))
    track = _ebml(0xAE, _ebml(0x83, b"\x01") + _ebml(0x86, b"V_VP9") + video)
    seg = _ebml(0x18538067, info + _ebml(0x1654AE6B, track))
    return _ebml(0x1A45DFA3, _ebml(0x4282, b"matroska")) + seg


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    if len(body) % 2:
        body += b"\x00"
    return fourcc + struct.pack("<I", len(body)) + body


def _valid_avi() -> bytes:
    avih = _chunk(b"avih", struct.pack("<14I", 33333, 0, 0, 0, 60, 0, 1, 0,
                                       320, 240, 0, 0, 0, 0))
    strh = _chunk(b"strh", b"vids" + b"VP80" + bytes(12)
                  + struct.pack("<II", 1, 30) + bytes(28))
    strl = b"LIST" + struct.pack("<I", 4 + len(strh)) + b"strl" + strh
    hdrl_body = b"hdrl" + avih + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    return b"RIFF" + struct.pack("<I", 4 + len(hdrl)) + b"AVI " + hdrl


_MAGICS = [
    _box(b"ftyp", b"isom" + bytes(8))[:12],  # ISO-BMFF
    bytes.fromhex("1A45DFA3"),               # EBML / Matroska
    b"RIFF\xff\xff\x00\x00AVI ",             # RIFF AVI
]


# ---------------------------------------------------------------- fuzz


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(prefix=st.sampled_from(_MAGICS), tail=st.binary(max_size=2048))
def test_magic_plus_random_tail(tmp_path, prefix, tail):
    _run(tmp_path, prefix + tail)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(payload=st.binary(max_size=512))
def test_pure_garbage(tmp_path, payload):
    _run(tmp_path, payload)


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(base=st.sampled_from([_valid_mp4(), _valid_mkv(), _valid_avi()]),
       edits=st.lists(st.tuples(st.integers(0, 10_000), st.integers(0, 255)),
                      max_size=8),
       cut=st.integers(0, 10_000))
def test_mutated_valid_files(tmp_path, base, edits, cut):
    """Byte substitutions + truncation of valid files: corrupt sizes/vints/
    fourccs must degrade to partial or empty metadata, never hang or raise."""
    buf = bytearray(base)
    for pos, val in edits:
        buf[pos % len(buf)] = val
    payload = bytes(buf)[: max(1, cut % (len(buf) + 1))]
    _run(tmp_path, payload)


def test_valid_files_still_parse(tmp_path):
    """The fuzz builders themselves are in-contract: each family yields its
    core fields (guards against builders drifting from the parsers)."""
    mp4 = _run(tmp_path, _valid_mp4())
    assert mp4.get("duration_ms") == 3000
    assert mp4.get("camera_make") == "Apple"
    assert (mp4.get("width"), mp4.get("height")) == (320, 240)
    mkv = _run(tmp_path, _valid_mkv())
    assert mkv.get("duration_ms") == 2000
    assert (mkv.get("width"), mkv.get("height")) == (320, 240)
    avi = _run(tmp_path, _valid_avi())
    assert (avi.get("width"), avi.get("height")) == (320, 240)
    assert avi.get("fps") == 30.0
    assert avi.get("duration_ms") == 1999  # 60 frames * 33333 us


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(sizes=st.lists(st.sampled_from([0, 1, 7, 8, 0xFFFFFFFF]), min_size=1,
                      max_size=6))
def test_adversarial_box_sizes(tmp_path, sizes):
    """Box size fields that historically cause non-progress: 0 ("to end of
    file" in ISO-BMFF), 1 (64-bit largesize), sub-header sizes, and huge."""
    body = b""
    for s in sizes:
        body += struct.pack(">I", s) + b"moov"
    _run(tmp_path, _box(b"ftyp", b"isom" + bytes(8)) + body)
