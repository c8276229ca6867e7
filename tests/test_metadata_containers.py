"""Metadata parity across containers: MKV (EBML), AVI (RIFF), and MP4 camera
tags — the reference gets all of this from exiftool composites
(/root/reference/ml-service/src/services/metadata_extractor.py:17-54)."""
import struct

import numpy as np
import pytest

from eioku_tpu.ml import audio_io
from eioku_tpu.ml.metadata import extract_metadata


def _frames(n=30, w=160, h=120):
    out = np.zeros((n, h, w, 3), np.uint8)
    out[n // 2:] = 180
    return out


class TestMkv:
    @pytest.fixture(scope="class")
    def mkv(self, tmp_path_factory):
        if audio_io.native_decoder() is None:
            pytest.skip("native shim unavailable")
        p = str(tmp_path_factory.mktemp("mkv") / "clip.mkv")
        sr = 16000
        tone = (0.3 * np.sin(2 * np.pi * 440 * np.arange(sr * 3) / sr)
                ).astype(np.float32)
        audio_io.native_media_encode(p, _frames(), fps=10.0, samples=tone,
                                     sr=sr)
        return p

    def test_video_fields(self, mkv):
        meta = extract_metadata(mkv)
        assert meta["container"] == "mkv"
        assert meta["width"] == 160 and meta["height"] == 120
        assert meta["codec"] == "h264"
        assert 2500 <= meta["duration_ms"] <= 3500
        assert meta["create_date"] is not None

    def test_audio_fields(self, mkv):
        meta = extract_metadata(mkv)
        assert meta["audio_codec"] == "aac"
        assert meta["audio_sample_rate"] == 16000
        assert meta["audio_channels"] == 1

    def test_schema_valid(self, mkv):
        from eioku_tpu.domain.schema_registry import (
            SchemaRegistry,
            register_all_schemas,
        )
        register_all_schemas()
        SchemaRegistry.validate("video.metadata", 1, extract_metadata(mkv))


class TestAvi:
    @pytest.fixture(scope="class")
    def avi(self, tmp_path_factory):
        import cv2

        p = str(tmp_path_factory.mktemp("avi") / "clip.avi")
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"MJPG"), 12.0,
                            (160, 120))
        for f in _frames(36):
            w.write(f)
        w.release()
        return p

    def test_fields(self, avi):
        meta = extract_metadata(avi)
        assert meta["container"] == "avi"
        assert meta["width"] == 160 and meta["height"] == 120
        assert meta["fps"] == pytest.approx(12.0, abs=0.1)
        assert meta["codec"] == "mjpg"
        assert meta["duration_ms"] == pytest.approx(3000, abs=200)

    def test_opendml_dmlh_total_frames_wins(self, avi, tmp_path):
        """OpenDML (>1 GB) AVIs carry the REAL total frame count in the
        odml/dmlh extended header; the legacy avih counts only the first
        RIFF segment. A dmlh with a larger count must set the duration."""
        from eioku_tpu.ml.metadata import _parse_avi

        data = bytearray(open(avi, "rb").read(4 * 1024 * 1024))
        # append an odml LIST with a dmlh claiming 10x the frames
        dmlh = struct.pack("<4sI", b"dmlh", 4) + struct.pack("<I", 360)
        odml = struct.pack("<4sI", b"LIST", 4 + len(dmlh)) + b"odml" + dmlh
        out = {"extra": {}}
        _parse_avi(bytes(data) + odml, out)
        # 360 frames at 1/12 s -> ~30 s, not the avih's ~3 s
        assert out["duration_ms"] == pytest.approx(30000, rel=0.05)
        assert out["extra"]["frame_count"] == 360


def _box(t: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + t + body


def _intl_text(t: bytes, text: str) -> bytes:
    raw = text.encode()
    return _box(t, struct.pack(">HH", len(raw), 0x55C4) + raw)


class TestMp4CameraTags:
    def _mvhd(self) -> bytes:
        from eioku_tpu.ml.metadata import _MP4_EPOCH_OFFSET

        ctime = 1_600_000_000 + _MP4_EPOCH_OFFSET
        return _box(b"mvhd", b"\x00\x00\x00\x00"
                    + struct.pack(">IIII", ctime, ctime, 1000, 5000)
                    + b"\x00" * 80)

    def test_udta_quicktime_tags(self, tmp_path):
        """Android/QuickTime style: (C)mak / (C)mod / (C)xyz in moov>udta."""
        udta = _box(b"udta", _intl_text(b"\xa9mak", "Canon")
                    + _intl_text(b"\xa9mod", "EOS R5")
                    + _intl_text(b"\xa9xyz", "+35.6580+139.6994/"))
        moov = _box(b"moov", self._mvhd() + udta)
        p = tmp_path / "cam.mp4"
        p.write_bytes(_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov)
        meta = extract_metadata(str(p))
        assert meta["camera_make"] == "Canon"
        assert meta["camera_model"] == "EOS R5"
        assert meta["gps"] == {"latitude": 35.658, "longitude": 139.6994}
        assert meta["duration_ms"] == 5000
        assert meta["create_date"].startswith("2020-09-13")

    def test_iphone_meta_keys_ilst(self, tmp_path):
        """iPhone layout: moov>meta with keys + ilst (mdta scheme)."""
        def key_entry(name: bytes) -> bytes:
            return struct.pack(">I", 8 + len(name)) + b"mdta" + name

        names = [b"com.apple.quicktime.make", b"com.apple.quicktime.model",
                 b"com.apple.quicktime.location.ISO6709"]
        keys = _box(b"keys", b"\x00\x00\x00\x00"
                    + struct.pack(">I", len(names))
                    + b"".join(key_entry(n) for n in names))

        def ilst_item(idx: int, value: bytes) -> bytes:
            data = _box(b"data", struct.pack(">II", 1, 0) + value)
            return struct.pack(">I", 8 + len(data)) \
                + struct.pack(">I", idx) + data

        ilst = _box(b"ilst", ilst_item(1, b"Apple")
                    + ilst_item(2, b"iPhone 15 Pro")
                    + ilst_item(3, b"+37.3349-122.0090/"))
        meta_box = _box(b"meta", b"\x00\x00\x00\x00" + keys + ilst)
        moov = _box(b"moov", self._mvhd() + meta_box)
        p = tmp_path / "iphone.mov"
        p.write_bytes(_box(b"ftyp", b"qt  \x00\x00\x02\x00qt  ") + moov)
        meta = extract_metadata(str(p))
        assert meta["camera_make"] == "Apple"
        assert meta["camera_model"] == "iPhone 15 Pro"
        assert meta["gps"]["latitude"] == pytest.approx(37.3349)
        assert "_meta_keys" not in meta["extra"]

    def test_meta_hdlr_does_not_clobber_track_handler(self, tmp_path):
        """iPhone layout puts moov>meta AFTER the traks; the meta box's own
        hdlr child (b'mdta') must not overwrite the last trak's handler and
        wipe its video attribution (regression)."""
        tkhd = _box(b"tkhd", b"\x00" * 76
                    + struct.pack(">II", 160 << 16, 120 << 16))
        hdlr = _box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12)
        mdhd = _box(b"mdhd", b"\x00\x00\x00\x00"
                    + struct.pack(">IIII", 0, 0, 1000, 5000))
        stsd = _box(b"stsd", b"\x00" * 8 + _box(b"avc1", b"\x00" * 70))
        stbl = _box(b"stbl", stsd)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", tkhd + mdia)
        meta_hdlr = _box(b"hdlr", b"\x00" * 8 + b"mdta" + b"\x00" * 12)
        meta_box = _box(b"meta", b"\x00\x00\x00\x00" + meta_hdlr)
        moov = _box(b"moov", self._mvhd() + trak + meta_box)
        p = tmp_path / "clip.mov"
        p.write_bytes(_box(b"ftyp", b"qt  \x00\x00\x02\x00qt  ") + moov)
        meta = extract_metadata(str(p))
        assert meta["width"] == 160 and meta["height"] == 120
        assert meta["codec"] == "avc1"

    def test_quicktime_plain_meta_box(self, tmp_path):
        """QuickTime-brand meta is a plain box: children start immediately,
        no version/flags. Real iPhone .MOV files use this layout."""
        def key_entry(name: bytes) -> bytes:
            return struct.pack(">I", 8 + len(name)) + b"mdta" + name

        keys = _box(b"keys", b"\x00\x00\x00\x00" + struct.pack(">I", 1)
                    + key_entry(b"com.apple.quicktime.model"))
        data = _box(b"data", struct.pack(">II", 1, 0) + b"iPhone 12")
        ilst = _box(b"ilst", struct.pack(">I", 8 + len(data))
                    + struct.pack(">I", 1) + data)
        hdlr = _box(b"hdlr", b"\x00" * 8 + b"mdta" + b"\x00" * 12)
        meta_box = _box(b"meta", hdlr + keys + ilst)  # NO version/flags
        moov = _box(b"moov", self._mvhd() + meta_box)
        p = tmp_path / "qt.mov"
        p.write_bytes(_box(b"ftyp", b"qt  \x00\x00\x02\x00qt  ") + moov)
        meta = extract_metadata(str(p))
        assert meta["camera_model"] == "iPhone 12"

    def test_day_tag_wins_over_zero_mvhd_ctime(self, tmp_path):
        """mvhd ctime=0 (encoder omitted it) must not mask a udta (C)day."""
        mvhd = _box(b"mvhd", b"\x00\x00\x00\x00"
                    + struct.pack(">IIII", 0, 0, 1000, 5000) + b"\x00" * 80)
        udta = _box(b"udta", _intl_text(b"\xa9day", "2021-07-04T12:00:00Z"))
        moov = _box(b"moov", mvhd + udta)
        p = tmp_path / "day.mp4"
        p.write_bytes(_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov)
        meta = extract_metadata(str(p))
        assert meta["create_date"] == "2021-07-04T12:00:00Z"
        assert "create_date_source" not in meta["extra"]


def _ebml_elem(eid: int, body: bytes) -> bytes:
    assert len(body) < 0x7F
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big") \
        + bytes([0x80 | len(body)]) + body


def _simple_tag(name: bytes, value: bytes) -> bytes:
    return _ebml_elem(0x67C8, _ebml_elem(0x45A3, name)
                      + _ebml_elem(0x4487, value))


class TestMkvCameraTags:
    def test_tags_simpletag_make_model_date(self, tmp_path):
        """Phones/muxers writing Matroska carry camera identity as
        Tags>Tag>SimpleTag MAKE/MODEL (ffmpeg -metadata emits the same) and
        the recording date as DATE_RECORDED."""
        tags = _ebml_elem(
            0x1254C367,
            _ebml_elem(0x7373, _simple_tag(b"MAKE", b"GoPro")
                       + _simple_tag(b"MODEL", b"HERO12 Black")))
        tags2 = _ebml_elem(
            0x1254C367,
            _ebml_elem(0x7373, _simple_tag(b"DATE_RECORDED",
                                           b"2023-11-05T09:30:00Z")))
        tscale = _ebml_elem(0x2AD7B1, (1_000_000).to_bytes(3, "big"))
        dur = _ebml_elem(0x4489, struct.pack(">d", 4000.0))
        info = _ebml_elem(0x1549A966, tscale + dur)
        segment = (0x18538067).to_bytes(4, "big") + b"\xff" \
            + info + tags + tags2
        header = _ebml_elem(0x1A45DFA3, _ebml_elem(0x4282, b"matroska"))
        p = tmp_path / "cam.mkv"
        p.write_bytes(header + segment)
        meta = extract_metadata(str(p))
        assert meta["camera_make"] == "GoPro"
        assert meta["camera_model"] == "HERO12 Black"
        assert meta["create_date"] == "2023-11-05T09:30:00Z"
        assert "create_date_source" not in meta["extra"]

    def test_nested_simpletag_and_encoder(self, tmp_path):
        """SimpleTags can nest; the walk must apply both levels. ENCODER
        feeds writing_app without clobbering a Segment-level one."""
        nested = _ebml_elem(0x67C8, _ebml_elem(0x45A3, b"MODEL")
                            + _ebml_elem(0x4487, b"Pixel 8")
                            + _simple_tag(b"ENCODER", b"android-mkv"))
        tags = _ebml_elem(0x1254C367, _ebml_elem(0x7373, nested))
        segment = (0x18538067).to_bytes(4, "big") + b"\xff" + tags
        header = _ebml_elem(0x1A45DFA3, _ebml_elem(0x4282, b"matroska"))
        p = tmp_path / "nested.mkv"
        p.write_bytes(header + segment)
        meta = extract_metadata(str(p))
        assert meta["camera_model"] == "Pixel 8"
        assert meta["extra"]["writing_app"] == "android-mkv"


class TestAviInfoChunks:
    def _chunk(self, fourcc: bytes, body: bytes) -> bytes:
        return struct.pack("<4sI", fourcc, len(body)) + body \
            + (b"\x00" if len(body) & 1 else b"")

    def test_info_list_software_and_icrd_date(self, tmp_path):
        info = self._chunk(b"ISFT", b"CanonMVI06\x00") \
            + self._chunk(b"ICRD", b"2008-08-18\x00")
        lst = struct.pack("<4sI", b"LIST", 4 + len(info)) + b"INFO" + info
        from eioku_tpu.ml.metadata import _parse_avi

        out = {"extra": {}}
        _parse_avi(b"RIFF" + struct.pack("<I", 4 + len(lst)) + b"AVI " + lst,
                   out)
        assert out["extra"]["writing_app"] == "CanonMVI06"
        assert out["create_date"].startswith("2008-08-18")

    def test_idit_ctime_date_in_hdrl(self, tmp_path):
        """Camera firmwares put IDIT (ctime format, case varies) inside the
        hdrl LIST; it must be picked up wherever it appears."""
        idit = self._chunk(b"IDIT", b"MON AUG 18 10:00:00 2008\n\x00")
        hdrl = struct.pack("<4sI", b"LIST", 4 + len(idit)) + b"hdrl" + idit
        from eioku_tpu.ml.metadata import _parse_avi

        out = {"extra": {}}
        _parse_avi(b"RIFF" + struct.pack("<I", 4 + len(hdrl)) + b"AVI "
                   + hdrl, out)
        assert out["create_date"] == "2008-08-18T10:00:00"

    def test_riff_date_formats(self):
        from eioku_tpu.ml.metadata import _parse_riff_date

        assert _parse_riff_date("2008-08-18") == "2008-08-18T00:00:00"
        assert _parse_riff_date("Mon Aug 18 10:00:00 2008") == \
            "2008-08-18T10:00:00"
        assert _parse_riff_date("not a date") is None
        assert _parse_riff_date("") is None


class TestEbmlUnknownSize:
    def test_short_unknown_size_vints(self, tmp_path):
        """Live-recorded MKVs mark Segment/Cluster unknown-size with SHORT
        all-ones vints (0xFF), not just the 8-byte form."""
        def vint_size(n: int) -> bytes:
            return bytes([0x80 | n])  # 1-byte size, value n < 0x7F

        def elem(eid: int, body: bytes) -> bytes:
            return eid.to_bytes((eid.bit_length() + 7) // 8, "big") \
                + vint_size(len(body)) + body

        tscale = elem(0x2AD7B1, (1_000_000).to_bytes(3, "big"))
        dur = elem(0x4489, struct.pack(">d", 4000.0))
        info = elem(0x1549A966, tscale + dur)
        # Segment with 1-byte unknown-size marker 0xFF (all data bits set)
        segment = (0x18538067).to_bytes(4, "big") + b"\xff" + info
        header = elem(0x1A45DFA3, elem(0x4282, b"matroska"))
        p = tmp_path / "live.mkv"
        p.write_bytes(header + segment)
        meta = extract_metadata(str(p))
        assert meta["duration_ms"] == 4000
