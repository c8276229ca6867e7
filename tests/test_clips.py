"""Clip export (services/clips.py + /videos/{id}/clip).

Native stream-copy remux with cv2 re-encode fallback; cut points snap to
the keyframe at-or-before start_ms, like every copy-based cutter.
"""
from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "tests")
from test_api import client, ctx, seed_video  # noqa: E402,F401
from test_ml_pipeline import write_video  # noqa: E402


@pytest.fixture()
def clip_video(tmp_path):
    path = str(tmp_path / "src.mp4")
    write_video(path, [(30, (20, 40, 60)), (30, (200, 100, 30))],
                fps=10, size=(64, 64))  # 6 s, scene change at 3 s
    return path


class TestExport:
    def test_export_and_probe(self, clip_video, tmp_path):
        from eioku_tpu.ml.video_io import probe
        from eioku_tpu.services.clips import export_clip
        dst = str(tmp_path / "clip.mp4")
        assert export_clip(clip_video, dst, 2000, 4000)
        assert os.path.getsize(dst) > 0
        info = probe(dst)
        # cut snaps to the keyframe at-or-before 2 s, so the clip covers AT
        # LEAST the requested 2 s and at most the whole 6 s source
        assert 1.5 <= info.frame_count / (info.fps or 10) <= 6.5
        assert info.width == 64 and info.height == 64

    def test_av_remux_keeps_audio(self, tmp_path):
        """Stream-copy on an H.264+AAC source: both streams survive the cut
        and the clip's audio still decodes (tone energy present)."""
        import numpy as np

        from eioku_tpu.ml import audio_io
        if audio_io.native_decoder() is None:
            pytest.skip("native shim unavailable")
        src = str(tmp_path / "av.mp4")
        sr = 16000
        t = np.arange(sr * 6) / sr
        tone = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        frames = np.zeros((60, 64, 64, 3), np.uint8)
        frames[30:] = 200
        audio_io.native_media_encode(src, frames, fps=10.0, samples=tone,
                                     sr=sr)
        from eioku_tpu.services.clips import export_clip
        dst = str(tmp_path / "clip.mp4")
        assert export_clip(src, dst, 2000, 4000)
        clip_audio = audio_io.native_decode(dst)
        assert clip_audio is not None
        assert len(clip_audio) > sr  # >1 s of audio made it into the clip
        assert float(np.abs(clip_audio).mean()) > 0.05  # the tone, not silence
        # A/V sync: the source's dark->bright switch is at 3.0 s with the
        # tone continuous. Both streams rebase by ONE origin (the snapped
        # keyframe), so audio must not exceed the video span by more than a
        # frame or two — per-stream rebase (the reviewed bug) would make
        # audio 2 s longer than video
        from eioku_tpu.ml.video_io import probe
        info = probe(dst)
        video_s = info.frame_count / (info.fps or 10)
        audio_s = len(clip_audio) / 16000
        assert abs(audio_s - video_s) < 0.75, (audio_s, video_s)

    def test_invalid_span(self, clip_video, tmp_path):
        from eioku_tpu.services.clips import export_clip
        assert export_clip(clip_video, str(tmp_path / "x.mp4"),
                           4000, 4000) is False

    def test_cache_roundtrip(self, clip_video):
        from eioku_tpu.services.clips import clip_path
        p1 = clip_path(clip_video, "h123", 1000, 3000)
        assert p1 and os.path.isfile(p1)
        mtime = os.path.getmtime(p1)
        p2 = clip_path(clip_video, "h123", 1000, 3000)
        assert p2 == p1  # cache hit, no re-render
        assert os.path.getmtime(p2) >= mtime

    def test_reencode_fallback(self, clip_video, tmp_path, monkeypatch):
        """Without the native shim the cv2 re-encode path still cuts."""
        from eioku_tpu.services import clips
        monkeypatch.setattr("eioku_tpu.ml.audio_io.native_decoder",
                            lambda: None)
        dst = str(tmp_path / "fallback.mp4")
        assert clips.export_clip(clip_video, dst, 1000, 3000)
        assert os.path.getsize(dst) > 0


class TestEndpoint:
    def test_clip_download(self, client, ctx, clip_video):
        v = seed_video(ctx, path=clip_video)
        r = client.get(f"/api/v1/videos/{v.id}/clip?start_ms=1000&end_ms=3000")
        assert r.status_code == 200
        assert len(r.content) > 0
        # inline lets the browser play the clip; filename names the download
        assert 'filename="src_1000_3000' in r.headers.get(
            "content-disposition", "")

    def test_validation(self, client, ctx, clip_video):
        v = seed_video(ctx, path=clip_video)
        url = f"/api/v1/videos/{v.id}/clip"
        assert client.get(url).status_code == 422  # end_ms required
        assert client.get(url + "?start_ms=5&end_ms=5").status_code == 422
        assert client.get(
            url + "?start_ms=0&end_ms=999999999").status_code == 422

    def test_missing_file(self, client, ctx):
        v = seed_video(ctx)  # /tmp/nonexistent.mp4
        r = client.get(f"/api/v1/videos/{v.id}/clip?start_ms=0&end_ms=1000")
        assert r.status_code == 404
