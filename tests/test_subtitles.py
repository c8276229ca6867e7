"""Subtitle export (services/subtitles.py + /videos/{id}/subtitles).

Beyond the reference: transcripts export as standard WebVTT/SRT, and the SPA
player attaches the VTT as a native captions track.
"""
from __future__ import annotations

import pytest


class TestFormatters:
    SEGS = [
        {"span_start_ms": 0, "span_end_ms": 2000,
         "payload_json": {"text": "hello world"}},
        {"span_start_ms": 3_661_500, "span_end_ms": 3_663_000,
         "payload_json": {"text": "one hour in", "speaker": "SPEAKER_1"}},
        {"span_start_ms": 5000, "span_end_ms": 5000,   # zero-length span
         "payload_json": {"text": "point in time"}},
        {"span_start_ms": 9000, "span_end_ms": 9500,
         "payload_json": {"text": "   "}},              # empty -> dropped
    ]

    def test_vtt(self):
        from eioku_tpu.services.subtitles import to_vtt
        out = to_vtt(self.SEGS)
        assert out.startswith("WEBVTT\n")
        assert "00:00:00.000 --> 00:00:02.000" in out
        assert "01:01:01.500 --> 01:01:03.000" in out
        assert "SPEAKER_1: one hour in" in out
        # zero-length span gets a 1 s display window
        assert "00:00:05.000 --> 00:00:06.000" in out
        assert "point in time" in out
        assert out.count("-->") == 3  # blank text dropped
        # cues are ordered by start even though input isn't
        assert out.index("hello world") < out.index("point in time") \
            < out.index("one hour in")

    def test_srt(self):
        from eioku_tpu.services.subtitles import to_srt
        out = to_srt(self.SEGS)
        assert "00:00:00,000 --> 00:00:02,000" in out
        assert out.splitlines()[0] == "1"
        assert "WEBVTT" not in out

    def test_hostile_text_sanitized(self):
        """Blank lines would terminate a cue, '-->' parses as a timing line,
        '<'/'&' start VTT cue tags/entities — all must be neutralized."""
        from eioku_tpu.services.subtitles import to_srt, to_vtt
        segs = [{"span_start_ms": 0, "span_end_ms": 1000,
                 "payload_json": {"text": "foo\n\nbar --> baz <i>&x"}}]
        vtt = to_vtt(segs)
        body = [ln for ln in vtt.splitlines() if ln.startswith("foo")]
        assert body == ["foo bar → baz &lt;i>&amp;x"]
        assert vtt.count("-->") == 1  # only the timing line
        srt = to_srt(segs)
        assert "foo bar → baz <i>&x" in srt  # SRT: no entity escaping
        assert srt.count("-->") == 1


class TestEndpoint:
    def test_vtt_endpoint(self, client, ctx):
        import sys
        sys.path.insert(0, "tests")
        from test_api import seed_transcript, seed_video
        v = seed_video(ctx)
        seed_transcript(ctx, v.id)
        r = client.get(f"/api/v1/videos/{v.id}/subtitles")
        assert r.status_code == 200
        assert r.headers["content-type"].startswith("text/vtt")
        assert r.text.startswith("WEBVTT")
        assert "a red fox appears" in r.text
        assert "00:00:02.000 --> 00:00:04.000" in r.text

    def test_srt_download(self, client, ctx):
        import sys
        sys.path.insert(0, "tests")
        from test_api import seed_transcript, seed_video
        v = seed_video(ctx)
        seed_transcript(ctx, v.id)
        r = client.get(f"/api/v1/videos/{v.id}/subtitles?format=srt")
        assert r.status_code == 200
        assert "attachment" in r.headers.get("content-disposition", "")
        assert "00:00:02,000 --> 00:00:04,000" in r.text

    def test_language_filter_and_bad_format(self, client, ctx):
        import sys
        sys.path.insert(0, "tests")
        from test_api import seed_transcript, seed_video
        v = seed_video(ctx)
        seed_transcript(ctx, v.id)  # language "en"
        r = client.get(f"/api/v1/videos/{v.id}/subtitles?language=ja")
        assert r.status_code == 200
        assert "-->" not in r.text  # no ja segments
        assert client.get(
            f"/api/v1/videos/{v.id}/subtitles?format=ass").status_code == 422

    def test_spa_player_attaches_track(self, client):
        js = client.get("/static/app.js").text
        assert "subtitles?format=vtt" in js and 'kind = "captions"' in js


# reuse test_api's app fixtures
from test_api import client, ctx  # noqa: E402,F401
