"""End-to-end pipeline tests on synthetic videos (CPU JAX backend).

This is the integration layer the reference never had in CI (its ml-service was
untested end-to-end, SURVEY.md section 4): a tiny video runs discovery -> queue ->
worker -> engine -> artifacts -> projections -> API queries, with a fake queue
nowhere in sight.
"""
import asyncio

import cv2
import numpy as np
import pytest

from eioku_tpu.api.app import build_context
from eioku_tpu.config.settings import AppConfig
from eioku_tpu.db.connection import Database
from eioku_tpu.domain.models import TaskStatus


def write_video(path: str, segments: list[tuple[int, tuple[int, int, int]]],
                fps: int = 10, size=(64, 64)) -> None:
    """Write an mp4 of solid-color segments: [(n_frames, (r,g,b)), ...]."""
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, size)
    assert w.isOpened()
    rng = np.random.default_rng(0)
    for n_frames, (r, g, b) in segments:
        base = np.zeros((size[1], size[0], 3), np.uint8)
        base[:, :] = (b, g, r)  # BGR for cv2
        for _ in range(n_frames):
            noisy = base.astype(np.int16) + rng.integers(-4, 5, base.shape)
            w.write(np.clip(noisy, 0, 255).astype(np.uint8))
    w.release()


@pytest.fixture()
def scene_video(tmp_path):
    path = str(tmp_path / "scenes.mp4")
    # 3 visually distinct scenes: dark red 2s, bright green 3s, blue 2s @ 10fps
    write_video(path, [(20, (120, 0, 0)), (30, (30, 220, 30)), (20, (10, 10, 230))])
    return path


class TestNativeDecode:
    def test_matches_cv2_path(self, tmp_path, monkeypatch):
        """The native decoder must sample the same frames with the same
        indices/timestamps as the cv2 path, at full and resized geometry."""
        from eioku_tpu.ml import video_io
        if video_io.native_video_lib() is None:
            pytest.skip("native video decoder unavailable in this image")
        path = str(tmp_path / "v.mp4")
        write_video(path, [(25, (200, 30, 30)), (30, (30, 200, 30))])

        def collect(native, resize):
            monkeypatch.setenv("EIOKU_NATIVE_DECODE", "1" if native else "0")
            out = []
            for b in video_io.iter_frame_batches(
                    path, batch_size=8, frame_interval_s=0.3,
                    resize_hw=resize, decode_threads=1):
                for s in range(b.valid):
                    out.append((int(b.frame_indices[s]),
                                int(b.timestamps_ms[s]),
                                b.frames[s].astype(np.int32)))
            return out

        for resize in (None, (48, 64)):
            ref = collect(False, resize)
            nat = collect(True, resize)
            assert [x[:2] for x in ref] == [x[:2] for x in nat]
            for (_, _, fa), (_, _, fb) in zip(ref, nat):
                assert fa.shape == fb.shape
                # different resize kernels (INTER_AREA vs SWS_AREA) may
                # differ by a hair; content must match closely
                assert float(np.abs(fa - fb).mean()) < 3.0

    def test_fast_levels_sample_equivalent_frames(self, tmp_path):
        """Analysis-decode accelerators: level 1 (deblock skip) keeps the
        exact sample grid with near-identical pixels; level 2 (non-ref skip)
        may snap each sample a couple of frames but keeps one sample per
        step. Needs an H.264 fixture (B-frames + loop filter)."""
        from eioku_tpu.ml import audio_io, video_io
        if video_io.native_video_lib() is None or \
                audio_io.native_decoder() is None:
            pytest.skip("native shims unavailable in this image")
        path = str(tmp_path / "h264.mp4")
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, (60, 64, 96, 3), dtype=np.uint8)
        audio_io.native_media_encode(path, frames, fps=12.0,
                                     preset="veryfast")

        def collect(level):
            out = []
            for b in video_io.iter_frame_batches(
                    path, batch_size=8, frame_interval_s=0.5,
                    decode_threads=1, fast_level=level):
                for s in range(b.valid):
                    out.append((int(b.frame_indices[s]),
                                b.frames[s].astype(np.int32)))
            return out

        exact = collect(0)
        deblock = collect(1)
        nonref = collect(2)
        step = 6  # 12 fps * 0.5 s
        assert [i for i, _ in exact] == list(range(0, 60, step))
        # level 1: same grid, pixels within deblocking drift
        assert [i for i, _ in deblock] == [i for i, _ in exact]
        drift = max(float(np.abs(a - b).mean())
                    for (_, a), (_, b) in zip(exact, deblock))
        assert drift < 4.0
        # level 2: one sample per step-window, each within a B-run of the grid
        assert len(nonref) == len(exact)
        for want, (got, _) in zip(range(0, 60, step), nonref):
            assert want <= got < want + step

    def test_lowres_engages_only_for_small_targets(self, tmp_path):
        """mpeg4 supports DCT-domain lowres; a small target triggers it
        without changing the emitted geometry, and content stays right."""
        from eioku_tpu.ml import video_io
        if video_io.native_video_lib() is None:
            pytest.skip("native video decoder unavailable in this image")
        path = str(tmp_path / "big.mp4")
        write_video(path, [(12, (220, 10, 10))], size=(640, 480))
        batches = list(video_io._decode_native(
            path, 10.0, 5, 4, (60, 80), None))
        assert batches and batches[0].frames.shape == (4, 60, 80, 3)
        frame = batches[0].frames[0].astype(np.float32)
        assert frame[..., 0].mean() > 150  # red channel survived lowres
        assert frame[..., 1].mean() < 80

    def test_max_frames_cap(self, tmp_path):
        from eioku_tpu.ml import video_io
        if video_io.native_video_lib() is None:
            pytest.skip("native video decoder unavailable in this image")
        path = str(tmp_path / "cap.mp4")
        write_video(path, [(40, (50, 50, 200))])
        total = sum(b.valid for b in video_io._decode_native(
            path, 10.0, 2, 8, None, 5))
        assert total == 5

    @pytest.mark.parametrize("codec,ext", [
        ("libx265", "hevc.mp4"),        # HEVC with B-frame reordering
        ("libvpx-vp9", "vp9.webm"),     # VP9 in webm
        (None, "h264.mp4"),             # default H.264
    ])
    def test_modern_codec_decode_breadth(self, tmp_path, codec, ext):
        """Real-world library files come in many codecs; both decode paths
        (native shim and cv2 over the same system libav) must read them."""
        import cv2
        from eioku_tpu.ml import audio_io, video_io
        if audio_io.native_decoder() is None or \
                video_io.native_video_lib() is None:
            pytest.skip("native shims unavailable in this image")
        frames = np.zeros((20, 96, 128, 3), np.uint8)
        for i in range(20):
            frames[i, :, :(i + 1) * 6] = 220
        p = str(tmp_path / ext)
        audio_io.native_media_encode(p, frames, fps=10.0, video_codec=codec)
        n_native = sum(b.valid for b in video_io._decode_native(
            p, 10.0, 1, 8, None, None))
        cap = cv2.VideoCapture(p)
        n_cv = 0
        while cap.read()[0]:
            n_cv += 1
        cap.release()
        assert n_native >= 18 and n_cv >= 18  # demuxers may drop a tail frame

    def test_frame_map_encode_matches_materialized(self, tmp_path):
        """frame_map encoding (unique frames + index map) must produce the
        same decoded content as materializing every frame — it exists so
        long fixtures don't need GBs of frame buffer (bench _ensure_av_clip)."""
        from eioku_tpu.ml import audio_io, video_io
        if audio_io.native_decoder() is None or \
                video_io.native_video_lib() is None:
            pytest.skip("native shims unavailable in this image")
        uniq = np.zeros((3, 96, 128, 3), np.uint8)
        uniq[0], uniq[1], uniq[2] = 30, 120, 220
        fmap = np.repeat(np.arange(3, dtype=np.int32), 8)  # 24 frames
        p_map = str(tmp_path / "mapped.mp4")
        audio_io.native_media_encode(p_map, uniq, fps=8.0, frame_map=fmap)
        p_full = str(tmp_path / "full.mp4")
        audio_io.native_media_encode(p_full, uniq[fmap], fps=8.0)
        for a, b in zip(video_io._decode_native(p_map, 8.0, 1, 4, None, None),
                        video_io._decode_native(p_full, 8.0, 1, 4, None, None)):
            assert a.valid == b.valid
            np.testing.assert_allclose(
                a.frames[:a.valid].astype(np.int16),
                b.frames[:b.valid].astype(np.int16),
                atol=4)  # same encoder settings; minor x264 rate noise
        with pytest.raises(ValueError):
            audio_io.native_media_encode(
                str(tmp_path / "bad.mp4"), uniq, fps=8.0,
                frame_map=np.asarray([0, 3], np.int32))

    def test_truncated_file_yields_partial_frames(self, tmp_path):
        """A tail-truncated recording must yield the frames that decoded,
        not raise and fail the whole task (cv2-path behavior parity)."""
        from eioku_tpu.ml import audio_io, video_io
        if video_io.native_video_lib() is None:
            pytest.skip("native video decoder unavailable in this image")
        # MPEG-TS: a streamable container, so a truncated prefix stays
        # readable (an mp4 would lose its tail moov index entirely)
        path = str(tmp_path / "full.ts")
        frames = np.zeros((40, 96, 128, 3), np.uint8)
        for i in range(40):
            frames[i, :, : (i + 1) * 3] = 200
        audio_io.native_media_encode(path, frames, fps=10.0)
        data = open(path, "rb").read()
        cut = str(tmp_path / "cut.ts")
        open(cut, "wb").write(data[: int(len(data) * 0.6)])
        got = sum(b.valid for b in video_io._decode_native(
            cut, 10.0, 1, 8, None, None))
        full = sum(b.valid for b in video_io._decode_native(
            path, 10.0, 1, 8, None, None))
        assert 0 < got < full


class TestVideoIO:
    def test_probe(self, scene_video):
        from eioku_tpu.ml.video_io import probe
        info = probe(scene_video)
        assert info.frame_count == 70
        assert info.fps == 10.0
        assert info.duration_ms == 7000

    def test_batches_fixed_shape(self, scene_video):
        from eioku_tpu.ml.video_io import iter_frame_batches
        batches = list(iter_frame_batches(scene_video, batch_size=16,
                                          frame_interval_s=0.1))
        assert all(b.frames.shape == (16, 64, 64, 3) for b in batches)
        assert sum(b.valid for b in batches) == 70
        # padding slots are zeros
        last = batches[-1]
        assert last.frames[last.valid:].sum() == 0

    def test_sampling_interval(self, scene_video):
        from eioku_tpu.ml.video_io import iter_frame_batches
        batches = list(iter_frame_batches(scene_video, batch_size=8,
                                          frame_interval_s=1.0))
        idx = np.concatenate([b.frame_indices[:b.valid] for b in batches])
        assert list(idx) == [0, 10, 20, 30, 40, 50, 60]

    def test_prefetch_matches_direct(self, scene_video):
        from eioku_tpu.ml.video_io import iter_frame_batches, prefetch
        direct = list(iter_frame_batches(scene_video, batch_size=8,
                                         frame_interval_s=0.5))
        fetched = list(prefetch(iter_frame_batches(scene_video, batch_size=8,
                                                   frame_interval_s=0.5)))
        assert len(direct) == len(fetched)
        for a, b in zip(direct, fetched):
            np.testing.assert_array_equal(a.frames, b.frames)


class TestSceneKernel:
    def test_pallas_matches_jnp(self):
        import jax.numpy as jnp
        from eioku_tpu.ops.scene_diff import scene_scores
        rng = np.random.default_rng(1)
        planes = jnp.asarray(rng.random((6, 300), dtype=np.float32))
        prev = jnp.asarray(rng.random(300, dtype=np.float32))
        a = np.asarray(scene_scores(prev, planes, use_pallas=True))
        b = np.asarray(scene_scores(prev, planes, use_pallas=False))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    def test_rgb_to_hsv_matches_colorsys(self):
        import colorsys
        import jax.numpy as jnp
        from eioku_tpu.ops.colorspace import rgb_to_hsv
        rng = np.random.default_rng(2)
        rgb = rng.random((50, 3)).astype(np.float32)
        ours = np.asarray(rgb_to_hsv(jnp.asarray(rgb)))
        for i in range(50):
            expected = colorsys.rgb_to_hsv(*rgb[i])
            np.testing.assert_allclose(ours[i], expected, atol=1e-5)

    def test_i420_to_rgb_matches_cv2(self):
        import jax.numpy as jnp
        from eioku_tpu.ops.colorspace import i420_to_rgb
        rng = np.random.default_rng(3)
        rgb = rng.integers(0, 255, (3, 64, 96, 3), dtype=np.uint8)
        planes = np.stack([cv2.cvtColor(f, cv2.COLOR_RGB2YUV_I420)
                           for f in rgb])
        ours = np.asarray(i420_to_rgb(jnp.asarray(planes))) * 255.0
        ref = np.stack([cv2.cvtColor(p, cv2.COLOR_YUV2RGB_I420)
                        for p in planes]).astype(np.float32)
        assert np.abs(ours - ref).max() <= 1.0  # rounding only

    def test_i420_to_rgb_height_2_mod_4(self):
        # regression: 21:9 sources decode to heights like 270 where the packed
        # U plane spans partial rows; flat-offset slicing must handle it
        import jax.numpy as jnp
        from eioku_tpu.ops.colorspace import i420_to_rgb, to_i420
        rng = np.random.default_rng(5)
        rgb = rng.integers(0, 255, (2, 270, 64, 3), dtype=np.uint8)
        ours = np.asarray(i420_to_rgb(jnp.asarray(to_i420(list(rgb))))) * 255.0
        ref = np.stack([cv2.cvtColor(cv2.cvtColor(f, cv2.COLOR_RGB2YUV_I420),
                                     cv2.COLOR_YUV2RGB_I420)
                        for f in rgb]).astype(np.float32)
        assert np.abs(ours - ref).max() <= 1.0

    def test_i420_hsv_planes_match_rgb_path(self):
        import jax.numpy as jnp
        from eioku_tpu.ops.colorspace import (
            frames_to_hsv_planes,
            i420_frames_to_hsv_planes,
        )
        rng = np.random.default_rng(4)
        base = rng.integers(0, 255, (8, 12, 3), dtype=np.uint8)
        smooth = np.stack([cv2.resize(base, (160, 96),
                                      interpolation=cv2.INTER_LINEAR)] * 2)
        planes_u8 = np.stack([cv2.cvtColor(f, cv2.COLOR_RGB2YUV_I420)
                              for f in smooth])
        via_i420 = np.asarray(i420_frames_to_hsv_planes(jnp.asarray(planes_u8)))
        direct = np.asarray(frames_to_hsv_planes(jnp.asarray(smooth)))
        # chroma subsampling + video-range quantization: close, not exact
        assert np.abs(via_i420 - direct).mean() < 0.05

    def test_detects_three_scenes(self, scene_video):
        from eioku_tpu.ml.scenes import detect_scenes
        scenes = detect_scenes(scene_video, sample_fps=4.0)
        assert len(scenes) == 3
        assert scenes[0].start_ms == 0
        assert abs(scenes[1].start_ms - 2000) <= 300
        assert abs(scenes[2].start_ms - 5000) <= 300
        assert scenes[-1].end_ms == 7000  # padded to container duration

    def test_uniform_video_single_scene(self, tmp_path):
        from eioku_tpu.ml.scenes import detect_scenes
        path = str(tmp_path / "uniform.mp4")
        write_video(path, [(30, (100, 100, 100))])
        scenes = detect_scenes(path)
        assert len(scenes) == 1
        assert scenes[0].start_ms == 0 and scenes[0].end_ms == 3000


class TestMetadata:
    def test_extracts_mp4_fields(self, scene_video):
        from eioku_tpu.ml.metadata import extract_metadata
        meta = extract_metadata(scene_video)
        assert meta["width"] == 64 and meta["height"] == 64
        assert meta["duration_ms"] == 7000
        assert meta["container"] == "mp4"
        assert meta["fps"] == pytest.approx(10.0, abs=0.1)
        assert meta["create_date"] is not None

    def test_validates_against_schema(self, scene_video):
        from eioku_tpu.domain.schema_registry import SchemaRegistry, register_all_schemas
        from eioku_tpu.ml.metadata import extract_metadata
        register_all_schemas()
        SchemaRegistry.validate("video.metadata", 1, extract_metadata(scene_video))

    @pytest.mark.slow
    def test_moov_deep_behind_large_payload(self, tmp_path, scene_video):
        """The common non-faststart layout (moov after a huge mdat) must
        still yield full metadata: top-level boxes are walked by seeking,
        never by a fixed read window."""
        import struct
        from eioku_tpu.ml.metadata import extract_metadata
        data = open(scene_video, "rb").read()
        boxes, pos = [], 0
        while pos + 8 <= len(data):
            size, = struct.unpack(">I", data[pos:pos + 4])
            boxes.append((data[pos + 4:pos + 8], data[pos:pos + size]))
            pos += size
        rest = [b for t, b in boxes if t != b"moov"]
        moov = [b for t, b in boxes if t == b"moov"]
        pad = 70 * 1024 * 1024  # push moov past any plausible head window
        filler = struct.pack(">I", 8 + pad) + b"free" + b"\0" * pad
        p = tmp_path / "tailmoov.mp4"
        p.write_bytes(b"".join(rest) + filler + b"".join(moov))
        meta = extract_metadata(str(p))
        assert meta["duration_ms"] == 7000
        assert meta["width"] == 64
        assert meta["create_date"] is not None

    def test_iso6709_gps(self):
        from eioku_tpu.ml.metadata import _parse_iso6709
        assert _parse_iso6709("+35.6580+139.6994/") == {
            "latitude": 35.658, "longitude": 139.6994}
        assert _parse_iso6709("+40.75-074.00+011.0/")["altitude"] == 11.0
        assert _parse_iso6709("garbage") is None
        assert _parse_iso6709("+95.0+10.0/") is None  # out of range


class TestEndToEndPipeline:
    def test_scene_and_metadata_tasks_e2e(self, tmp_path, scene_video):
        from eioku_tpu.queue.worker import WorkerSettings
        from eioku_tpu.web.testing import TestClient
        from eioku_tpu.api.app import create_app
        from eioku_tpu.workers.main import build_worker

        config = AppConfig(
            scan_paths=[str(tmp_path)], auto_discover=False,
            active_task_types=["scene_detection", "metadata_extraction"])
        db = Database(f"sqlite:///{tmp_path}/e2e.db")
        ctx = build_context(config, db=db)

        # 1. discovery creates + enqueues tasks
        from eioku_tpu.domain.models import PathConfig
        ctx.paths.save(PathConfig(path=str(tmp_path)))
        report = ctx.discovery.discover()
        assert report.videos_new == 1 and report.tasks_created == 2

        # 2. worker drains the queue, running the real engine on CPU-JAX
        worker = build_worker(app_ctx=ctx,
                              settings=WorkerSettings(max_jobs=2, poll_delay_s=0.01))
        asyncio.run(worker.drain())

        tasks = ctx.tasks.find(limit=10)
        assert {t.status for t in tasks} == {TaskStatus.COMPLETED}, \
            [(t.task_type, t.status, t.error) for t in tasks]

        video = ctx.videos.list()[0]
        # metadata task updated the video row
        assert video.duration_ms == 7000

        # 3. artifacts + projections + API queries
        scenes = ctx.artifacts.get_by_asset(video.id, artifact_type="scene")
        assert len(scenes) == 3
        assert db.scalar("SELECT COUNT(*) FROM scene_ranges") == 3

        app = create_app(ctx=ctx, start_reconciler=False, auto_discover=False)
        with TestClient(app) as client:
            r = client.get(f"/api/v1/videos/{video.id}/jump",
                           params={"kind": "scene", "from_ms": 2500,
                                   "direction": "next"})
            assert r.json()["found"]
            assert abs(r.json()["jump_to"]["start_ms"] - 5000) <= 300
            meta = client.get(f"/api/v1/videos/{video.id}/artifacts",
                              params={"type": "video.metadata"}).json()
            assert meta["total"] == 1
            assert meta["artifacts"][0]["payload_json"]["width"] == 64

    def test_failed_model_marks_task_failed(self, tmp_path, scene_video):
        from eioku_tpu.queue.worker import WorkerSettings
        from eioku_tpu.workers.main import build_worker
        from eioku_tpu.domain.models import PathConfig

        config = AppConfig(scan_paths=[], auto_discover=False,
                           active_task_types=["scene_detection"])
        db = Database(f"sqlite:///{tmp_path}/fail.db")
        ctx = build_context(config, db=db)
        ctx.paths.save(PathConfig(path=str(tmp_path)))
        ctx.discovery.discover()
        # corrupt the video so decode fails
        video = ctx.videos.list()[0]
        with open(video.path, "wb") as f:
            f.write(b"not a video")
        worker = build_worker(app_ctx=ctx,
                              settings=WorkerSettings(max_jobs=1, poll_delay_s=0.01))
        asyncio.run(worker.drain())
        t = ctx.tasks.find(limit=1)[0]
        assert t.status is TaskStatus.FAILED
        assert t.error

    def test_changed_file_fails_with_hash_mismatch(self, tmp_path, scene_video):
        from eioku_tpu.queue.worker import WorkerSettings
        from eioku_tpu.workers.main import build_worker
        from eioku_tpu.domain.models import PathConfig

        config = AppConfig(scan_paths=[], auto_discover=False,
                           active_task_types=["scene_detection"])
        db = Database(f"sqlite:///{tmp_path}/hash.db")
        ctx = build_context(config, db=db)
        ctx.paths.save(PathConfig(path=str(tmp_path)))
        ctx.discovery.discover()
        # rewrite the video with different content AFTER discovery
        write_video(ctx.videos.list()[0].path, [(25, (9, 9, 9))])
        worker = build_worker(app_ctx=ctx,
                              settings=WorkerSettings(max_jobs=1, poll_delay_s=0.01))
        asyncio.run(worker.drain())
        t = ctx.tasks.find(limit=1)[0]
        assert t.status is TaskStatus.FAILED
        assert "changed since discovery" in t.error


class TestStripedDecode:
    def test_striped_matches_serial(self, tmp_path):
        # call the striped iterator directly: iter_frame_batches clamps worker
        # count to os.cpu_count(), which routes to the serial path on 1-core CI
        from eioku_tpu.ml import video_io
        path = str(tmp_path / "long.mp4")
        write_video(path, [(60, (10, 200, 40)), (60, (220, 10, 10))], fps=12)
        serial = list(video_io.iter_frame_batches(path, batch_size=8,
                                                  frame_interval_s=0.25))
        info = video_io.probe(path)
        step = max(int(round(info.fps * 0.25)), 1)
        striped = list(video_io._iter_batches_striped(
            path, info, step, 8, None, n_workers=4))
        s_idx = np.concatenate([b.frame_indices[:b.valid] for b in serial])
        p_idx = np.concatenate([b.frame_indices[:b.valid] for b in striped])
        np.testing.assert_array_equal(s_idx, p_idx)
        s_frames = np.concatenate([b.frames[:b.valid] for b in serial])
        p_frames = np.concatenate([b.frames[:b.valid] for b in striped])
        np.testing.assert_array_equal(s_frames, p_frames)

    @pytest.mark.slow
    def test_process_pool_matches_serial(self, tmp_path):
        from eioku_tpu.ml import video_io
        path = str(tmp_path / "long2.mp4")
        write_video(path, [(40, (10, 200, 40)), (40, (220, 10, 10))], fps=12)
        serial = list(video_io.iter_frame_batches(path, batch_size=8,
                                                  frame_interval_s=0.25))
        info = video_io.probe(path)
        step = max(int(round(info.fps * 0.25)), 1)
        try:
            striped = list(video_io._iter_batches_striped(
                path, info, step, 8, None, n_workers=2, use_procs=True))
        finally:
            for pool in video_io._proc_pools.values():
                pool.shutdown(wait=False, cancel_futures=True)
            video_io._proc_pools.clear()
        s_idx = np.concatenate([b.frame_indices[:b.valid] for b in serial])
        p_idx = np.concatenate([b.frame_indices[:b.valid] for b in striped])
        np.testing.assert_array_equal(s_idx, p_idx)
        s_frames = np.concatenate([b.frames[:b.valid] for b in serial])
        p_frames = np.concatenate([b.frames[:b.valid] for b in striped])
        np.testing.assert_array_equal(s_frames, p_frames)

    def test_native_stripes_match_cv2_stripes(self, tmp_path, monkeypatch):
        """Native stripe workers (seek + bounded read) must produce the same
        sampled set as cv2 stripe workers."""
        from eioku_tpu.ml import video_io
        if video_io.native_video_lib() is None:
            pytest.skip("native video decoder unavailable in this image")
        path = str(tmp_path / "long3.mp4")
        write_video(path, [(60, (10, 200, 40)), (60, (220, 10, 10))], fps=12)
        info = video_io.probe(path)
        step = max(int(round(info.fps * 0.25)), 1)

        def stripes(native):
            monkeypatch.setenv("EIOKU_NATIVE_DECODE", "1" if native else "0")
            return list(video_io._iter_batches_striped(
                path, info, step, 8, None, n_workers=3))

        ref, nat = stripes(False), stripes(True)
        r_idx = np.concatenate([b.frame_indices[:b.valid] for b in ref])
        n_idx = np.concatenate([b.frame_indices[:b.valid] for b in nat])
        np.testing.assert_array_equal(r_idx, n_idx)
        r_f = np.concatenate([b.frames[:b.valid] for b in ref])
        n_f = np.concatenate([b.frames[:b.valid] for b in nat])
        np.testing.assert_array_equal(r_f, n_f)  # full res: bit-exact

    def test_striped_falls_back_on_short_video(self, scene_video):
        from eioku_tpu.ml.video_io import iter_frame_batches
        serial = list(iter_frame_batches(scene_video, batch_size=8,
                                         frame_interval_s=2.0))
        striped = list(iter_frame_batches(scene_video, batch_size=8,
                                          frame_interval_s=2.0,
                                          decode_threads=8))
        assert sum(b.valid for b in serial) == sum(b.valid for b in striped)


class TestCombinedVisual:
    @pytest.mark.slow  # heaviest e2e: ~1-2 min each on the 1-core image
    def test_combined_matches_separate_artifact_types(self, scene_video):
        from eioku_tpu.ml.combined import run_visual_analysis
        results = run_visual_analysis(scene_video, {
            "scene_detection": {"sample_fps": 4.0},
            "object_detection": {"batch_size": 4, "confidence_threshold": 0.0},
            "face_detection": {"batch_size": 4},
            "place_classification": {"batch_size": 4, "top_k": 3},
        })
        assert set(results) == {"scene_detection", "object_detection",
                                "face_detection", "place_classification"}
        scenes = results["scene_detection"]
        assert len(scenes) == 3  # same 3 scenes the separate pipeline finds
        assert scenes[-1]["span_end_ms"] == 7000
        # places sampled at 1 fps over 7 s -> 7 frames
        assert len(results["place_classification"]) == 7
        from eioku_tpu.domain.schema_registry import SchemaRegistry, register_all_schemas
        register_all_schemas()
        for r in results["place_classification"]:
            SchemaRegistry.validate("place.classification", 1, r["payload"])
        for r in results["object_detection"][:10]:
            SchemaRegistry.validate("object.detection", 1, r["payload"])

    def test_fused_faces_match_separate_consumer(self, tmp_path):
        """The face rider (device-side gather from the object upload) must
        produce the same face stream as the separate face consumer. A
        >=640-wide source engages the fused i420 path; the smaller fixtures
        exercise the letterbox fallback elsewhere."""
        from eioku_tpu.ml.combined import run_visual_analysis
        path = str(tmp_path / "wide.mp4")
        write_video(path, segments=[(30, (200, 40, 40)), (30, (40, 200, 40))],
                    size=(960, 540), fps=12)
        cfg = {"object_detection": {"batch_size": 8, "frame_interval_s": 1.0},
               "face_detection": {"batch_size": 8, "frame_interval_s": 3.0,
                                  "confidence_threshold": 0.2}}
        fused = run_visual_analysis(path, cfg)["face_detection"]
        separate = run_visual_analysis(path, {**cfg, "fuse_faces": False})[
            "face_detection"]
        assert len(fused) == len(separate)
        for f, s in zip(fused, separate):
            assert f["span_start_ms"] == s["span_start_ms"]
            fb, sb = f["payload"]["bounding_box"], s["payload"]["bounding_box"]
            for k in ("x", "y", "width", "height"):
                assert abs(fb[k] - sb[k]) < 2.0, (fb, sb)

    @pytest.mark.slow  # heaviest e2e: ~1-2 min each on the 1-core image
    def test_fused_places_matches_standalone_on_letterboxed_video(
            self, scene_video):
        """Sub-640 videos take the host-letterbox path; fused places must
        classify the RAW frames (no gray bars), i.e. agree with the
        standalone places pipeline on the same video (regression for the
        letterbox-contamination bug)."""
        from eioku_tpu.ml.combined import run_visual_analysis
        from eioku_tpu.ml.places import run_place_classification
        fused = run_visual_analysis(scene_video, {
            "object_detection": {"batch_size": 4, "frame_interval_s": 1.0},
            "place_classification": {"batch_size": 4, "top_k": 3,
                                     "frame_interval_s": 1.0},
        })["place_classification"]
        standalone = run_place_classification(scene_video, {"frame_interval_s": 1.0,
                                              "top_k": 3, "batch_size": 4})
        assert len(fused) == len(standalone) > 0
        for f, s in zip(fused, standalone):
            assert [p["label"] for p in f["payload"]["predictions"]] == \
                [p["label"] for p in s["payload"]["predictions"]]

    @pytest.mark.slow  # heaviest e2e: ~1-2 min each on the 1-core image
    def test_combined_includes_ocr_when_configured(self, scene_video):
        from eioku_tpu.domain.schema_registry import (
            SchemaRegistry,
            register_all_schemas,
        )
        from eioku_tpu.ml.combined import run_visual_analysis
        results = run_visual_analysis(scene_video, {
            "scene_detection": {"sample_fps": 2.0},
            "object_detection": {"batch_size": 4},
            "face_detection": {"batch_size": 4},
            "place_classification": {"batch_size": 4},
            "ocr": {"languages": ["en"], "frame_interval_s": 2.0,
                    "batch_size": 4},
        })
        assert "ocr" in results  # key present even when random weights find none
        register_all_schemas()
        for r in results["ocr"][:5]:
            SchemaRegistry.validate("ocr.text", 1, r["payload"])
            assert r["payload"]["languages"] == ["en"]

    def test_ocr_only_fold_skips_other_visual_tasks(self, tmp_path,
                                                    scene_video):
        """combined_visual with only OCR active must not run (or emit)
        detection/scene/place work."""
        from eioku_tpu.domain.models import PathConfig
        from eioku_tpu.ml.combined import run_visual_analysis
        results = run_visual_analysis(scene_video, {
            "ocr": {"languages": ["en"], "frame_interval_s": 2.0,
                    "batch_size": 4}})
        assert set(results) == {"ocr"}

        config = AppConfig(
            scan_paths=[], auto_discover=False, combined_visual=True,
            active_task_types=["ocr"])
        db = Database(f"sqlite:///{tmp_path}/ocronly.db")
        ctx = build_context(config, db=db)
        try:
            ctx.paths.save(PathConfig(path=str(tmp_path)))
            ctx.discovery.discover()
            tasks = ctx.tasks.find(limit=10)
            assert [t.task_type for t in tasks] == ["visual_analysis"]
            assert set(tasks[0].config) == {"ocr"}
        finally:
            db.close()

    def test_combined_discovery_merges_fold_settings(self, tmp_path,
                                                     scene_video):
        """task_settings["visual_analysis"] (decode batch/threads/fast) lands
        top-level in the fold task's config next to the sub-task dicts."""
        from eioku_tpu.domain.models import PathConfig
        config = AppConfig(
            scan_paths=[], auto_discover=False, combined_visual=True,
            active_task_types=["scene_detection", "object_detection"],
            task_settings={"visual_analysis": {"decode_fast": 2,
                                               "batch_size": 64}})
        db = Database(f"sqlite:///{tmp_path}/cvf.db")
        ctx = build_context(config, db=db)
        try:
            ctx.paths.save(PathConfig(path=str(tmp_path)))
            ctx.discovery.discover()
            tasks = ctx.tasks.find(limit=10)
            assert [t.task_type for t in tasks] == ["visual_analysis"]
            cfg = tasks[0].config
            assert cfg["decode_fast"] == 2 and cfg["batch_size"] == 64
            assert "scene_detection" in cfg and "object_detection" in cfg
        finally:
            db.close()

    def test_combined_discovery_folds_ocr(self, tmp_path, scene_video):
        from eioku_tpu.domain.models import PathConfig
        config = AppConfig(
            scan_paths=[], auto_discover=False, combined_visual=True,
            active_task_types=["scene_detection", "ocr"],
            task_settings={"ocr": {"languages": ["en", "ja"]}})
        db = Database(f"sqlite:///{tmp_path}/cvo.db")
        ctx = build_context(config, db=db)
        try:
            ctx.paths.save(PathConfig(path=str(tmp_path)))
            ctx.discovery.discover()
            tasks = ctx.tasks.find(limit=10)
            assert [t.task_type for t in tasks] == ["visual_analysis"]
            assert tasks[0].config["ocr"]["languages"] == ["en", "ja"]
        finally:
            db.close()

    @pytest.mark.slow
    def test_realworld_video_e2e_through_worker(self, tmp_path):
        """A reference-style input — one H.264 mp4 with an embedded AAC
        track, no sidecar — runs discovery -> worker -> transcription +
        scenes. The audio source is the video itself (native libav demux)."""
        from eioku_tpu.ml import audio_io
        from eioku_tpu.queue.worker import WorkerSettings
        from eioku_tpu.workers.main import build_worker
        from eioku_tpu.domain.models import PathConfig

        if audio_io.native_decoder() is None:
            pytest.skip("native audio shim unavailable in this image")
        sr = 16000
        tone = (0.4 * np.sin(2 * np.pi * 330 * np.arange(sr * 3) / sr)
                ).astype(np.float32)
        frames = np.zeros((30, 120, 160, 3), np.uint8)
        frames[15:] = 200
        video = str(tmp_path / "holiday.mp4")
        audio_io.native_media_encode(video, frames, fps=10.0, samples=tone,
                                     sr=sr)
        assert audio_io.find_audio_for_video(video) == video

        config = AppConfig(
            scan_paths=[], auto_discover=False,
            active_task_types=["scene_detection", "transcription"],
            task_settings={"transcription": {"model": "whisper-tiny",
                                             "max_tokens": 4,
                                             "batch_size": 1}})
        db = Database(f"sqlite:///{tmp_path}/rw.db")
        ctx = build_context(config, db=db)
        try:
            ctx.paths.save(PathConfig(path=str(tmp_path)))
            report = ctx.discovery.discover()
            assert report.tasks_created == 2
            worker = build_worker(app_ctx=ctx,
                                  settings=WorkerSettings(max_jobs=1,
                                                          poll_delay_s=0.01))
            asyncio.run(worker.drain())
            tasks = ctx.tasks.find(limit=10)
            assert {t.status for t in tasks} == {TaskStatus.COMPLETED}, \
                [(t.task_type, t.error) for t in tasks]
            v = ctx.videos.list()[0]
            assert "scene" in set(ctx.artifacts.list_types_for_asset(v.id))
        finally:
            db.close()

    def test_failed_first_attempt_retries_to_completion(self, tmp_path,
                                                        scene_video):
        """With a try budget of 2, a transient first-attempt failure must end
        COMPLETED: the handler steps the FAILED task back through PENDING."""
        from eioku_tpu.domain.models import PathConfig
        from eioku_tpu.queue.producer import JobProducer
        from eioku_tpu.queue.queue import SqliteJobQueue
        from eioku_tpu.queue.worker import WorkerSettings
        from eioku_tpu.workers.main import build_worker

        class FlakyEngine:
            producer_name = "stub-engine"
            producer_version = "0"
            model_profile = "balanced"
            calls = 0

            def run_task(self, task_type, video_path, config):
                FlakyEngine.calls += 1
                if FlakyEngine.calls == 1:
                    raise RuntimeError("transient failure")
                return []

        config = AppConfig(scan_paths=[], auto_discover=False,
                           active_task_types=["scene_detection"])
        db = Database(f"sqlite:///{tmp_path}/retry.db")
        ctx = build_context(config, db=db)
        ctx.producer.max_tries = 2
        try:
            ctx.paths.save(PathConfig(path=str(tmp_path)))
            ctx.discovery.discover()
            worker = build_worker(app_ctx=ctx, engine=FlakyEngine(),
                                  settings=WorkerSettings(max_jobs=1,
                                                          poll_delay_s=0.01))
            asyncio.run(worker.drain())
            task = ctx.tasks.find(limit=1)[0]
            assert FlakyEngine.calls == 2
            assert task.status is TaskStatus.COMPLETED, task.error
        finally:
            db.close()

    @pytest.mark.slow  # ~25 s e2e through the worker on the 1-core image
    def test_combined_e2e_through_worker(self, tmp_path, scene_video):
        from eioku_tpu.queue.worker import WorkerSettings
        from eioku_tpu.workers.main import build_worker
        from eioku_tpu.domain.models import PathConfig

        config = AppConfig(
            scan_paths=[], auto_discover=False, combined_visual=True,
            active_task_types=["metadata_extraction", "scene_detection",
                               "object_detection", "face_detection",
                               "place_classification"],
            task_settings={"object_detection": {"batch_size": 4},
                           "face_detection": {"batch_size": 4},
                           "place_classification": {"batch_size": 4}})
        db = Database(f"sqlite:///{tmp_path}/cv.db")
        ctx = build_context(config, db=db)
        ctx.paths.save(PathConfig(path=str(tmp_path)))
        report = ctx.discovery.discover()
        # 4 visual tasks collapsed into one visual_analysis + metadata
        assert report.tasks_created == 2
        worker = build_worker(app_ctx=ctx,
                              settings=WorkerSettings(max_jobs=1,
                                                      poll_delay_s=0.01))
        asyncio.run(worker.drain())
        tasks = ctx.tasks.find(limit=10)
        assert {t.status for t in tasks} == {TaskStatus.COMPLETED}, \
            [(t.task_type, t.error) for t in tasks]
        v = ctx.videos.list()[0]
        types = set(ctx.artifacts.list_types_for_asset(v.id))
        assert {"scene", "place.classification", "video.metadata"} <= types
        # one run per sub task type
        runs = {r["run_id"] for r in ctx.artifacts.list_runs(v.id)}
        assert len(runs) >= 3
