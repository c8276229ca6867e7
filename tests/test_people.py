"""Cross-video face identities (services/people.py + GET /api/v1/people)."""
from __future__ import annotations

import numpy as np
import pytest

from eioku_tpu.domain.artifacts import ArtifactEnvelope, new_id
from eioku_tpu.domain.models import Video

# reuse test_api's app fixtures
from test_api import client, ctx  # noqa: F401


def _unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


def _face(video_id, cluster_id, emb, start_ms, run="r1"):
    return ArtifactEnvelope(
        artifact_id=new_id(), asset_id=video_id,
        artifact_type="face.detection", schema_version=1,
        span_start_ms=start_ms, span_end_ms=start_ms + 33,
        payload_json={"cluster_id": cluster_id, "confidence": 0.9,
                      "bounding_box": {"x": 1, "y": 1, "width": 10,
                                       "height": 10},
                      "frame_number": start_ms // 33,
                      "embedding": [float(x) for x in emb]},
        producer="yolo-face", producer_version="1", model_profile="balanced",
        config_hash="c", input_hash="i", run_id=run)


IDENT_A = _unit(np.r_[1.0, 0.2, np.zeros(510)])
IDENT_B = _unit(np.r_[0.0, 0.1, -1.0, np.zeros(509)])


def seed_library(ctx):
    rng = np.random.default_rng(0)

    def noisy(base):
        return _unit(base + rng.normal(0, 0.02, 512).astype(np.float32))

    v1 = Video(path="/tmp/p1.mp4", file_hash="h1")
    v2 = Video(path="/tmp/p2.mp4", file_hash="h2")
    ctx.videos.save(v1)
    ctx.videos.save(v2)
    envs = []
    # person A: tracks in both videos; person B: only video 2
    for k in range(3):
        envs.append(_face(v1.id, "face_0", noisy(IDENT_A), k * 1000))
    for k in range(2):
        envs.append(_face(v2.id, "face_0", noisy(IDENT_A), k * 1000))
    for k in range(4):
        envs.append(_face(v2.id, "face_1", noisy(IDENT_B), k * 1000 + 50))
    # a face with no embedding must be ignored, not crash
    envs.append(_face(v1.id, "face_9", [], 9000))
    envs[-1].payload_json.pop("embedding")
    ctx.artifacts.batch_create(envs)
    return v1, v2


class TestClustering:
    def test_identities_span_videos(self, ctx):
        from eioku_tpu.services.people import cluster_people
        v1, v2 = seed_library(ctx)
        persons = cluster_people(ctx)
        assert len(persons) == 2
        a = persons[0]  # sorted by total faces: A has 5, B has 4
        assert a["total_faces"] == 5 and a["video_count"] == 2
        assert {o["video_id"] for o in a["occurrences"]} == {v1.id, v2.id}
        b = persons[1]
        assert b["total_faces"] == 4 and b["video_count"] == 1
        assert b["occurrences"][0]["cluster_id"] == "face_1"

    def test_tight_threshold_splits(self, ctx):
        from eioku_tpu.services.people import cluster_people
        seed_library(ctx)
        persons = cluster_people(ctx, threshold=1e-6)
        assert len(persons) == 3  # every track its own person

    def test_memoization(self, ctx):
        from eioku_tpu.services.people import PeopleService
        v1, _ = seed_library(ctx)
        svc = PeopleService(ctx)
        first = svc.people()
        assert svc.people() is first  # cached
        ctx.artifacts.create(_face(v1.id, "face_5", IDENT_B, 20000, run="r2"))
        assert svc.people() is not first  # fingerprint moved


class TestEmbeddingsPipeline:
    @pytest.mark.slow  # full face pipeline on the 1-core image
    def test_face_detection_attaches_embeddings(self, tmp_path):
        """config {"embeddings": true}: every detected face gains a
        512-d L2-normalized ArcFace embedding, cropped in the same decode
        pass (detection._FaceCropCollector)."""
        import sys
        sys.path.insert(0, "tests")
        from test_ml_pipeline import write_video

        from eioku_tpu.ml.detection import run_face_detection
        path = str(tmp_path / "v.mp4")
        write_video(path, [(6, (80, 120, 160))], fps=3, size=(96, 96))
        # random-init detector: threshold 0 so boxes exist
        results = run_face_detection(path, {
            "confidence_threshold": 0.0, "batch_size": 4,
            "frame_interval_s": 0.5, "embeddings": True})
        assert results
        with_emb = [r for r in results if r["payload"].get("embedding")]
        assert with_emb, "no embeddings attached"
        v = np.asarray(with_emb[0]["payload"]["embedding"])
        assert v.shape == (512,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-2
        # schema-valid: FaceDetectionV1 declares the embedding field
        from eioku_tpu.domain.schema_registry import (
            SchemaRegistry,
            register_all_schemas,
        )
        register_all_schemas()
        SchemaRegistry.validate("face.detection", 1, with_emb[0]["payload"])


    @pytest.mark.slow
    def test_combined_pass_embeddings_snapped_grid(self, tmp_path):
        """Regression (review finding): with scene detection active the
        combined pass samples faces on a grid SNAPPED to the base step
        (substep()), which differs from round(fps * interval). The re-decode
        must follow faces.step, not re-derive a grid — otherwise nearly all
        faces silently lose their embeddings."""
        import sys
        sys.path.insert(0, "tests")
        from test_ml_pipeline import write_video

        from eioku_tpu.ml.combined import run_visual_analysis
        path = str(tmp_path / "v.mp4")
        write_video(path, [(16, (80, 120, 160)), (16, (200, 40, 90))],
                    fps=4, size=(96, 96))
        # base grid from scenes (sample_fps 2 -> base_step 2); face interval
        # 1.25 s -> unsnapped step 5, snapped step 6: the grids genuinely
        # diverge, which is exactly the broken case
        out = run_visual_analysis(path, {
            "scene_detection": {"sample_fps": 2.0},
            "face_detection": {"confidence_threshold": 0.0, "batch_size": 4,
                               "frame_interval_s": 1.25, "embeddings": True}})
        faces = out["face_detection"]
        assert faces
        missing = [r for r in faces if not r["payload"].get("embedding")]
        assert not missing, f"{len(missing)}/{len(faces)} faces lost embeddings"

    @pytest.mark.slow
    def test_combined_pass_embeddings(self, tmp_path):
        """The one-decode combined pass supports the same embeddings opt-in
        (re-decoding only the face-sampled frames)."""
        import sys
        sys.path.insert(0, "tests")
        from test_ml_pipeline import write_video

        from eioku_tpu.ml.combined import run_visual_analysis
        path = str(tmp_path / "v.mp4")
        write_video(path, [(6, (80, 120, 160))], fps=3, size=(96, 96))
        out = run_visual_analysis(path, {
            "face_detection": {"confidence_threshold": 0.0, "batch_size": 4,
                               "frame_interval_s": 0.5, "embeddings": True}})
        faces = out["face_detection"]
        assert faces
        assert any(r["payload"].get("embedding") for r in faces)


class TestEndpoint:
    def test_people_endpoint(self, client, ctx):
        seed_library(ctx)
        r = client.get("/api/v1/people")
        assert r.status_code == 200
        body = r.json()
        assert body["total"] == 2
        assert body["people"][0]["person_id"] == "person_0"
        assert body["people"][0]["occurrences"][0]["first_ms"] == 0

    def test_empty_library(self, client):
        r = client.get("/api/v1/people")
        assert r.status_code == 200 and r.json() == {"people": [],
                                                     "total": 0}

    def test_bad_threshold(self, client):
        assert client.get("/api/v1/people?threshold=abc").status_code == 422
