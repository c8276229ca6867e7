import pytest

from eioku_tpu.domain.artifacts import ArtifactEnvelope, Run, SelectionPolicy, new_id
from eioku_tpu.domain.models import Task, TaskStatus, Video, VideoStatus
from eioku_tpu.domain.schema_registry import (
    SchemaRegistry,
    SchemaValidationError,
    register_all_schemas,
)
from eioku_tpu.domain.task_registry import (
    ACTIVE_TASK_TYPES,
    TASK_REGISTRY,
    is_language_agnostic,
    is_language_optional,
    is_language_required,
)


def make_envelope(**kw):
    defaults = dict(
        artifact_id=new_id(),
        asset_id="asset1",
        artifact_type="scene",
        schema_version=1,
        span_start_ms=0,
        span_end_ms=1000,
        payload_json={"scene_index": 0, "start_ms": 0, "end_ms": 1000, "duration_ms": 1000},
        producer="eioku-tpu",
        producer_version="0.1.0",
        model_profile="balanced",
        config_hash="abc",
        input_hash="def",
        run_id="run1",
    )
    defaults.update(kw)
    return ArtifactEnvelope(**defaults)


class TestArtifactEnvelope:
    def test_valid(self):
        env = make_envelope()
        assert env.overlaps(500, 1500)
        assert not env.overlaps(1000, 2000)

    def test_invalid_span(self):
        with pytest.raises(ValueError):
            make_envelope(span_end_ms=-1, span_start_ms=0)
        with pytest.raises(ValueError):
            make_envelope(span_start_ms=100, span_end_ms=50)

    def test_invalid_profile(self):
        with pytest.raises(ValueError):
            make_envelope(model_profile="turbo")

    def test_roundtrip_dict(self):
        env = make_envelope()
        d = env.to_dict()
        assert d["artifact_type"] == "scene"
        assert d["payload_json"]["scene_index"] == 0


class TestSelectionPolicy:
    def test_default(self):
        assert SelectionPolicy.default().mode == "latest"

    def test_pinned_requires_run(self):
        with pytest.raises(ValueError):
            SelectionPolicy(mode="pinned")
        SelectionPolicy(mode="pinned", run_id="r1")

    def test_profile_requires_valid_profile(self):
        with pytest.raises(ValueError):
            SelectionPolicy(mode="profile", model_profile="nope")
        SelectionPolicy(mode="profile", model_profile="fast")

    def test_from_dict(self):
        p = SelectionPolicy.from_dict({"mode": "pinned", "run_id": "x"})
        assert p.run_id == "x"


class TestRun:
    def test_valid(self):
        r = Run(run_id="r", asset_id="a", task_type="scene_detection",
                producer="p", producer_version="1", model_profile="fast",
                config_hash="c", input_hash="i")
        assert r.run_id == "r"


class TestSchemaRegistry:
    def test_all_registered(self):
        register_all_schemas()
        register_all_schemas()  # idempotent
        types = {t for t, _ in SchemaRegistry.registered_types()}
        assert {"transcript.segment", "scene", "object.detection", "face.detection",
                "ocr.text", "place.classification", "video.metadata",
                "embedding.chunk", "speaker.turn"} <= types

    def test_validate_ok(self):
        register_all_schemas()
        m = SchemaRegistry.validate("object.detection", 1, {
            "label": "dog", "confidence": 0.9,
            "bounding_box": {"x": 1, "y": 2, "width": 3, "height": 4},
            "frame_number": 10,
        })
        assert m.label == "dog"

    def test_validate_rejects(self):
        register_all_schemas()
        with pytest.raises(SchemaValidationError):
            SchemaRegistry.validate("object.detection", 1, {"label": "dog"})
        with pytest.raises(SchemaValidationError):
            SchemaRegistry.validate("ocr.text", 1, {
                "text": "x", "polygon": [[0, 0], [1, 1]], "frame_index": 0})

    def test_unknown_schema(self):
        with pytest.raises(KeyError):
            SchemaRegistry.get("nope", 1)


class TestTaskTransitions:
    def test_lifecycle(self):
        t = Task(video_id="v", task_type="scene_detection")
        t.transition(TaskStatus.RUNNING)
        assert t.attempts == 1 and t.started_at is not None
        t.transition(TaskStatus.COMPLETED)
        assert t.completed_at is not None
        with pytest.raises(ValueError):
            t.transition(TaskStatus.RUNNING)

    def test_retry_path(self):
        t = Task(video_id="v", task_type="ocr", language="en")
        t.transition(TaskStatus.RUNNING)
        t.transition(TaskStatus.FAILED)
        t.error = "boom"
        t.transition(TaskStatus.PENDING)
        assert t.error is None and t.started_at is None

    def test_reconciler_reset(self):
        t = Task(video_id="v", task_type="ocr")
        t.transition(TaskStatus.RUNNING)
        t.transition(TaskStatus.PENDING)
        assert t.status is TaskStatus.PENDING

    def test_completed_rerun_path(self):
        """COMPLETED -> PENDING is legal (semantic re-indexing after a new
        transcript, deliberate re-runs); FAILED -> COMPLETED stays illegal."""
        t = Task(video_id="v", task_type="semantic_indexing")
        t.transition(TaskStatus.RUNNING)
        t.transition(TaskStatus.COMPLETED)
        t.transition(TaskStatus.PENDING)
        assert t.status is TaskStatus.PENDING
        t2 = Task(video_id="v", task_type="ocr")
        t2.transition(TaskStatus.RUNNING)
        t2.transition(TaskStatus.FAILED)
        with pytest.raises(ValueError):
            t2.transition(TaskStatus.COMPLETED)


class TestTaskRegistry:
    def test_language_modes(self):
        assert is_language_required("ocr")
        assert is_language_optional("transcription")
        assert is_language_agnostic("scene_detection")

    def test_active_types(self):
        assert len(ACTIVE_TASK_TYPES) == 7
        assert "semantic_indexing" in TASK_REGISTRY
        assert "semantic_indexing" not in ACTIVE_TASK_TYPES


class TestVideo:
    def test_defaults(self):
        v = Video(path="/x.mp4")
        assert v.status is VideoStatus.DISCOVERED
        assert v.to_dict()["path"] == "/x.mp4"
