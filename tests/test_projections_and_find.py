from eioku_tpu.domain.artifacts import ArtifactEnvelope, new_id
from eioku_tpu.repositories import ArtifactRepository, SelectionPolicyManager
from eioku_tpu.services.find_service import FindWithinVideoService
from eioku_tpu.services.jump_service import JumpNavigationService
from eioku_tpu.services.projection_sync import ProjectionSyncService


def env(atype, payload, start=0, end=1000, asset="a1", run="r1"):
    return ArtifactEnvelope(
        artifact_id=new_id(), asset_id=asset, artifact_type=atype, schema_version=1,
        span_start_ms=start, span_end_ms=end, payload_json=payload,
        producer="p", producer_version="1", model_profile="balanced",
        config_hash="c", input_hash="i", run_id=run)


def transcript(text, start, end, lang="en", **kw):
    return env("transcript.segment",
               {"text": text, "language": lang, "start_ms": start, "end_ms": end},
               start, end, **kw)


def make_repo(db):
    sync = ProjectionSyncService(db)
    return ArtifactRepository(db, projection_sync=sync.sync_artifact), sync


class TestProjectionSync:
    def test_transcript_fts_roundtrip(self, db):
        repo, _ = make_repo(db)
        repo.create(transcript("the quick brown fox jumps", 0, 2000))
        rows = db.query("SELECT * FROM transcript_fts_meta")
        assert len(rows) == 1 and rows[0]["asset_id"] == "a1"

    def test_resync_idempotent(self, db):
        repo, sync = make_repo(db)
        repo.create(transcript("hello world", 0, 1000))
        sync.sync_artifact(repo.get_by_asset("a1")[0])  # re-sync same artifact
        assert db.scalar("SELECT COUNT(*) FROM transcript_fts") == 1

    def test_scene_object_face_projections(self, db):
        repo, _ = make_repo(db)
        repo.create(env("scene", {"scene_index": 0, "start_ms": 0, "end_ms": 5000,
                                  "duration_ms": 5000}, 0, 5000))
        repo.create(env("object.detection",
                        {"label": "cat", "confidence": 0.8,
                         "bounding_box": {"x": 0, "y": 0, "width": 1, "height": 1},
                         "frame_number": 3}, 100, 133))
        repo.create(env("face.detection",
                        {"cluster_id": None, "confidence": 0.9,
                         "bounding_box": {"x": 0, "y": 0, "width": 1, "height": 1},
                         "frame_number": 3}, 100, 133))
        assert db.scalar("SELECT COUNT(*) FROM scene_ranges") == 1
        assert db.scalar("SELECT label FROM object_labels") == "cat"
        assert db.scalar("SELECT COUNT(*) FROM face_clusters") == 1

    def test_metadata_location_projection_with_offline_geocode(self, db):
        repo, _ = make_repo(db)
        repo.create(env("video.metadata",
                        {"duration_ms": 60000,
                         "gps": {"latitude": 35.68, "longitude": 139.69}},
                        0, 60000))
        row = db.query_one("SELECT * FROM video_locations WHERE asset_id='a1'")
        assert row is not None and row["country"] == "Japan"
        # city-level resolution like the reference's Nominatim results
        # (reverse_geocoding_service.py:12-54): 35.68,139.69 is central Tokyo
        assert row["city"] == "Tokyo" and row["state"] == "Tokyo"

    def test_place_has_no_projection(self, db):
        repo, _ = make_repo(db)
        repo.create(env("place.classification",
                        {"predictions": [{"label": "beach", "confidence": 0.7}],
                         "frame_number": 0}, 0, 33))
        # no table writes expected; just ensure artifact stored
        assert len(repo.get_by_asset("a1")) == 1

    def test_resync_all_rebuilds(self, db):
        repo, sync = make_repo(db)
        repo.create(transcript("rebuild me", 0, 1000))
        db.execute("DELETE FROM transcript_fts")
        db.execute("DELETE FROM transcript_fts_meta")
        n = sync.resync_all()
        assert n == 1
        assert db.scalar("SELECT COUNT(*) FROM transcript_fts") == 1


class TestFindWithinVideo:
    def _seed(self, db):
        repo, _ = make_repo(db)
        repo.create(transcript("the quick brown fox", 0, 2000))
        repo.create(transcript("a lazy dog sleeps", 5000, 7000))
        repo.create(transcript("the fox returns again", 10000, 12000))
        repo.create(env("ocr.text",
                        {"text": "FOX NEWS banner", "polygon": [[0, 0], [1, 0], [1, 1]],
                         "languages": ["en"], "frame_index": 100},
                        8000, 8033))
        return FindWithinVideoService(db)

    def test_find_next(self, db):
        svc = self._seed(db)
        hits = svc.find("a1", "fox", from_ms=0, direction="next")
        assert [h["jump_to"]["start_ms"] for h in hits] == [0, 8000, 10000]
        assert {h["source"] for h in hits} == {"transcript", "ocr"}

    def test_find_next_after_time(self, db):
        svc = self._seed(db)
        hits = svc.find("a1", "fox", from_ms=1, direction="next")
        assert hits[0]["jump_to"]["start_ms"] == 8000

    def test_find_prev(self, db):
        svc = self._seed(db)
        hits = svc.find("a1", "fox", from_ms=9000, direction="prev")
        assert hits[0]["jump_to"]["start_ms"] == 8000

    def test_stemming(self, db):
        svc = self._seed(db)
        # porter stemmer: "sleeping" matches "sleeps"
        hits = svc.find("a1", "sleeping", from_ms=0)
        assert hits and hits[0]["jump_to"]["start_ms"] == 5000

    def test_substring_fallback(self, db):
        svc = self._seed(db)
        hits = svc.find("a1", "azy do", from_ms=0)  # not a token match, LIKE fallback
        assert hits and hits[0]["jump_to"]["start_ms"] == 5000

    def test_snippet_highlight(self, db):
        svc = self._seed(db)
        hits = svc.find("a1", "fox", from_ms=0)
        assert "<b>" in hits[0]["snippet"]

    def test_no_results(self, db):
        svc = self._seed(db)
        assert svc.find("a1", "zebra", from_ms=0) == []


class TestJumpNavigation:
    def _svc(self, db):
        repo, _ = make_repo(db)
        repo.batch_create([
            env("object.detection",
                {"label": "dog", "confidence": 0.9,
                 "bounding_box": {"x": 0, "y": 0, "width": 1, "height": 1},
                 "frame_number": i},
                start=i * 1000, end=i * 1000 + 33)
            for i in range(5)
        ])
        repo.create(env("object.detection",
                        {"label": "cat", "confidence": 0.4,
                         "bounding_box": {"x": 0, "y": 0, "width": 1, "height": 1},
                         "frame_number": 99}, 2500, 2533))
        return JumpNavigationService(repo, SelectionPolicyManager(db))

    def test_next(self, db):
        svc = self._svc(db)
        hit = svc.jump("a1", "object", from_ms=1500, direction="next")
        assert hit["start_ms"] == 2000

    def test_prev(self, db):
        svc = self._svc(db)
        hit = svc.jump("a1", "object", from_ms=1500, direction="prev")
        assert hit["start_ms"] == 1000

    def test_label_filter(self, db):
        svc = self._svc(db)
        hit = svc.jump("a1", "object", from_ms=0, direction="next", label="cat")
        assert hit["start_ms"] == 2500

    def test_min_confidence(self, db):
        svc = self._svc(db)
        hit = svc.jump("a1", "object", from_ms=2100, direction="next", min_confidence=0.5)
        assert hit["start_ms"] == 3000  # skips the 0.4-confidence cat at 2500

    def test_none_when_exhausted(self, db):
        svc = self._svc(db)
        assert svc.jump("a1", "object", from_ms=99999, direction="next") is None


class TestProjectionDeletion:
    def test_delete_for_asset_removes_all_projections(self, db):
        repo, sync = make_repo(db)
        repo.create(transcript("delete me soon", 0, 1000))
        repo.create(env("scene", {"scene_index": 0, "start_ms": 0, "end_ms": 1000,
                                  "duration_ms": 1000}, 0, 1000))
        repo.create(env("ocr.text", {"text": "gone text",
                                     "polygon": [[0, 0], [1, 0], [1, 1]],
                                     "languages": ["en"], "frame_index": 0},
                        0, 33))
        find = FindWithinVideoService(db)
        assert find.find("a1", "delete", 0)
        sync.delete_for_asset("a1")
        assert find.find("a1", "delete", 0) == []
        assert find.find("a1", "gone", 0) == []
        assert db.scalar("SELECT COUNT(*) FROM scene_ranges") == 0
        assert db.scalar("SELECT COUNT(*) FROM transcript_fts") == 0
        assert db.scalar("SELECT COUNT(*) FROM ocr_fts") == 0
