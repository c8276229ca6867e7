"""Property-based tests (Hypothesis) for the pure logic layers.

The reference's specs call for property-based tests but none were implemented
(SURVEY.md section 4, README.md:139-144 of the reference). These cover the
invariants unit examples can miss.
"""
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from eioku_tpu.domain.artifacts import ArtifactEnvelope, new_id
from eioku_tpu.index.semantic import chunk_segments
from eioku_tpu.ml.scenes import assemble_scenes
from eioku_tpu.models.embed.tokenizer import WordPieceTokenizer
from eioku_tpu.models.yolo.postprocess import _iou_matrix, nms_fixed
from eioku_tpu.services.find_service import _fts_query

pytestmark = pytest.mark.slow  # heavy e2e: excluded from the default fast selection

spans = st.tuples(st.integers(0, 10_000), st.integers(0, 10_000)).map(
    lambda t: (min(t), max(t) + 1))


class TestEnvelopeProperties:
    @given(a=spans, b=spans)
    @settings(max_examples=200, deadline=None)
    def test_overlap_matches_interval_math(self, a, b):
        env = ArtifactEnvelope(
            artifact_id=new_id(), asset_id="x", artifact_type="scene",
            schema_version=1, span_start_ms=a[0], span_end_ms=a[1],
            payload_json={"scene_index": 0, "start_ms": a[0], "end_ms": a[1],
                          "duration_ms": a[1] - a[0]},
            producer="p", producer_version="1", model_profile="fast",
            config_hash="c", input_hash="i", run_id="r")
        expected = max(a[0], b[0]) < min(a[1], b[1])
        assert env.overlaps(b[0], b[1]) == expected


class TestSceneAssemblyProperties:
    @given(
        duration=st.integers(1000, 100_000),
        cuts=st.lists(st.tuples(st.integers(1, 99_999),
                                st.floats(0.1, 1.0)), max_size=20),
        min_len=st.floats(0.1, 5.0),
    )
    @settings(max_examples=150, deadline=None)
    def test_scenes_partition_the_video(self, duration, cuts, min_len):
        scenes = assemble_scenes(cuts, duration, min_scene_len_s=min_len)
        assert scenes[0].start_ms == 0
        assert scenes[-1].end_ms >= duration
        for prev, cur in zip(scenes, scenes[1:]):
            assert prev.end_ms == cur.start_ms  # contiguous, no gaps/overlap
            assert cur.start_ms - prev.start_ms >= int(min_len * 1000)


class TestChunkingProperties:
    texts = st.lists(st.text(alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters=" "),
        min_size=0, max_size=60), min_size=0, max_size=30)

    @given(texts=texts, chunk_chars=st.integers(10, 200),
           overlap=st.integers(0, 50))
    @settings(max_examples=100, deadline=None)
    def test_every_word_lands_in_a_chunk(self, texts, chunk_chars, overlap):
        segs = [{"text": t, "start_ms": i * 100, "end_ms": i * 100 + 100}
                for i, t in enumerate(texts)]
        chunks = chunk_segments(segs, chunk_chars=chunk_chars,
                                overlap_chars=min(overlap, chunk_chars - 1))
        joined = " ".join(c["text"] for c in chunks)
        for t in texts:
            for word in t.split():
                assert word in joined
        for c in chunks:
            assert c["start_ms"] <= c["end_ms"]


class TestNmsProperties:
    boxes_strategy = st.lists(
        st.tuples(st.floats(0, 500), st.floats(0, 500),
                  st.floats(1, 100), st.floats(1, 100),
                  st.floats(0.01, 1.0), st.integers(0, 3)),
        min_size=1, max_size=24)

    @given(data=boxes_strategy, thr=st.floats(0.1, 0.9))
    @settings(max_examples=60, deadline=None)
    def test_kept_boxes_are_nms_consistent(self, data, thr):
        data.sort(key=lambda d: -d[4])  # NMS expects score-sorted input
        boxes = jnp.asarray([[x, y, x + w, y + h] for x, y, w, h, _, _ in data],
                            jnp.float32)
        scores = jnp.asarray([s for *_, s, _ in data], jnp.float32)
        classes = jnp.asarray([c for *_, c in data], jnp.int32)
        out = nms_fixed(boxes, scores, classes, iou_threshold=thr,
                        max_det=len(data))
        valid = np.asarray(out["valid"])
        kept_boxes = np.asarray(out["boxes"])[valid]
        kept_classes = np.asarray(out["classes"])[valid]
        iou = np.asarray(_iou_matrix(jnp.asarray(kept_boxes)))
        for i in range(len(kept_boxes)):
            for j in range(i + 1, len(kept_boxes)):
                if kept_classes[i] == kept_classes[j]:
                    assert iou[i, j] <= thr + 1e-5

    @given(data=boxes_strategy)
    @settings(max_examples=30, deadline=None)
    def test_highest_score_always_kept(self, data):
        data.sort(key=lambda d: -d[4])
        boxes = jnp.asarray([[x, y, x + w, y + h] for x, y, w, h, _, _ in data],
                            jnp.float32)
        scores = jnp.asarray([s for *_, s, _ in data], jnp.float32)
        classes = jnp.asarray([c for *_, c in data], jnp.int32)
        out = nms_fixed(boxes, scores, classes, max_det=len(data))
        assert bool(np.asarray(out["valid"])[0])


class TestFtsQueryProperties:
    @given(q=st.text(max_size=80))
    @settings(max_examples=200, deadline=None)
    def test_sanitizer_output_is_safe(self, q):
        from eioku_tpu.db.dialect import SQLITE

        out = _fts_query(q, SQLITE)
        # either empty or strictly AND-of-quoted-word-tokens
        if out:
            parts = out.split(" AND ")
            for p in parts:
                assert p.startswith('"') and p.endswith('"')
                inner = p[1:-1]
                assert '"' not in inner

    @given(q=st.text(max_size=80))
    @settings(max_examples=200, deadline=None)
    def test_pg_sanitizer_output_is_safe(self, q):
        """The PG form must be a bare &-of-word-terms: no tsquery operators
        (& | ! < > ( ) :) or quotes can leak from user text."""
        from eioku_tpu.db.dialect import POSTGRES

        out = _fts_query(q, POSTGRES)
        if out:
            for term in out.split(" & "):
                assert term and not set(term) & set("&|!()<>:'\" ")


class TestTokenizerProperties:
    @given(text=st.text(max_size=200), max_len=st.integers(8, 64))
    @settings(max_examples=100, deadline=None)
    def test_fixed_shape_and_mask(self, text, max_len):
        tok = WordPieceTokenizer(max_len=max_len)
        ids, mask = tok.encode(text)
        assert len(ids) == len(mask) == max_len
        n = sum(mask)
        assert mask == [1] * n + [0] * (max_len - n)  # contiguous padding
        assert ids[0] == tok.cls_id
        assert tok.sep_id in ids
        assert all(0 <= i < tok.vocab_size for i in ids)


class TestSubtitleProperties:
    seg_strategy = st.lists(st.fixed_dictionaries({
        "span_start_ms": st.integers(0, 10_000_000),
        "span_end_ms": st.integers(0, 10_000_000),
        "payload_json": st.fixed_dictionaries({
            "text": st.text(max_size=60),
        }, optional={"speaker": st.text(min_size=1, max_size=10)}),
    }), max_size=12)

    @given(segs=seg_strategy)
    @settings(max_examples=60, deadline=None)
    def test_vtt_always_parses(self, segs):
        """Any payload text yields a structurally valid VTT: header, cue
        count == timing-line count, non-decreasing starts, every timing line
        well-formed — regardless of newlines/arrows/tags in the text."""
        import re

        from eioku_tpu.services.subtitles import to_vtt
        out = to_vtt(segs)
        lines = out.splitlines()
        assert lines[0] == "WEBVTT"
        timing = [ln for ln in lines if "-->" in ln]
        pat = re.compile(r"^\d{2,}:\d{2}:\d{2}\.\d{3} --> "
                         r"\d{2,}:\d{2}:\d{2}\.\d{3}$")
        starts = []
        for ln in timing:
            assert pat.match(ln), ln
            h, m, s = ln.split(" --> ")[0].split(":")
            starts.append((int(h) * 3600 + int(m) * 60 + float(s)))
        assert starts == sorted(starts)
        # a cue body never contains a blank line (it would end the cue)
        for i, ln in enumerate(lines):
            if "-->" in ln:
                assert lines[i + 1].strip() != ""

    @given(segs=seg_strategy)
    @settings(max_examples=30, deadline=None)
    def test_srt_vtt_same_cue_count(self, segs):
        from eioku_tpu.services.subtitles import to_srt, to_vtt
        assert to_vtt(segs).count("-->") == to_srt(segs).count("-->")


class TestPeopleClusteringProperties:
    vec = st.lists(st.floats(-1, 1, allow_nan=False, width=32),
                   min_size=8, max_size=8)
    track_strategy = st.lists(st.fixed_dictionaries({
        "video_id": st.sampled_from(["v1", "v2", "v3"]),
        "cluster_id": st.integers(0, 9).map(lambda i: f"face_{i}"),
        "centroid": vec,
        "count": st.integers(1, 20),
        "first_ms": st.integers(0, 100_000),
    }), max_size=20, unique_by=lambda t: (t["video_id"], t["cluster_id"]))

    @given(tracks=track_strategy, threshold=st.floats(0.0, 2.0))
    @settings(max_examples=60, deadline=None)
    def test_partition_invariants(self, tracks, threshold):
        """Every track lands in exactly one person; face totals are
        preserved; person ids are dense and sorted by total faces."""
        from unittest.mock import patch

        import numpy as np

        from eioku_tpu.services import people as pp
        norm = []
        for t in tracks:
            c = np.asarray(t["centroid"], np.float32)
            n = float(np.linalg.norm(c))
            if n < 1e-6:
                continue
            norm.append({**t, "centroid": c / n})
        with patch.object(pp, "_track_centroids", lambda ctx: list(norm)):
            persons = pp.cluster_people(ctx=None, threshold=threshold)
        occs = [o for p in persons for o in p["occurrences"]]
        assert len(occs) == len(norm)
        assert sum(p["total_faces"] for p in persons) == \
            sum(t["count"] for t in norm)
        totals = [p["total_faces"] for p in persons]
        assert totals == sorted(totals, reverse=True)
        assert [p["person_id"] for p in persons] == \
            [f"person_{i}" for i in range(len(persons))]

    @given(tracks=track_strategy)
    @settings(max_examples=20, deadline=None)
    def test_zero_threshold_never_merges_distinct(self, tracks):
        from unittest.mock import patch

        import numpy as np

        from eioku_tpu.services import people as pp
        norm = []
        for t in tracks:
            c = np.asarray(t["centroid"], np.float32)
            n = float(np.linalg.norm(c))
            if n < 1e-6:
                continue
            norm.append({**t, "centroid": c / n})
        with patch.object(pp, "_track_centroids", lambda ctx: list(norm)):
            persons = pp.cluster_people(ctx=None, threshold=0.0)
        # only exactly-identical centroids may share a person
        for p in persons:
            ms = [m for m in norm
                  if any(o["cluster_id"] == m["cluster_id"]
                         and o["video_id"] == m["video_id"]
                         for o in p["occurrences"])]
            for a in ms:
                for b in ms:
                    assert float(a["centroid"] @ b["centroid"]) > 1 - 1e-5


class TestDumpRoundTripProperties:
    """Arbitrary libraries survive export -> import bit-exactly
    (services/dump.py): payloads, spans, provenance, unicode text."""

    payloads = st.fixed_dictionaries({
        "text": st.text(min_size=0, max_size=80),
        "language": st.sampled_from(["en", "ja", "de"]),
        "start_ms": st.integers(0, 10_000),
        "end_ms": st.integers(10_001, 20_000),
        "confidence": st.floats(0, 1, allow_nan=False).map(
            lambda x: round(x, 6)),
    })

    @given(payloads=st.lists(payloads, min_size=1, max_size=12))
    @settings(max_examples=20, deadline=None)
    def test_artifacts_roundtrip_bit_exact(self, payloads, tmp_path_factory):
        import json as _json

        from eioku_tpu.api.app import build_context
        from eioku_tpu.config.settings import AppConfig
        from eioku_tpu.db.connection import Database
        from eioku_tpu.domain.models import Video
        from eioku_tpu.services.dump import export_dump, import_dump

        base = tmp_path_factory.mktemp("dumpprop")
        src_db = Database(f"sqlite:///{base}/src.db")
        dst_db = Database(f"sqlite:///{base}/dst.db")
        try:
            src = build_context(AppConfig(scan_paths=[], auto_discover=False,
                                          semantic_search=False,
                                          visual_search=False), db=src_db)
            dst = build_context(AppConfig(scan_paths=[], auto_discover=False,
                                          semantic_search=False,
                                          visual_search=False), db=dst_db)
            v = Video(path=str(base / "v.mp4"), file_hash="h")
            src.videos.save(v)
            envs = [ArtifactEnvelope(
                artifact_id=new_id(), asset_id=v.id,
                artifact_type="transcript.segment", schema_version=1,
                span_start_ms=p["start_ms"], span_end_ms=p["end_ms"],
                payload_json=p, producer="p", producer_version="1",
                model_profile="balanced", config_hash="c", input_hash="i",
                run_id="r1") for p in payloads]
            src.artifacts.insert_unchecked_batch(envs)
            out = str(base / "d.jsonl.gz")
            export_dump(src, out)
            import_dump(dst, out, reindex=False)
            restored = dst.artifacts.get_by_asset(v.id)
            assert len(restored) == len(envs)
            by_id = {e.artifact_id: e for e in envs}
            for r in restored:
                e = by_id[r.artifact_id]
                assert _json.dumps(r.payload_json, sort_keys=True) == \
                    _json.dumps(e.payload_json, sort_keys=True)
                assert (r.span_start_ms, r.span_end_ms, r.run_id) == \
                    (e.span_start_ms, e.span_end_ms, e.run_id)
        finally:
            src_db.close()
            dst_db.close()


class TestPgwirePlaceholderScanner:
    """db/pgwire.py:_format_to_dollar — the third stage of the qmark -> %s ->
    $n placeholder chain every PostgreSQL statement rides."""

    sql_atoms = st.lists(st.sampled_from([
        "SELECT a FROM t WHERE x = ", "?", " AND y IN (", "?", ", ", "?", ")",
        " ORDER BY 1", "'it''s'", "'100%'", '"we?ird"', "-- c ? %s\n",
        "/* block ? */", " || ", "'%s'", " + 1 ",
    ]), min_size=1, max_size=25)

    @given(sql_atoms)
    @settings(max_examples=200, deadline=None)
    def test_composes_with_translate_qmark(self, atoms):
        """translate_qmark (? -> %s, literal/comment-aware) followed by
        _format_to_dollar (%s -> $n) numbers exactly the placeholders
        OUTSIDE literals/comments, in order, leaving everything else
        byte-identical."""
        import re

        from eioku_tpu.db.dialect import translate_qmark
        from eioku_tpu.db.pgwire import _format_to_dollar

        sql = "".join(atoms)
        n_params = sum(1 for a in atoms if a == "?")
        dollar = _format_to_dollar(translate_qmark(sql))
        found = re.findall(r"\$(\d+)", dollar)
        assert [int(x) for x in found] == list(range(1, n_params + 1))
        # no un-rewritten placeholders outside literals remain: rebuild the
        # expected string atom-by-atom and compare exactly
        expected, n = [], 0
        for a in atoms:
            if a == "?":
                n += 1
                expected.append(f"${n}")
            else:
                expected.append(a)
        assert dollar == "".join(expected)

    @given(st.text(alphabet="abc?'\"-%s/*\n ", max_size=60))
    @settings(max_examples=300, deadline=None)
    def test_never_crashes_and_is_deterministic(self, sql):
        from eioku_tpu.db.pgwire import _format_to_dollar

        assert _format_to_dollar(sql) == _format_to_dollar(sql)
