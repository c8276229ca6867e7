"""bench.py orchestration guarantees (VERDICT r1 item 1): the final JSON line
prints within the deadline no matter what — stages are skipped when the
budget can't fit them, the parent process never initializes JAX (a dead TPU
tunnel can't hang it), and partial results flush to disk."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestAssemble:
    def _assemble(self):
        sys.path.insert(0, REPO)
        import bench
        return bench._assemble

    def test_empty_still_valid(self):
        out = self._assemble()({}, "cpu")
        assert out["metric"] and out["unit"]
        assert out["value"] == 0.0 and out["vs_baseline"] == 0.0

    def test_combined_metric_and_extras(self):
        out = self._assemble()(
            {"detect": 5000.0, "embed": 6000.0, "pipeline": 35.0,
             "query": 2.5}, "tpu")
        assert out["extra"]["detect_fps_640"] == 5000.0
        assert out["extra"]["pipeline_video_hours_per_hour"] == 35.0
        assert out["extra"]["query_p50_ms_10k"] == 2.5
        # 1/(1/5000 + (1/30)/6000) ~ 4866
        assert 4800 < out["value"] < 4900
        assert out["vs_baseline"] == round(out["value"] / 30.0, 2)

    def test_estimate_only_when_pipeline_missing(self):
        a = self._assemble()
        est = a({"combined": 30.0, "embed": 6000.0}, "tpu")["extra"]
        assert "est_pipeline_video_hours_per_hour" in est
        measured = a({"combined": 30.0, "embed": 6000.0, "pipeline": 28.0},
                     "tpu")["extra"]
        assert "est_pipeline_video_hours_per_hour" not in measured
        assert measured["pipeline_video_hours_per_hour"] == 28.0


class TestPrimeMode:
    """`bench.py --prime` — the pre-driver cache-warming chore (CLAUDE.md).
    Pure-unit: collaborators are monkeypatched, no subprocesses spawned."""

    def _prime(self, monkeypatch, *, alive=True, results=None, env=None):
        sys.path.insert(0, REPO)
        import bench
        monkeypatch.setattr(bench, "_START", __import__("time").monotonic())
        calls = []

        def fake_run(stage, force_cpu=False):
            calls.append(stage)
            v = (results or {}).get(stage, 1.0)
            bench._LAST_STAGE_DISTRESS = v is None
            return v

        monkeypatch.setattr(bench, "_backend_alive", lambda *a: alive)
        monkeypatch.setattr(bench, "_run_stage_subprocess", fake_run)
        for k, v in (env or {}).items():
            monkeypatch.setenv(k, v)
        # STAGE_TIMEOUT_S (doubled) and DEADLINE_S (prime deadline) are
        # mutated module-wide — restore both so later in-process tests of
        # budget/skip behavior aren't order-dependent
        saved = dict(bench.STAGE_TIMEOUT_S)
        saved_deadline = bench.DEADLINE_S
        try:
            with pytest.raises(SystemExit) as exc:
                bench._prime()
        finally:
            bench.STAGE_TIMEOUT_S.clear()
            bench.STAGE_TIMEOUT_S.update(saved)
            bench.DEADLINE_S = saved_deadline
            bench._LAST_STAGE_DISTRESS = False
        return bench, calls, exc.value.code

    def test_primes_every_real_stage_and_doubles_ceilings(self, monkeypatch):
        sys.path.insert(0, REPO)
        import bench
        bench._LAST_STAGE_DISTRESS = False  # a prior test may have left the
        # module global True; fake_run below never resets it (ADVICE r3)
        # prime covers exactly the driver's run order (pruned extras stay
        # selectable via EIOKU_PRIME_STAGES)
        want = list(bench.DRIVER_ORDER)
        seen_budget = {}

        def fake_run(stage, force_cpu=False):
            seen_budget[stage] = bench.STAGE_TIMEOUT_S[stage]
            return 1.0

        monkeypatch.setattr(bench, "_backend_alive", lambda *a: True)
        monkeypatch.setattr(bench, "_run_stage_subprocess", fake_run)
        saved = dict(bench.STAGE_TIMEOUT_S)
        saved_deadline = bench.DEADLINE_S
        try:
            with pytest.raises(SystemExit) as exc:
                bench._prime()
        finally:
            bench.STAGE_TIMEOUT_S.clear()
            bench.STAGE_TIMEOUT_S.update(saved)
            bench.DEADLINE_S = saved_deadline
        assert list(seen_budget) == want
        assert exc.value.code == 0
        assert all(seen_budget[s] == 2 * saved[s] for s in want)

    def test_subset_selection_and_failure_exit_code(self, monkeypatch):
        _, calls, code = self._prime(
            monkeypatch, results={"scenes": None},
            env={"EIOKU_PRIME_STAGES": "scenes, query ,nonexistent"})
        assert calls == ["scenes", "query"]
        assert code == 1  # an incomplete stage must be visible to scripts

    def test_dead_backend_with_low_budget_skips_stages(self, monkeypatch):
        """ADVICE r3: once the outage-wait loop exhausts its re-probe budget
        with the backend still dead (a probe DID run and fail), remaining
        stages are skipped instead of launched against a backend known to be
        unreachable."""
        sys.path.insert(0, REPO)
        import bench
        # first _remaining() call sees >300 (so one probe runs and fails),
        # every later call sees 200 (wait loop exits, probe never re-runs)
        seq = iter([400.0])
        monkeypatch.setattr(bench, "_remaining",
                            lambda: next(seq, 200.0))
        monkeypatch.setattr(bench.time, "sleep", lambda s: None)
        _, calls, code = self._prime(
            monkeypatch, alive=False,
            env={"EIOKU_PRIME_STAGES": "scenes,query"})
        # nothing may launch, and the failure must be visible to scripts
        assert calls == []
        assert code == 1


class TestSecondChanceRetry:
    def test_wedged_stage_retried_once_with_remaining_budget(
            self, monkeypatch, capsys):
        """A stage that produced nothing (transient tunnel wedge) gets ONE
        retry after the main pass while deadline remains; the retried value
        lands in the final line."""
        import signal
        import time
        sys.path.insert(0, REPO)
        import bench
        calls = []

        def fake_run(stage, force_cpu=False):
            calls.append(stage)
            bench._LAST_STAGE_SKIPPED = False
            first_try = calls.count(stage) == 1
            bench._LAST_STAGE_DISTRESS = stage == "scenes" and first_try
            if stage == "scenes" and first_try:
                return None
            return 42.0

        monkeypatch.setattr(bench, "_run_stage_subprocess", fake_run)
        monkeypatch.setattr(bench, "_backend_alive", lambda *a: True)
        monkeypatch.setattr(bench, "DRIVER_ORDER", ["scenes", "embed"])
        monkeypatch.setattr(bench, "_START", time.monotonic())
        monkeypatch.setattr(bench, "_PRINTED", False)
        monkeypatch.setattr(sys, "argv", ["bench.py"])
        monkeypatch.delenv("EIOKU_BENCH_WHISPER", raising=False)
        try:
            bench.main()
        finally:
            signal.alarm(0)
            bench._LAST_STAGE_DISTRESS = False
        assert calls == ["scenes", "embed", "scenes"]
        line = capsys.readouterr().out.strip().splitlines()[-1]
        out = json.loads(line)
        assert out["extra"]["scene_video_hours_per_hour"] == 42.0


class TestStageProvisionals:
    def test_every_stage_emits_provisional(self):
        """VERDICT r3 item 2: every real stage must flush a provisional
        result line before (or during) its slow tail so a ceiling-hit kill
        still yields a parseable value. Structural check: each stage's
        source (incl. its delegated harness) calls _provisional."""
        import inspect
        sys.path.insert(0, REPO)
        import bench
        for name, fn in bench.STAGES.items():
            if name.startswith("_"):
                continue
            src = inspect.getsource(fn)
            for helper in (bench._bench_whisper_common, bench.bench_detect,
                           bench.bench_query_p50,
                           bench._bench_pipeline_common):
                if helper.__name__ + "(" in src:
                    src += inspect.getsource(helper)
            assert "_provisional(" in src, (
                f"stage {name} has no provisional salvage line")


class TestIvfRecallProxy:
    def test_recall_at10_meets_baseline_target(self):
        """VERDICT r3 item 5: the driver-recordable stand-in for BASELINE's
        `top-10 recall >= 0.99` must actually clear 0.99 on the bench
        corpus (embedding-like clustered vectors, production n_probe)."""
        sys.path.insert(0, REPO)
        import bench
        # the real bench corpus config (10k x 384): smaller/lower-dim configs
        # sit near the threshold, the production one clears it with margin
        corpus, queries = bench._embedding_like_corpus(10000, 384, 12, seed=3)
        out = bench._ivf_recall_extra(corpus, queries)
        assert out["ivf_recall_at10"] >= 0.99
        assert out["ivf_n_probe"] == max(out["ivf_clusters"] // 8, 1)


class TestCacheForensics:
    def test_drift_line_on_forced_miss(self, monkeypatch, capsys):
        """VERDICT r3 item 4: a compile exceeding the threshold dumps the
        recorded key-component hashes and names the drifted
        module-independent component vs tools/cache_key_baseline.md."""
        sys.path.insert(0, REPO)
        import bench
        monkeypatch.setenv("EIOKU_CACHE_FORENSICS_THRESHOLD_S", "0")
        monkeypatch.setattr(bench, "_CK_HASHES",
                            {"computation": "ab" * 32,
                             "backend version": "cd" * 32})
        bench._maybe_cache_forensics("probe_stage", compile_s=1.0)
        err = capsys.readouterr().err
        assert "key components" in err
        # baseline's backend-version hash differs from "cd"*32 -> drift named
        assert "COMPONENT DRIFT backend version" in err
        # computation is module-dependent: it must NOT be reported as drift
        assert "DRIFT computation" not in err

    def test_quiet_below_threshold(self, monkeypatch, capsys):
        sys.path.insert(0, REPO)
        import bench
        monkeypatch.setenv("EIOKU_CACHE_FORENSICS_THRESHOLD_S", "60")
        monkeypatch.setattr(bench, "_CK_HASHES", {"backend version": "e" * 64})
        bench._maybe_cache_forensics("probe_stage", compile_s=5.0)
        assert "key components" not in capsys.readouterr().err


@pytest.mark.slow
class TestTimeoutSalvage:
    def _run_probe(self, stage, timeout_s=None):
        """Run a test-only probe stage under EIOKU_FORCE_CPU, optionally
        shrinking its timeout ceiling (the probe prints its provisional line
        right after child startup — no need to sleep through the production
        45 s budget), and clean up the module globals the probes set."""
        sys.path.insert(0, REPO)
        import bench
        bench._START = __import__("time").monotonic()  # fresh deadline: the
        # module may have been imported many minutes earlier in this process
        old = bench.STAGE_TIMEOUT_S[stage]
        os.environ["EIOKU_FORCE_CPU"] = "1"
        try:
            if timeout_s is not None:
                bench.STAGE_TIMEOUT_S[stage] = timeout_s
            val = bench._run_stage_subprocess(stage, force_cpu=True)
        finally:
            bench.STAGE_TIMEOUT_S[stage] = old
            os.environ.pop("EIOKU_FORCE_CPU", None)
        extra = {k: bench._STAGE_EXTRA.pop(k, None)
                 for k in ("salvaged", "crash_salvaged")}
        return bench, val, extra

    def test_timed_out_stage_reports_provisional_value(self):
        """A stage killed during slow optional extras (the MFU cost_analysis
        compile can run minutes cold) must still report the number it already
        measured: stages print a provisional result line first, and the
        orchestrator salvages the pipe after a timeout kill. A salvaged
        timeout still flags distress so the liveness check keeps counting."""
        bench, val, extra = self._run_probe("_salvage_probe", timeout_s=15)
        assert val == 123.0
        assert extra["salvaged"] is True
        assert bench._LAST_STAGE_DISTRESS is True

    def test_crashed_stage_reports_provisional_value(self):
        """A stage that CRASHES after measuring (nonzero exit, final stdout
        line cut mid-write) must also salvage: the parser falls through on
        rc != 0 and reverse-scans past the truncated line to the intact
        provisional one."""
        bench, val, extra = self._run_probe("_crash_probe")
        assert val == 321.0
        assert extra["crash_salvaged"] is True
        assert bench._LAST_STAGE_DISTRESS is True

    def test_clean_stage_clears_distress(self):
        """_assemble smoke stage: a normally-completing subprocess resets the
        distress flag so earlier salvages don't poison the miss counter."""
        sys.path.insert(0, REPO)
        import bench
        bench._START = __import__("time").monotonic()
        bench._LAST_STAGE_DISTRESS = True
        os.environ["EIOKU_FORCE_CPU"] = "1"
        try:
            val = bench._run_stage_subprocess("query", force_cpu=True)
        finally:
            os.environ.pop("EIOKU_FORCE_CPU", None)
        assert val is not None and val > 0
        assert bench._LAST_STAGE_DISTRESS is False


class TestOrchestratorAlwaysPrints:
    def test_exhausted_deadline_prints_final_line_fast(self, tmp_path):
        """With a 1 s deadline every stage is skipped — the run must still
        exit 0 quickly with one parseable JSON line (the r1 failure mode was
        rc=124 with no line at all)."""
        env = dict(os.environ, EIOKU_BENCH_DEADLINE_S="1")
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, cwd=REPO, capture_output=True, text=True, timeout=60)
        assert proc.returncode == 0, proc.stderr[-500:]
        line = proc.stdout.strip().splitlines()[-1]
        parsed = json.loads(line)
        assert parsed["unit"] == "frames/s/chip"
        assert "SKIPPED" in proc.stderr
