"""Device helpers: host-keyed compile cache + the single-thread device probe
(ADVICE r2: a dead remote backend must not leak one blocked thread per
/device request, and /tmp caches must never serve another machine's XLA:CPU
AOT artifacts)."""
import threading
import time

from eioku_tpu.utils.device import compile_cache_dir


class TestCompileCacheDir:
    def test_deterministic_and_host_keyed(self):
        a = compile_cache_dir()
        b = compile_cache_dir()
        assert a == b
        assert a.startswith("/tmp/eioku_jax_cache_")
        suffix = a.rsplit("_", 1)[1]
        assert len(suffix) == 10 and all(c in "0123456789abcdef"
                                         for c in suffix)

    def test_respects_base(self):
        assert compile_cache_dir("/tmp/other").startswith("/tmp/other_")

    def test_cpu_fingerprint_reflects_cpuid_or_boot(self):
        """The key must come from CPUID (what LLVM's host detection reads) or,
        failing that, the boot id — never from the genericised /proc/cpuinfo
        that proved identical across different physical hosts."""
        from eioku_tpu.utils.device import _cpu_fingerprint

        fp = _cpu_fingerprint()
        assert fp == _cpu_fingerprint()  # stable within a process
        import platform
        if platform.machine() in ("x86_64", "i686"):
            # native path: leaf dump incl. vendor leaf 0 and feature leaf 7.0,
            # or the boot_id fallback when the toolchain is absent
            assert fp.startswith(("0.0:", "boot:", "plat:"))
            if fp.startswith("0.0:"):
                assert "7.0:" in fp and "1.0:" in fp


class TestDeviceInfoSingleProbeThread:
    def test_blocked_probe_reuses_one_thread(self, monkeypatch):
        """With jax.devices() hung, repeated device_info calls must not stack
        blocked threads: one shared worker stays in flight and is re-awaited."""
        import eioku_tpu.ml.engine as engine

        release = threading.Event()
        calls = []

        def hung_devices():
            calls.append(1)
            release.wait(timeout=30)
            return []

        monkeypatch.setattr(engine.jax, "devices", hung_devices)
        monkeypatch.setattr(engine, "_DEVICE_PROBE_FAILED_AT", 0.0)
        monkeypatch.setattr(engine, "_DEVICE_PROBE_POOL", None)
        monkeypatch.setattr(engine, "_DEVICE_PROBE_FUTURE", None)

        before = threading.active_count()
        out1 = engine.device_info(timeout_s=0.1)
        assert out1["backend"] == "unavailable"
        # memo window suppresses immediate re-probes
        assert engine.device_info(timeout_s=0.1)["backend"] == "unavailable"
        # force past the memo: still must NOT start a second probe thread
        engine._DEVICE_PROBE_FAILED_AT = 0.0
        out3 = engine.device_info(timeout_s=0.1)
        assert out3["backend"] == "unavailable"
        assert len(calls) == 1  # ONE in-flight probe, re-awaited
        assert threading.active_count() <= before + 1
        release.set()
        time.sleep(0.05)

    def test_probe_recovers_after_backend_returns(self, monkeypatch):
        import eioku_tpu.ml.engine as engine

        release = threading.Event()

        class Dev:
            id = 0
            device_kind = "cpu"
            platform = "cpu"

        def slow_devices():
            release.wait(timeout=30)
            return [Dev()]

        monkeypatch.setattr(engine.jax, "devices", slow_devices)
        monkeypatch.setattr(engine.jax, "default_backend", lambda: "cpu")
        monkeypatch.setattr(engine, "_DEVICE_PROBE_FAILED_AT", 0.0)
        monkeypatch.setattr(engine, "_DEVICE_PROBE_POOL", None)
        monkeypatch.setattr(engine, "_DEVICE_PROBE_FUTURE", None)

        assert engine.device_info(timeout_s=0.1)["backend"] == "unavailable"
        release.set()  # tunnel comes back; the in-flight probe resolves
        time.sleep(0.1)
        engine._DEVICE_PROBE_FAILED_AT = 0.0  # step past the failure memo
        out = engine.device_info(timeout_s=2.0)
        assert out["backend"] == "cpu" and out["device_count"] == 1


class TestSpuriousAotErrorFilter:
    def test_drops_only_pseudo_feature_lines(self, tmp_path):
        """The stderr filter must drop XLA's false-positive prefer-no-*
        cpu_aot_loader errors (logged on every warm-cache reload even on the
        compiling host) while passing real feature mismatches and ordinary
        stderr through. Runs in a subprocess: the filter rewires fd 2."""
        import subprocess
        import sys

        out = tmp_path / "err.txt"
        code = (
            "import os, sys, time\n"
            "sys.path.insert(0, %r)\n"
            "from eioku_tpu.utils.device import "
            "suppress_spurious_aot_feature_errors as s\n"
            "s(); s()  # idempotent\n"
            "os.write(2, b'E cpu_aot_loader.cc:210] Target machine feature "
            "+prefer-no-gather is not supported\\n')\n"
            "os.write(2, b'E cpu_aot_loader.cc:210] Target machine feature "
            "+amx-fp16 is not supported\\n')\n"
            "os.write(2, b'ordinary stderr line\\n')\n"
            "time.sleep(0.3)\n"  # let the pump thread forward
        ) % "/root/repo"
        with open(out, "wb") as f:
            subprocess.run([sys.executable, "-c", code], stderr=f,
                           check=True, timeout=60)
        text = out.read_text()
        assert "prefer-no-gather" not in text
        assert "+amx-fp16" in text          # real mismatch passes through
        assert "ordinary stderr line" in text
