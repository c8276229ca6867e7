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

    def test_accelerator_dir_is_host_independent(self, monkeypatch):
        """VERDICT r3 item 1: TPU executables are compiled by/for the remote
        device — keying their cache dir by host CPUID made a prime on one
        host useless for a capture on another (the r03 driver paid a 495 s
        cold compile). Non-CPU backends must key by software stack only."""
        import jax

        from eioku_tpu.utils import device as dev

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        a = compile_cache_dir()
        assert "_tpu_" in a
        fp = dev._cpu_fingerprint()
        # the host fingerprint must not influence the accelerator dir
        monkeypatch.setattr(dev, "_cpu_fingerprint",
                            lambda: fp + "DIFFERENT-HOST")
        assert compile_cache_dir() == a
        # ... but it must still key the CPU dir (foreign-AOT SIGILL guard)
        monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
        c1 = compile_cache_dir()
        monkeypatch.setattr(dev, "_cpu_fingerprint", lambda: fp)
        c2 = compile_cache_dir()
        assert c1 != c2 and "_tpu_" not in c1

    def test_setup_persistent_cache_wires_config(self):
        """The shared entry-point helper must point jax at the backend-split
        dir and set the persistence threshold (every entry point — bench,
        conftest, graft entry, profiler — relies on this one function)."""
        import jax

        from eioku_tpu.utils.device import setup_persistent_cache

        d = setup_persistent_cache()
        assert d == compile_cache_dir()
        assert jax.config.jax_compilation_cache_dir == d
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 2.0

    def test_cache_key_stabilizer_drops_build_timestamp_only(self):
        """stabilize_compile_cache_key must make the `backend version` key
        component invariant to the platform_version's `Built on …` line on
        accelerators (the tunnel-reconnect churner, tools/
        cache_key_baseline.md) while CPU and real compat changes still
        rekey."""
        import hashlib

        from eioku_tpu.utils import device as dev

        dev.stabilize_compile_cache_key()
        from jax._src import cache_key as ck

        class B:
            def __init__(self, platform, pv):
                self.platform = platform
                self.platform_version = pv

        def digest(platform, pv):
            h = hashlib.sha256()
            ck._hash_platform(h, B(platform, pv))
            return h.hexdigest()

        compat = ("PJRT C API\naxon 0.1.0; SerializedExecutable v9; "
                  "compile-cache v14; compat c49\nTFRT TPU v5 lite")
        a = digest("tpu", compat + "\nBuilt on Nov 12 2025 (1762985796) cl/1")
        b = digest("tpu", compat + "\nBuilt on Dec 01 2025 (1764500000) cl/2")
        assert a == b  # rebuild timestamp must not rekey
        c = digest("tpu", compat.replace("compat c49", "compat c50")
                   + "\nBuilt on Nov 12 2025 (1762985796) cl/1")
        assert c != a  # a real compat change must rekey
        # CPU keeps the full string: identical-compat different-build rekeys
        d = digest("cpu", "x\nBuilt on A")
        e = digest("cpu", "x\nBuilt on B")
        assert d != e

    def test_compile_options_hash_ignores_debug_defaults_on_accelerators(
            self, monkeypatch):
        """r5 churn source: a tunnel-server restart changes debug_options
        DEFAULTS, drifting the serialized-CompileOptions key component while
        the compat line (and thus executable loadability) is unchanged. On
        non-CPU backends the stabilized hash must ignore debug options but
        still rekey on semantically-relevant fields (partition counts)."""
        import hashlib

        import jax
        from jax._src import compiler as jax_compiler

        from eioku_tpu.utils import device as dev

        dev.stabilize_compile_cache_key()
        from jax._src import cache_key as ck

        def digest(co):
            h = hashlib.sha256()
            ck._hash_serialized_compile_options(h, co)
            return h.hexdigest()

        def make(num_partitions=1, dump_to=""):
            co = jax_compiler.xc.CompileOptions()
            co.num_partitions = num_partitions
            co.executable_build_options.debug_options.xla_dump_to = dump_to
            # a debug knob jax does NOT clear in its own hasher: the exact
            # field a server restart can re-default
            co.executable_build_options.debug_options \
                .xla_cpu_enable_fast_math = bool(dump_to)
            return co

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert digest(make()) == digest(make(dump_to="x"))  # debug-invariant
        assert digest(make()) != digest(make(num_partitions=2))
        monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
        # CPU keeps jax's full hashing: the uncleaned debug knob rekeys
        assert digest(make()) != digest(make(dump_to="x"))

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
