"""Device/backend selection helpers.

The deployment image presets JAX_PLATFORMS to a remote-TPU tunnel AND pins
`jax_platforms` via a sitecustomize `jax.config` update, so overriding the env
var alone does NOT move a spawned process back onto CPU. `maybe_force_cpu`
applies the full recipe (config update + backend-cache clears) when
EIOKU_FORCE_CPU=1 is set — used by tests that spawn real API/worker processes
(tests/test_multiprocess.py, tests/test_crash_recovery.py) so they never
compile over the TPU tunnel.

Counterpart in the reference: CUDA_VISIBLE_DEVICES-style device pinning of its
GPU worker container (/root/reference/ml-service/src/main_worker.py:124-129);
here backend choice is a JAX runtime concern instead.
"""
from __future__ import annotations

import os


def force_cpu() -> None:
    """Force this process's JAX backend to CPU, even if a sitecustomize has
    already pinned another platform via jax.config."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        from jax._src import xla_bridge as _xb

        for clear in ("_clear_backends", "clear_backends"):
            if hasattr(_xb, clear):
                getattr(_xb, clear)()
                break
        jax.clear_caches()
        if hasattr(_xb.get_backend, "cache_clear"):
            _xb.get_backend.cache_clear()
    except Exception:
        pass  # private API drifted: the config update above still wins


def maybe_force_cpu() -> None:
    """Apply force_cpu() iff EIOKU_FORCE_CPU is truthy in the environment."""
    if os.environ.get("EIOKU_FORCE_CPU", "").lower() in ("1", "true", "yes"):
        force_cpu()


def _cpu_fingerprint() -> str:
    """CPU identity as LLVM's host detection sees it.

    XLA:CPU AOT target features (incl. tuning toggles like prefer-no-gather)
    come from LLVM reading CPUID + XGETBV directly — NOT from /proc/cpuinfo,
    which this deployment's VMs present fully genericised (identical model
    name/flags on different physical hosts). So the fingerprint is a raw
    CPUID-leaf dump from a tiny native helper (native/cpuid.cpp). When the
    helper can't build (no toolchain), fall back to the kernel boot_id:
    per-boot isolation trades cross-boot cache reuse for guaranteed safety.
    """
    import ctypes

    from eioku_tpu.utils.native_build import load_native_lib

    def _configure(lib: ctypes.CDLL) -> None:
        lib.eioku_cpuid_fingerprint.restype = ctypes.c_int
        lib.eioku_cpuid_fingerprint.argtypes = [ctypes.c_char_p, ctypes.c_int]

    lib = load_native_lib("cpuid", _configure)
    if lib is not None:
        buf = ctypes.create_string_buffer(4096)
        n = lib.eioku_cpuid_fingerprint(buf, len(buf))
        if n > 0:
            return buf.raw[:n].decode("ascii", "replace")
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            return "boot:" + f.read().strip()
    except OSError:
        import platform

        return "plat:" + platform.processor() + platform.machine()


def suppress_spurious_aot_feature_errors() -> None:
    """Drop XLA's false-positive `cpu_aot_loader` machine-feature errors.

    XLA:CPU stamps persistent-cache artifacts with tuning *pseudo*-features
    (`+prefer-no-gather` / `+prefer-no-scatter`, slow-gather mitigations) in
    addition to real ISA features. Its load-time host probe only reports real
    ISA features, so EVERY warm-cache reload logs two "machine feature not
    supported ... could lead to SIGILL" errors — even on the very host that
    compiled the entry (verified: fresh cache dir, compile then reload in a
    second process on one machine reproduces it; the computation is correct).

    Filters stderr at the fd level (XLA logs bypass sys.stderr) and drops
    exactly the lines naming a `prefer-no-*` pseudo-feature. Real feature
    mismatches (foreign artifacts, e.g. `+amx-fp16`) are logged one feature
    per line and still pass through — those are the SIGILL-risk cases the
    host-keyed cache dir exists to prevent. Idempotent per process.
    """
    global _AOT_FILTER_INSTALLED
    if _AOT_FILTER_INSTALLED:
        return
    _AOT_FILTER_INSTALLED = True
    import threading

    real_fd = os.dup(2)
    read_fd, write_fd = os.pipe()
    os.dup2(write_fd, 2)
    os.close(write_fd)

    def _pump() -> None:
        buf = b""
        while True:
            try:
                chunk = os.read(read_fd, 65536)
            except OSError:
                break
            if not chunk:
                break
            buf += chunk
            *lines, buf = buf.split(b"\n")
            for line in lines:
                if b"cpu_aot_loader" in line and b"prefer-no-" in line:
                    continue
                os.write(real_fd, line + b"\n")
        if buf:
            os.write(real_fd, buf)

    pump = threading.Thread(target=_pump, daemon=True,
                            name="xla-aot-log-filter")
    pump.start()

    def _drain_at_exit() -> None:
        # a crash traceback written just before exit sits in the pipe; point
        # fd 2 back at the real stderr (closing the pipe's only write end ->
        # EOF) and give the pump a moment to forward the tail
        os.dup2(real_fd, 2)
        pump.join(timeout=2.0)

    import atexit

    atexit.register(_drain_at_exit)


_AOT_FILTER_INSTALLED = False


def compile_cache_dir(base: str = "/tmp/eioku_jax_cache") -> str:
    """Backend-split persistent compile cache directory.

    CPU: XLA:CPU AOT artifacts embed the compiling machine's CPU feature set;
    loading them on a different host spams `cpu_aot_loader` machine-feature
    errors and can SIGILL. /tmp is shared across heterogeneous hosts in this
    deployment, so the CPU cache dir is keyed by a hash of the host CPU
    identity — a native CPUID dump matching what LLVM's host detection reads
    (see _cpu_fingerprint; generic /proc/cpuinfo proved insufficient) plus
    the jax/jaxlib versions — so no host ever loads another machine's (or
    another compiler's) AOT code.

    Accelerators (TPU/axon): the executables are compiled by and for the
    REMOTE device and have no host-CPU dependence, so keying them by host
    CPUID only breaks cache sharing — a `bench.py --prime` on one host then
    warmed nothing for a capture on a different host (the r03 driver bench
    paid a 495 s cold detect compile for exactly this reason). Key the
    accelerator dir by the software stack alone (backend platform +
    jax/jaxlib versions): any host's prime warms every other host's run.
    """
    import hashlib

    import jax
    import jaxlib

    backend = jax.default_backend()
    if backend == "cpu":
        bits = [_cpu_fingerprint(), jax.__version__, jaxlib.__version__]
        digest = hashlib.sha1("|".join(bits).encode()).hexdigest()[:10]
        return f"{base}_{digest}"
    bits = [backend, jax.__version__, jaxlib.__version__]
    digest = hashlib.sha1("|".join(bits).encode()).hexdigest()[:10]
    return f"{base}_{backend}_{digest}"


def stabilize_compile_cache_key() -> None:
    """Strip the churn-prone build-timestamp from JAX's persistent-cache key
    on accelerator backends.

    Evidence (tools/cache_key_baseline.md): identical model code accumulated
    18 distinct cache keys for one module across multi-hour gaps on the
    remote TPU tunnel — previously-primed stages cold-compiled again hours
    later. The `backend version` key component hashes the full
    `backend.platform_version`, which on this backend embeds a build
    timestamp line (`Built on Nov 12 2025 … cl/831091709`) that moves
    whenever the tunnel reconnects to a differently-built server instance,
    even though executable compatibility is governed entirely by the compat
    line (`axon 0.1.0; SerializedExecutable v9; compile-cache v14; compat
    c49` — the same string the backend serves as its topology
    serialization). Patch jax's `_hash_platform` to drop only `Built on …`
    lines for non-CPU backends; a real compat change still changes the key.
    CPU keeps the full string (XLA:CPU AOT executables genuinely are
    build-sensitive; the host-keyed dir handles them). Idempotent.
    """
    global _CACHE_KEY_STABILIZED
    if _CACHE_KEY_STABILIZED:
        return
    _CACHE_KEY_STABILIZED = True
    try:
        from jax._src import cache_key as _ck

        def _hash_platform(hash_obj, backend):
            _ck._hash_string(hash_obj, backend.platform)
            version = backend.platform_version
            if backend.platform != "cpu":
                version = "\n".join(
                    line for line in version.split("\n")
                    if not line.startswith("Built on "))
            _ck._hash_string(hash_obj, version)

        _ck._hash_platform = _hash_platform

        # Second churn source (observed r5): the serialized CompileOptions
        # component drifted across tunnel sessions (70e23aa1 -> 5885dced)
        # with identical client code and byte-identical options within any
        # one session — the server restart changed debug_options DEFAULTS.
        # Debug options are compiler-side knobs: within an unchanged compat
        # line (which _hash_platform still hashes) the cached executable
        # remains loadable, so on accelerator backends hash only the
        # semantically-relevant fields. XLA_FLAGS the user actually sets are
        # hashed by the separate "XLA flags" component, and explicit option
        # overrides are included below. CPU keeps jax's full hashing.
        _orig_hsco = _ck._hash_serialized_compile_options

        def _hsco(hash_obj, co, strip_device_assignment=False):
            import jax as _jax

            if _jax.default_backend() == "cpu":
                return _orig_hsco(
                    hash_obj, co,
                    strip_device_assignment=strip_device_assignment)
            ebo = co.executable_build_options
            parts = (
                co.num_replicas, co.num_partitions,
                co.parameter_is_tupled_arguments,
                co.compile_portable_executable,
                ebo.num_replicas, ebo.num_partitions,
                ebo.use_spmd_partitioning, ebo.use_auto_spmd_partitioning,
                repr(getattr(ebo, "use_shardy_partitioner", None)),
                repr(getattr(ebo, "optimization_level", None)),
                repr(getattr(ebo, "memory_fitting_level", None)),
                repr(getattr(ebo, "exec_time_optimization_effort", None)),
                repr(getattr(ebo, "memory_fitting_effort", None)),
                tuple(ebo.allow_spmd_sharding_propagation_to_output or ()),
                tuple(ebo.allow_spmd_sharding_propagation_to_parameters
                      or ()),
                tuple(sorted((str(k), str(v))
                             for k, v in (co.env_option_overrides or []))),
                str(co.device_assignment),
                bytes(getattr(ebo, "fdo_profile", b"") or b""),
            )
            hash_obj.update(repr(parts).encode())

        _ck._hash_serialized_compile_options = _hsco
    except Exception:
        pass  # private API drifted: lose key stability, not correctness


_CACHE_KEY_STABILIZED = False


def setup_persistent_cache() -> str:
    """Configure this process's persistent XLA compile cache: stabilized key
    (accelerators), backend-split directory, and — on CPU — the spurious
    AOT-feature-error filter. Returns the cache dir. Call after any
    force-CPU decision and before the first compile."""
    import jax

    stabilize_compile_cache_key()
    cache_dir = compile_cache_dir()
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    if jax.default_backend() == "cpu":
        suppress_spurious_aot_feature_errors()
    return cache_dir
