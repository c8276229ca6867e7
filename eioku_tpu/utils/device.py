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


def compile_cache_dir(base: str = "/tmp/eioku_jax_cache") -> str:
    """Host-keyed persistent compile cache directory.

    XLA:CPU AOT artifacts embed the compiling machine's CPU feature set;
    loading them on a different host spams `cpu_aot_loader` machine-feature
    errors and can SIGILL. /tmp is shared across heterogeneous hosts in this
    deployment, so the cache dir is keyed by a hash of the host CPU identity
    — a native CPUID dump matching what LLVM's host detection reads (see
    _cpu_fingerprint; generic /proc/cpuinfo proved insufficient) plus the
    jax/jaxlib versions — so no host ever loads another machine's (or
    another compiler's) AOT code.
    """
    import hashlib

    import jax
    import jaxlib

    bits = [_cpu_fingerprint(), jax.__version__, jaxlib.__version__]
    digest = hashlib.sha1("|".join(bits).encode()).hexdigest()[:10]
    return f"{base}_{digest}"
