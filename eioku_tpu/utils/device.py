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


def compile_cache_dir(base: str = "/tmp/eioku_jax_cache") -> str:
    """Host-keyed persistent compile cache directory.

    XLA:CPU AOT artifacts embed the compiling machine's CPU feature set;
    loading them on a different host spams `cpu_aot_loader` machine-feature
    errors and can SIGILL. /tmp is shared across heterogeneous hosts in this
    deployment, so the cache dir is keyed by a hash of the host CPU identity
    (machine arch + cpuinfo model/flags) — each distinct host gets its own
    cache and never loads another machine's AOT code.
    """
    import hashlib
    import platform

    bits = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            seen = set()
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in ("model name", "flags") and key not in seen:
                    seen.add(key)
                    bits.append(line.strip())
                if len(seen) == 2:
                    break
    except OSError:
        bits.append(platform.processor() or "unknown")
    digest = hashlib.sha1("|".join(bits).encode()).hexdigest()[:10]
    return f"{base}_{digest}"
