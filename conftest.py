"""Root conftest: force JAX onto a virtual 8-device CPU mesh for all tests.

Mirrors the reference's test strategy of running everything on lightweight local
infrastructure (reference: backend/tests run on in-memory SQLite, queue always mocked
— /root/reference/backend/tests/test_api.py:14-60). Here the analogous move is running
all JAX code on the CPU backend with 8 virtual devices so sharding/pjit paths are
exercised without TPU hardware.
"""
import os
import sys

# Must be set before jax is imported anywhere. Force (not setdefault): the
# environment presets JAX_PLATFORMS to the TPU tunnel, but tests run on CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(__file__))

# The image's sitecustomize registers the remote-TPU backend and pins
# jax.config jax_platforms to it, overriding the env var — override back.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent host-keyed compile cache: XLA compiles dominate the suite's wall
# clock on this 1-core image, and they are identical across runs of unchanged
# code — warm re-runs cut the fast selection by minutes. (Host-keyed so a
# /tmp shared across machines never serves foreign XLA:CPU AOT code.)
try:
    from eioku_tpu.utils.device import setup_persistent_cache

    setup_persistent_cache()
except Exception:
    pass
