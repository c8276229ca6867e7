"""Diagnose XLA persistent-compile-cache key churn.

Runs one bench.py stage with jax._src.cache_key's DEBUG logging routed to a
file, so every compiled module logs the hash of each key component
(computation / jax_lib version / backend version / XLA flags /
compile_options / accelerator_config / compression / custom_hook). Running
the same stage twice and diffing the logs pinpoints WHICH component changed
when a previously-primed stage cold-compiles (observed all day on the remote
TPU tunnel: e.g. jit_whisper_encode accumulated 16 distinct cache keys for
identical code, burning 100-250 s per "warm" bench run).

Usage: python tools/cache_key_probe.py <stage> <out-log>
"""
import logging
import os
import runpy
import sys

_BENCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")


def main() -> None:
    stage, out_path = sys.argv[1], sys.argv[2]

    handler = logging.FileHandler(out_path, mode="w")
    handler.setLevel(logging.DEBUG)
    handler.setFormatter(logging.Formatter("%(message)s"))
    for name in ("jax._src.cache_key", "jax._src.compiler",
                 "jax._src.compilation_cache"):
        lg = logging.getLogger(name)
        lg.setLevel(logging.DEBUG)
        lg.addHandler(handler)

    sys.argv = ["bench.py", "--stage", stage]
    runpy.run_path(_BENCH, run_name="__main__")


if __name__ == "__main__":
    main()
