"""VERDICT r4 item 7: confirm or close the whisper int8 edge with repeated
measurements.

BENCH_r04 recorded int8 163.2 vs bf16 152.9 audio-s/s at the realistic
beam-5/224-token budget — the only int8 win ever measured on this backend,
single-sample, within the documented 2x tunnel variance. This tool runs N
ALTERNATING pairs (bf16, int8) through the exact bench harness
(bench._bench_whisper_common) so both variants sample the same tunnel
weather, then prints per-variant best/median and the pairwise verdict.

Run on the real TPU:  python tools/whisper_int8_repeats.py [N]
"""
from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root module)


def main() -> None:
    bench._setup_jax()  # persistent compile cache + EIOKU_FORCE_CPU hook
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    bf16: list[float] = []
    int8: list[float] = []
    for i in range(n):
        for is_int8, sink in ((False, bf16), (True, int8)):
            v = bench._bench_whisper_common(
                beam_size=5, decode_tokens=224, int8=is_int8,
                stage="whisper_int8_repeat")
            if isinstance(v, tuple):
                v = v[0]
            sink.append(float(v))
            print(f"pair {i}: {'int8' if is_int8 else 'bf16'} "
                  f"{v:.1f} audio-s/s", file=sys.stderr, flush=True)
    wins = sum(1 for a, b in zip(bf16, int8) if b > a)
    out = {
        "n_pairs": n,
        "bf16_audio_s_per_s": [round(v, 1) for v in bf16],
        "int8_audio_s_per_s": [round(v, 1) for v in int8],
        "bf16_median": round(statistics.median(bf16), 1),
        "int8_median": round(statistics.median(int8), 1),
        "bf16_best": round(max(bf16), 1),
        "int8_best": round(max(int8), 1),
        "int8_pairwise_wins": wins,
        "verdict": ("int8 faster" if wins > n / 2
                    and statistics.median(int8) > statistics.median(bf16)
                    else "within variance / bf16 faster"),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
