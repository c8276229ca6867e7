"""Experiment (VERDICT r4 item 5): space-to-depth stem rewrite for YOLOv8n.

Hypothesis: the stem's 3x3 stride-2 conv over 3 input channels is
lane-starved on the MXU (3 << 128 input lanes) and bandwidth-bound at 640^2;
the EXACT rewrite
    stride-2 3x3 conv  ==  space-to-depth(2) + stride-1 2x2 conv over 4x3
                           channels with scattered weights
quadruples the input-channel occupancy without changing the function
(bit-level reordering of the same MACs; verified to fp tolerance below).

Derivation: out(y,x) = sum_{dy,dx in 0..2} w[dy,dx] . in[2y+dy-1, 2x+dx-1]
(TORCH pad 1). Writing rows as 2*block+parity: dy = 2*ky + p1 - 1 for kernel
tap ky in {0,1} over the S2D grid with pad (1,0); (ky=0, p1=0) has no
source tap and gets zero weight. Channel layout follows
rearrange("b (h p1) (w p2) c -> b h w (p1 p2 c)").

Run:  python tools/exp_s2d_stem.py            (TPU; prints both throughputs)
      EIOKU_FORCE_CPU=1 python tools/exp_s2d_stem.py --check-only
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eioku_tpu.utils.device import maybe_force_cpu

maybe_force_cpu()

import jax
import jax.numpy as jnp
import numpy as np

from eioku_tpu.models.layers import conv2d, silu
from eioku_tpu.models.yolo.model import (
    YoloConfig,
    fold_batchnorm,
    init_yolo_params,
    yolo_forward,
)
from eioku_tpu.models.yolo.postprocess import detect


def s2d_stem_weights(w: jnp.ndarray, b: jnp.ndarray):
    """[3,3,3,C] stride-2 stem -> ([2,2,12,C], b) for the S2D formulation."""
    k, _, c_in, c_out = w.shape
    assert k == 3
    w2 = np.zeros((2, 2, 4 * c_in, c_out), np.float32)
    for ky in range(2):
        for kx in range(2):
            for p1 in range(2):
                for p2 in range(2):
                    dy, dx = 2 * ky + p1 - 1, 2 * kx + p2 - 1
                    if 0 <= dy < 3 and 0 <= dx < 3:
                        ch = (p1 * 2 + p2) * c_in
                        w2[ky, kx, ch:ch + c_in] = np.asarray(
                            w[dy, dx], np.float32)
    return jnp.asarray(w2), b


def s2d(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def stem_s2d_forward(x, w2, b):
    y = conv2d(x if x.dtype != jnp.uint8 else x.astype(jnp.bfloat16),
               w2, b, stride=1, padding=[(1, 0), (1, 0)])
    return silu(y)


def main() -> None:
    check_only = "--check-only" in sys.argv
    cfg = YoloConfig("yolov8n", num_classes=80)
    params = fold_batchnorm(init_yolo_params(cfg, seed=0))
    w2, b2 = s2d_stem_weights(params["stem"]["w"], params["stem"]["b"])

    # --- exactness: stem output parity on a real-scale input
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    ref = silu(conv2d(x, params["stem"]["w"], params["stem"]["b"], stride=2))
    got = stem_s2d_forward(s2d(x), w2, b2)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"stem parity: max|diff| = {err:.3e} (same MACs, reordered)")
    assert err < 1e-4
    if check_only:
        return

    # --- throughput: full detect() with the stock stem vs the S2D stem.
    # The S2D variant swaps only the first layer; everything downstream is
    # identical, so any delta is the stem/memory-layout effect.
    batch, size, n_batches = 384, 640, 8
    frames = jnp.asarray(rng.integers(0, 255, (batch, size, size, 3),
                                      dtype=np.uint8))

    def run_detect(params, frames, start):
        def step(acc, i):
            out = detect(params, jnp.roll(frames, i, axis=0), cfg)
            return acc + out["scores"].sum(), None
        acc, _ = jax.lax.scan(step, 0.0,
                              start + jnp.arange(1, n_batches + 1))
        return acc

    import eioku_tpu.models.yolo.model as ym

    orig_convbn = ym._convbn

    def patched_convbn(x, p, stride=1):
        if "w2" in p:  # the S2D stem (detect() already normalized to bf16)
            return stem_s2d_forward(s2d(x), p["w2"], p["b"])
        return orig_convbn(x, p, stride)

    params_s2d = dict(params)
    params_s2d["stem"] = {"w2": w2, "b": b2}

    for name, p in (("stock", params), ("s2d", params_s2d)):
        if name == "s2d":
            ym._convbn = patched_convbn
        try:
            fn = jax.jit(run_detect)
            t0 = time.time()
            float(fn(p, frames, jnp.int32(0)))
            print(f"{name}: compile+first {time.time()-t0:.1f}s")
            dt = float("inf")
            for s in (7, 13, 21, 29):
                t0 = time.time()
                float(fn(p, frames, jnp.int32(s)))
                dt = min(dt, time.time() - t0)
            print(f"{name}: {n_batches * batch / dt:.1f} frames/s "
                  f"(best of 4: {dt:.3f}s)")
        finally:
            ym._convbn = orig_convbn


if __name__ == "__main__":
    main()
