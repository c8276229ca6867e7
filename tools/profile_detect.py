"""Segment-level TPU timing for the YOLOv8 detect path (profiler pass).

jax.profiler device traces are unavailable over the remote-TPU tunnel, so
this measures cumulative PREFIXES of the real forward (same blocks the model
executes, same scan harness as bench.py's detect stage) and reports the
deltas as per-segment time. Differences between a prefix compiled alone and
the same ops inside the full program are fusion-boundary noise — treat the
table as ~5% granularity.

Usage:
    python tools/profile_detect.py [--variant yolov8n] [--batch 384]
                                   [--size 640] [--n-batches 6]

Writes a markdown table to stdout (paste into docs/PERF.md).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

# runnable as `python tools/profile_detect.py` from anywhere: the package
# lives at the repo root, one level up from this file
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_prefixes(cfg):
    """Ordered (name, fn(params, images_f)) cut points over the real blocks."""
    from eioku_tpu.models.yolo import model as M
    from eioku_tpu.models.yolo.postprocess import decode_boxes
    import jax
    import jax.numpy as jnp

    def upto(stage):
        def fn(params, x):
            x = M._convbn(x, params["stem"], stride=2)
            x = M._convbn(x, params["down1"], stride=2)
            x = M._c2f(x, params["c2f_1"], True)
            if stage == "s1":
                return [x]
            x = M._convbn(x, params["down2"], stride=2)
            p3 = M._c2f(x, params["c2f_2"], True)
            if stage == "s2":
                return [p3]
            x = M._convbn(p3, params["down3"], stride=2)
            p4 = M._c2f(x, params["c2f_3"], True)
            if stage == "s3":
                return [p3, p4]
            x = M._convbn(p4, params["down4"], stride=2)
            x = M._c2f(x, params["c2f_4"], True)
            p5 = M._sppf(x, params["sppf"])
            if stage == "s4":
                return [p3, p4, p5]
            t4 = M._c2f_concat_in([(p5, "up"), (p4, None)],
                                  params["neck_c2f_td1"], False)
            n3 = M._c2f_concat_in([(t4, "up"), (p3, None)],
                                  params["neck_c2f_td2"], False)
            n4 = M._c2f_concat_in(
                [(M._convbn(n3, params["neck_down1"], stride=2), None),
                 (t4, None)], params["neck_c2f_bu1"], False)
            n5 = M._c2f_concat_in(
                [(M._convbn(n4, params["neck_down2"], stride=2), None),
                 (p5, None)], params["neck_c2f_bu2"], False)
            if stage == "neck":
                return [n3, n4, n5]
            box_out, cls_out = [], []
            for i, feat in enumerate([n3, n4, n5]):
                b = feat.shape[0]
                box = M._detect_branch(feat, params[f"head_box_{i}"])
                cls = M._detect_branch(feat, params[f"head_cls_{i}"])
                box_out.append(box.reshape(b, -1, 4 * cfg.reg_max))
                cls_out.append(cls.reshape(b, -1, cfg.num_classes))
            bo = jnp.concatenate(box_out, axis=1)
            co = jnp.concatenate(cls_out, axis=1)
            if stage == "head":
                return [bo, co]
            h, w = x.shape[1] * 32, x.shape[2] * 32
            anchors, strides = M.anchor_points(h, w, cfg.strides)
            boxes = decode_boxes(bo, anchors, strides, cfg.reg_max)
            scores = jax.nn.sigmoid(jnp.max(co, axis=-1).astype(jnp.float32))
            if stage == "decode":
                return [boxes, scores]
            raise ValueError(stage)
        return fn

    return [(s, upto(s)) for s in
            ("s1", "s2", "s3", "s4", "neck", "head", "decode")]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="yolov8n")
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--n-batches", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # same persistent compile cache as every other entry point (backend-split
    # dir + stabilized key): a rerun must hit warm prefixes, not pay ~8 cold
    # remote compiles
    from eioku_tpu.utils.device import setup_persistent_cache
    setup_persistent_cache()

    from eioku_tpu.models.yolo.model import (YoloConfig, fold_batchnorm,
                                             init_yolo_params)
    from eioku_tpu.models.yolo.postprocess import detect

    cfg = YoloConfig(args.variant, num_classes=80)
    params = fold_batchnorm(init_yolo_params(cfg, seed=0))
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(
        0, 255, (args.batch, args.size, args.size, 3), dtype=np.uint8))
    jax.block_until_ready(frames)
    n = args.n_batches

    def scan_harness(body):
        @jax.jit
        def run(params, frames, start):
            def step(acc, i):
                x = jnp.roll(frames, i, axis=0).astype(jnp.bfloat16) / 255.0
                outs = body(params, x)
                return acc + sum(o.astype(jnp.float32).sum() for o in outs), None
            acc, _ = jax.lax.scan(step, 0.0, start + jnp.arange(1, n + 1))
            return acc
        return run

    def measure(name, run):
        t0 = time.time()
        float(run(params, frames, jnp.int32(0)))
        compile_s = time.time() - t0
        t0 = time.time()
        float(run(params, frames, jnp.int32(7)))
        dt = time.time() - t0
        ms = dt / (n * args.batch) * 1e3
        print(f"  {name}: {ms:.4f} ms/frame cumulative "
              f"(compile+first {compile_s:.1f}s)", flush=True)
        return ms

    print(f"profiling {args.variant} @ {args.size}, batch {args.batch}, "
          f"backend {jax.default_backend()}", flush=True)
    rows = []
    prev = 0.0
    for name, body in build_prefixes(cfg):
        cum = measure(name, scan_harness(body))
        rows.append((name, cum, cum - prev))
        prev = cum

    # full detect() (adds top-k + NMS) via the bench harness for the total
    @jax.jit
    def full(params, frames, start):
        def step(acc, i):
            out = detect(params, jnp.roll(frames, i, axis=0), cfg)
            return acc + out["scores"].sum(), None
        acc, _ = jax.lax.scan(step, 0.0, start + jnp.arange(1, n + 1))
        return acc
    cum = measure("full(detect)", full)
    rows.append(("topk+nms", cum, cum - prev))

    seg_names = {"s1": "stem+down1+c2f_1 (160^2 early)",
                 "s2": "down2+c2f_2 -> P3 (80^2)",
                 "s3": "down3+c2f_3 -> P4 (40^2)",
                 "s4": "down4+c2f_4+sppf -> P5 (20^2)",
                 "neck": "PAN neck (4 c2f + 2 down)",
                 "head": "decoupled heads (6 branches)",
                 "decode": "DFL decode + sigmoid",
                 "topk+nms": "top-k + fixed-shape NMS"}
    total = rows[-1][1]
    print()
    print(f"| segment | ms/frame | share |  ({args.variant} @ {args.size}, "
          f"batch {args.batch}, {total:.3f} ms/frame = "
          f"{1e3 / total:.0f} f/s total)")
    print("|---|---|---|")
    for name, _, delta in rows:
        print(f"| {seg_names[name]} | {max(delta, 0):.4f} | "
              f"{max(delta, 0) / total * 100:.1f}% |")


if __name__ == "__main__":
    main()
