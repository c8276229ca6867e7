"""YOLO head decoding + XLA-friendly fixed-shape NMS.

Replaces ultralytics' CUDA/torchvision NMS (used implicitly by the reference via
`model(frame, conf=...)`, model_manager.py:215-306). TPU constraints shape the
design (SURVEY.md hard-part 3): everything is fixed-shape — select top-K
candidates by score, run greedy suppression as a lax.fori_loop over a K x K IoU
matrix, and emit exactly K slots with a validity mask; the host trims.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from eioku_tpu.models.layers import Params
from eioku_tpu.models.yolo.model import YoloConfig, anchor_points, yolo_forward


def decode_boxes(box_logits: jnp.ndarray, anchors: jnp.ndarray,
                 strides: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """DFL decode: box_logits [B, A, 4*reg_max] -> xyxy pixels [B, A, 4].

    The softmax expectation is written as explicit max/exp + einsum: on the TPU
    backend jax.nn.softmax over the trailing (4, reg_max) layout compiles ~200x
    slower (162 s vs 0.7 s measured) than this formulation.
    """
    b, a, _ = box_logits.shape
    dist = box_logits.reshape(b, a, 4, reg_max).astype(jnp.float32)
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    m = jnp.max(dist, axis=-1, keepdims=True)
    e = jnp.exp(dist - m)
    ltrb = jnp.einsum("bafr,r->baf", e, bins) / jnp.sum(e, axis=-1)  # [B, A, 4]
    ltrb = ltrb * strides[None, :, None]
    x1y1 = anchors[None] - ltrb[..., :2]
    x2y2 = anchors[None] + ltrb[..., 2:]
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def _iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU for [K, 4] xyxy boxes -> [K, K]."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * \
        jnp.maximum(boxes[:, 3] - boxes[:, 1], 0)
    lt = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms_fixed(boxes: jnp.ndarray, scores: jnp.ndarray, classes: jnp.ndarray,
              iou_threshold: float = 0.45, max_det: int = 300) -> dict:
    """Greedy class-aware NMS over pre-top-K candidates (single image).

    boxes [K,4], scores [K] (0 for padding), classes [K]. Returns dict of
    fixed-shape [min(K, max_det)]-row arrays: boxes [.,4], scores, classes,
    valid mask. Candidates must already be sorted by descending score.
    When K <= max_det the rows stay in score order with suppressed slots
    masked out (NOT compacted kept-first); only the K > max_det truncation
    path reorders kept boxes to the front. Consumers must trim by the
    `valid` mask, never by slot position.

    Greedy keep is the unique solution of "kept iff no kept higher-ranked
    box conflicts with me", so instead of K sequential suppression steps it
    is computed by Jacobi iteration on that recurrence, and the fixpoint —
    reached in suppression-chain-depth sweeps (measured 3-5 on the bench
    workload) — is exactly the sequential result. Each sweep is one
    [K, K] x [K] matvec: counting suppressors on the MXU measured faster
    than the equivalent masked any-reduce on the VPU (docs/PERF.md).
    """
    k = boxes.shape[0]
    iou = _iou_matrix(boxes)
    same_class = classes[:, None] == classes[None, :]
    ranks = jnp.arange(k)
    # conflict[j, i]: higher-ranked j (j < i, score order) suppresses i
    conflict = ((iou > iou_threshold) & same_class &
                (ranks[:, None] < ranks[None, :])).astype(jnp.float32)
    valid = scores > 0

    def cond(state):
        keep, prev, it = state
        return (it < k) & jnp.any(keep != prev)

    def body(state):
        keep, _, it = state
        suppressors = conflict.T @ keep.astype(jnp.float32)  # [K] per box
        return valid & (suppressors < 0.5), keep, it + 1

    keep, _, _ = jax.lax.while_loop(cond, body, (valid, ~valid, 0))
    if k <= max_det:
        # every candidate fits in the output: skip the kept-first argsort +
        # gather entirely (measured ~2% of whole-detect time at K=256) and
        # return score-ordered slots with the validity mask — consumers trim
        # by mask, not position (ml/detection.py:146, ml/combined.py:229)
        return {
            "boxes": boxes,
            "scores": jnp.where(keep, scores, 0.0),
            "classes": jnp.where(keep, classes, -1),
            "valid": keep,
        }
    order = jnp.argsort(~keep, stable=True)  # kept first, score order preserved
    sel = order[:max_det]
    return {
        "boxes": boxes[sel],
        "scores": jnp.where(keep[sel], scores[sel], 0.0),
        "classes": jnp.where(keep[sel], classes[sel], -1),
        "valid": keep[sel],
    }


def pad_offsets_for(h: int, w: int) -> tuple[int, int]:
    """(pad_x, pad_y) that detect() applies to align (h, w) to stride 32."""
    return ((-w) % 32) // 2, ((-h) % 32) // 2


@partial(jax.jit, static_argnames=("cfg", "top_k", "max_det"))
def detect(params: Params, images: jnp.ndarray, cfg: YoloConfig,
           conf_threshold: float = 0.25, iou_threshold: float = 0.45,
           top_k: int = 256, max_det: int = 300) -> dict:
    """Full batched detection: forward -> decode -> top-K -> NMS (all on device).

    images: [B, H, W, 3] uint8 or float. Returns dict of
    [B, min(top_k, max_det), ...] fixed-shape outputs + validity mask.

    top_k bounds the NMS candidate pool; its [K, K] suppression work scales
    quadratically, and 512 -> 256 measured +8.6% whole-detect throughput
    (docs/PERF.md). 256 candidates >= conf comfortably covers real scenes
    (the reference runs conf 0.5 objects / 0.7 faces,
    model_manager.py:230-326, where dozens of candidates is already a crowd);
    pass top_k=512 to restore the wider pre-NMS pool.
    """
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.bfloat16) / 255.0
    b, h, w, _ = images.shape
    if h % 32 or w % 32:
        # pad to stride alignment ON DEVICE (letterbox gray), centered — the
        # host then uploads only real pixels; callers account for the offset
        # via pad_offsets_for()
        ph, pw = (-h) % 32, (-w) % 32
        images = jnp.pad(images, ((0, 0), (ph // 2, ph - ph // 2),
                                  (pw // 2, pw - pw // 2), (0, 0)),
                         constant_values=114.0 / 255.0)
        h, w = h + ph, w + pw
    box_logits, cls_logits = yolo_forward(params, images, cfg)
    anchors, strides = anchor_points(h, w, cfg.strides)
    boxes = decode_boxes(box_logits, anchors, strides, cfg.reg_max)
    # sigmoid is monotonic: max/argmax over raw logits give the same class and
    # score as over probabilities, for 1/num_classes the transcendental cost
    scores_all = jax.nn.sigmoid(
        jnp.max(cls_logits, axis=-1).astype(jnp.float32))  # [B, A]
    classes_all = jnp.argmax(cls_logits, axis=-1)  # [B, A]
    scores_all = jnp.where(scores_all >= conf_threshold, scores_all, 0.0)

    k = min(top_k, scores_all.shape[1])
    top_scores, top_idx = jax.lax.top_k(scores_all, k)  # [B, K]
    top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
    top_classes = jnp.take_along_axis(classes_all, top_idx, axis=1)

    if k <= max_det:
        # default configuration (k=256): the fused XLA formulation measured
        # fastest here (docs/PERF.md r4 experiments)
        return jax.vmap(
            lambda bx, sc, cl: nms_fixed(bx, sc, cl, iou_threshold, max_det)
        )(top_boxes, top_scores, top_classes)
    # large candidate pool (k > max_det, e.g. top_k=512/1024 crowd configs):
    # batched keep mask — the Pallas kernel keeps each image's [K, K]
    # suppression problem VMEM-resident (ops/nms.py; ~27% faster than the
    # XLA path at K=1024) — then kept-first truncation to max_det slots
    from eioku_tpu.ops.nms import nms_keep_mask

    keep = nms_keep_mask(top_boxes, top_scores, top_classes, iou_threshold)
    order = jnp.argsort(~keep, axis=1, stable=True)[:, :max_det]
    keep_sel = jnp.take_along_axis(keep, order, axis=1)
    return {
        "boxes": jnp.take_along_axis(top_boxes, order[..., None], axis=1),
        "scores": jnp.where(
            keep_sel, jnp.take_along_axis(top_scores, order, axis=1), 0.0),
        "classes": jnp.where(
            keep_sel, jnp.take_along_axis(top_classes, order, axis=1), -1),
        "valid": keep_sel,
    }
