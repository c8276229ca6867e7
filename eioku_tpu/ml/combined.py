"""Combined visual analysis: one decode pass feeds every frame-based task.

A timed 5-minute end-to-end run showed the separate-task design decoding the
video once per visual task (scene 4 fps + objects 1 fps + faces 1/3 fps +
places 1 fps = ~4 decode passes); host decode is the pipeline bottleneck once
compute is on device. This pipeline decodes ONCE at the finest sampling rate
and routes frames to each consumer:

  - scene scoring consumes every sampled frame (device resize -> HSV -> diff)
  - detection/faces/places consume the subset matching their intervals,
    accumulated into fixed-size batches and flushed to their device programs

Results are returned per task type; the task handler emits one run per type so
the artifact/run/selection model is unchanged (enable with
`combined_visual: true` in config — discovery then creates one visual_analysis
task instead of four).
"""
from __future__ import annotations

import logging
import os

import jax.numpy as jnp
import numpy as np

from functools import partial

import jax

from eioku_tpu.ml import video_io
from eioku_tpu.ml.detection import INPUT_SIZE, _load_model, letterbox_batch
from eioku_tpu.utils import progress
from eioku_tpu.models.yolo.classes import COCO_CLASSES
from eioku_tpu.models.yolo.postprocess import detect
from eioku_tpu.ops.colorspace import (
    i420_frames_to_hsv_planes,
    i420_to_rgb,
    to_i420,
)
from eioku_tpu.ops.scene_diff import scene_scores

log = logging.getLogger(__name__)

SCENE_H, SCENE_W = 96, 160


def _place_records(psc: np.ndarray, pidx: np.ndarray, meta, valid: int,
                   labels, frame_ms: int) -> list[dict]:
    """Assemble place.classification results from a top-k device output —
    the ONE shape shared by the fused and standalone paths."""
    recs = []
    for i in range(valid):
        fi, t_ms = meta[i]
        preds = [{"label": labels[int(pidx[i, j])],
                  "confidence": float(psc[i, j])}
                 for j in range(psc.shape[1])]
        recs.append({"payload": {"predictions": preds, "frame_number": fi},
                     "span_start_ms": t_ms, "span_end_ms": t_ms + frame_ms})
    return recs


@partial(jax.jit, static_argnames=("cfg", "conf_threshold"))
def _detect_i420(params, planes, cfg, conf_threshold):
    """Upload-lean detection: I420 planes in, full detect graph on device."""
    rgb = i420_to_rgb(planes).astype(jnp.bfloat16)
    return detect(params, rgb, cfg, conf_threshold=conf_threshold)


@partial(jax.jit, static_argnames=("top_k",))
def _places_i420(pparams, planes, top_k):
    """Standalone places classification from host-resized 224px I420 thumbs."""
    from eioku_tpu.models.resnet.model import (
        IMAGENET_MEAN,
        IMAGENET_STD,
        resnet18_forward,
    )

    rgb = i420_to_rgb(planes)
    x = ((rgb - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)) \
        .astype(jnp.bfloat16)
    logits = resnet18_forward(pparams, x)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jax.lax.top_k(probs, top_k)


@partial(jax.jit, static_argnames=("ycfg", "fcfg"))
def _detect_faces_i420(yparams, fparams, planes, face_idx, ycfg, fcfg,
                       conf_threshold, face_conf):
    """Fused objects+faces: the face grid is a subset of the object grid
    (3 s vs 1 s default), so faces read a device-side GATHER of the same
    I420 upload instead of paying their own host->device transfer — on a
    bandwidth-scarce link the face upload was pure waste."""
    rgb = i420_to_rgb(planes)
    det = detect(yparams, rgb.astype(jnp.bfloat16), ycfg,
                 conf_threshold=conf_threshold)
    fdet = detect(fparams, rgb[face_idx].astype(jnp.bfloat16), fcfg,
                  conf_threshold=face_conf)
    return det, fdet


@partial(jax.jit, static_argnames=("ycfg", "fcfg", "top_k"))
def _detect_places_faces_i420(yparams, pparams, fparams, planes, face_idx,
                              ycfg, fcfg, conf_threshold, top_k, face_conf):
    """Fully fused visual frame pass: ONE I420 upload feeds objects, places
    (on-device resize), and the face-grid gather."""
    from eioku_tpu.models.resnet.model import (
        IMAGENET_MEAN,
        IMAGENET_STD,
        resnet18_forward,
    )

    rgb = i420_to_rgb(planes)
    det = detect(yparams, rgb.astype(jnp.bfloat16), ycfg,
                 conf_threshold=conf_threshold)
    b = rgb.shape[0]
    imgs = jax.image.resize(rgb, (b, 224, 224, 3), method="bilinear")
    x = ((imgs - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)) \
        .astype(jnp.bfloat16)
    logits = resnet18_forward(pparams, x)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    sc, idx = jax.lax.top_k(probs, top_k)
    fdet = detect(fparams, rgb[face_idx].astype(jnp.bfloat16), fcfg,
                  conf_threshold=face_conf)
    return det, sc, idx, fdet


@partial(jax.jit, static_argnames=("ycfg", "conf_threshold", "top_k"))
def _detect_places_i420(yparams, pparams, planes, ycfg, conf_threshold, top_k):
    """Fused objects+places: ONE I420 upload feeds the YOLO graph and, via an
    on-device resize, the Places365 classifier (they sample the same frames at
    the default 1 s cadence — the separate 224px host resize + upload of the
    per-task design disappears entirely)."""
    from eioku_tpu.models.resnet.model import (
        IMAGENET_MEAN,
        IMAGENET_STD,
        resnet18_forward,
    )

    rgb = i420_to_rgb(planes)
    det = detect(yparams, rgb.astype(jnp.bfloat16), ycfg,
                 conf_threshold=conf_threshold)
    b = rgb.shape[0]
    imgs = jax.image.resize(rgb, (b, 224, 224, 3), method="bilinear")
    x = ((imgs - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)) \
        .astype(jnp.bfloat16)
    logits = resnet18_forward(pparams, x)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    sc, idx = jax.lax.top_k(probs, top_k)
    return det, sc, idx


class _DetectionConsumer:
    """Accumulates sampled frames into fixed batches for one detector.

    Offered frames may be pre-downscaled by the shared decode pass;
    coord_scale maps detector coordinates back to source pixels so payloads
    stay in original-frame coordinates like the reference's."""

    def __init__(self, model_name: str, num_classes: int, class_names,
                 conf: float, step: int, batch_size: int, cache_dir,
                 payload_builder, frame_ms: int, src_wh: tuple[int, int],
                 coord_scale: float = 1.0, places: tuple | None = None,
                 int8: bool = False, face_rider: dict | None = None):
        self.params, self.cfg = _load_model(model_name, num_classes,
                                            cache_dir, int8)
        self.class_names = class_names
        self.conf = conf
        self.step = max(step, 1)
        self.batch_size = batch_size
        self.payload_builder = payload_builder
        self.frame_ms = frame_ms
        self.src_w, self.src_h = src_wh
        self.coord_scale = coord_scale
        # fused places mode: (resnet_params, labels, top_k) — this consumer's
        # frames also feed the Places classifier in the same device call
        self.places = places
        self.place_results: list[dict] = []
        # fused faces mode: the face grid is a multiple of this consumer's
        # grid, so face frames ride the same upload via a device-side gather
        # (keys: params, cfg, conf, step, payload_builder; results are
        # appended to face_rider["results"])
        self.face_rider = face_rider
        if face_rider is not None:
            face_rider.setdefault("results", [])
        self._frames: list[np.ndarray] = []
        self._meta: list[tuple[int, int]] = []  # (frame_idx, t_ms)
        self._pending: list[tuple] = []  # dispatched, not yet fetched
        self.results: list[dict] = []

    def offer(self, frame: np.ndarray, frame_idx: int, t_ms: int) -> None:
        if frame_idx % self.step != 0:
            return
        self._frames.append(frame)
        self._meta.append((frame_idx, t_ms))
        if len(self._frames) == self.batch_size:
            self.flush()

    # bounds queued device work: each undrained flush pins its uploaded
    # input batch (batch x HxWx3) until the device executes it
    MAX_PENDING = 16

    def flush(self) -> None:
        """Dispatch the batch to the device WITHOUT fetching results: JAX
        dispatch is async, so detection overlaps decode and the other
        consumers. drain() forces the transfers (per-batch blocking round
        trips dominated the combined pass on high-latency links)."""
        from eioku_tpu.models.yolo.postprocess import pad_offsets_for

        if not self._frames:
            return
        valid = len(self._frames)
        # bucket partial batches to the next power of two: a final 20-frame
        # flush uploads a 32-slot batch, not the full 64 (few extra compiles)
        bucket = self.batch_size
        for c in (1, 2, 4, 8, 16, 32, 64, 128, 256):
            if valid <= c <= self.batch_size:
                bucket = c
                break
        stack = np.stack(self._frames + [np.zeros_like(self._frames[0])]
                         * (bucket - valid))
        h, w = stack.shape[1:3]
        if max(h, w) == INPUT_SIZE:
            # decode already delivered detector-scale frames: upload the real
            # pixels only and let detect() pad to stride alignment on device
            # (a 360x640 frame letterboxed on host to 640x640 wastes 44% of
            # the upload on gray padding)
            scale, (pad_x, pad_y) = 1.0, pad_offsets_for(h, w)
            boxed = stack
        else:
            boxed, scale, (pad_x, pad_y) = letterbox_batch(stack, valid)
        places_out = None
        face_out = None  # (fdet, face_meta, face_valid) when faces rode along
        even = boxed.shape[1] % 2 == 0 and boxed.shape[2] % 2 == 0
        letterboxed = boxed is not stack
        rider = self.face_rider
        face_sel = []
        if rider is not None:
            ratio = rider["step"] // self.step
            face_sel = [k for k, (fi, _) in enumerate(self._meta)
                        if fi % rider["step"] == 0]
        if even and not letterboxed and rider is not None and face_sel:
            # fully fused path: one upload feeds objects (+places) and the
            # face-grid gather. face_idx is padded to a per-bucket fixed cap
            # so the gather shape is compile-stable.
            cap = bucket // max(rider["step"] // self.step, 1) + 1
            fidx = np.zeros((cap,), np.int32)
            fidx[:len(face_sel)] = face_sel[:cap]
            planes = jnp.asarray(to_i420(list(boxed)))
            face_meta = [self._meta[k] for k in face_sel[:cap]]
            if self.places is not None:
                pparams, _, topk = self.places
                out, psc, pidx, fdet = _detect_places_faces_i420(
                    self.params, pparams, rider["params"], planes,
                    jnp.asarray(fidx), self.cfg, rider["cfg"], self.conf,
                    topk, rider["conf"])
                places_out = (psc, pidx)
            else:
                out, fdet = _detect_faces_i420(
                    self.params, rider["params"], planes, jnp.asarray(fidx),
                    self.cfg, rider["cfg"], self.conf, rider["conf"])
            face_out = (fdet, face_meta, len(face_meta))
        elif even and self.places is not None and not letterboxed:
            # fused single-upload path: the detector frames are the raw decode
            # output (no gray letterbox bars), so places can read them too
            planes = jnp.asarray(to_i420(list(boxed)))
            pparams, _, topk = self.places
            out, psc, pidx = _detect_places_i420(
                self.params, pparams, planes, self.cfg, self.conf, topk)
            places_out = (psc, pidx)
        else:
            if even:
                # ship I420 (half the bytes); the device converts back
                out = _detect_i420(self.params,
                                   jnp.asarray(to_i420(list(boxed))),
                                   self.cfg, self.conf)
            else:  # odd geometry can't subsample chroma: plain RGB upload
                out = detect(self.params, jnp.asarray(boxed), self.cfg,
                             conf_threshold=self.conf)
            if self.places is not None:
                # letterboxed (or odd) frames would feed gray bars into the
                # classifier: resize the RAW frames to 224 like the
                # standalone path instead (accuracy over fusion here)
                import cv2
                resized = [cv2.resize(f, (224, 224),
                                      interpolation=cv2.INTER_AREA)
                           for f in self._frames]
                resized += [np.zeros_like(resized[0])] * (bucket - valid)
                pparams, _, topk = self.places
                places_out = _places_i420(pparams,
                                          jnp.asarray(to_i420(resized)), topk)
        if rider is not None and face_sel and face_out is None:
            # the fused path didn't run (letterbox/odd geometry): faces still
            # must be processed — host-gather the subset and dispatch the
            # rider's own detect (correctness over fusion on this rare path)
            fstack = np.stack([boxed[k] for k in face_sel])
            fdet = detect(rider["params"], jnp.asarray(fstack), rider["cfg"],
                          conf_threshold=rider["conf"])
            face_out = (fdet, [self._meta[k] for k in face_sel],
                        len(face_sel))
        self._pending.append((out, self._meta, scale, (pad_x, pad_y), valid,
                              places_out, face_out))
        self._frames, self._meta = [], []
        if len(self._pending) >= self.MAX_PENDING:
            self.drain()

    def _emit_boxes(self, out_np, meta, scale, pads, valid, sink,
                    payload_builder, class_names) -> None:
        """Un-letterbox + clip + build payloads for one fetched batch (the
        shared tail of the object and ridden-face outputs)."""
        pad_x, pad_y = pads
        boxes, scores, classes, ok = out_np
        for i in range(valid):
            frame_idx, t_ms = meta[i]
            for j in np.nonzero(ok[i])[0]:
                x1, y1, x2, y2 = boxes[i, j]
                cs = self.coord_scale
                x1 = float(np.clip((x1 - pad_x) / scale * cs, 0, self.src_w))
                x2 = float(np.clip((x2 - pad_x) / scale * cs, 0, self.src_w))
                y1 = float(np.clip((y1 - pad_y) / scale * cs, 0, self.src_h))
                y2 = float(np.clip((y2 - pad_y) / scale * cs, 0, self.src_h))
                if x2 <= x1 or y2 <= y1:
                    continue
                label = class_names[int(classes[i, j])] if class_names \
                    else "face"
                sink.append({
                    "payload": payload_builder(
                        label, float(scores[i, j]),
                        {"x": x1, "y": y1,
                         "width": x2 - x1, "height": y2 - y1},
                        frame_idx),
                    "span_start_ms": t_ms,
                    "span_end_ms": t_ms + self.frame_ms,
                })

    def drain(self) -> None:
        for out, meta, scale, (pad_x, pad_y), valid, places_out, face_out \
                in self._pending:
            if places_out is not None:
                self.place_results.extend(_place_records(
                    np.asarray(places_out[0]), np.asarray(places_out[1]),
                    meta, valid, self.places[1], self.frame_ms))
            if face_out is not None:
                fdet, fmeta, fvalid = face_out
                rider = self.face_rider
                self._emit_boxes(
                    (np.asarray(fdet["boxes"]), np.asarray(fdet["scores"]),
                     np.asarray(fdet["classes"]), np.asarray(fdet["valid"])),
                    fmeta, scale, (pad_x, pad_y), fvalid,
                    rider["results"], rider["payload_builder"], [])
            self._emit_boxes(
                (np.asarray(out["boxes"]), np.asarray(out["scores"]),
                 np.asarray(out["classes"]), np.asarray(out["valid"])),
                meta, scale, (pad_x, pad_y), valid,
                self.results, self.payload_builder, self.class_names)
        self._pending = []


class _OcrConsumer:
    """Accumulates sampled frames for the OCR path: one CRAFT detection pass
    per batch shared by every configured language, then one recognition pass
    per script-specific recognizer (languages mapping to the same recognizer
    share it). Folding OCR in here removes the last separate decode pass of
    the per-task design."""

    def __init__(self, cfg: dict, step: int, batch_size: int, cache_dir,
                 src_wh: tuple[int, int], frame_ms: int):
        from eioku_tpu.ml.ocr_task import _models
        from eioku_tpu.models.ocr.weights import recognizer_for_language

        self.languages = cfg.get("languages") or ["en"]
        groups: dict[str, list[str]] = {}
        for lang in self.languages:
            groups.setdefault(recognizer_for_language(lang), []).append(lang)
        self.recognizers = []
        for rec, langs in groups.items():
            craft, crnn, charset, _ = _models(cache_dir, rec)
            self.craft_params = craft  # same CRAFT weights for every group
            self.recognizers.append((crnn, charset, langs))
        self.min_conf = float(cfg.get("confidence_threshold", 0.0))
        self.step = max(step, 1)
        self.batch_size = batch_size
        self.frame_ms = frame_ms
        self.src_w, self.src_h = src_wh
        self._frames: list[np.ndarray] = []
        self._meta: list[tuple[int, int]] = []
        self._pending: list[tuple] = []  # dispatched CRAFT, not yet fetched
        self.results: list[dict] = []

    def offer(self, frame: np.ndarray, frame_idx: int, t_ms: int) -> None:
        if frame_idx % self.step != 0:
            return
        self._frames.append(frame)
        self._meta.append((frame_idx, t_ms))
        if len(self._frames) == self.batch_size:
            self.flush()

    MAX_PENDING = 8  # grayscale staging for undrained CRAFT batches

    def flush(self) -> None:
        """Dispatch CRAFT detection async (like _DetectionConsumer.flush);
        quad extraction and recognition — which need the scores on host —
        happen in drain()."""
        import cv2

        from eioku_tpu.ml.ocr_task import DETECT_H, DETECT_W, craft_scores_i420

        if not self._frames:
            return
        valid = len(self._frames)
        det = [cv2.resize(f, (DETECT_W, DETECT_H),
                          interpolation=cv2.INTER_AREA) for f in self._frames]
        det += [np.zeros_like(det[0])] * (self.batch_size - valid)
        stack = np.stack(det)
        # I420 upload + on-device normalize: 1.5 B/px instead of 12 (fp32 RGB)
        scores = craft_scores_i420(self.craft_params,
                                   jnp.asarray(to_i420(list(stack))))
        grays = [cv2.cvtColor(stack[i], cv2.COLOR_RGB2GRAY)
                 for i in range(valid)]
        self._pending.append((scores, grays, self._meta))
        self._frames, self._meta = [], []
        if len(self._pending) >= self.MAX_PENDING:
            self.drain()

    def drain(self) -> None:
        from eioku_tpu.ml.ocr_task import (
            DETECT_H,
            DETECT_W,
            detect_text_crops,
            quad_to_source_polygon,
            recognize_crops,
        )

        sx = self.src_w / DETECT_W
        sy = self.src_h / DETECT_H
        for scores_dev, grays, meta in self._pending:
            scores = np.asarray(scores_dev, np.float32)
            for i, gray in enumerate(grays):
                crops, metas = detect_text_crops(gray, scores[i, :, :, 0],
                                                 scores[i, :, :, 1])
                if not crops:
                    continue
                frame_idx, t_ms = meta[i]
                for crnn, charset, langs in self.recognizers:
                    for quad, (text, conf) in zip(
                            metas, recognize_crops(crnn, crops, charset)):
                        if not text or conf < self.min_conf:
                            continue
                        self.results.append({
                            "payload": {"text": text,
                                        "confidence": min(conf, 1.0),
                                        "polygon": quad_to_source_polygon(
                                            quad, sx, sy),
                                        "languages": langs,
                                        "frame_index": frame_idx},
                            "span_start_ms": t_ms,
                            "span_end_ms": t_ms + self.frame_ms,
                        })
        self._pending = []


def run_visual_analysis(video_path: str, config: dict,
                        model_cache_dir: str | None = None
                        ) -> dict[str, list[dict]]:
    """Returns {task_type: results} for scene_detection, object_detection,
    face_detection, place_classification — and ocr when config carries an
    "ocr" sub-config — from ONE decode pass."""
    from eioku_tpu.ml.scenes import assemble_scenes
    from eioku_tpu.ml.places import _model as load_places
    import jax

    info = video_io.probe(video_path)
    fps = info.fps or 30.0
    frame_ms = int(round(1000.0 / fps))
    # each sub-task runs only when its sub-config is present — discovery
    # includes exactly the active task types, so e.g. an OCR-only fold does
    # no detection/scene/place work
    scfg = config.get("scene_detection")
    ocfg = config.get("object_detection")
    fcfg = config.get("face_detection")
    pcfg = config.get("place_classification")
    xcfg = config.get("ocr")

    # base sampling grid: the scene cadence when scenes run, else the
    # fastest active consumer cadence
    if scfg is not None:
        sample_fps = float(scfg.get("sample_fps", 4.0))
        interval_s = 1.0 / max(sample_fps, 1e-6)
    else:
        candidates = [float(c.get("frame_interval_s", d))
                      for c, d in ((ocfg, 1.0), (fcfg, 3.0), (pcfg, 1.0),
                                   (xcfg, 2.0)) if c is not None]
        interval_s = min(candidates) if candidates else 1.0
    base_step = max(int(round(fps * interval_s)), 1)

    def substep(seconds: float) -> int:
        # consumer steps are in source-frame units, aligned to the base grid
        return max(int(round(fps * seconds / base_step)), 1) * base_step

    # Decode directly at the detector's long-side geometry (aspect preserved):
    # the decode worker then resizes before its BGR->RGB pass, every smaller
    # consumer (places 224, scenes 96x160) derives from ~1/4 the pixels of the
    # source, and detection letterboxing becomes pad-only. Boxes map back to
    # source pixels via coord_scale.
    det_long = int(config.get("detector_size", 640))
    ds = det_long / max(info.width, info.height, 1)
    if ds < 1.0:
        dec_hw = (max(int(round(info.height * ds)), 2) // 2 * 2,
                  max(int(round(info.width * ds)), 2) // 2 * 2)
        coord_scale = info.width / dec_hw[1]
    else:
        dec_hw = None
        coord_scale = 1.0

    if pcfg is not None:
        place_params, place_labels = load_places(model_cache_dir)
        place_step = substep(float(pcfg.get("frame_interval_s", 1.0)))
        place_topk = int(pcfg.get("top_k", 5))
        place_bs = int(pcfg.get("batch_size", 64))
    else:
        place_step = 0
    obj_step = substep(float(ocfg.get("frame_interval_s", 1.0))) \
        if ocfg is not None else 0
    # places fuses into the object consumer when both sample the same grid
    # (the 1 s default): one I420 upload, one device program for both tasks
    fuse_places = pcfg is not None and ocfg is not None \
        and place_step == obj_step
    face_step = substep(float(fcfg.get("frame_interval_s", 3.0))) \
        if fcfg is not None else 0
    face_payload = lambda label, conf, box, fi: {  # noqa: E731
        "cluster_id": None, "confidence": conf, "bounding_box": box,
        "frame_number": fi}
    # faces fuse into the object consumer when their (sparser) grid is a
    # multiple of the object grid (the 3 s vs 1 s defaults): the face frames
    # are a device-side GATHER of the already-uploaded object batch, so the
    # separate face upload disappears entirely
    fuse_faces = fcfg is not None and ocfg is not None \
        and face_step % max(obj_step, 1) == 0 \
        and bool(config.get("fuse_faces", True))  # kill-switch
    face_rider = None
    if fuse_faces:
        fparams, fycfg = _load_model(fcfg.get("model", "yolov8n-face"), 1,
                                     model_cache_dir,
                                     bool(fcfg.get("int8", False)))
        face_rider = {
            "params": fparams, "cfg": fycfg,
            "conf": float(fcfg.get("confidence_threshold", 0.7)),
            "step": face_step, "payload_builder": face_payload,
            "results": []}
    objects = _DetectionConsumer(
        ocfg.get("model", "yolov8n"), len(COCO_CLASSES), COCO_CLASSES,
        float(ocfg.get("confidence_threshold", 0.5)),
        obj_step,
        int(ocfg.get("batch_size", 64)), model_cache_dir,
        lambda label, conf, box, fi: {"label": label, "confidence": conf,
                                      "bounding_box": box, "frame_number": fi},
        frame_ms, (info.width, info.height), coord_scale,
        places=(place_params, place_labels, place_topk) if fuse_places
        else None, int8=bool(ocfg.get("int8", False)),
        face_rider=face_rider) \
        if ocfg is not None else None
    if fuse_places:
        place_step = 0  # the standalone places path below stays idle
    faces = _DetectionConsumer(
        fcfg.get("model", "yolov8n-face"), 1, [],
        float(fcfg.get("confidence_threshold", 0.7)),
        face_step,
        int(fcfg.get("batch_size", 64)), model_cache_dir,
        face_payload,
        frame_ms, (info.width, info.height), coord_scale,
        int8=bool(fcfg.get("int8", False))) \
        if fcfg is not None and not fuse_faces else None

    ocr = _OcrConsumer(
        xcfg, substep(float(xcfg.get("frame_interval_s", 2.0))),
        int(xcfg.get("batch_size", 16)), model_cache_dir,
        (info.width, info.height), frame_ms) if xcfg is not None else None

    place_batch: list[np.ndarray] = []
    place_meta: list[tuple[int, int]] = []
    place_pending: list[tuple] = []  # (sc_dev, idx_dev, meta, valid)
    place_results: list[dict] = []

    def flush_places():
        """Dispatch async; drain_places() fetches (see consumer flush note)."""
        import cv2
        if not place_batch:
            return
        valid = len(place_batch)
        # host resize to 224 keeps the device upload small (see scene note);
        # I420 halves it again
        resized = [cv2.resize(f, (224, 224), interpolation=cv2.INTER_AREA)
                   for f in place_batch]
        stack = resized + [np.zeros_like(resized[0])] * (place_bs - valid)
        sc, idx = _places_i420(place_params, jnp.asarray(to_i420(stack)),
                               place_topk)
        place_pending.append((sc, idx, list(place_meta), valid))
        place_batch.clear()
        place_meta.clear()
        if len(place_pending) >= 48:
            drain_places()

    def drain_places():
        for sc_dev, idx_dev, meta, valid in place_pending:
            place_results.extend(_place_records(
                np.asarray(sc_dev), np.asarray(idx_dev), meta, valid,
                place_labels, frame_ms))
        place_pending.clear()

    # scene state: sampled frames accumulate into fixed 256-slot chunks so a
    # whole bench-sized clip needs ONE scene device call (per-decode-batch
    # calls cost a round trip each on high-latency links); score arrays stay
    # on device until the post-pass, prev-plane chaining is device-side
    threshold = float(scfg.get("threshold", 0.1)) if scfg is not None else 0.0
    prev_plane = jnp.zeros((SCENE_H * SCENE_W * 3,), jnp.float32)
    SCENE_CHUNK = 256
    scene_buf: list[np.ndarray] = []  # 96x160 frames awaiting scoring
    scene_stamps: list[int] = []
    scene_pending: list[tuple] = []  # (scores_dev, timestamps, valid)
    boundaries: list[tuple[int, float]] = []

    def flush_scenes():
        nonlocal prev_plane
        if not scene_buf:
            return
        valid = len(scene_buf)
        stack = scene_buf + [np.zeros_like(scene_buf[0])] \
            * (SCENE_CHUNK - valid)
        planes = i420_frames_to_hsv_planes(jnp.asarray(to_i420(stack)))
        scene_pending.append((scene_scores(prev_plane, planes),
                              list(scene_stamps), valid))
        prev_plane = planes[valid - 1]
        scene_buf.clear()
        scene_stamps.clear()

    batch_size = int(config.get("batch_size", 32))
    decode_threads = int(config.get("decode_threads", 4))
    decode_procs = int(config.get("decode_procs", 0))
    # analysis-decode accelerators (video_io._decode_flags): default level 1
    # skips only the deblocking filter; level 2 additionally skips non-ref
    # frames — sound here because every consumer samples sparsely (the base
    # grid is the 4 fps scene cadence: step >= 6 at 24-30 fps sources)
    decode_fast = int(config.get("decode_fast", 1))
    # keyframe cache: persist 1 s-grid frames as JPEGs so the downstream
    # CLIP visual-index task reads them instead of re-decoding the source
    # (cv2 seek-decodes a whole GOP per keyframe — measured ~18 s of
    # redundant 1080p decode per 60 s clip; this pass already decoded
    # every frame once). The task handler points this at
    # <visual_index.data_dir>/keyframes/<video_id>.
    kf_dir = config.get("keyframe_cache_dir")
    kf_step = 0
    if kf_dir:
        import shutil
        shutil.rmtree(kf_dir, ignore_errors=True)  # replace stale cache
        os.makedirs(kf_dir, exist_ok=True)
        kf_step = substep(float(config.get("keyframe_cache_interval_s", 1.0)))
    for batch in video_io.prefetch(video_io.iter_frame_batches(
            video_path, batch_size=batch_size, frame_interval_s=interval_s,
            resize_hw=dec_hw, decode_threads=decode_threads,
            decode_procs=decode_procs, fast_level=decode_fast)):
        if kf_step:
            import cv2
            for i in range(batch.valid):
                if int(batch.frame_indices[i]) % kf_step == 0:
                    cv2.imwrite(
                        os.path.join(kf_dir,
                                     f"{int(batch.timestamps_ms[i])}.jpg"),
                        cv2.cvtColor(batch.frames[i], cv2.COLOR_RGB2BGR))
        if scfg is not None:
            # Scene scoring needs only 96x160: resize on host so the device
            # upload is ~40x smaller than shipping full-resolution frames
            # (host->device bandwidth is the scarce resource; measured 3x
            # regression otherwise).
            import cv2
            for i in range(batch.valid):
                scene_buf.append(cv2.resize(batch.frames[i],
                                            (SCENE_W, SCENE_H),
                                            interpolation=cv2.INTER_AREA))
                scene_stamps.append(int(batch.timestamps_ms[i]))
                if len(scene_buf) == SCENE_CHUNK:
                    flush_scenes()
        for slot in range(batch.valid):
            fi = int(batch.frame_indices[slot])
            t_ms = int(batch.timestamps_ms[slot])
            if objects is not None:
                # .copy(): a buffered view would pin the whole decode
                # batch in memory until the consumer's next flush
                objects.offer(batch.frames[slot].copy(), fi, t_ms)
            if faces is not None:
                faces.offer(batch.frames[slot].copy(), fi, t_ms)
            if ocr is not None:
                ocr.offer(batch.frames[slot].copy(), fi, t_ms)
            if place_step and fi % place_step == 0:
                place_batch.append(batch.frames[slot].copy())
                place_meta.append((fi, t_ms))
                if len(place_batch) == place_bs:
                    flush_places()
        if info.duration_ms > 0 and batch.valid:
            # the post-loop drain is a small tail; cap decode at 95%
            progress.report(0.95 * batch.timestamps_ms[batch.valid - 1]
                            / info.duration_ms)
    # final partial batches ALL dispatch before anything drains: the async
    # dispatches queue back-to-back so their transfers/executions overlap
    # instead of each consumer's blocking fetch serializing the next one's
    # upload (measured ~1 s on a 600 ms/call link)
    if scfg is not None:
        flush_scenes()
    if objects is not None:
        objects.flush()
    if faces is not None:
        faces.flush()
    flush_places()
    if ocr is not None:
        ocr.flush()
    if objects is not None:
        objects.drain()
    if faces is not None:
        faces.drain()
    drain_places()
    if ocr is not None:
        ocr.drain()

    out: dict[str, list[dict]] = {}
    if scfg is not None:
        first = True
        for scores_dev, stamps, valid in scene_pending:
            scores = np.asarray(scores_dev)
            for slot in range(valid):
                if first and slot == 0:
                    first = False
                elif scores[slot] > threshold:
                    boundaries.append((int(stamps[slot]),
                                       float(scores[slot])))
        scenes = assemble_scenes(boundaries, info.duration_ms,
                                 float(scfg.get("min_scene_len_s", 0.5)))
        out["scene_detection"] = [
            {"payload": {"scene_index": s.scene_index, "start_ms": s.start_ms,
                         "end_ms": s.end_ms, "duration_ms": s.duration_ms,
                         "score": round(s.score, 4)},
             "span_start_ms": s.start_ms, "span_end_ms": s.end_ms}
            for s in scenes
        ]
    if objects is not None:
        out["object_detection"] = objects.results
    if fcfg is not None:
        face_results = face_rider["results"] if fuse_faces else faces.results
        # face clustering over the merged face results
        from eioku_tpu.ml.detection import _assign_face_clusters
        _assign_face_clusters(face_results, frame_step=face_step)
        if fcfg.get("embeddings"):
            # identity embeddings for /people: the combined pass has already
            # released its frames, so this re-decodes the face-sampled ones.
            # face_step is the TRUE grid (snapped to the pass's base step);
            # passing the seconds interval instead would rederive a different
            # grid and miss the faces (review finding, round 3)
            from eioku_tpu.ml.detection import attach_face_embeddings
            attach_face_embeddings(video_path, face_results, face_step,
                                   model_cache_dir)
        out["face_detection"] = face_results
    if pcfg is not None:
        out["place_classification"] = objects.place_results if fuse_places \
            else place_results
    if ocr is not None:
        out["ocr"] = ocr.results
    return out
