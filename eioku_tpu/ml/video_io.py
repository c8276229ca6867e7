"""Host-side video decode feeding fixed-shape batched frame tensors.

TPU-native replacement for the reference's per-frame cv2 loop
(/root/reference/ml-service/src/services/model_manager.py:236-299: one frame ->
one inference call, `cap.grab()` to skip). Here decode stays on host (cv2) but
frames are sampled at a configurable interval, resized on host to the model's
input geometry (cheap, overlapped with TPU compute via double-buffered
prefetch), stacked into fixed-shape uint8 batches, and handed to jitted/pjit
model functions. Fixed shapes keep XLA from recompiling; the final partial
batch is padded and masked.
"""
from __future__ import annotations

import logging
import queue as _queue
import threading
from dataclasses import dataclass
from typing import Iterator

import cv2
import numpy as np

log = logging.getLogger(__name__)


@dataclass(frozen=True)
class VideoInfo:
    path: str
    width: int
    height: int
    fps: float
    frame_count: int

    @property
    def duration_ms(self) -> int:
        if self.fps <= 0:
            return 0
        return int(round(self.frame_count / self.fps * 1000.0))


@dataclass
class FrameBatch:
    """A fixed-shape batch of sampled frames.

    frames: uint8 [B, H, W, 3] RGB; entries past `valid` are zero padding.
    frame_indices / timestamps_ms: per-slot source frame index and time.
    """

    frames: np.ndarray
    frame_indices: np.ndarray  # int32 [B]
    timestamps_ms: np.ndarray  # int32 [B]
    valid: int

    @property
    def batch_size(self) -> int:
        return self.frames.shape[0]


def probe(path: str) -> VideoInfo:
    cap = cv2.VideoCapture(path)
    try:
        if not cap.isOpened():
            raise IOError(f"cannot open video: {path}")
        return VideoInfo(
            path=path,
            width=int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            height=int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
            fps=float(cap.get(cv2.CAP_PROP_FPS)) or 30.0,
            frame_count=int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
        )
    finally:
        cap.release()


def iter_frame_batches(
    path: str,
    batch_size: int = 32,
    frame_interval_s: float = 1.0,
    resize_hw: tuple[int, int] | None = None,
    max_frames: int | None = None,
    decode_threads: int = 1,
) -> Iterator[FrameBatch]:
    """Yield fixed-shape batches of frames sampled every `frame_interval_s`.

    Frames between samples are skipped with cap.grab() (no decode), matching the
    reference's skip strategy but emitting batches instead of single frames.
    decode_threads > 1 stripes the video across segment decoders (each with its
    own capture) — decode is the host-side bottleneck of the indexing pipeline.
    """
    info = probe(path)
    step = max(int(round(info.fps * frame_interval_s)), 1)
    if decode_threads > 1 and info.frame_count >= decode_threads * step * 2 \
            and max_frames is None:
        yield from _iter_batches_striped(path, info, step, batch_size,
                                         resize_hw, decode_threads)
        return
    yield from _iter_batches_serial(path, info, step, batch_size, resize_hw,
                                    max_frames, start_frame=0, end_frame=None)


def _iter_batches_serial(path, info, step, batch_size, resize_hw, max_frames,
                         start_frame: int, end_frame: int | None
                         ) -> Iterator[FrameBatch]:
    cap = cv2.VideoCapture(path)
    try:
        if start_frame:
            cap.set(cv2.CAP_PROP_POS_FRAMES, start_frame)
        frames: list[np.ndarray] = []
        indices: list[int] = []
        stamps: list[int] = []
        emitted = 0
        frame_idx = start_frame
        while end_frame is None or frame_idx < end_frame:
            if max_frames is not None and emitted + len(frames) >= max_frames:
                break
            if frame_idx % step == 0:
                ok, frame = cap.read()
                if not ok:
                    break
                frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                if resize_hw is not None:
                    frame = cv2.resize(frame, (resize_hw[1], resize_hw[0]),
                                       interpolation=cv2.INTER_AREA)
                frames.append(frame)
                indices.append(frame_idx)
                stamps.append(int(round(frame_idx / info.fps * 1000.0)))
                if len(frames) == batch_size:
                    yield _make_batch(frames, indices, stamps, batch_size)
                    emitted += len(frames)
                    frames, indices, stamps = [], [], []
            else:
                if not cap.grab():
                    break
            frame_idx += 1
        if frames:
            yield _make_batch(frames, indices, stamps, batch_size)
    finally:
        cap.release()


def _iter_batches_striped(path, info, step, batch_size, resize_hw,
                          n_threads: int) -> Iterator[FrameBatch]:
    """Decode disjoint frame ranges on worker threads, re-emit in time order.

    Range boundaries are aligned to the sampling step so the sampled frame set
    is identical to the serial path; each worker seeks once to its range start.
    """
    from concurrent.futures import ThreadPoolExecutor

    total = info.frame_count
    per = max(total // n_threads, 1)
    ranges = []
    start = 0
    for i in range(n_threads):
        end = total if i == n_threads - 1 else min((i + 1) * per, total)
        # align the next start up to a sampling-step boundary
        end_aligned = ((end + step - 1) // step) * step if i < n_threads - 1 \
            else total
        if end_aligned > start:
            ranges.append((start, end_aligned))
        start = end_aligned

    def run_range(rng):
        s, e = rng
        return list(_iter_batches_serial(path, info, step, batch_size,
                                         resize_hw, None, s, e))

    with ThreadPoolExecutor(max_workers=len(ranges)) as pool:
        results = list(pool.map(run_range, ranges))

    # restitch into full batches in time order
    frames: list[np.ndarray] = []
    indices: list[int] = []
    stamps: list[int] = []
    for batches in results:
        for b in batches:
            for j in range(b.valid):
                frames.append(b.frames[j])
                indices.append(int(b.frame_indices[j]))
                stamps.append(int(b.timestamps_ms[j]))
                if len(frames) == batch_size:
                    yield _make_batch(frames, indices, stamps, batch_size)
                    frames, indices, stamps = [], [], []
    if frames:
        yield _make_batch(frames, indices, stamps, batch_size)


def _make_batch(frames: list[np.ndarray], indices: list[int], stamps: list[int],
                batch_size: int) -> FrameBatch:
    valid = len(frames)
    h, w, c = frames[0].shape
    out = np.zeros((batch_size, h, w, c), dtype=np.uint8)
    out[:valid] = np.stack(frames)
    idx = np.zeros((batch_size,), dtype=np.int32)
    idx[:valid] = indices
    ts = np.zeros((batch_size,), dtype=np.int32)
    ts[:valid] = stamps
    return FrameBatch(frames=out, frame_indices=idx, timestamps_ms=ts, valid=valid)


def prefetch(iterator: Iterator[FrameBatch], depth: int = 2) -> Iterator[FrameBatch]:
    """Run decode on a background thread so host decode overlaps device compute
    (double-buffered host staging, SURVEY.md hard-part 5)."""
    q: _queue.Queue = _queue.Queue(maxsize=depth)
    _sentinel = object()
    error: list[BaseException] = []

    def producer() -> None:
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # propagate decode errors to consumer
            error.append(e)
        finally:
            q.put(_sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _sentinel:
            if error:
                raise error[0]
            return
        yield item
