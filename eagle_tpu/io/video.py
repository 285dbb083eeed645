"""Host-side video decode/encode.

Video codec work stays on the host CPU (FFmpeg via OpenCV), exactly like
the reference (eagle/utils/io.py:5-48) -- it is the only non-XLA stage of
the pipeline.  Frames are returned as a single contiguous uint8 ndarray
(N, H, W, 3) in BGR order so the whole clip can be transferred to device
in one DMA instead of a Python list of arrays.
"""

from __future__ import annotations

import os

import cv2
import numpy as np


def read_video(path: str, fps: int = 24) -> tuple[list[np.ndarray], int]:
    """Decode ``path`` sampling every ``native_fps // fps``-th frame.

    Returns (frames, fps) where frames is a list of BGR uint8 arrays and
    fps is the *requested* rate -- bit-compatible with the reference
    contract (eagle/utils/io.py:5-28), including the quirk that the
    returned fps is the requested one even when ``native_fps // fps``
    sampling lands on a slightly different effective rate.
    """
    arr, fps = read_video_array(path, fps)
    return list(arr), fps


def read_video_array(path: str, fps: int = 24) -> tuple[np.ndarray, int]:
    """Like :func:`read_video` but returns a stacked (N, H, W, 3) uint8
    array, the layout the device pipeline consumes."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"File not found: {path}")
    cap = cv2.VideoCapture(path)
    native_fps = cap.get(cv2.CAP_PROP_FPS)
    skip = max(1, int(native_fps // fps)) if native_fps > 0 else 1
    frames = []
    frame_count = 0
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        if frame_count % skip == 0:
            frames.append(frame)
        frame_count += 1
    cap.release()
    if not frames:
        return np.zeros((0, 0, 0, 3), dtype=np.uint8), fps
    return np.stack(frames), fps


def iter_video(path: str, fps: int = 24, segment_frames: int = 512):
    """Stream ``path`` as (N<=segment_frames, H, W, 3) uint8 BGR blocks.

    Same every-``native_fps // fps``-th-frame sampling (and requested-fps
    quirk) as :func:`read_video_array`, but bounded memory: at most
    ``segment_frames`` decoded frames are held at once.  Feed the blocks
    to :meth:`CoordinateModel.stream_coordinates` to process arbitrarily
    long videos."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"File not found: {path}")
    if segment_frames < 1:
        raise ValueError("segment_frames must be >= 1")
    cap = cv2.VideoCapture(path)
    native_fps = cap.get(cv2.CAP_PROP_FPS)
    skip = max(1, int(native_fps // fps)) if native_fps > 0 else 1
    frames = []
    frame_count = 0
    try:
        while True:
            ret, frame = cap.read()
            if not ret:
                break
            if frame_count % skip == 0:
                frames.append(frame)
                if len(frames) == segment_frames:
                    yield np.stack(frames)
                    frames = []
            frame_count += 1
    finally:
        cap.release()
    if frames:
        yield np.stack(frames)


class VideoFrameSource:
    """Lazy random access to the sampled frames of a video file.

    Decodes on demand instead of holding the clip in RAM -- the host-side
    consumers of a streamed run (the Processor's team-assignment crops,
    the annotated-video renderer) index frames mostly in ascending order,
    which this serves at sequential-decode speed; a backward jump reopens
    the file and decodes forward (cv2 frame seeking is codec-dependent and
    inexact, so correctness wins over speed there).  ``source[i]`` is
    bit-identical to ``read_video_array(path, fps)[0][i]``."""

    def __init__(self, path: str, fps: int = 24, length: int | None = None):
        if not os.path.exists(path):
            raise FileNotFoundError(f"File not found: {path}")
        self.path = path
        cap = cv2.VideoCapture(path)
        native_fps = cap.get(cv2.CAP_PROP_FPS)
        self.skip = max(1, int(native_fps // fps)) if native_fps > 0 else 1
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        cap.release()
        # CAP_PROP_FRAME_COUNT is container metadata and can disagree with
        # the decodable frame count (VFR / imperfect muxing); callers that
        # know the true sampled count (e.g. from an iter_video pass over the
        # same file) should pass ``length`` to make indexing exact.
        self._len = length if length is not None else max(0, -(-total // self.skip))
        self._cap = None
        self._next_raw = 0  # raw index the open decoder will return next
        self._cache_idx = -1
        self._cache = None

    def __len__(self) -> int:
        return self._len

    def _reopen(self):
        if self._cap is not None:
            self._cap.release()
        self._cap = cv2.VideoCapture(self.path)
        self._next_raw = 0

    def __getitem__(self, i: int) -> np.ndarray:
        i = int(i)
        if i < 0:
            i += self._len
        if not 0 <= i < self._len:
            raise IndexError(i)
        if i == self._cache_idx:
            return self._cache
        target = i * self.skip
        if self._cap is None or target < self._next_raw:
            self._reopen()
        while self._next_raw < target:  # grab skips the BGR conversion
            if not self._cap.grab():
                raise IndexError(f"decode ended before sampled index {i}")
            self._next_raw += 1
        ret, frame = self._cap.read()
        self._next_raw += 1
        if not ret:
            raise IndexError(f"decode ended before sampled index {i}")
        self._cache_idx, self._cache = i, frame
        return frame

    def close(self):
        if self._cap is not None:
            self._cap.release()
            self._cap = None


def write_video(frames, path: str, fps: int = 24, is_rgb: bool = False) -> str:
    """Encode ``frames`` (list, (N,H,W,3) array, or frame iterable) to mp4
    (mp4v fourcc), matching the reference writer (eagle/utils/io.py:31-48).
    Iterables are consumed lazily so a streamed render never holds the
    whole annotated clip in memory."""
    it = iter(frames)
    try:
        first = np.asarray(next(it))
    except StopIteration:
        raise ValueError("write_video needs at least one frame")
    height, width = first.shape[:2]
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    out = cv2.VideoWriter(path, fourcc, fps, (width, height))

    def emit(frame):
        frame = np.asarray(frame)
        if is_rgb:
            frame = cv2.cvtColor(frame, cv2.COLOR_RGB2BGR)
        out.write(np.ascontiguousarray(frame))

    try:
        emit(first)
        for frame in it:
            emit(frame)
    finally:
        out.release()
    return path
