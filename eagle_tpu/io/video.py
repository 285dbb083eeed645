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


def write_video(frames, path: str, fps: int = 24, is_rgb: bool = False) -> str:
    """Encode ``frames`` (list or (N,H,W,3) array) to mp4 (mp4v fourcc),
    matching the reference writer (eagle/utils/io.py:31-48)."""
    frames = np.asarray(frames)
    height, width = frames[0].shape[:2]
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    out = cv2.VideoWriter(path, fourcc, fps, (width, height))
    for frame in frames:
        if is_rgb:
            frame = cv2.cvtColor(frame, cv2.COLOR_RGB2BGR)
        out.write(np.ascontiguousarray(frame))
    out.release()
    return path
