"""Clip-pipelined serving: perception of clip k+1 overlaps the host
post-processing of clip k.

The reference runs its stages strictly in sequence per video
(main.py:49-76: get_coordinates, then Processor.process_data, then
format_data).  On TPU the perception phase is device-dominated -- the
host spends most of it blocked on device results, with the GIL released
-- while the Processor is pure host pandas/numpy.  Running the Processor
of the previous clip on a worker thread while the next clip's perception
occupies the device therefore costs neither side: the serving throughput
approaches max(device_time, host_time) per clip instead of their sum.

This is the "overlap Processor work with the next clip's device phase"
lever from docs/architecture.md's v5e-8 extrapolation; results are
bit-identical to the sequential path (pinned by tests/test_serve.py).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import NamedTuple

import pandas as pd

from eagle_tpu.pipeline.processor import Processor


class ClipResult(NamedTuple):
    """Everything the reference CLI derives from one clip (main.py:49-76)."""

    coordinates: dict  # get_coordinates output ({frame: {...}})
    dataframe: pd.DataFrame  # wide per-frame table (process_data)
    team_mapping: dict  # player id -> team color
    formatted: pd.DataFrame  # long-format records (format_data)


def serve_clips(
    model,
    clips,
    fps: int,
    num_homography: int = 1,
    num_keypoint_detection: int = 1,
    calibration: bool = False,
    smooth: bool = False,
    filter_ball_detections: bool = False,
    processor_config=None,
    overlap: bool | str = "auto",
):
    """Process an iterable of clips end to end, yielding one
    :class:`ClipResult` per clip in order.

    ``overlap=True`` pipelines in both directions around each clip's
    device phase: after clip k's perception returns, its Processor runs on
    a worker thread while the main thread starts clip k+1's perception,
    and clip k+1's HOST PRESCALE (the other host-serial stage, ~1.2
    ms/frame) is prefetched on a second worker during clip k's perception
    and handed to ``get_coordinates(prescaled=...)``.  Both workers'
    blocking stages release the GIL (device waits, native/cv2 kernels), so
    they ride inside the device phase.  The Processor's device work
    (batched team-color KMeans) simply enqueues behind the perception
    programs on the in-order device queue.  ``overlap=False`` degenerates
    to the strict reference ordering -- results are identical either way.

    ``overlap="auto"`` (default) enables the worker threads only when a
    spare CPU core exists: on a single core the workers' CPU-bound slices
    (pandas, array packing) contend with the perception dispatch loop for
    the GIL and measure as a net LOSS (~3-10% on the dev box), while the
    threads can only win when another core runs them.

    ``clips`` may be a generator (e.g. decode-on-demand), so arbitrarily
    many clips stream through bounded memory: at most three clips are
    alive at once (post-processing, perceiving, prescale-prefetching).
    """

    def post(coords, clip):
        proc = Processor(
            coords,
            clip,
            fps,
            filter_ball_detections=filter_ball_detections,
            config=processor_config,
        )
        df, team_mapping = proc.process_data(smooth=smooth)
        formatted = proc.format_data(df)
        return ClipResult(coords, df, team_mapping, formatted)

    def perceive(clip, prescaled=None):
        return model.get_coordinates(
            clip,
            fps,
            num_homography=num_homography,
            num_keypoint_detection=num_keypoint_detection,
            calibration=calibration,
            verbose=False,
            prescaled=prescaled,
        )

    if overlap == "auto":
        from eagle_tpu.utils import available_cpus

        overlap = available_cpus() > 1
    if not overlap:
        for clip in clips:
            yield post(perceive(clip), clip)
        return

    it = iter(clips)
    with ThreadPoolExecutor(max_workers=1) as ex, ThreadPoolExecutor(
        max_workers=1
    ) as pre_ex:
        pending = None
        cur = next(it, None)
        pre = None  # prescale future for `cur` (None for the first clip)
        while cur is not None:
            nxt = next(it, None)
            pre_next = (
                pre_ex.submit(model.prescale_clip, nxt) if nxt is not None else None
            )
            coords = perceive(cur, pre.result() if pre is not None else None)
            if pending is not None:
                yield pending.result()
            # submit AFTER draining the previous result so yields stay in
            # order and at most one post-processing job is ever in flight
            pending = ex.submit(post, coords, cur)
            cur, pre = nxt, pre_next
        if pending is not None:
            yield pending.result()
