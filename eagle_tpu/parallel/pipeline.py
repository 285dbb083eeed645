"""Sharded pipeline steps: frame-parallel perception and clip-parallel
temporal scans over the device mesh.

This is the scale-out configuration from BASELINE.json ("multi-clip
batched inference on v5e-8"): stateless model stages shard the *frame*
axis; the sequential stage shards the *clip* axis (each clip's scan stays
on one device, clips run data-parallel -- preserving the reference's
tracker-identity semantics within a clip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from eagle_tpu.config import PipelineConfig
from eagle_tpu.models import hrnet, yolov8
from eagle_tpu.ops.heatmap import decode_heatmaps
from eagle_tpu.ops.nms import batched_nms
from eagle_tpu.ops.preprocess import letterbox, preprocess_keypoint
from eagle_tpu.parallel.mesh import batch_sharding, replicated
from eagle_tpu.pipeline import temporal


def sharded_keypoint_step(mesh, params, cfg: PipelineConfig, image_hw, conf=0.3):
    """Returns a jitted (frames uint8 NHWC sharded on frames) ->
    ((N, 57, 3), (N, 57)) keypoint inference step."""

    @functools.partial(
        jax.jit,
        in_shardings=batch_sharding(mesh, 4),
        out_shardings=(batch_sharding(mesh, 3), batch_sharding(mesh, 2)),
    )
    def step(frames):
        pre = preprocess_keypoint(frames, out_hw=cfg.keypoint.input_hw)
        hm = hrnet.apply(params, pre, use_bf16=cfg.keypoint.use_bf16)
        return decode_heatmaps(hm, conf, image_hw, cfg.keypoint.score_floor)

    return step


def sharded_detector_step(mesh, params, cfg: PipelineConfig, image_hw, variant="l", conf=0.15):
    """Returns a jitted frame-sharded detector + NMS step producing boxes
    in original pixel coordinates."""
    h, w = image_hw

    @functools.partial(
        jax.jit,
        in_shardings=batch_sharding(mesh, 4),
        out_shardings=tuple(batch_sharding(mesh, n) for n in (3, 2, 2, 2)),
    )
    def step(frames):
        imgs, gain, pad = letterbox(frames, size=cfg.detector.image_size)
        boxes, scores = yolov8.apply(params, imgs, variant=variant, use_bf16=cfg.detector.use_bf16)
        b, s, c, v = batched_nms(
            boxes,
            scores,
            conf_threshold=conf,
            iou_threshold=cfg.detector.nms_iou,
            max_det=cfg.detector.max_detections,
        )
        b = (b - jnp.concatenate([pad, pad])) / gain
        b = jnp.clip(b, 0.0, jnp.asarray([w - 1, h - 1, w - 1, h - 1], jnp.float32))
        return b, s, c, v

    return step


_MULTI_CLIP_SCAN_CACHE: dict = {}


def multi_clip_scan(mesh, cfg: PipelineConfig, base_key, derive_prev: bool = False, packed: bool = False):
    """Returns a jitted clip-parallel temporal scan: carries and frame
    inputs gain a leading clip axis sharded over the mesh; each device runs
    its clips' scans locally (no cross-clip communication is needed --
    tracker identity is per-clip, like running the reference once per
    clip).

    The jitted step is cached per (mesh, cfg, flags) -- re-tracing the
    vmapped scan costs seconds, and a fresh ``jax.jit`` object per call
    would pay it on every run.  ``base_key`` is bound as a RUNTIME
    argument of the cached program (not part of the cache key), so a
    long-lived server handing every request a fresh key reuses one
    compiled executable instead of accumulating one per key.

    derive_prev : build ``prev_frame_bgr`` inside the program (per-clip
        one-frame shift, frame 0 repeating) so the caller uploads the clip
        ONCE instead of twice.
    packed : return outputs flattened to one (C, L, F) float32 array
        (one device->host transfer; unpack with
        :func:`eagle_tpu.pipeline.temporal.unpack_outputs`).
    """
    cache_key = (mesh, cfg, derive_prev, packed)
    step = _MULTI_CLIP_SCAN_CACHE.get(cache_key)
    if step is None:

        def vscan(carries, xs, key):
            # scan over TIME with a clip-batched step (not vmap-of-scan):
            # the homography cond then fires per step on any(do_h) instead
            # of lowering to an every-frame select (5x scan cost at 512
            # RANSAC hypotheses; see temporal.temporal_step_clips)
            xs_tm = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), xs)  # (L, C, ...)
            carries, out_tm = jax.lax.scan(
                lambda c, x: temporal.temporal_step_clips(c, x, cfg, key),
                carries,
                xs_tm,
            )
            return carries, jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), out_tm)

        def shardings(tree):
            return jax.tree.map(
                lambda x: batch_sharding(mesh, jnp.ndim(x)) if jnp.ndim(x) > 0 else replicated(mesh),
                tree,
            )

        @jax.jit
        def step(carries, xs, key):
            if derive_prev:
                f = xs.frame_bgr
                xs = xs._replace(
                    prev_frame_bgr=jnp.concatenate([f[:, :1], f[:, :-1]], axis=1)
                )
            carries = jax.lax.with_sharding_constraint(carries, shardings(carries))
            xs = jax.lax.with_sharding_constraint(xs, shardings(xs))
            carries, out = vscan(carries, xs, key)
            if packed:
                out = jax.vmap(temporal.pack_outputs)(out)
            return carries, out

        _MULTI_CLIP_SCAN_CACHE[cache_key] = step

    return functools.partial(step, key=base_key)
