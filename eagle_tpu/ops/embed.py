"""Appearance embeddings for tracker association.

The reference's tracker uses OSNet-x0.25 ReID features through boxmot
(coordinate_model.py:69).  This module provides the embedding slot's
default implementation: an HSV color histogram over the detection crop --
cheap, fully batched on device, and effective for jersey-colored players.
A learned ReID network can be dropped into the same slot (any callable
producing (D, E) L2-normalized vectors).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from eagle_tpu.ops.color import bgr_to_hsv
from eagle_tpu.ops.kmeans import gather_crops

HIST_BINS = (16, 2, 2)  # hue x saturation x value -> 64-dim


@functools.partial(jax.jit, static_argnames=("grid_hw",))
def histogram_embeddings(
    frames: jax.Array, frame_idx: jax.Array, boxes: jax.Array, grid_hw=(32, 16)
) -> jax.Array:
    """(F, H, W, 3) uint8 frames + (B,) frame indices + (B, 4) xyxy boxes
    -> (B, 64) L2-normalized HSV histograms (soft-binned, gather-free)."""
    crops = gather_crops(frames, frame_idx, boxes, grid_hw=grid_hw)  # (B, gh, gw, 3)
    hsv = bgr_to_hsv(crops)
    b = crops.shape[0]
    nh, ns, nv = HIST_BINS
    # hard binning via broadcast compares (one-hot without scatter)
    hbin = jnp.clip((hsv[..., 0] / 180.0 * nh).astype(jnp.int32), 0, nh - 1)
    sbin = jnp.clip((hsv[..., 1] / 256.0 * ns).astype(jnp.int32), 0, ns - 1)
    vbin = jnp.clip((hsv[..., 2] / 256.0 * nv).astype(jnp.int32), 0, nv - 1)
    flat_bin = (hbin * ns + sbin) * nv + vbin  # (B, gh, gw)
    eq = flat_bin[..., None] == jnp.arange(nh * ns * nv)[None, None, None, :]
    hist = eq.sum(axis=(1, 2)).astype(jnp.float32)
    return hist / jnp.maximum(jnp.linalg.norm(hist, axis=-1, keepdims=True), 1e-9)
