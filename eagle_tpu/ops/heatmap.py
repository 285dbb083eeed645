"""On-device heatmap decoding for the keypoint model.

Replaces the reference's per-heatmap CPU numpy argmax readback
(keypoint_hrnet.py:575-595: 57 device->host transfers *per frame*) with a
single batched argmax + dedup entirely on device; only the final (57, 3)
keypoint tensor crosses to the host.

The decode reproduces the reference semantics exactly:
- per-heatmap flat argmax, first occurrence on ties (numpy unravel_index)
- normalized coords x/(W-1), y/(H-1) (keypoint_hrnet.py:590-591)
- score floor 0.01 (:592) and the caller's confidence threshold
  (coordinate_model.py:232)
- image coords int(x_n * width) truncation (:236-237)
- same-pixel dedup keeping the highest score, last label wins ties
  (coordinate_model.py:238-248 dict semantics)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("image_hw", "score_floor"))
def decode_heatmaps(
    heatmaps: jax.Array,
    conf: jax.Array | float,
    image_hw: tuple[int, int],
    score_floor: float = 0.01,
) -> tuple[jax.Array, jax.Array]:
    """Decode (N, H, W, K) sigmoid heatmaps to per-frame keypoints.

    Returns
    -------
    kp : (N, K, 3) float32 -- integer-truncated image x, y and peak score
    valid : (N, K) bool -- above threshold and winner of same-pixel dedup
    """
    n, h, w, k = heatmaps.shape
    img_h, img_w = image_hw
    flat = heatmaps.transpose(0, 3, 1, 2).reshape(n, k, h * w)
    idx = jnp.argmax(flat, axis=-1)  # first max on ties, like numpy
    score = jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
    py = idx // w
    px = idx % w
    # int(px/(W-1) * img_w) truncation, computed exactly in integer
    # arithmetic (XLA would otherwise turn /(W-1) into a reciprocal multiply
    # and lose the exact-integer boundary cases)
    xi = (px * img_w // max(1, w - 1)).astype(jnp.float32)
    yi = (py * img_h // max(1, h - 1)).astype(jnp.float32)

    valid = (score > score_floor) & (score >= conf)

    # same-pixel dedup: keypoint k loses if another valid keypoint shares
    # its integer pixel with a higher score, or an equal score and a larger
    # label index (the reference's dict overwrite keeps the last label)
    key = yi * img_w + xi  # (n, k)
    same = key[:, :, None] == key[:, None, :]  # (n, k, k)
    s_i = score[:, :, None]
    s_j = score[:, None, :]
    lab = jnp.arange(k)
    j_wins = (s_j > s_i) | ((s_j == s_i) & (lab[None, None, :] > lab[None, :, None]))
    beaten = (same & j_wins & valid[:, None, :]).any(axis=-1)
    valid = valid & ~beaten

    kp = jnp.stack([xi, yi, score], axis=-1)
    return kp, valid
