"""Color-space ops on device (cv2-convention HSV).

Replaces the reference's cv2.cvtColor/inRange calls scattered through the
flow filters, keypoint calibration and team assignment
(coordinate_model.py:461,538-547; processor.py:470-496).

cv2 8-bit HSV: H in [0, 180) (degrees / 2), S and V in [0, 255].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bgr_to_hsv(bgr: jax.Array) -> jax.Array:
    """(..., 3) uint8/float BGR -> float32 HSV with cv2 ranges."""
    x = bgr.astype(jnp.float32)
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    m = jnp.minimum(jnp.minimum(r, g), b)
    c = v - m
    safe_c = jnp.where(c > 0, c, 1.0)
    hr = jnp.mod((g - b) / safe_c, 6.0)
    hg = (b - r) / safe_c + 2.0
    hb = (r - g) / safe_c + 4.0
    h6 = jnp.where(v == r, hr, jnp.where(v == g, hg, hb))
    h = jnp.where(c > 0, h6 * 30.0, 0.0)  # degrees / 2, cv2 8-bit scale
    s = jnp.where(v > 0, c / jnp.where(v > 0, v, 1.0) * 255.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hue(bgr: jax.Array) -> jax.Array:
    """(..., 3) BGR -> (...,) cv2-scale hue."""
    return bgr_to_hsv(bgr)[..., 0]


def value(bgr: jax.Array) -> jax.Array:
    """(..., 3) BGR -> (...,) brightness (HSV V) = max channel."""
    x = bgr.astype(jnp.float32)
    return jnp.maximum(jnp.maximum(x[..., 0], x[..., 1]), x[..., 2])


def window_mean_hue(frame_bgr: jax.Array, pts: jax.Array, radius: int = 1) -> jax.Array:
    """Mean hue of the (2r+1)^2 window around each integer point, with the
    reference's border clipping (window intersected with the image;
    coordinate_model.py:456-462).

    frame_bgr : (H, W, 3) uint8;  pts : (K, 2) float/int pixel coords.
    Returns (K,) float32 mean hues.
    """
    h, w, _ = frame_bgr.shape
    x = jnp.clip(pts[:, 0].astype(jnp.int32), 0, w - 1)
    y = jnp.clip(pts[:, 1].astype(jnp.int32), 0, h - 1)
    d = 2 * radius + 1
    offs = jnp.arange(-radius, radius + 1)
    yy = y[:, None, None] + offs[None, :, None]  # (K, d, 1)
    xx = x[:, None, None] + offs[None, None, :]  # (K, 1, d)
    inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
    yc = jnp.clip(yy, 0, h - 1)
    xc = jnp.clip(xx, 0, w - 1)
    pix = frame_bgr[yc, xc]  # (K, d, d, 3)
    hues = hue(pix)
    inb = jnp.broadcast_to(inb, (pts.shape[0], d, d))
    cnt = jnp.maximum(inb.sum(axis=(1, 2)), 1)
    return jnp.where(inb, hues, 0.0).sum(axis=(1, 2)) / cnt
