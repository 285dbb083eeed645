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


def extract_windows(
    frame: jax.Array, pts_xy_int: jax.Array, size: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fixed-size pixel windows around integer points via vmapped
    dynamic_slice.

    The vmap lowers to an XLA gather, whose cost on v5e depends on the
    source layout (measured, round 5): uint8 3-channel windows pay a
    ~0.25 ms fixed cost regardless of size, while the same windows from
    a float32 2-D map cost ~0.05 ms.  Hot paths that only need a scalar
    per pixel (brightness, hue) should convert the frame to the flat
    float32 map first and slice that (see ``calibrate_keypoints``).

    Accepts (H, W, C) or (H, W) frames; returns (windows
    (K, size, size[, C]), origins (K, 2) as (x, y)).  Windows are
    start-clipped into the image; callers mask cells against their
    intended ranges.
    """
    h, w = frame.shape[:2]
    half = size // 2
    x0 = jnp.clip(pts_xy_int[:, 0] - half, 0, max(0, w - size))
    y0 = jnp.clip(pts_xy_int[:, 1] - half, 0, max(0, h - size))

    if frame.ndim == 2:

        def one(yy, xx):
            return jax.lax.dynamic_slice(frame, (yy, xx), (size, size))

    else:

        def one(yy, xx):
            return jax.lax.dynamic_slice(frame, (yy, xx, 0), (size, size, frame.shape[2]))

    wins = jax.vmap(one)(y0, x0)
    return wins, jnp.stack([x0, y0], axis=-1)


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
    # NOTE: the window gather stays on the uint8 color frame here — hue
    # is ~20 VPU ops/pixel, so converting the full frame first (the
    # trick that wins for gray/brightness maps, see extract_windows)
    # measured SLOWER (0.149 vs 0.065 ms at K=114/d=3, round 5); the
    # tiny d=3 color gather is cheap enough
    wins, org = extract_windows(frame_bgr, jnp.stack([x, y], -1), d)
    # mask window cells against the intended (clipped) range around (x, y)
    rows = org[:, 1][:, None] + jnp.arange(d)[None, :]  # (K, d) absolute y
    cols = org[:, 0][:, None] + jnp.arange(d)[None, :]
    row_ok = (rows >= jnp.maximum(0, y - radius)[:, None]) & (
        rows < jnp.minimum(h, y + radius + 1)[:, None]
    )
    col_ok = (cols >= jnp.maximum(0, x - radius)[:, None]) & (
        cols < jnp.minimum(w, x + radius + 1)[:, None]
    )
    inb = row_ok[:, :, None] & col_ok[:, None, :]  # (K, d, d)
    hues = hue(wins)
    cnt = jnp.maximum(inb.sum(axis=(1, 2)), 1)
    return jnp.where(inb, hues, 0.0).sum(axis=(1, 2)) / cnt
