"""Pyramidal Lucas-Kanade sparse optical flow on device.

Replaces cv2.calcOpticalFlowPyrLK (reference coordinate_model.py:65,:435;
winSize 15x15, maxLevel 2, 10 iters / eps 0.03) with a vectorized JAX
implementation: all tracked points advance in parallel, the iteration
count is fixed (converged points take near-zero steps).

TPU mapping (measured on v5e):
- XLA gathers are expensive and full-frame 1-channel pyramid
  convolutions map poorly onto the MXU.  So the kernel converts both
  frames to gray elementwise (~free), extracts one 192x192 ROI per
  tracked point from the stacked float32 pair with a single vmapped
  dynamic_slice (which lowers to ONE efficient f32 gather: 0.051 ms at
  the scan shape vs 0.245 for per-frame uint8 color gathers, measured
  round 5), and builds a per-ROI 3-level pyramid with small banded
  matmuls.  ROI origins are aligned to multiples of 4 so ROI pyramid
  pixels coincide with the full-image pyramid away from borders.
- Newton iterations sample patches by arithmetic interpolation matmuls
  (hat-function weights vs an iota) -- no gather anywhere in the loop.

Numerical conventions follow OpenCV: 5-tap Gaussian pyrDown, Scharr /32
derivatives, bilinear subpixel sampling, initial guess carried down the
pyramid with x2 rescaling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# cv2 BGR -> gray coefficients
_GRAY_W = np.array([0.114, 0.587, 0.299], dtype=np.float32)

#: per-point color ROI side at full resolution; must be divisible by
#: 2**levels; level-l ROI side = ROI_SIDE / 2**l (level 2 -> 48 px, which
#: holds the 17x17 ext patch plus +-15 px of drift)
ROI_SIDE = 192


def bgr_to_gray(frames: jax.Array) -> jax.Array:
    """uint8 BGR NHWC -> float32 grayscale (N, H, W), cv2-rounded."""
    y = frames.astype(jnp.float32) @ jnp.asarray(_GRAY_W)
    return jnp.round(y)


@functools.lru_cache(maxsize=32)
def _pyr_matrix(n: int) -> np.ndarray:
    """1-D pyrDown operator as a dense (n//2, n) matrix: 5-tap
    [1,4,6,4,1]/16 Gaussian with reflect-101 borders + stride-2 decimation
    (cv2.pyrDown convention, even n)."""
    out = (n + 1) // 2
    k = np.array([1, 4, 6, 4, 1], np.float64) / 16.0
    M = np.zeros((out, n), np.float64)
    for o in range(out):
        for t in range(-2, 3):
            idx = 2 * o + t
            if idx < 0:
                idx = -idx  # reflect-101
            if idx >= n:
                idx = 2 * (n - 1) - idx
            M[o, idx] += k[t + 2]
    return M.astype(np.float32)


def pyr_down(gray: jax.Array) -> jax.Array:
    """cv2.pyrDown of (..., H, W) via two matmuls (tools/tests; the flow
    kernel builds pyramids per-ROI instead)."""
    h, w = gray.shape[-2:]
    Mh = jnp.asarray(_pyr_matrix(h))
    Mw = jnp.asarray(_pyr_matrix(w))
    y = jnp.einsum("oh,...hw->...ow", Mh, gray, precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("ow,...hw->...ho", Mw, y, precision=jax.lax.Precision.HIGHEST)


def build_pyramid(gray: jax.Array, levels: int = 2) -> list[jax.Array]:
    """[(N, H, W), (N, H/2, W/2), ...] with ``levels`` downsamples."""
    pyr = [gray]
    for _ in range(levels):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


def scharr_gradients(gray: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Full-image Scharr /32 derivatives of (N, H, W) with reflect borders
    (tools/tests; the flow kernel differentiates sampled patches)."""
    sm = jnp.asarray(np.array([3.0, 10.0, 3.0]) / 16.0, jnp.float32)
    dv = jnp.asarray(np.array([-1.0, 0.0, 1.0]) / 2.0, jnp.float32)

    def conv1d(x, k, axis):
        pad = [(0, 0)] * 3
        pad[axis] = (1, 1)
        xp = jnp.pad(x, pad, mode="reflect")
        sl = [slice(None)] * 3
        out = 0.0
        for t in range(3):
            s = list(sl)
            s[axis] = slice(t, t + x.shape[axis])
            out = out + k[t] * xp[tuple(s)]
        return out

    gx = conv1d(conv1d(gray, sm, 1), dv, 2)
    gy = conv1d(conv1d(gray, dv, 1), sm, 2)
    return gx, gy


def _extract_color_rois(frame: jax.Array, origins: jax.Array, size: int) -> jax.Array:
    """(H, W, 3) + (K, 2) int (x, y) origins -> (K, size, size, 3).

    NOTE (measured, round 5): vmapped dynamic_slice lowers to an XLA
    gather, and gathers of uint8 3-channel windows pay a ~0.25 ms fixed
    cost on v5e regardless of window size; the same windows sliced from
    a float32 single-channel map cost ~0.05 ms.  Hot paths should
    convert the frame first and slice the flat map (see
    ``_extract_gray_roi_pair``, which both flow backends now use); this
    color variant remains only for measurement tooling
    (``scripts/profile_flow.py``)."""

    def one(o):
        return jax.lax.dynamic_slice(frame, (o[1], o[0], 0), (size, size, 3))

    return jax.vmap(one)(origins)


def _extract_gray_roi_pair(
    prev_bgr: jax.Array, curr_bgr: jax.Array, origins: jax.Array, size: int
) -> tuple[jax.Array, jax.Array]:
    """cv2-gray ROIs of both frames at shared origins: full-frame gray
    first (elementwise, ~free), then ONE vmapped slice over the stacked
    (2, H, W) float32 pair -- 0.051 vs 0.245 ms measured at the scan
    shape (K=57, 192^2) against two per-frame uint8 color gathers.
    Per-pixel math is identical to gathering color then converting
    (round(f32 BGR @ w) either way), so ROI values are bit-equal."""
    gray_w = jnp.asarray(_GRAY_W)
    stacked = jnp.stack(
        [
            jnp.round(prev_bgr.astype(jnp.float32) @ gray_w),
            jnp.round(curr_bgr.astype(jnp.float32) @ gray_w),
        ]
    )

    def one(o):
        return jax.lax.dynamic_slice(stacked, (0, o[1], o[0]), (2, size, size))

    rois = jax.vmap(one)(origins)  # (K, 2, size, size)
    return rois[:, 0], rois[:, 1]


def _interp_weights(start: jax.Array, taps: int, size: int) -> jax.Array:
    """(K,) continuous start positions -> (K, taps, size) linear
    interpolation weights (hat function vs an iota), edge-clamped."""
    pos = start[:, None] + jnp.arange(taps, dtype=jnp.float32)[None, :]
    pos = jnp.clip(pos, 0.0, size - 1.0)
    grid = jnp.arange(size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, :, None] - grid[None, None, :]))


def _sample_patches(rois: jax.Array, tl: jax.Array, taps: int) -> jax.Array:
    """Bilinear-sample (K, taps, taps) patches at continuous in-ROI
    top-left positions ``tl`` (K, 2) via two batched contractions."""
    size = rois.shape[-1]
    wy = _interp_weights(tl[:, 1], taps, size)
    wx = _interp_weights(tl[:, 0], taps, size)
    tmp = jnp.einsum("kir,krc->kic", wy, rois)
    return jnp.einsum("kic,kjc->kij", tmp, wx)


@functools.partial(jax.jit, static_argnames=("window", "levels", "iterations"))
def lk_flow(
    prev_bgr: jax.Array,
    curr_bgr: jax.Array,
    pts: jax.Array,
    valid: jax.Array,
    window: int = 15,
    levels: int = 2,
    iterations: int = 10,
    epsilon: float = 0.03,
) -> tuple[jax.Array, jax.Array]:
    """Track ``pts`` (K, 2) from the previous to the current frame.

    prev_bgr / curr_bgr : (H, W, 3) uint8 frames (batch framing is the
    caller's: the temporal scan feeds one frame pair per step).

    Returns (new_pts (K, 2), status (K,) bool).
    """
    h, w, _ = prev_bgr.shape
    k = pts.shape[0]
    half = (window - 1) / 2.0
    ext = window + 2  # +1 px ring for in-patch Scharr differentiation
    side = min(ROI_SIDE, h - h % 4, w - w % 4)  # keep /4 alignment
    factor = 2**levels

    # ROI origins: centered on the point, aligned to 2**levels so ROI
    # pyramid pixels coincide with the image pyramid, clipped inside
    def align(v, limit):
        a = jnp.clip(v - side // 2, 0, max(0, limit - side))
        return (a // factor) * factor

    origin = jnp.stack(
        [
            align(jnp.floor(pts[:, 0]).astype(jnp.int32), w),
            align(jnp.floor(pts[:, 1]).astype(jnp.int32), h),
        ],
        axis=-1,
    )
    prev_roi0, curr_roi0 = _extract_gray_roi_pair(prev_bgr, curr_bgr, origin, side)
    prev_pyr = [prev_roi0]
    curr_pyr = [curr_roi0]
    for _ in range(levels):
        prev_pyr.append(pyr_down(prev_pyr[-1]))
        curr_pyr.append(pyr_down(curr_pyr[-1]))

    sm = np.array([3.0, 10.0, 3.0], np.float32) / 16.0
    dv = np.array([-1.0, 0.0, 1.0], np.float32) / 2.0

    def patch_grads(p_ext: jax.Array):
        """(K, ext, ext) patches -> interior values + Scharr gradients."""

        def sep(k1, axis1, k2, axis2):
            out = 0.0
            for a in range(3):
                row = 0.0
                for b in range(3):
                    sl = [slice(None), slice(1, -1), slice(1, -1)]
                    sl[1 + axis1] = slice(a, a + window)
                    sl[1 + axis2] = slice(b, b + window)
                    row = row + k2[b] * p_ext[tuple(sl)]
                out = out + k1[a] * row
            return out

        gx = sep(sm, 0, dv, 1)
        gy = sep(dv, 0, sm, 1)
        return p_ext[:, 1:-1, 1:-1], gx, gy

    origin_f = origin.astype(jnp.float32)
    g = pts / (2.0**levels)
    status = valid
    for lvl in range(levels, -1, -1):
        g = g * 2.0 if lvl < levels else g
        o_lvl = origin_f / (2.0**lvl)
        p_lvl = pts / (2.0**lvl)

        p_ext = _sample_patches(prev_pyr[lvl], p_lvl - o_lvl - (half + 1.0), ext)
        patch_i, gx, gy = patch_grads(p_ext)
        g11 = jnp.sum(gx * gx, axis=(1, 2))
        g12 = jnp.sum(gx * gy, axis=(1, 2))
        g22 = jnp.sum(gy * gy, axis=(1, 2))
        det = g11 * g22 - g12 * g12
        invertible = det > 1e-6
        safe_det = jnp.where(invertible, det, 1.0)

        curr_lvl = curr_pyr[lvl]
        eps_sq = jnp.float32(epsilon) ** 2

        def body(_, state):
            gcur, done = state
            patch_j = _sample_patches(curr_lvl, gcur - o_lvl - half, window)
            diff = patch_j - patch_i
            b1 = jnp.sum(diff * gx, axis=(1, 2))
            b2 = jnp.sum(diff * gy, axis=(1, 2))
            dx = -(g22 * b1 - g12 * b2) / safe_det
            dy = -(-g12 * b1 + g11 * b2) / safe_det
            live = invertible & ~done
            step = jnp.where(live[:, None], jnp.stack([dx, dy], -1), 0.0)
            # cv2 TERM_CRITERIA_EPS: apply the step, then stop iterating
            # once its squared norm falls below epsilon^2
            done = done | (jnp.sum(step * step, axis=-1) <= eps_sq)
            return gcur + step, done

        g, _ = jax.lax.fori_loop(
            0, iterations, body, (g, jnp.zeros(k, bool))
        )
        status = status & invertible

    inside = (g[:, 0] >= 0) & (g[:, 0] <= w - 1) & (g[:, 1] >= 0) & (g[:, 1] <= h - 1)
    return g, status & inside & valid
