"""Pyramidal Lucas-Kanade sparse optical flow on device.

Replaces cv2.calcOpticalFlowPyrLK (reference coordinate_model.py:65,:435;
winSize 15x15, maxLevel 2, 10 iters / eps 0.03) with a vectorized JAX
implementation: all tracked points advance in parallel (vmap), the
iteration count is fixed (converged points take near-zero steps).

TPU mapping:
- pyrDown is expressed as two banded-matrix contractions (MXU) instead of
  a 1-channel conv, which XLA maps poorly onto the systolic array;
- spatial gradients are *not* precomputed as full-resolution images: each
  tracked point samples one (window+2)^2 patch and differentiates it with
  Scharr /32 shifts on the VPU, saving two full-image passes and the HBM
  traffic of carrying gradient planes into the temporal scan.

Numerical conventions follow OpenCV: 5-tap Gaussian pyrDown with
reflect-101 borders, Scharr /32 derivatives, bilinear subpixel sampling,
initial guess carried down the pyramid with x2 rescaling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# cv2 BGR -> gray coefficients
_GRAY_W = np.array([0.114, 0.587, 0.299], dtype=np.float32)


def bgr_to_gray(frames: jax.Array) -> jax.Array:
    """uint8 BGR NHWC -> float32 grayscale (N, H, W), cv2-rounded."""
    y = frames.astype(jnp.float32) @ jnp.asarray(_GRAY_W)
    return jnp.round(y)


@functools.lru_cache(maxsize=32)
def _pyr_matrix(n: int) -> np.ndarray:
    """1-D pyrDown operator as a dense ((n+1)//2, n) matrix: 5-tap
    [1,4,6,4,1]/16 Gaussian with reflect-101 borders + stride-2 decimation
    (cv2.pyrDown convention)."""
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
    """cv2.pyrDown of (N, H, W) via two MXU matmuls."""
    _, h, w = gray.shape
    Mh = jnp.asarray(_pyr_matrix(h))
    Mw = jnp.asarray(_pyr_matrix(w))
    y = jnp.einsum("oh,nhw->now", Mh, gray, precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("ow,nhw->nho", Mw, y, precision=jax.lax.Precision.HIGHEST)


def build_pyramid(gray: jax.Array, levels: int = 2) -> list[jax.Array]:
    """[(N, H, W), (N, H/2, W/2), ...] with ``levels`` downsamples."""
    pyr = [gray]
    for _ in range(levels):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


def scharr_gradients(gray: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Full-image Scharr /32 derivatives of (N, H, W) with replicated
    borders (kept for tests/tools; the flow kernel differentiates sampled
    patches instead)."""
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


def _bilinear_patch(img: jax.Array, center: jax.Array, offsets: jax.Array) -> jax.Array:
    """Sample subpixel positions ``center + offsets`` from a 2-D image
    with bilinear interpolation and edge clamping.  offsets: (P, 2)."""
    pos = center[None, :] + offsets
    h, w = img.shape
    x = jnp.clip(pos[:, 0], 0.0, w - 1.001)
    y = jnp.clip(pos[:, 1], 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


@functools.partial(jax.jit, static_argnames=("window", "levels", "iterations"))
def lk_flow(
    prev_pyr: tuple[jax.Array, ...],
    curr_pyr: tuple[jax.Array, ...],
    pts: jax.Array,
    valid: jax.Array,
    window: int = 15,
    levels: int = 2,
    iterations: int = 10,
) -> tuple[jax.Array, jax.Array]:
    """Track ``pts`` (K, 2) from prev to curr.

    Pyramids are single-image ((H, W) per level); batch framing is handled
    by the caller (the temporal scan carries one frame pair per step).

    Returns (new_pts (K, 2), status (K,) bool).
    """
    half = (window - 1) / 2.0
    ext = window + 2  # +1 px ring for in-patch Scharr differentiation
    eoffs = np.stack(
        np.meshgrid(
            np.arange(ext) - half - 1.0, np.arange(ext) - half - 1.0, indexing="xy"
        ),
        axis=-1,
    ).reshape(-1, 2).astype(np.float32)
    ext_offsets = jnp.asarray(eoffs)  # (ext^2, 2) as (dx, dy)
    woffs = np.stack(
        np.meshgrid(np.arange(window) - half, np.arange(window) - half, indexing="xy"),
        axis=-1,
    ).reshape(-1, 2).astype(np.float32)
    win_offsets = jnp.asarray(woffs)

    sm = jnp.asarray([3.0, 10.0, 3.0]) / 16.0
    dv = jnp.asarray([-1.0, 0.0, 1.0]) / 2.0

    def patch_grads(patch_ext: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
        """(ext, ext) sampled patch -> interior (win^2,) values + Scharr
        gradients, all on the VPU via shifts."""
        p = patch_ext.reshape(ext, ext)

        def sep(k1, axis1, k2, axis2):
            out = 0.0
            for a in range(3):
                row = 0.0
                for b in range(3):
                    sl = [slice(1, -1), slice(1, -1)]
                    sl[axis1] = slice(a, a + window)
                    sl[axis2] = slice(b, b + window)
                    row = row + k2[b] * p[tuple(sl)]
                out = out + k1[a] * row
            return out

        gx = sep(sm, 0, dv, 1)  # smooth rows, differentiate cols
        gy = sep(dv, 0, sm, 1)
        return p[1:-1, 1:-1].reshape(-1), gx.reshape(-1), gy.reshape(-1)

    def track_point(pt, ok):
        g = pt / (2.0**levels)
        status = ok
        for lvl in range(levels, -1, -1):
            g = g * 2.0 if lvl < levels else g
            prev_img = prev_pyr[lvl]
            curr_img = curr_pyr[lvl]
            p_lvl = pt / (2.0**lvl)

            patch_ext = _bilinear_patch(prev_img, p_lvl, ext_offsets)
            patch_i, gx, gy = patch_grads(patch_ext)
            g11 = jnp.sum(gx * gx)
            g12 = jnp.sum(gx * gy)
            g22 = jnp.sum(gy * gy)
            det = g11 * g22 - g12 * g12
            invertible = det > 1e-6
            safe_det = jnp.where(invertible, det, 1.0)

            def body(_, gcur):
                patch_j = _bilinear_patch(curr_img, gcur, win_offsets)
                diff = patch_j - patch_i
                b1 = jnp.sum(diff * gx)
                b2 = jnp.sum(diff * gy)
                dx = -(g22 * b1 - g12 * b2) / safe_det
                dy = -(-g12 * b1 + g11 * b2) / safe_det
                step = jnp.where(invertible, jnp.stack([dx, dy]), jnp.zeros(2))
                return gcur + step

            g = jax.lax.fori_loop(0, iterations, body, g)
            status = status & invertible

        h, w = prev_pyr[0].shape
        inside = (g[0] >= 0) & (g[0] <= w - 1) & (g[1] >= 0) & (g[1] <= h - 1)
        return g, status & inside

    new_pts, status = jax.vmap(track_point)(pts, valid)
    return new_pts, status & valid
