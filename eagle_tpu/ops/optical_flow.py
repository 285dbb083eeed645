"""Pyramidal Lucas-Kanade sparse optical flow on device.

Replaces cv2.calcOpticalFlowPyrLK (reference coordinate_model.py:65,:435;
winSize 15x15, maxLevel 2, 10 iters / eps 0.03) with a vectorized JAX
implementation: all tracked points advance in parallel (vmap), the
iteration count is fixed (converged points take near-zero steps), and the
pyramid / gradient images are computed once per frame as plain XLA convs.

Numerical conventions follow OpenCV: pyrDown 5-tap Gaussian with
reflect-101 borders, Scharr /32 spatial derivatives, bilinear subpixel
sampling, initial guess carried down the pyramid with x2 rescaling.
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


_PYR_K = np.outer([1, 4, 6, 4, 1], [1, 4, 6, 4, 1]).astype(np.float32) / 256.0


def _reflect_pad(x: jax.Array, p: int) -> jax.Array:
    """reflect-101 padding on the last two axes of (N, H, W)."""
    return jnp.pad(x, ((0, 0), (p, p), (p, p)), mode="reflect")


def pyr_down(gray: jax.Array) -> jax.Array:
    """cv2.pyrDown: 5x5 Gaussian blur + 2x decimation, (N, H, W)."""
    x = _reflect_pad(gray, 2)[:, :, :, None]
    k = jnp.asarray(_PYR_K)[:, :, None, None]
    y = jax.lax.conv_general_dilated(
        x, k, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )[..., 0]
    return y


def build_pyramid(gray: jax.Array, levels: int = 2) -> list[jax.Array]:
    """[(N, H, W), (N, H/2, W/2), ...] with ``levels`` downsamples."""
    pyr = [gray]
    for _ in range(levels):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


def scharr_gradients(gray: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Scharr /32 derivatives of (N, H, W), reflect-101 borders (the
    kernel OpenCV LK uses for the spatial gradient matrix)."""
    kx = jnp.asarray(np.array([[-3, 0, 3], [-10, 0, 10], [-3, 0, 3]], np.float32) / 32.0)
    ky = kx.T
    x = _reflect_pad(gray, 1)[:, :, :, None]
    gx = jax.lax.conv_general_dilated(
        x, kx[:, :, None, None], (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )[..., 0]
    gy = jax.lax.conv_general_dilated(
        x, ky[:, :, None, None], (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )[..., 0]
    return gx, gy


def _bilinear_patch(img: jax.Array, center: jax.Array, offsets: jax.Array) -> jax.Array:
    """Sample a (P,) set of subpixel positions ``center + offsets`` from a
    2-D image with bilinear interpolation and edge clamping."""
    pos = center[None, :] + offsets  # (P, 2) as (x, y)
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
    prev_grads: tuple[tuple[jax.Array, jax.Array], ...],
    pts: jax.Array,
    valid: jax.Array,
    window: int = 15,
    levels: int = 2,
    iterations: int = 10,
) -> tuple[jax.Array, jax.Array]:
    """Track ``pts`` (K, 2) from prev to curr.

    Pyramids/gradients are single-image ((H, W) per level) -- batch framing
    is handled by the caller (scan carries one frame pair at a time).

    Returns (new_pts (K, 2), status (K,) bool).
    """
    half = (window - 1) / 2.0
    offs = np.stack(
        np.meshgrid(np.arange(window) - half, np.arange(window) - half, indexing="xy"),
        axis=-1,
    ).reshape(-1, 2).astype(np.float32)
    offsets = jnp.asarray(offs)  # (window^2, 2) as (dx, dy)

    def track_point(pt, ok):
        g = pt / (2.0**levels)

        status = ok
        for lvl in range(levels, -1, -1):
            g = g * 2.0 if lvl < levels else g
            prev_img = prev_pyr[lvl]
            curr_img = curr_pyr[lvl]
            gx_img, gy_img = prev_grads[lvl]
            p_lvl = pt / (2.0**lvl)

            patch_i = _bilinear_patch(prev_img, p_lvl, offsets)
            gx = _bilinear_patch(gx_img, p_lvl, offsets)
            gy = _bilinear_patch(gy_img, p_lvl, offsets)
            g11 = jnp.sum(gx * gx)
            g12 = jnp.sum(gx * gy)
            g22 = jnp.sum(gy * gy)
            det = g11 * g22 - g12 * g12
            invertible = det > 1e-6
            safe_det = jnp.where(invertible, det, 1.0)

            def body(_, gcur):
                patch_j = _bilinear_patch(curr_img, gcur, offsets)
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
