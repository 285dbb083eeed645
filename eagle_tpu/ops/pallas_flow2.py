"""Pallas LK-flow v2: one lane-batched kernel per pyramid level.

The XLA flow path (:func:`eagle_tpu.ops.optical_flow.lk_flow`) and a
since-deleted v1 per-point kernel both pay a fixed cost per tiny op: the
XLA path as per-HLO dispatch overhead inside the scan, the v1 kernel as
per-grid-step tiles that used a handful of the VPU's 8x128 lanes
(measured 3.1 vs 2.6 ms/frame -- docs/architecture.md; v1 was removed
after measuring slower than both this kernel and the XLA path).

v2 batches ALL K tracked points onto the lane dimension and runs one
kernel per pyramid level (the reference semantics: cv2 winSize 15,
maxLevel 2, 10 iters, coordinate_model.py:65):

  XLA (cheap, a dozen ops total): per-point 192px gray ROI extraction +
  batched pyrDown pyramids (identical to the XLA path), then per level a
  small per-point window slice around the level's initial guess.

  Pallas (per level): previous-patch sampling + Scharr gradients + the
  whole 10-iteration Newton engine for every point at once.  Patches live
  as (taps, taps, K) tiles, per-point scalars as (1, K) vectors, and the
  bilinear sampling runs as dense hat-weight multiply-reduce over the
  window rows/columns -- every VPU op covers all K points.

Numerics match the XLA path exactly (same hat-function clamping at the
ROI bounds, expressed in window coordinates) whenever the per-level
Newton drift stays inside the window slack (~+-24 px at levels 0-1;
level 2's window IS the whole 48px ROI).  Beyond that the sampling clamps
to the window instead of the ROI -- points drifting that fast fail the
pipeline's z-score filter regardless.

Select with ``FlowConfig.backend = "pallas2"``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eagle_tpu.ops.optical_flow import ROI_SIDE, _extract_gray_roi_pair, _pyr_matrix


def _clamped_start(start: jax.Array, taps: int, roi_size: int, wo: jax.Array, win: int):
    """Apply the XLA path's per-tap ROI clamp, in window coordinates.

    Returns (taps, 1, K) positions: clip(start + t, 0, roi_size-1) - wo,
    additionally clamped to the window (a deviation only when the patch
    has drifted past the window slack)."""
    k = start.shape[-1]
    t = jax.lax.broadcasted_iota(jnp.int32, (taps, 1, k), 0).astype(jnp.float32)
    pos = jnp.clip(start[None] + t, 0.0, float(roi_size - 1)) - wo[None]
    return jnp.clip(pos, 0.0, float(win - 1))


def _sample(win_ref_val: jax.Array, pos_y, pos_x, taps: int) -> jax.Array:
    """(S, S, K) window + (taps, 1, K) positions -> (taps, taps, K) patch
    via two dense hat-weight contractions (rows then columns)."""
    s = win_ref_val.shape[0]
    k = win_ref_val.shape[-1]
    gy = jax.lax.broadcasted_iota(jnp.int32, (taps, s, k), 1).astype(jnp.float32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(pos_y - gy))  # (taps, S, K)
    gx = jax.lax.broadcasted_iota(jnp.int32, (taps, s, k), 1).astype(jnp.float32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(pos_x - gx))
    # rows: A[ty, x, k] = sum_y wy[ty, y, k] * W[y, x, k]
    rows = [
        jnp.sum(wy[ty][:, None, :] * win_ref_val, axis=0) for ty in range(taps)
    ]
    a = jnp.stack(rows)  # (taps, S, K)
    # cols: P[ty, tx, k] = sum_x wx[tx, x, k] * A[ty, x, k]
    cols = [jnp.sum(wx[tx][None] * a, axis=1) for tx in range(taps)]
    return jnp.stack(cols, axis=1)  # (taps, taps, K)


def _make_level_kernel(
    s_l: int, p_win: int, c_win: int, window: int, iterations: int, epsilon: float
):
    ext = window + 2
    half = (window - 1) / 2.0
    eps_sq = np.float32(epsilon) ** 2
    sm = np.array([3.0, 10.0, 3.0], np.float32) / 16.0
    dv = np.array([-1.0, 0.0, 1.0], np.float32) / 2.0

    def kernel(meta_ref, g_ref, prev_ref, curr_ref, out_g_ref, out_ok_ref):
        # meta rows: 0 px, 1 py (pts at this level), 2 ox, 3 oy (ROI origin
        # at this level), 4 woxp, 5 woyp (prev-window origin), 6 woxc,
        # 7 woyc (curr-window origin); all (1, K) slices of an (8, K) array
        px, py = meta_ref[0][None], meta_ref[1][None]
        ox, oy = meta_ref[2][None], meta_ref[3][None]
        woxp, woyp = meta_ref[4][None], meta_ref[5][None]
        woxc, woyc = meta_ref[6][None], meta_ref[7][None]
        prev = prev_ref[...]
        curr = curr_ref[...]

        # ---- previous patch (fixed per level) + Scharr gradients
        sy = py - oy - (half + 1.0)
        sx = px - ox - (half + 1.0)
        p_ext = _sample(
            prev,
            _clamped_start(sy[0], ext, s_l, woyp[0][None], p_win),
            _clamped_start(sx[0], ext, s_l, woxp[0][None], p_win),
            ext,
        )  # (ext, ext, K)

        def sep(k1, a1, k2, a2):
            out = 0.0
            for a in range(3):
                row = 0.0
                for b in range(3):
                    sl = [slice(1, -1), slice(1, -1), slice(None)]
                    sl[a1] = slice(a, a + window)
                    sl[a2] = slice(b, b + window)
                    row = row + k2[b] * p_ext[tuple(sl)]
                out = out + k1[a] * row
            return out

        patch_i = p_ext[1:-1, 1:-1]
        gxp = sep(sm, 0, dv, 1)  # (w, w, K)
        gyp = sep(dv, 0, sm, 1)

        g11 = jnp.sum(jnp.sum(gxp * gxp, axis=0), axis=0)[None]  # (1, K)
        g12 = jnp.sum(jnp.sum(gxp * gyp, axis=0), axis=0)[None]
        g22 = jnp.sum(jnp.sum(gyp * gyp, axis=0), axis=0)[None]
        det = g11 * g22 - g12 * g12
        invertible = det > 1e-6
        safe_det = jnp.where(invertible, det, 1.0)

        inv_f = invertible.astype(jnp.float32)

        def body(_, state):
            # Mosaic mis-lays-out i1 vectors in loop carries; the done
            # flag rides as 0.0/1.0 float instead
            gx_, gy_, done = state
            patch_j = _sample(
                curr,
                _clamped_start((gy_ - oy - half)[0], window, s_l, woyc[0][None], c_win),
                _clamped_start((gx_ - ox - half)[0], window, s_l, woxc[0][None], c_win),
                window,
            )
            diff = patch_j - patch_i
            b1 = jnp.sum(jnp.sum(diff * gxp, axis=0), axis=0)[None]
            b2 = jnp.sum(jnp.sum(diff * gyp, axis=0), axis=0)[None]
            dx = -(g22 * b1 - g12 * b2) / safe_det
            dy = -(-g12 * b1 + g11 * b2) / safe_det
            live = inv_f * (1.0 - done)
            dx = dx * live
            dy = dy * live
            # cv2 TERM_CRITERIA_EPS: apply the step, then stop once its
            # squared norm falls below epsilon^2
            done = jnp.maximum(
                done, (dx * dx + dy * dy <= eps_sq).astype(jnp.float32)
            )
            return gx_ + dx, gy_ + dy, done

        k = px.shape[-1]
        gx0 = g_ref[0][None]
        gy0 = g_ref[1][None]
        gx_img, gy_img, _ = jax.lax.fori_loop(
            0, iterations, body, (gx0, gy0, jnp.zeros((1, k), jnp.float32))
        )
        out_g_ref[0] = gx_img[0]
        out_g_ref[1] = gy_img[0]
        out_ok_ref[0] = invertible[0].astype(jnp.int32)

    return kernel


def _window_extract(rois: jax.Array, woy: jax.Array, wox: jax.Array, win: int):
    """(K, s, s) per-point level ROIs -> (win, win, K) windows at integer
    per-point origins (gather-free: vmapped dynamic_slice)."""

    def one(r, oy, ox):
        return jax.lax.dynamic_slice(r, (oy, ox), (win, win))

    w = jax.vmap(one)(rois, woy, wox)
    return jnp.transpose(w, (1, 2, 0))


@functools.partial(
    jax.jit, static_argnames=("window", "levels", "iterations", "epsilon", "interpret")
)
def lk_flow_pallas2(
    prev_bgr: jax.Array,
    curr_bgr: jax.Array,
    pts: jax.Array,
    valid: jax.Array,
    window: int = 15,
    levels: int = 2,
    iterations: int = 10,
    epsilon: float = 0.03,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in replacement for :func:`eagle_tpu.ops.optical_flow.lk_flow`
    with the per-level iteration engine in lane-batched Pallas kernels."""
    h, w, _ = prev_bgr.shape
    k = pts.shape[0]
    half = (window - 1) / 2.0
    ext = window + 2
    side = min(ROI_SIDE, h - h % 4, w - w % 4)
    factor = 2**levels

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
    p0, c0 = _extract_gray_roi_pair(prev_bgr, curr_bgr, origin, side)
    prev_pyr = [p0]
    curr_pyr = [c0]
    for l in range(levels):
        m = jnp.asarray(_pyr_matrix(side // (2**l)))
        for pyr in (prev_pyr, curr_pyr):
            x = pyr[-1]
            y = jnp.einsum("oh,khw->kow", m, x, precision=jax.lax.Precision.HIGHEST)
            pyr.append(
                jnp.einsum("ow,khw->kho", m, y, precision=jax.lax.Precision.HIGHEST)
            )

    origin_f = origin.astype(jnp.float32)
    g = pts / (2.0**levels)  # (K, 2), level-image coords
    status = valid

    p_win = ext + 1  # holds every ROI-clamped prev tap exactly
    for lvl in range(levels, -1, -1):
        if lvl < levels:
            g = g * 2.0
        s_l = side // (2**lvl)
        c_win = min(64, s_l)
        pw = min(p_win, s_l)
        inv = 1.0 / (2.0**lvl)
        o_lvl = origin_f * inv  # (K, 2)
        p_lvl = pts * inv

        # prev window: tight, exact (see module docstring)
        syp = p_lvl[:, 1] - o_lvl[:, 1] - (half + 1.0)
        sxp = p_lvl[:, 0] - o_lvl[:, 0] - (half + 1.0)
        woyp = jnp.clip(jnp.floor(syp).astype(jnp.int32), 0, s_l - pw)
        woxp = jnp.clip(jnp.floor(sxp).astype(jnp.int32), 0, s_l - pw)
        # curr window: centered on the level's initial guess
        syc = g[:, 1] - o_lvl[:, 1] - half
        sxc = g[:, 0] - o_lvl[:, 0] - half
        pad = (c_win - window) // 2
        woyc = jnp.clip(jnp.floor(syc).astype(jnp.int32) - pad, 0, s_l - c_win)
        woxc = jnp.clip(jnp.floor(sxc).astype(jnp.int32) - pad, 0, s_l - c_win)

        prev_win = _window_extract(prev_pyr[lvl], woyp, woxp, pw)
        curr_win = _window_extract(curr_pyr[lvl], woyc, woxc, c_win)

        meta = jnp.stack(
            [
                p_lvl[:, 0],
                p_lvl[:, 1],
                o_lvl[:, 0],
                o_lvl[:, 1],
                woxp.astype(jnp.float32),
                woyp.astype(jnp.float32),
                woxc.astype(jnp.float32),
                woyc.astype(jnp.float32),
            ]
        )  # (8, K)

        kernel = _make_level_kernel(s_l, pw, c_win, window, iterations, float(epsilon))
        g_t, ok = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((2, k), jnp.float32),
                jax.ShapeDtypeStruct((1, k), jnp.int32),
            ),
            interpret=interpret,
        )(meta, g.T, prev_win, curr_win)
        g = g_t.T
        status = status & (ok[0] > 0)

    inside = (
        (g[:, 0] >= 0) & (g[:, 0] <= w - 1) & (g[:, 1] >= 0) & (g[:, 1] <= h - 1)
    )
    return g, status & inside & valid
