"""Pallas kernel for the Lucas-Kanade iteration engine.

The XLA flow path (:func:`eagle_tpu.ops.optical_flow.lk_flow`) expresses
the per-point pyramid build + 3x10 Newton iterations as a few hundred
small HLO ops per scan step; at ~5-10 us of fixed cost per op on TPU that
overhead dominates the (tiny) arithmetic.  This kernel runs the whole
engine for one point per grid step with everything resident in VMEM:

  grid = (K,); per step: the point's two gray ROIs (already extracted and
  grayed by cheap XLA dynamic_slices) are block-mapped into VMEM, the
  3-level pyramid is built with small MXU matmuls, and all Newton
  iterations execute in-register -- one kernel replaces the op soup.

Numerics are identical to the XLA path (same pyrDown matrices, Scharr /32
patch gradients, hat-function interpolation weights); the equivalence test
runs the kernel in interpreter mode on CPU.

Select with ``FlowConfig.backend = "pallas"``; the XLA path stays the
default until the kernel is profiled on the target fleet.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eagle_tpu.ops.optical_flow import ROI_SIDE, _pyr_matrix


def _hat_weights(start: jax.Array, taps: int, size: int) -> jax.Array:
    """(taps, size) linear interpolation weights for a scalar start
    position (edge-clamped hat function vs an iota)."""
    # int arange + cast: Mosaic folds float-constant ranges into an iota op,
    # which must be integer-typed
    taps_f = jnp.arange(taps, dtype=jnp.int32).astype(jnp.float32)
    pos = start + taps_f[:, None]  # (taps, 1)
    pos = jnp.clip(pos, 0.0, size - 1.0)
    # Mosaic iota must be integer-typed
    grid = jax.lax.broadcasted_iota(jnp.int32, (taps, size), 1).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos - grid))


def _sample(roi: jax.Array, tlx: jax.Array, tly: jax.Array, taps: int) -> jax.Array:
    size = roi.shape[0]
    wy = _hat_weights(tly, taps, size)  # (taps, size)
    wx = _hat_weights(tlx, taps, size)
    tmp = jax.lax.dot_general(
        wy, roi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (taps, size)
    return jax.lax.dot_general(
        tmp, wx, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (taps, taps)


def _make_kernel(side: int, window: int, levels: int, iterations: int, epsilon: float):
    ext = window + 2
    half = (window - 1) / 2.0
    eps_sq = np.float32(epsilon) ** 2
    sm = np.array([3.0, 10.0, 3.0], np.float32) / 16.0
    dv = np.array([-1.0, 0.0, 1.0], np.float32) / 2.0

    def patch_grads(p_ext):
        def sep(k1, a1, k2, a2):
            out = 0.0
            for a in range(3):
                row = 0.0
                for b in range(3):
                    sl = [slice(1, -1), slice(1, -1)]
                    sl[a1] = slice(a, a + window)
                    sl[a2] = slice(b, b + window)
                    row = row + k2[b] * p_ext[tuple(sl)]
                out = out + k1[a] * row
            return out

        return p_ext[1:-1, 1:-1], sep(sm, 0, dv, 1), sep(dv, 0, sm, 1)

    def kernel(pts_ref, org_ref, valid_ref, prev_ref, curr_ref, *rest):
        # refs: pts (K,2) SMEM full, org (K,2) SMEM full, valid (K,1) SMEM
        # full (TPU lowering requires small blocks to be whole arrays),
        # prev/curr (1, side, side) VMEM, pyramid operators (levels refs),
        # outputs (K,2)/(K,1) SMEM full
        pyr_refs = rest[:-2]
        out_pt_ref, out_ok_ref = rest[-2:]
        i = pl.program_id(0)
        px = pts_ref[i, 0]
        py = pts_ref[i, 1]
        ox = org_ref[i, 0].astype(jnp.float32)
        oy = org_ref[i, 1].astype(jnp.float32)

        # build both ROI pyramids in VMEM (block shape (1, side, side))
        prev_lv = [prev_ref[0]]
        curr_lv = [curr_ref[0]]
        for l in range(levels):
            M = pyr_refs[l][...]
            for lst in (prev_lv, curr_lv):
                x = lst[-1]
                y = jax.lax.dot_general(
                    M, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )
                y = jax.lax.dot_general(
                    y, M, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                )
                lst.append(y)

        gx_img = px
        gy_img = py
        status = valid_ref[i, 0] > 0
        gx_img = gx_img / (2.0**levels)
        gy_img = gy_img / (2.0**levels)
        for lvl in range(levels, -1, -1):
            if lvl < levels:
                gx_img = gx_img * 2.0
                gy_img = gy_img * 2.0
            inv = 1.0 / (2.0**lvl)
            olx = ox * inv
            oly = oy * inv
            plx = px * inv
            ply = py * inv

            p_ext = _sample(prev_lv[lvl], plx - olx - (half + 1.0), ply - oly - (half + 1.0), ext)
            patch_i, gxp, gyp = patch_grads(p_ext)
            g11 = jnp.sum(gxp * gxp)
            g12 = jnp.sum(gxp * gyp)
            g22 = jnp.sum(gyp * gyp)
            det = g11 * g22 - g12 * g12
            invertible = det > 1e-6
            safe_det = jnp.where(invertible, det, 1.0)
            curr_roi = curr_lv[lvl]

            def body(_, g):
                gx_, gy_, done = g
                patch_j = _sample(curr_roi, gx_ - olx - half, gy_ - oly - half, window)
                diff = patch_j - patch_i
                b1 = jnp.sum(diff * gxp)
                b2 = jnp.sum(diff * gyp)
                dx = -(g22 * b1 - g12 * b2) / safe_det
                dy = -(-g12 * b1 + g11 * b2) / safe_det
                live = invertible & ~done
                dx = jnp.where(live, dx, 0.0)
                dy = jnp.where(live, dy, 0.0)
                # cv2 TERM_CRITERIA_EPS: apply the step, then stop once its
                # squared norm falls below epsilon^2
                done = done | (dx * dx + dy * dy <= eps_sq)
                return gx_ + dx, gy_ + dy, done

            gx_img, gy_img, _ = jax.lax.fori_loop(
                0, iterations, body, (gx_img, gy_img, jnp.bool_(False))
            )
            status = status & invertible

        out_pt_ref[i, 0] = gx_img
        out_pt_ref[i, 1] = gy_img
        out_ok_ref[i, 0] = status.astype(jnp.int32)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("window", "levels", "iterations", "epsilon", "interpret")
)
def lk_flow_pallas(
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
    running the iteration engine as one Pallas kernel per point."""
    from eagle_tpu.ops.optical_flow import _GRAY_W, _extract_color_rois

    h, w, _ = prev_bgr.shape
    k = pts.shape[0]
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
    gray_w = jnp.asarray(_GRAY_W)
    prev_rois = jnp.round(
        _extract_color_rois(prev_bgr, origin, side).astype(jnp.float32) @ gray_w
    )
    curr_rois = jnp.round(
        _extract_color_rois(curr_bgr, origin, side).astype(jnp.float32) @ gray_w
    )

    kernel = _make_kernel(side, window, levels, iterations, float(epsilon))
    pyr_ops = [jnp.asarray(_pyr_matrix(side // (2**l))) for l in range(levels)]
    out_pt, out_ok = pl.pallas_call(
        kernel,
        grid=(k,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, side, side), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, side, side), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(levels)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k, 2), jnp.float32),
            jax.ShapeDtypeStruct((k, 1), jnp.int32),
        ),
        interpret=interpret,
    )(
        pts.astype(jnp.float32),
        origin,
        valid.astype(jnp.int32)[:, None],
        prev_rois,
        curr_rois,
        *pyr_ops,
    )

    new_pts = out_pt
    status = out_ok[:, 0] > 0
    inside = (
        (new_pts[:, 0] >= 0)
        & (new_pts[:, 0] <= w - 1)
        & (new_pts[:, 1] >= 0)
        & (new_pts[:, 1] <= h - 1)
    )
    return new_pts, status & inside & valid
