"""Class-aware non-maximum suppression on device, fixed shapes.

Replaces the ultralytics CPU/CUDA NMS the reference relies on
(coordinate_model.py:567-572).  TPU-idiomatic design: confidence top-K
pre-selection bounds the candidate count, the IoU matrix is computed once
as a dense (K, K) block, and the greedy suppression pass is a
``fori_loop`` over the score-sorted candidates carrying a suppression
vector -- identical results to the classic sequential algorithm, but with
static shapes and no host synchronization.  Class separation uses the
standard coordinate-offset trick.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MAX_WH = 7680.0  # class-separation offset (ultralytics convention)


def box_iou_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise IoU of xyxy boxes: (N, 4) x (M, 4) -> (N, M)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


@functools.partial(jax.jit, static_argnames=("max_det", "pre_topk"))
def nms(
    boxes: jax.Array,
    scores: jax.Array,
    conf_threshold: jax.Array | float = 0.15,
    iou_threshold: jax.Array | float = 0.7,
    max_det: int = 128,
    pre_topk: int = 512,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Single-image class-aware NMS.

    Parameters
    ----------
    boxes : (A, 4) xyxy candidate boxes
    scores : (A, nc) per-class scores; class = argmax, conf = max
        (ultralytics single-label mode)

    Returns
    -------
    out_boxes : (max_det, 4), score-descending
    out_scores : (max_det,)
    out_cls : (max_det,) int32
    out_valid : (max_det,) bool
    """
    conf = scores.max(axis=-1)
    cls = scores.argmax(axis=-1).astype(jnp.int32)
    cand = conf > conf_threshold

    k = min(pre_topk, boxes.shape[0])
    top_conf, order = jax.lax.top_k(jnp.where(cand, conf, -jnp.inf), k)
    top_boxes = boxes[order]
    top_cls = cls[order]
    top_valid = jnp.isfinite(top_conf)

    # class offset so cross-class IoU is always ~0
    off = top_cls.astype(boxes.dtype)[:, None] * MAX_WH  # (k, 1), broadcasts
    shifted = top_boxes + off
    iou = box_iou_matrix(shifted, shifted)

    # greedy suppression as a fixed-point iteration: keep[i] holds iff no
    # higher-scored kept box overlaps it.  Iterating the whole vector
    # converges in (suppression-chain depth) steps -- a handful of dense
    # (k, k) passes instead of k sequential scalar steps.
    tri_overlap = (
        (iou > iou_threshold)
        & (jnp.arange(k)[:, None] < jnp.arange(k)[None, :])  # strictly j > i
        & top_valid[:, None]
        & top_valid[None, :]
    )  # (i, j): kept i would suppress j

    def cond(state):
        keep, prev, it = state
        return (it < k) & jnp.any(keep != prev)

    def body(state):
        keep, _, it = state
        suppressed = (tri_overlap & keep[:, None]).any(axis=0)
        return top_valid & ~suppressed, keep, it + 1

    keep0 = top_valid
    keep, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.zeros_like(keep0), jnp.int32(0))
    )

    # compact kept entries (already score-sorted) into the first slots
    pos = jnp.cumsum(keep) - 1
    slot = jnp.where(keep, pos, max_det)  # drop overflow + rejects
    out_boxes = jnp.zeros((max_det + 1, 4), boxes.dtype).at[slot].set(top_boxes, mode="drop")[:max_det]
    out_scores = jnp.zeros((max_det + 1,), conf.dtype).at[slot].set(top_conf, mode="drop")[:max_det]
    out_cls = jnp.zeros((max_det + 1,), jnp.int32).at[slot].set(top_cls, mode="drop")[:max_det]
    n_kept = jnp.minimum(keep.sum(), max_det)
    out_valid = jnp.arange(max_det) < n_kept
    return out_boxes, out_scores, out_cls, out_valid


def batched_nms(boxes, scores, conf_threshold=0.15, iou_threshold=0.7, max_det=128, pre_topk=512):
    """vmap of :func:`nms` over the leading batch axis."""
    fn = functools.partial(
        nms,
        conf_threshold=conf_threshold,
        iou_threshold=iou_threshold,
        max_det=max_det,
        pre_topk=pre_topk,
    )
    return jax.vmap(fn)(boxes, scores)
