"""Batched k=2 KMeans + jersey-color voting on device.

The reference's team assignment runs one sklearn KMeans per player crop on
the host and is its slowest post-processing stage (processor.py:405 "This
is pretty slow").  TPU re-design: every crop is resampled to a fixed grid
with one bilinear gather, so all crops across all frames cluster in a
single batched fixed-iteration Lloyd solve, and the HSV color-range counts
reduce in one vectorized pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from eagle_tpu.ops.color import bgr_to_hsv

#: (name, lower, upper) cv2-HSV jersey color ranges (processor.py:10-23);
#: red wraps, handled by merging red2 into red after counting
COLOR_TABLE = [
    ("red", (0, 100, 100), (10, 255, 255)),
    ("red2", (160, 100, 100), (179, 255, 255)),
    ("orange", (11, 100, 100), (25, 255, 255)),
    ("yellow", (26, 100, 100), (35, 255, 255)),
    ("green", (36, 100, 100), (85, 255, 255)),
    ("cyan", (86, 100, 100), (95, 255, 255)),
    ("blue", (96, 100, 100), (125, 255, 255)),
    ("purple", (126, 100, 100), (145, 255, 255)),
    ("magenta", (146, 100, 100), (159, 255, 255)),
    ("white", (0, 0, 200), (180, 30, 255)),
    ("gray", (0, 0, 50), (180, 30, 200)),
    ("black", (0, 0, 0), (180, 255, 50)),
]
COLOR_NAMES = [c[0] for c in COLOR_TABLE]
_LOWER = np.array([c[1] for c in COLOR_TABLE], np.float32)
_UPPER = np.array([c[2] for c in COLOR_TABLE], np.float32)


@functools.partial(jax.jit, static_argnames=("iters",))
def kmeans2(pixels: jax.Array, valid: jax.Array, iters: int = 10) -> jax.Array:
    """Batched 2-means over pixel sets.

    pixels : (B, N, 3) float; valid : (B, N) bool.
    Returns labels (B, N) int32.  Deterministic PCA init: centroids start
    at mean +- std along the principal color axis, which splits the two
    dominant color populations (jersey vs grass) reliably.
    """
    w = valid.astype(pixels.dtype)[..., None]
    n = jnp.maximum(w.sum(1), 1.0)
    mean = (pixels * w).sum(1) / n  # (B, 3)
    d = (pixels - mean[:, None]) * w
    cov = jnp.einsum("bnc,bnd->bcd", d, d, precision=jax.lax.Precision.HIGHEST) / n[..., None]
    _, vecs = jnp.linalg.eigh(cov)
    axis = vecs[..., -1]  # principal eigenvector, (B, 3)
    spread = jnp.sqrt(jnp.einsum("bnc,bc->bn", d, axis) ** 2).max(1, keepdims=True)
    centroids = jnp.stack(
        [mean - axis * spread * 0.5, mean + axis * spread * 0.5], axis=1
    )  # (B, 2, 3)

    def body(c, _):
        # squared distance: argmin is invariant, the sqrt is pure waste
        d = ((pixels[:, :, None, :] - c[:, None, :, :]) ** 2).sum(-1)  # (B,N,2)
        lab = jnp.argmin(d, axis=-1)
        onehot = jax.nn.one_hot(lab, 2) * valid[..., None]  # (B,N,2)
        num = jnp.einsum("bnk,bnc->bkc", onehot, pixels)
        den = jnp.maximum(onehot.sum(1)[..., None], 1e-6)
        return num / den, None

    centroids, _ = jax.lax.scan(body, centroids, None, length=iters)
    d = ((pixels[:, :, None, :] - centroids[:, None, :, :]) ** 2).sum(-1)
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("grid_hw",))
def gather_crops(frames: jax.Array, frame_idx: jax.Array, boxes: jax.Array, grid_hw=(64, 32)):
    """Resample arbitrary boxes to a fixed grid with one bilinear gather.

    frames : (F, H, W, 3) uint8; frame_idx : (B,); boxes : (B, 4) xyxy.
    Returns (B, gh, gw, 3) float32 crops.
    """
    gh, gw = grid_hw
    f, h, w, _ = frames.shape
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    # sample pixel centers like slicing crop[y1:y2, x1:x2] then resizing
    ty = (jnp.arange(gh) + 0.5) / gh
    tx = (jnp.arange(gw) + 0.5) / gw
    ys = y1[:, None] + ty[None, :] * (y2 - y1)[:, None] - 0.5  # (B, gh)
    xs = x1[:, None] + tx[None, :] * (x2 - x1)[:, None] - 0.5  # (B, gw)
    ys = jnp.clip(ys, 0.0, h - 1.001)
    xs = jnp.clip(xs, 0.0, w - 1.001)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    fy = (ys - y0)[:, :, None, None]
    fx = (xs - x0)[:, None, :, None]
    fi = frame_idx[:, None, None]
    img = frames.astype(jnp.float32)
    v00 = img[fi, y0[:, :, None], x0[:, None, :]]
    v01 = img[fi, y0[:, :, None], x0[:, None, :] + 1]
    v10 = img[fi, y0[:, :, None] + 1, x0[:, None, :]]
    v11 = img[fi, y0[:, :, None] + 1, x0[:, None, :] + 1]
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def matmul_crops(frame: jax.Array, boxes: jax.Array, grid_hw=(64, 32), dtype=jnp.float32):
    """Single-frame twin of :func:`gather_crops` built from one-hot
    interpolation matmuls instead of advanced-index gathers — the
    CLAUDE.md "no XLA gathers on hot paths" idiom applied to crop
    resampling.

    frame : (H, W, 3) uint8; boxes : (K, 4) xyxy.  Returns
    (K, gh, gw, 3) ``dtype`` crops with the IDENTICAL sample-position
    convention (``src = (dst+0.5)*scale - 0.5``, clip to [0, dim-1.001]):
    each bilinear axis becomes a (K, g, dim) row matrix with exactly two
    non-zero taps, contracted against the frame on the MXU.

    Measured on the v5e dev chip at the ReID shape (64 crops of 256x128
    from a 544x960 canvas, 16 frames — scripts/measure_reid_parts.py):
    the 4-tap gather costs 187.6 ms/frame, this matmul 1.0 (f32) / 1.2
    (bf16) ms/frame, ~180x.  f32 matches the gather to ~1e-3 on uint8
    pixels (contraction-order rounding only); bf16 taps wobble by <=2
    uint8 LSB — both immaterial for embeddings.
    """
    gh, gw = grid_hw
    h, w, _ = frame.shape
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    ty = (jnp.arange(gh, dtype=jnp.float32) + 0.5) / gh
    tx = (jnp.arange(gw, dtype=jnp.float32) + 0.5) / gw
    ys = jnp.clip(y1[:, None] + ty[None] * (y2 - y1)[:, None] - 0.5, 0.0, h - 1.001)
    xs = jnp.clip(x1[:, None] + tx[None] * (x2 - x1)[:, None] - 0.5, 0.0, w - 1.001)

    def interp_rows(pos, size):
        # pos (K, g) float sample coords -> (K, g, size) two-tap rows
        p0 = jnp.floor(pos)
        fr = (pos - p0)[..., None]
        idx = jnp.arange(size, dtype=pos.dtype)
        m = (idx == p0[..., None]) * (1 - fr) + (idx == p0[..., None] + 1) * fr
        return m.astype(dtype)

    ry = interp_rows(ys, h)  # (K, gh, H)
    rx = interp_rows(xs, w)  # (K, gw, W)
    t = jnp.einsum("hwc,kgw->khgc", frame.astype(dtype), rx)
    return jnp.einsum("khgc,kfh->kfgc", t, ry)


def gather_crops_host(
    frames, frame_idx: np.ndarray, boxes: np.ndarray, grid_hw=(64, 32)
) -> np.ndarray:
    """Host twin of :func:`gather_crops` (same sample-position convention
    ``src = (dst+0.5)*scale - 0.5``), rounded to uint8: crops are gathered
    on the host so only ~(B, gh, gw, 3) bytes cross to the device, not the
    full frames (4x fewer link bytes than float32 -- the crop upload is
    the dominant Processor cost when the host link degrades).

    NOT byte-identical to the device gather: integer clipped boxes (the
    Processor's normal input) take a cv2 fixed-point bilinear fast path
    whose values differ from the float gather by up to 1 LSB; fractional
    boxes take the exact numpy twin.  Both feed KMeans team votes, where
    a 1-LSB pixel wobble is far below the cluster separation.

    ``frames`` may be a list of per-frame arrays or an (F, H, W, 3) stack;
    crops are gathered frame-by-frame so a frame LIST is never stacked
    into one giant copy (stacking a 96-frame 720p clip costs ~1 s, which
    used to dominate the whole Processor)."""
    gh, gw = grid_hw
    first = np.asarray(frames[0])
    h, w = first.shape[:2]
    boxes = np.asarray(boxes, np.float32)
    ib = np.rint(boxes).astype(np.int64)
    if (
        np.abs(boxes - ib).max(initial=0.0) < 1e-6
        and (ib[:, 0] >= 0).all()
        and (ib[:, 1] >= 0).all()
        and (ib[:, 2] <= w).all()
        and (ib[:, 3] <= h).all()
        and (ib[:, 2] > ib[:, 0]).all()
        and (ib[:, 3] > ib[:, 1]).all()
    ):
        # integer boxes (the Processor's clipped bboxes): slice + cv2
        # bilinear resize -- the identical sample-position convention
        # (src = (dst+0.5)*scale - 0.5) in SIMD fixed point, ~20x faster
        # than the numpy gather and closest to the reference's
        # crop-then-cluster semantics (processor.py:467-474)
        import cv2

        fi = np.asarray(frame_idx, np.int64)
        out = np.empty((len(ib), gh, gw, 3), np.uint8)
        for k in range(len(ib)):
            img = np.asarray(frames[int(fi[k])])
            x1, y1, x2, y2 = ib[k]
            out[k] = cv2.resize(
                img[y1:y2, x1:x2], (gw, gh), interpolation=cv2.INTER_LINEAR
            )
        return out
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    ty = (np.arange(gh, dtype=np.float32) + 0.5) / gh
    tx = (np.arange(gw, dtype=np.float32) + 0.5) / gw
    ys = y1[:, None] + ty[None, :] * (y2 - y1)[:, None] - 0.5
    xs = x1[:, None] + tx[None, :] * (x2 - x1)[:, None] - 0.5
    ys = np.clip(ys, 0.0, np.float32(h - 1.001))
    xs = np.clip(xs, 0.0, np.float32(w - 1.001))
    y0 = np.floor(ys).astype(np.int32)
    x0 = np.floor(xs).astype(np.int32)
    fy = (ys - y0)[:, :, None, None].astype(np.float32)
    fx = (xs - x0)[:, None, :, None].astype(np.float32)
    fi = np.asarray(frame_idx, np.int64)
    out = np.empty((len(boxes), gh, gw, 3), np.uint8)
    for f in np.unique(fi):
        sel = np.flatnonzero(fi == f)
        img = np.asarray(frames[int(f)])  # view when already ndarray
        yy0, xx0 = y0[sel][:, :, None], x0[sel][:, None, :]
        # gather uint8 neighbors first, cast only the gathered crops
        v00 = img[yy0, xx0].astype(np.float32)
        v01 = img[yy0, xx0 + 1].astype(np.float32)
        v10 = img[yy0 + 1, xx0].astype(np.float32)
        v11 = img[yy0 + 1, xx0 + 1].astype(np.float32)
        sfy, sfx = fy[sel], fx[sel]
        vals = (
            v00 * (1 - sfy) * (1 - sfx)
            + v01 * (1 - sfy) * sfx
            + v10 * sfy * (1 - sfx)
            + v11 * sfy * sfx
        )
        out[sel] = np.clip(np.rint(vals), 0, 255).astype(np.uint8)
    return out


@functools.partial(jax.jit, static_argnames=("iters",))
def crop_color_votes(crops_bgr: jax.Array, iters: int = 10) -> jax.Array:
    """Per-crop foreground jersey-color histogram (the device counterpart
    of Processor.detect_color, processor.py:467-503).

    crops_bgr : (B, gh, gw, 3) float32 or uint8 (uint8 crops upload 4x
    fewer bytes; the cast happens on device).
    Returns (B, 12) int32 counts per COLOR_NAMES entry (red2 merged into
    red, slot red2 zeroed).
    """
    crops_bgr = crops_bgr.astype(jnp.float32)
    b, gh, gw, _ = crops_bgr.shape
    rgb = crops_bgr[..., ::-1].reshape(b, gh * gw, 3)
    labels = kmeans2(rgb, jnp.ones((b, gh * gw), bool), iters=iters)
    lab2d = labels.reshape(b, gh, gw)
    corners = jnp.stack(
        [lab2d[:, 0, 0], lab2d[:, 0, -1], lab2d[:, -1, 0], lab2d[:, -1, -1]], axis=-1
    )
    # corner-majority cluster is background; a 2-2 tie resolves to cluster
    # 0, matching the reference's max(set(corners), key=count) semantics
    background = (corners.sum(-1) >= 3).astype(jnp.int32)
    fg = lab2d != background[:, None, None]

    hsv = bgr_to_hsv(crops_bgr)  # (B, gh, gw, 3)
    in_range = (
        (hsv[..., None, :] >= _LOWER[None, None, None]) & (hsv[..., None, :] <= _UPPER[None, None, None])
    ).all(-1)  # (B, gh, gw, 12)
    counts = (in_range & fg[..., None]).sum(axis=(1, 2)).astype(jnp.int32)
    red = counts[:, 0] + counts[:, 1]
    counts = counts.at[:, 0].set(red).at[:, 1].set(0)
    return counts
