"""Full-frame sparse corner features for camera-motion estimation.

The reference's tracker (boxmot 15.0.2 BoTSORT, constructed at reference
coordinate_model.py:66-72 and driven via ``tracker.update`` at :577)
estimates camera motion with its sparse-optical-flow GMC:
``cv2.goodFeaturesToTrack`` corners on the previous gray frame tracked
by pyramidal LK, then a robust partial-affine fit.  eagle-tpu's default
GMC fits the warp to the tracked pitch-keypoint flow instead (documented
deviation #5); this module provides the full-frame feature source that
makes the boxmot-style estimate available as ``TrackerConfig.gmc =
"features"`` — the two diverge exactly on keypoint-scarce frames (heavy
pans, close-ups), which is where full-frame GMC earns its keep.

TPU shape: everything is fixed-size and gather-free.

- Shi-Tomasi response (min eigenvalue of the 3x3-summed structure
  tensor) from central-difference gradients and an integral-image box
  sum — no 1-channel full-frame convolutions (a measured slow path,
  docs/architecture.md) and no data-dependent shapes.
- ``cv2.goodFeaturesToTrack``'s top-K + minDistance suppression is
  replaced by a fixed GRID argmax: one corner per grid cell (the cell
  pitch plays minDistance's spreading role), each valid when its
  response clears ``quality_level`` x the frame's peak response — the
  same acceptance rule goodFeaturesToTrack applies.  Cell argmax
  indices convert to coordinates arithmetically; no sort, no top_k.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eagle_tpu.ops.geometry import masked_median

#: default grid (rows, cols): 240 fixed corner slots per frame
GRID = (12, 20)


def _gray(bgr: jax.Array) -> jax.Array:
    """cv2 BGR2GRAY weights (the frame enters as uint8 BGR)."""
    x = bgr.astype(jnp.float32)
    return x[..., 0] * 0.114 + x[..., 1] * 0.587 + x[..., 2] * 0.299


def _box3(x: jax.Array) -> jax.Array:
    """3x3 box sum via shifted adds (cheaper than cumsum at k=3 and free
    of conv lowering); edges behave like zero padding."""
    z = jnp.zeros_like(x[:1])
    v = x + jnp.concatenate([z, x[:-1]], 0) + jnp.concatenate([x[1:], z], 0)
    zc = jnp.zeros_like(v[:, :1])
    return v + jnp.concatenate([zc, v[:, :-1]], 1) + jnp.concatenate([v[:, 1:], zc], 1)


def corner_response(gray: jax.Array) -> jax.Array:
    """Shi-Tomasi min-eigenvalue response map (H, W) of a gray frame.

    Matches the response *ranking* of cv2.goodFeaturesToTrack's
    MinEigenVal path (Sobel gradients there, central differences here:
    same extrema, slightly different smoothing); exact corner positions
    are pinned by tests against cv2 on synthetic scenes."""
    h, w = gray.shape
    zr = jnp.zeros((1, w), gray.dtype)
    zc = jnp.zeros((h, 1), gray.dtype)
    ix = (jnp.concatenate([gray[:, 1:], zc], 1) - jnp.concatenate([zc, gray[:, :-1]], 1)) * 0.5
    iy = (jnp.concatenate([gray[1:], zr], 0) - jnp.concatenate([zr, gray[:-1]], 0)) * 0.5
    sxx = _box3(ix * ix)
    syy = _box3(iy * iy)
    sxy = _box3(ix * iy)
    tr = sxx + syy
    det_gap = jnp.sqrt(jnp.maximum((sxx - syy) ** 2 + 4.0 * sxy * sxy, 0.0))
    return 0.5 * (tr - det_gap)


def grid_corners(
    bgr: jax.Array,
    grid: tuple[int, int] = GRID,
    quality_level: float = 0.01,
    margin: int = 16,
) -> tuple[jax.Array, jax.Array]:
    """Per-grid-cell best corner of a (H, W, 3) uint8 BGR frame.

    Returns ``(pts (K, 2) float32 xy, valid (K,) bool)`` with
    ``K = grid[0] * grid[1]`` fixed slots.  ``margin`` excludes a border
    band (LK needs its window + pyramid halo inside the frame; boxmot
    masks borders the same way).  A slot is valid when its cell's peak
    response reaches ``quality_level * max_response`` — the
    goodFeaturesToTrack acceptance rule."""
    h, w, _ = bgr.shape
    gr, gc = grid
    resp = corner_response(_gray(bgr))
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    inb = (
        (ys[:, None] >= margin)
        & (ys[:, None] < h - margin)
        & (xs[None, :] >= margin)
        & (xs[None, :] < w - margin)
    )
    resp = jnp.where(inb, resp, -1.0)

    # fixed cell geometry: trailing pixels beyond gr*ch / gc*cw fall in
    # the border margin for any sane grid and are already masked
    ch, cw = h // gr, w // gc
    cells = resp[: gr * ch, : gc * cw].reshape(gr, ch, gc, cw).transpose(0, 2, 1, 3)
    flat = cells.reshape(gr * gc, ch * cw)
    idx = jnp.argmax(flat, axis=-1)
    best = flat.max(axis=-1)  # == flat[argmax]; avoids a gather (hot-path rule)
    cy = idx // cw
    cx = idx % cw
    base_y = (jnp.arange(gr * gc) // gc) * ch
    base_x = (jnp.arange(gr * gc) % gc) * cw
    pts = jnp.stack([(base_x + cx).astype(jnp.float32), (base_y + cy).astype(jnp.float32)], -1)
    valid = best >= quality_level * jnp.maximum(resp.max(), 1e-12)
    return pts, valid


def fit_similarity_robust(
    src: jax.Array,
    dst: jax.Array,
    valid: jax.Array,
    rounds: int = 3,
    inlier_px: float = 3.0,
) -> tuple[jax.Array, jax.Array]:
    """Robust 4-DOF partial-affine (rotation + uniform scale +
    translation) from masked correspondences — the role of boxmot's
    ``cv2.estimateAffinePartial2D(..., RANSAC, 3.0)``.

    Deterministic annealed trimming instead of sampling: least-squares
    fit, then per round drop residuals above ``max(inlier_px, 2.5 x
    median residual)`` and refit — the shrinking median pulls the
    threshold down to the RANSAC-style ``inlier_px`` as the fit locks
    onto the dominant rigid motion (the pitch background), shedding the
    independently moving minority (players).  Agreement with cv2's
    estimator is pinned by tests on scripted warps with 30% outliers.

    Returns ``(warp (2, 3) float32, n_inliers ())`` where ``n_inliers``
    counts final residuals within ``inlier_px``.  Parameterization:
    ``x' = a*x - b*y + tx``, ``y' = b*x + a*y + ty``."""

    def fit(m):
        cnt = jnp.maximum(m.sum(), 1.0)
        mx = (src * m[:, None]).sum(0) / cnt
        md = (dst * m[:, None]).sum(0) / cnt
        s = (src - mx) * m[:, None]
        d = (dst - md) * m[:, None]
        # normal equations for (a, b): sum |s|^2 * a = s.d ; b from cross
        denom = jnp.maximum((s * s).sum(), 1e-9)
        a = (s * d).sum() / denom
        b = (s[:, 0] * d[:, 1] - s[:, 1] * d[:, 0]).sum() / denom
        R = jnp.asarray([[a, -b], [b, a]])
        t = md - R @ mx
        return jnp.concatenate([R, t[:, None]], 1)

    def residuals(warp):
        pred = src @ warp[:, :2].T + warp[:, 2]
        return jnp.linalg.norm(pred - dst, axis=-1)

    vm = valid.astype(jnp.float32)
    warp = fit(vm)
    for _ in range(rounds):
        r = residuals(warp)
        med = masked_median(r, valid, interpolate=True)
        keep = valid & (r <= jnp.maximum(inlier_px, 2.5 * med))
        m = keep.astype(jnp.float32)
        # refit only while enough survive (degenerate otherwise)
        warp = jnp.where(m.sum() >= 4, fit(m), warp)
    n_inl = (valid & (residuals(warp) <= inlier_px)).sum()
    return warp, n_inl


