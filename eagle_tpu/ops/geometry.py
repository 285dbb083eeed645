"""2D line geometry on device: total-least-squares line fitting, infinite
line intersection, and the vectorized pitch-keypoint synthesis step.

Replaces the reference's per-group cv2.fitLine / np.linalg.solve loops
(coordinate_model.py:96-186) with fixed-shape masked batch math: all line
families are fitted at once, all (horizontal x vertical) intersections are
computed at once, and the cap on synthesized points is applied by a static
priority order identical to the reference's dict-iteration order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from eagle_tpu import pitch


def masked_median(
    values: jax.Array, valid: jax.Array, interpolate: bool = False
) -> jax.Array:
    """Median of the valid entries of a 1-D array (0.0 when none):
    sort with invalids pushed to +inf, then select the middle element(s)
    by arithmetic one-hot (no gather — hot-path rule).

    ``interpolate=False`` picks the LOWER-middle element for even counts
    (the convention the keypoint-flow GMC translation estimate pins);
    ``interpolate=True`` averages the two middle elements (np.median
    semantics, used by the feature-GMC robust trim threshold)."""
    n = values.shape[0]
    s = jnp.sort(jnp.where(valid, values, jnp.inf))
    count = valid.sum()
    lo_idx = jnp.maximum(count - 1, 0) // 2
    hi_idx = (jnp.maximum(count - 1, 0) - lo_idx) if interpolate else lo_idx
    lo = jnp.where(jnp.arange(n) == lo_idx, s, 0.0).sum()
    hi = jnp.where(jnp.arange(n) == hi_idx, s, 0.0).sum()
    return jnp.where(count > 0, 0.5 * (lo + hi), 0.0)


def fit_lines(points: jax.Array, masks: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Fit total-least-squares lines to masked point groups.

    Equivalent to cv2.fitLine(DIST_L2) per group (reference
    coordinate_model.py:96-115): the direction is the principal axis of the
    point covariance, the anchor is the centroid.

    Parameters
    ----------
    points : (N, 2) candidate points
    masks : (G, N) bool group-membership (already ANDed with validity)

    Returns
    -------
    lines : (G, 4) as (vx, vy, x0, y0)
    line_valid : (G,) bool -- >= 2 member points and non-degenerate
    """
    m = masks.astype(points.dtype)  # (G, N)
    counts = m.sum(axis=-1)  # (G,)
    denom = jnp.maximum(counts, 1.0)[:, None]
    centroid = (m[..., None] * points[None]).sum(axis=1) / denom  # (G, 2)
    d = (points[None] - centroid[:, None]) * m[..., None]  # (G, N, 2)
    # 2x2 covariance entries per group
    cxx = (d[..., 0] * d[..., 0]).sum(axis=-1)
    cyy = (d[..., 1] * d[..., 1]).sum(axis=-1)
    cxy = (d[..., 0] * d[..., 1]).sum(axis=-1)
    # principal eigenvector angle of [[cxx, cxy], [cxy, cyy]]
    theta = 0.5 * jnp.arctan2(2.0 * cxy, cxx - cyy)
    vx, vy = jnp.cos(theta), jnp.sin(theta)
    lines = jnp.stack([vx, vy, centroid[:, 0], centroid[:, 1]], axis=-1)
    # degenerate when all points coincide (zero covariance)
    spread = cxx + cyy
    line_valid = (counts >= 2) & (spread > 1e-9)
    return lines, line_valid


def intersect_lines(l1: jax.Array, l2: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Intersect two infinite lines (vx, vy, x0, y0); broadcasts.

    Returns (point (..., 2), valid (...,)) -- invalid when near-parallel
    (reference coordinate_model.py:117-138).
    """
    vx1, vy1, x1, y1 = l1[..., 0], l1[..., 1], l1[..., 2], l1[..., 3]
    vx2, vy2, x2, y2 = l2[..., 0], l2[..., 1], l2[..., 2], l2[..., 3]
    det = vx1 * (-vy2) - vy1 * (-vx2)
    ok = jnp.abs(det) >= 1e-8
    safe_det = jnp.where(ok, det, 1.0)
    # solve [vx1 -vx2; vy1 -vy2] [t, s]^T = [x2-x1, y2-y1]^T for t
    t = ((x2 - x1) * (-vy2) - (y2 - y1) * (-vx2)) / safe_det
    px = x1 + t * vx1
    py = y1 + t * vy1
    return jnp.stack([px, py], axis=-1), ok


# Static views of the pitch line families.  Kept as HOST numpy constants:
# they get baked into the jitted programs at trace time, and a module-level
# jnp.asarray would device_put at import -- initializing the backend before
# the caller can pick a platform (and hanging `import eagle_tpu` outright
# when the TPU is unreachable).
_X_MASKS = np.asarray(pitch.X_LINE_MASKS)
_Y_MASKS = np.asarray(pitch.Y_LINE_MASKS)
_GRID_IDS = np.asarray(pitch.LINE_GRID_IDS)
_ON_PLANE = np.asarray(pitch.ON_PLANE_MASK)
# priority of each grid cell in the reference's iteration order
# (outer loop = y-line insertion order, inner = x-line insertion order)
_CELL_PRIORITY = (
    np.asarray(pitch.Y_LINE_ORDER)[None, :] * len(pitch.X_LINE_ORDER)
    + np.asarray(pitch.X_LINE_ORDER)[:, None]
).astype(np.int32)


def synthesize_keypoints(
    kp_xy: jax.Array,
    kp_valid: jax.Array,
    min_points_per_line: int = 2,
    max_new_points: int = 30,
) -> tuple[jax.Array, jax.Array]:
    """Augment detected keypoints with line-intersection synthesis.

    Fits one image-space line per world-vertical (shared X) and
    world-horizontal (shared Y) pitch-line family using the detected
    on-plane keypoints, intersects every (horizontal, vertical) pair that
    corresponds to an actual landmark, and fills in landmarks that were not
    detected -- capped at ``max_new_points``, in the reference's iteration
    order (coordinate_model.py:140-186).

    Parameters
    ----------
    kp_xy : (57, 2) keypoint image coordinates
    kp_valid : (57,) bool detection mask

    Returns
    -------
    new_xy : (57, 2) with synthesized entries filled (rounded to ints,
        matching the reference's int() cast at :177-178)
    new_valid : (57,) bool
    """
    usable = kp_valid & _ON_PLANE
    x_lines, x_ok = fit_lines(kp_xy, _X_MASKS & usable[None, :])
    y_lines, y_ok = fit_lines(kp_xy, _Y_MASKS & usable[None, :])
    if min_points_per_line > 2:
        x_ok = x_ok & ((_X_MASKS & usable[None, :]).sum(-1) >= min_points_per_line)
        y_ok = y_ok & ((_Y_MASKS & usable[None, :]).sum(-1) >= min_points_per_line)

    nx, ny = _GRID_IDS.shape
    pts, par_ok = intersect_lines(y_lines[None, :, :], x_lines[:, None, :])  # (nx, ny, 2)
    ids = _GRID_IDS  # (nx, ny)
    cell_ok = (
        (ids >= 0)
        & x_ok[:, None]
        & y_ok[None, :]
        & par_ok
        & ~kp_valid[jnp.clip(ids, 0, None)]
    )

    # cap at max_new_points using the reference's iteration priority
    prio = jnp.where(cell_ok, _CELL_PRIORITY, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(prio.reshape(-1))  # ascending: first = added first
    rank = jnp.zeros((nx * ny,), jnp.int32).at[order].set(jnp.arange(nx * ny, dtype=jnp.int32))
    keep = cell_ok.reshape(-1) & (rank < max_new_points)

    flat_ids = ids.reshape(-1)
    flat_pts = jnp.round(pts.reshape(-1, 2))
    safe_ids = jnp.where(keep, flat_ids, 57)  # scatter no-op slot
    new_xy = jnp.zeros((58, 2), kp_xy.dtype).at[safe_ids].set(flat_pts, mode="drop")[:57]
    new_valid_mask = jnp.zeros((58,), bool).at[safe_ids].set(keep, mode="drop")[:57]

    out_xy = jnp.where(new_valid_mask[:, None], new_xy, kp_xy)
    out_valid = kp_valid | new_valid_mask
    return out_xy, out_valid
