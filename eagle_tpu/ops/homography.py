"""Plane homography estimation on device: normalized DLT, fixed-iteration
vectorized RANSAC, Gauss-Newton refinement, and perspective transforms.

Replaces the reference's cv2.findHomography(RANSAC 5.0 -> RHO -> LMEDS)
chain and cv2.perspectiveTransform (coordinate_model.py:354-357, :383,
:400-403) with a TPU-idiomatic design: every hypothesis is evaluated in
parallel on fixed shapes (no data-dependent loop counts), the minimal-set
solve is a batched 8x9 nullspace problem, and degeneracy is reported as a
validity flag instead of an exception.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from eagle_tpu.config import HomographyConfig


def perspective_transform(H: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply a 3x3 homography to points of shape (..., 2).

    Written elementwise (VPU) rather than as a matmul: a tiny Nx3 @ 3x3
    product would route through the MXU at bf16 input precision on TPU,
    costing ~4 decimal digits on pixel-scale coordinates.
    """
    x, y = pts[..., 0], pts[..., 1]
    u = H[0, 0] * x + H[0, 1] * y + H[0, 2]
    v = H[1, 0] * x + H[1, 1] * y + H[1, 2]
    w = H[2, 0] * x + H[2, 1] * y + H[2, 2]
    return jnp.stack([u / w, v / w], axis=-1)


def _normalization(pts: jax.Array, w: jax.Array) -> jax.Array:
    """Hartley normalization transform for weighted points (N, 2) ->
    translate weighted centroid to origin, scale mean distance to sqrt(2)."""
    wsum = jnp.maximum(w.sum(), 1e-9)
    centroid = (pts * w[:, None]).sum(0) / wsum
    d = jnp.linalg.norm(pts - centroid, axis=-1)
    mean_d = jnp.maximum((d * w).sum() / wsum, 1e-9)
    s = jnp.sqrt(2.0) / mean_d
    return jnp.array(
        [[s, 0.0, -s * centroid[0]], [0.0, s, -s * centroid[1]], [0.0, 0.0, 1.0]],
        dtype=pts.dtype,
    )


def dlt_homography(src: jax.Array, dst: jax.Array, weights: jax.Array) -> jax.Array:
    """Weighted normalized DLT.  src/dst: (N, 2); weights: (N,) in [0, 1].

    Returns a 3x3 H mapping src -> dst (unnormalized scale, H[2,2] ~ 1).
    Degenerate inputs produce a garbage-but-finite matrix; callers gate on
    their own validity logic.
    """
    src = src.astype(jnp.float64) if jax.config.read("jax_enable_x64") else src.astype(jnp.float32)
    dst = dst.astype(src.dtype)
    w = weights.astype(src.dtype)

    Ts = _normalization(src, w)
    Td = _normalization(dst, w)
    s = perspective_transform(Ts, src)
    d = perspective_transform(Td, dst)

    x, y = s[:, 0], s[:, 1]
    u, v = d[:, 0], d[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    # two rows per correspondence of the standard DLT system A h = 0
    rows_u = jnp.stack([-x, -y, -one, zero, zero, zero, u * x, u * y, u], axis=-1)
    rows_v = jnp.stack([zero, zero, zero, -x, -y, -one, v * x, v * y, v], axis=-1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)  # (2N, 9)
    ww = jnp.concatenate([w, w], axis=0)
    # full f32 precision: this normal-matrix product decides the nullspace
    ATA = jnp.matmul((A * ww[:, None]).T, A, precision=jax.lax.Precision.HIGHEST)

    # nullspace via symmetric eigendecomposition (batched-friendly on TPU)
    _, vecs = jnp.linalg.eigh(ATA)
    h = vecs[:, 0]
    Hn = h.reshape(3, 3)
    H = jnp.linalg.solve(Td, Hn @ Ts)
    # fix overall scale so H[2,2] == 1 when possible
    scale = jnp.where(jnp.abs(H[2, 2]) > 1e-12, H[2, 2], 1.0)
    return H / scale


def reprojection_errors(H: jax.Array, src: jax.Array, dst: jax.Array) -> jax.Array:
    """Forward transfer error ||dst - H src|| per point, (N,)."""
    proj = perspective_transform(H, src)
    return jnp.linalg.norm(proj - dst, axis=-1)


def _gauss_newton_refine(
    H: jax.Array, src: jax.Array, dst: jax.Array, w: jax.Array, steps: int
) -> jax.Array:
    """Refine H by damped Gauss-Newton on the 8 free parameters (h22 fixed
    at 1), minimizing the weighted forward transfer error -- the analogue of
    cv2's post-RANSAC Levenberg-Marquardt polish."""

    def residual(h8):
        Hm = jnp.concatenate([h8, jnp.ones((1,), h8.dtype)]).reshape(3, 3)
        proj = perspective_transform(Hm, src)
        return ((proj - dst) * w[:, None]).reshape(-1)

    def step(h8, _):
        J = jax.jacfwd(residual)(h8)
        r = residual(h8)
        JTJ = jnp.matmul(J.T, J, precision=jax.lax.Precision.HIGHEST) + 1e-6 * jnp.eye(
            8, dtype=h8.dtype
        )
        delta = jnp.linalg.solve(JTJ, J.T @ r)
        h_new = h8 - delta
        # accept only improving steps (cheap trust region)
        better = jnp.sum(residual(h_new) ** 2) < jnp.sum(r**2)
        return jnp.where(better, h_new, h8), None

    scale = jnp.where(jnp.abs(H[2, 2]) > 1e-12, H[2, 2], 1.0)
    h8 = (H / scale).reshape(-1)[:8]
    h8, _ = jax.lax.scan(step, h8, None, length=steps)
    return jnp.concatenate([h8, jnp.ones((1,), h8.dtype)]).reshape(3, 3)


def _sample_minimal_sets(key: jax.Array, valid: jax.Array, iters: int) -> jax.Array:
    """Sample ``iters`` sets of 4 distinct indices among valid points using
    the Gumbel top-k trick (fixed-shape, no rejection loops).  (iters, 4)."""
    n = valid.shape[0]
    g = jax.random.gumbel(key, (iters, n))
    scores = g + jnp.where(valid, 0.0, -jnp.inf)
    _, idx = jax.lax.top_k(scores, 4)
    return idx


@functools.partial(jax.jit, static_argnames=("iters", "refine_steps", "lmeds_fallback"))
def ransac_homography(
    src: jax.Array,
    dst: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    iters: int = 512,
    threshold: float = 5.0,
    refine_steps: int = 4,
    lmeds_fallback: bool = True,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Vectorized RANSAC homography for masked correspondences.

    Parameters
    ----------
    src, dst : (N, 2) point arrays (image and world coordinates)
    valid : (N,) bool mask of usable correspondences
    key : PRNG key (fold in the frame index for deterministic pipelines)
    iters : hypothesis count, all evaluated in parallel
    threshold : inlier forward-transfer-error threshold (reference: 5.0,
        coordinate_model.py:355)
    lmeds_fallback : when RANSAC yields < 4 inliers at ``threshold``,
        select the hypothesis with the least MEDIAN squared error instead
        and derive inliers from the robust scale estimate
        (2.5 * 1.4826 * (1 + 5/(n-4)) * sqrt(med) -- the classic LMedS
        scale) -- the role of the reference's
        cv2.findHomography(..., LMEDS) fallback
        (coordinate_model.py:354-357), computed branchlessly from the SAME
        hypothesis set (the per-hypothesis errors are already in hand, so
        the fallback costs one masked median, no second solve pass).

    Returns
    -------
    H : (3, 3) refined homography (src -> dst)
    inliers : (N,) bool inlier mask (False everywhere when not ok)
    ok : () bool validity flag (>= 4 valid points and >= 4 inliers)
    """
    n = src.shape[0]
    nvalid = valid.sum()

    sets = _sample_minimal_sets(key, valid, iters)  # (iters, 4)
    src4 = src[sets]  # (iters, 4, 2)
    dst4 = dst[sets]
    w4 = jnp.ones((iters, 4), src.dtype)

    Hs = jax.vmap(dlt_homography)(src4, dst4, w4)  # (iters, 3, 3)
    # no degenerate-subset gate on purpose: cv2.findHomography ACCEPTS
    # exactly-collinear correspondences (verified: RANSAC/RHO/LMEDS all
    # return a degenerate H with a full inlier mask), so parity means
    # accepting them too; fully-duplicate points fail via non-finite errors
    errs = jax.vmap(lambda H: reprojection_errors(H, src, dst))(Hs)  # (iters, N)
    finite = jnp.isfinite(errs)
    inl = (errs < threshold) & valid[None, :] & finite  # (iters, N)
    counts = inl.sum(axis=-1)
    # tie-break on total truncated error (MSAC-style score)
    trunc = jnp.where(inl, errs, threshold).sum(axis=-1)
    score = counts.astype(src.dtype) * 1e6 - trunc
    best = jnp.argmax(score)

    best_inl = inl[best]
    ok_ransac = (nvalid >= 4) & (counts[best] >= 4)
    chosen_inl = best_inl

    if lmeds_fallback:
        # masked median of squared errors per hypothesis: sort with
        # invalid/non-finite pushed to +inf, read the nvalid//2-th element
        sq = jnp.where(valid[None, :] & finite, errs * errs, jnp.inf)
        sq_sorted = jnp.sort(sq, axis=-1)  # (iters, N)
        med_idx = jnp.clip(nvalid // 2, 0, n - 1)
        # scalar dynamic index per row: dynamic_slice, not a gather (hot path)
        med = jax.lax.dynamic_slice_in_dim(sq_sorted, med_idx, 1, axis=1)[:, 0]
        best_lm = jnp.argmin(jnp.where(jnp.isfinite(med), med, jnp.inf))
        med_best = med[best_lm]
        nv = jnp.maximum(nvalid.astype(src.dtype), 5.0)
        sigma = 2.5 * 1.4826 * (1.0 + 5.0 / (nv - 4.0)) * jnp.sqrt(med_best)
        sigma = jnp.maximum(sigma, 1e-3)
        lm_inl = (errs[best_lm] <= sigma) & valid & finite[best_lm]
        ok_lmeds = (nvalid >= 4) & (lm_inl.sum() >= 4) & jnp.isfinite(med_best)
        use_lm = ~ok_ransac & ok_lmeds
        chosen_inl = jnp.where(use_lm, lm_inl, best_inl)
        ok = ok_ransac | ok_lmeds
    else:
        ok = ok_ransac

    w = chosen_inl.astype(src.dtype)
    H = dlt_homography(src, dst, w)
    H = _gauss_newton_refine(H, src, dst, w, refine_steps)
    # final inlier set under the refined model (threshold-based, like the
    # reference's downstream keypoint filtering regardless of method)
    final_err = reprojection_errors(H, src, dst)
    final_inl = (final_err < threshold) & valid & jnp.isfinite(final_err)
    # the LMEDS branch keeps its robust-scale inliers for the mask (its
    # accepted frames by construction have few sub-threshold points)
    if lmeds_fallback:
        final_inl = jnp.where(ok_ransac, final_inl, chosen_inl & jnp.isfinite(final_err))
    ok = ok & (final_inl.sum() >= 4) & jnp.isfinite(H).all()
    H = jnp.where(ok, H, jnp.eye(3, dtype=src.dtype))
    return H, final_inl & ok, ok


def ransac_homography_cfg(src, dst, valid, key, cfg: HomographyConfig):
    return ransac_homography(
        src,
        dst,
        valid,
        key,
        iters=cfg.ransac_iters,
        threshold=cfg.reproj_threshold,
        refine_steps=cfg.refine_steps,
        lmeds_fallback=cfg.lmeds_fallback,
    )
