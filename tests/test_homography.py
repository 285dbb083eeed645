"""Homography stack vs OpenCV oracles on synthetic correspondences."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eagle_tpu.ops.homography import (
    dlt_homography,
    perspective_transform,
    ransac_homography,
    reprojection_errors,
)


def _random_h(rng):
    """A well-conditioned random projective map (image -> world style)."""
    base = np.array([[0.08, 0.0, -5.0], [0.0, -0.09, 60.0], [0.0, 0.0, 1.0]])
    base[:2, :2] += rng.normal(scale=0.01, size=(2, 2))
    base[2, :2] = rng.normal(scale=1e-4, size=2)
    return base


def _correspondences(rng, n=40, noise=0.0, outliers=0):
    H = _random_h(rng)
    src = rng.uniform([0, 0], [1280, 720], size=(n, 2))
    dst = cv2.perspectiveTransform(src[None].astype(np.float64), H)[0]
    dst = dst + rng.normal(scale=noise, size=dst.shape)
    if outliers:
        idx = rng.choice(n, size=outliers, replace=False)
        dst[idx] += rng.uniform(20, 60, size=(outliers, 2)) * rng.choice([-1, 1], (outliers, 2))
    return H, src, dst


def test_perspective_transform_matches_cv2(rng):
    H, src, _ = _correspondences(rng)
    ours = np.asarray(perspective_transform(jnp.asarray(H), jnp.asarray(src)))
    cv = cv2.perspectiveTransform(src[None].astype(np.float64), H)[0]
    np.testing.assert_allclose(ours, cv, rtol=1e-5, atol=1e-5)


def test_dlt_exact_recovery(rng):
    H, src, dst = _correspondences(rng, n=12)
    w = jnp.ones(12)
    Hhat = np.asarray(dlt_homography(jnp.asarray(src), jnp.asarray(dst), w))
    np.testing.assert_allclose(Hhat / Hhat[2, 2], H / H[2, 2], rtol=5e-4, atol=5e-4)


def test_dlt_respects_weights(rng):
    H, src, dst = _correspondences(rng, n=20)
    # corrupt the last 8 points but zero their weights
    dst2 = dst.copy()
    dst2[12:] += 100.0
    w = jnp.asarray(np.r_[np.ones(12), np.zeros(8)])
    Hhat = np.asarray(dlt_homography(jnp.asarray(src), jnp.asarray(dst2), w))
    np.testing.assert_allclose(Hhat / Hhat[2, 2], H / H[2, 2], rtol=5e-4, atol=5e-4)


def test_ransac_clean(rng):
    H, src, dst = _correspondences(rng, n=30)
    valid = jnp.ones(30, bool)
    Hhat, inl, ok = ransac_homography(
        jnp.asarray(src), jnp.asarray(dst), valid, jax.random.key(0), iters=128
    )
    assert bool(ok)
    assert int(inl.sum()) == 30
    err = np.asarray(reprojection_errors(Hhat, jnp.asarray(src), jnp.asarray(dst)))
    assert err.max() < 1e-2


@pytest.mark.parametrize("outliers", [5, 10])
def test_ransac_rejects_outliers(rng, outliers):
    H, src, dst = _correspondences(rng, n=30, noise=0.05, outliers=outliers)
    valid = jnp.ones(30, bool)
    Hhat, inl, ok = ransac_homography(
        jnp.asarray(src), jnp.asarray(dst), valid, jax.random.key(1), iters=256
    )
    assert bool(ok)
    # compare against cv2's RANSAC on the same data
    Hcv, mask_cv = cv2.findHomography(
        src.astype(np.float32), dst.astype(np.float32), cv2.RANSAC, 5.0
    )
    pts = np.asarray(
        perspective_transform(Hhat, jnp.asarray(src[np.asarray(inl)])), dtype=np.float64
    )
    cvp = cv2.perspectiveTransform(src[np.asarray(inl)][None], Hcv)[0]
    np.testing.assert_allclose(pts, cvp, atol=0.5)
    # all true inliers kept, all planted outliers rejected
    assert int(inl.sum()) >= 30 - outliers - 2


def test_ransac_masked_and_degenerate(rng):
    H, src, dst = _correspondences(rng, n=10)
    valid = jnp.asarray(np.r_[np.ones(3, bool), np.zeros(7, bool)])  # only 3 points
    _, inl, ok = ransac_homography(
        jnp.asarray(src), jnp.asarray(dst), valid, jax.random.key(2), iters=64
    )
    assert not bool(ok)
    assert int(inl.sum()) == 0


def test_ransac_respects_mask(rng):
    H, src, dst = _correspondences(rng, n=30)
    dst2 = dst.copy()
    dst2[20:] += 500.0  # garbage, but masked out
    valid = jnp.asarray(np.r_[np.ones(20, bool), np.zeros(10, bool)])
    Hhat, inl, ok = ransac_homography(
        jnp.asarray(src), jnp.asarray(dst2), valid, jax.random.key(3), iters=128
    )
    assert bool(ok)
    assert not bool(inl[20:].any())
    err = np.asarray(reprojection_errors(Hhat, jnp.asarray(src[:20]), jnp.asarray(dst[:20])))
    assert err.max() < 1e-2
