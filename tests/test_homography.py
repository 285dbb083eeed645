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


def test_collinear_points_accepted_like_cv2(rng):
    """Keypoints all on one pitch line: cv2.findHomography ACCEPTS this
    (every method returns a degenerate line->line H with a full inlier
    mask -- verified against opencv 4.x), so parity means we accept too
    and report all points as inliers; the resulting projections are only
    meaningful on the line, exactly as in the reference."""
    t = rng.uniform(0, 1, size=12)
    src = np.stack([100 + 1000 * t, 200 + 300 * t], -1)  # one image line
    dst = np.stack([5 + 90 * t, 10 + 40 * t], -1)
    valid = jnp.ones(12, bool)
    Hcv, mask_cv = cv2.findHomography(
        src.astype(np.float32), dst.astype(np.float32), cv2.RANSAC, 5.0
    )
    assert Hcv is not None and mask_cv.sum() == 12
    _, inl, ok = ransac_homography(
        jnp.asarray(src.astype(np.float32)), jnp.asarray(dst.astype(np.float32)),
        valid, jax.random.key(4), iters=256,
    )
    assert bool(ok)
    assert int(inl.sum()) == 12


def test_duplicate_points_rejected_like_cv2(rng):
    """All-identical correspondences: cv2 returns None; the vectorized
    solver must fail (non-finite minimal-set errors -> zero inliers)."""
    src = np.tile(rng.uniform(0, 100, size=(1, 2)), (12, 1)).astype(np.float32)
    dst = np.tile(rng.uniform(0, 50, size=(1, 2)), (12, 1)).astype(np.float32)
    out = cv2.findHomography(src, dst, cv2.RANSAC, 5.0)
    assert out is None or out[0] is None
    _, inl, ok = ransac_homography(
        jnp.asarray(src), jnp.asarray(dst), jnp.ones(12, bool), jax.random.key(7), iters=128
    )
    assert not bool(ok)
    assert int(inl.sum()) == 0


def test_lmeds_fallback_selects_by_median_when_count_gate_fails(rng):
    """Unit test of the least-median selection path (the role of the
    reference's LMEDS fallback, coordinate_model.py:354-357): with a
    zero inlier threshold the count gate can never pass, but the median
    scorer still recovers the true model from clean correspondences."""
    H, src, dst = _correspondences(rng, n=24)
    valid = jnp.ones(24, bool)
    _, _, ok_plain = ransac_homography(
        jnp.asarray(src), jnp.asarray(dst), valid, jax.random.key(6),
        iters=256, threshold=0.0, lmeds_fallback=False,
    )
    Hhat, inl, ok = ransac_homography(
        jnp.asarray(src), jnp.asarray(dst), valid, jax.random.key(6),
        iters=256, threshold=0.0, lmeds_fallback=True,
    )
    assert not bool(ok_plain)
    assert bool(ok)
    assert int(inl.sum()) >= 4
    err = np.asarray(reprojection_errors(Hhat, jnp.asarray(src), jnp.asarray(dst)))
    assert np.median(err) < 0.1


def test_lmeds_fallback_leaves_ransac_success_untouched(rng):
    """When RANSAC succeeds, the fallback-enabled path must be bit-exact
    with the fallback-free path (parity guard for every existing stream)."""
    H, src, dst = _correspondences(rng, n=30, noise=0.05, outliers=6)
    valid = jnp.ones(30, bool)
    a = ransac_homography(
        jnp.asarray(src), jnp.asarray(dst), valid, jax.random.key(5),
        iters=256, lmeds_fallback=False,
    )
    b = ransac_homography(
        jnp.asarray(src), jnp.asarray(dst), valid, jax.random.key(5),
        iters=256, lmeds_fallback=True,
    )
    assert bool(a[2]) and bool(b[2])
    # two distinct compiled programs: XLA fusion reorders float ops at the
    # last ulp, so "untouched" means ulp-level-equal H + identical inliers
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), rtol=2e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


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
