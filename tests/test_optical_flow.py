"""LK optical flow vs cv2.calcOpticalFlowPyrLK on synthetic motion."""

import cv2
import jax.numpy as jnp
import numpy as np

from eagle_tpu.ops.optical_flow import (
    bgr_to_gray,
    build_pyramid,
    lk_flow,
    pyr_down,
    scharr_gradients,
)
from eagle_tpu.utils.synthetic import make_scene


def test_bgr_to_gray_matches_cv2(rng):
    img = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    ours = np.asarray(bgr_to_gray(jnp.asarray(img[None])))[0]
    ref = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY).astype(np.float32)
    assert np.abs(ours - ref).max() <= 1.0  # cv2 fixed-point rounding


def test_pyr_down_matches_cv2(rng):
    img = rng.integers(0, 256, size=(64, 96), dtype=np.uint8).astype(np.float32)
    ours = np.asarray(pyr_down(jnp.asarray(img[None])))[0]
    ref = cv2.pyrDown(img)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=0.6)


def test_scharr_matches_cv2(rng):
    img = rng.integers(0, 256, size=(32, 48), dtype=np.uint8).astype(np.float32)
    gx, gy = scharr_gradients(jnp.asarray(img[None]))
    ref_x = cv2.Scharr(img, cv2.CV_32F, 1, 0) / 32.0
    ref_y = cv2.Scharr(img, cv2.CV_32F, 0, 1) / 32.0
    np.testing.assert_allclose(np.asarray(gx)[0, 1:-1, 1:-1], ref_x[1:-1, 1:-1], atol=1e-3)
    np.testing.assert_allclose(np.asarray(gy)[0, 1:-1, 1:-1], ref_y[1:-1, 1:-1], atol=1e-3)


def _flow_pair(scene, t):
    prev = cv2.cvtColor(scene.frames[t], cv2.COLOR_BGR2GRAY)
    curr = cv2.cvtColor(scene.frames[t + 1], cv2.COLOR_BGR2GRAY)
    return prev, curr


def test_lk_flow_vs_cv2_on_panning_scene():
    scene = make_scene(num_frames=3, width=960, height=540, num_players=0, seed=9, pan_speed=3.0)
    prev, curr = _flow_pair(scene, 0)

    # track visible pitch-line intersections (strong corners)
    vis = scene.keypoints_image
    inb = (
        (vis[:, 0] > 30) & (vis[:, 0] < 930) & (vis[:, 1] > 30) & (vis[:, 1] < 510)
    )
    pts = vis[inb].astype(np.float32)

    cv_new, cv_status, _ = cv2.calcOpticalFlowPyrLK(
        prev,
        curr,
        pts.reshape(-1, 1, 2),
        None,
        winSize=(15, 15),
        maxLevel=2,
        criteria=(cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 10, 0.03),
    )
    cv_new = cv_new.reshape(-1, 2)
    cv_status = cv_status.ravel().astype(bool)

    ours, status = lk_flow(
        jnp.asarray(scene.frames[0]),
        jnp.asarray(scene.frames[1]),
        jnp.asarray(pts),
        jnp.ones(len(pts), bool),
    )
    ours, status = np.asarray(ours), np.asarray(status)

    both = cv_status & status
    assert both.sum() >= len(pts) * 0.7
    err = np.linalg.norm(ours[both] - cv_new[both], axis=1)
    # sub-pixel agreement with cv2 on well-conditioned corners
    assert np.median(err) < 0.3, np.median(err)
    assert (err < 1.0).mean() > 0.85
    # and the flow must match the true camera pan (3 px/frame in x)
    true_new = pts + np.array([3.0, 0.0])
    err_true = np.linalg.norm(ours[both] - true_new[both], axis=1)
    assert np.median(err_true) < 0.5


def test_lk_flow_rejects_flat_regions():
    """Points in featureless areas must be flagged (non-invertible G)."""
    prev = np.zeros((128, 128, 3), np.uint8)
    curr = np.zeros((128, 128, 3), np.uint8)
    pts = jnp.asarray(np.array([[64.0, 64.0]], np.float32))
    _, status = lk_flow(jnp.asarray(prev), jnp.asarray(curr), pts, jnp.ones(1, bool))
    assert not bool(status[0])


def test_window_mean_hue_matches_cv2(rng):
    """3x3 mean-hue windows (the flow occlusion filter) vs the reference's
    cv2-based computation, including border clipping."""
    from eagle_tpu.ops.color import window_mean_hue

    frame = rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)
    pts = np.array([[30.0, 20.0], [0.0, 0.0], [59.0, 39.0], [1.0, 38.0]], np.float32)
    ours = np.asarray(window_mean_hue(jnp.asarray(frame), jnp.asarray(pts)))

    for k, (x, y) in enumerate(pts.astype(int)):
        x = np.clip(x, 0, 59)
        y = np.clip(y, 0, 39)
        x0, x1 = max(0, x - 1), min(60, x + 2)
        y0, y1 = max(0, y - 1), min(40, y + 2)
        grid = cv2.cvtColor(frame[y0:y1, x0:x1], cv2.COLOR_BGR2HSV)
        ref = grid[:, :, 0].mean()
        # cv2 hue is quantized to integer degrees/2; ours is continuous
        assert abs(ours[k] - ref) < 1.0, (k, ours[k], ref)


def test_gray_roi_pair_bit_equals_color_composition(rng):
    """The round-5 extraction rewrite (full-frame gray, one slice of the
    stacked f32 pair) must produce bit-identical ROIs to the original
    gather-color-then-convert composition it replaced."""
    from eagle_tpu.ops.optical_flow import (
        _GRAY_W,
        _extract_color_rois,
        _extract_gray_roi_pair,
    )

    prev = rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
    curr = rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
    origins = np.stack(
        [rng.integers(0, 128 - 48, 9), rng.integers(0, 96 - 48, 9)], -1
    ).astype(np.int32)

    got_p, got_c = _extract_gray_roi_pair(
        jnp.asarray(prev), jnp.asarray(curr), jnp.asarray(origins), 48
    )
    w = jnp.asarray(_GRAY_W)
    want_p = jnp.round(
        _extract_color_rois(jnp.asarray(prev), jnp.asarray(origins), 48).astype(
            jnp.float32
        )
        @ w
    )
    want_c = jnp.round(
        _extract_color_rois(jnp.asarray(curr), jnp.asarray(origins), 48).astype(
            jnp.float32
        )
        @ w
    )
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(want_p))
    np.testing.assert_array_equal(np.asarray(got_c), np.asarray(want_c))
