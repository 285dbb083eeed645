"""Full-frame sparse-feature GMC (TrackerConfig.gmc="features"):
corner quality vs cv2, robust-fit parity with cv2.estimateAffinePartial2D,
and end-to-end warp recovery on scripted camera motion (VERDICT r4 #5 —
deviation #5 becomes opt-in)."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from eagle_tpu.ops.corners import corner_response, fit_similarity_robust, grid_corners
from eagle_tpu.utils.synthetic import make_scene


def _frame(seed=3, w=640, h=360):
    scene = make_scene(num_frames=1, width=w, height=h, num_players=8, seed=seed)
    return scene.frames[0]


def test_grid_corners_are_cv2_quality_corners():
    """Every valid grid corner must be a genuine corner by cv2's own
    measure: its cornerMinEigenVal response (3x3 block, the
    goodFeaturesToTrack default) clears the same quality_level
    acceptance threshold cv2 applies."""
    frame = _frame()
    pts, valid = grid_corners(jnp.asarray(frame), quality_level=0.01)
    pts, valid = np.asarray(pts), np.asarray(valid)
    assert valid.sum() >= 20, "a busy broadcast frame must yield many corners"

    gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY).astype(np.float32)
    resp = cv2.cornerMinEigenVal(gray, blockSize=3)
    # cv2's own acceptance bar, with slack for the gradient-kernel
    # difference (Sobel there, central differences here)
    bar = 0.002 * resp.max()
    for x, y in pts[valid]:
        neigh = resp[max(0, int(y) - 1) : int(y) + 2, max(0, int(x) - 1) : int(x) + 2]
        assert neigh.max() >= bar, (x, y, neigh.max(), bar)


def test_corner_response_peaks_match_cv2_ranking():
    """The strongest response cell peaks land on cv2's strongest corners:
    each of our top-20 corners is within 2 px of some
    goodFeaturesToTrack corner."""
    frame = _frame(seed=5)
    pts, valid = grid_corners(jnp.asarray(frame), quality_level=0.01)
    pts, valid = np.asarray(pts), np.asarray(valid)
    resp = np.asarray(corner_response(jnp.asarray(
        cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY).astype(np.float32))))
    strengths = resp[pts[:, 1].astype(int), pts[:, 0].astype(int)]
    order = np.argsort(-np.where(valid, strengths, -np.inf))[:20]

    gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
    cv_pts = cv2.goodFeaturesToTrack(gray, maxCorners=1000, qualityLevel=0.005, minDistance=1)
    cv_pts = cv_pts.reshape(-1, 2)
    for i in order:
        if not valid[i]:
            continue
        d = np.linalg.norm(cv_pts - pts[i], axis=1).min()
        assert d <= 2.0, (pts[i], d)


@pytest.mark.parametrize("angle,scale,tx,ty", [(0.0, 1.0, 3.0, -2.0), (1.5, 1.01, -4.0, 1.0)])
def test_fit_similarity_matches_cv2_estimate_affine_partial(angle, scale, tx, ty):
    """On correspondences with a 30% outlier minority (the player-motion
    case), the trimmed LS fit must agree with boxmot's estimator
    (cv2.estimateAffinePartial2D RANSAC, 3px) on the scripted warp."""
    rng = np.random.default_rng(11)
    src = rng.uniform(40, 300, (120, 2)).astype(np.float32)
    a = np.deg2rad(angle)
    R = scale * np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]], np.float32)
    dst = src @ R.T + np.array([tx, ty], np.float32)
    n_out = 36
    dst[:n_out] += rng.uniform(6, 25, (n_out, 2)).astype(np.float32)  # "players"
    valid = np.ones(len(src), bool)

    warp, n_inl = fit_similarity_robust(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(valid))
    warp = np.asarray(warp)
    cv_warp, _ = cv2.estimateAffinePartial2D(src, dst, method=cv2.RANSAC, ransacReprojThreshold=3.0)

    assert float(n_inl) >= len(src) - n_out - 5
    np.testing.assert_allclose(warp[:, :2], R, atol=2e-3)
    np.testing.assert_allclose(warp[:, 2], [tx, ty], atol=0.5)
    np.testing.assert_allclose(warp, cv_warp, atol=0.5)


def test_features_gmc_recovers_scripted_pan():
    """Two frames of a panning synthetic scene: grid corners + LK + the
    robust fit must recover the global translation, matching the full
    cv2 chain (goodFeaturesToTrack -> calcOpticalFlowPyrLK ->
    estimateAffinePartial2D — boxmot's sof.py) on the same frames."""
    from eagle_tpu.ops.optical_flow import lk_flow

    scene = make_scene(num_frames=2, width=640, height=360, num_players=6, seed=9, pan_speed=3.0)
    prev, curr = scene.frames[0], scene.frames[1]

    pts, pvalid = grid_corners(jnp.asarray(prev))
    new_pts, status = lk_flow(jnp.asarray(prev), jnp.asarray(curr), pts, pvalid)
    warp, n_inl = fit_similarity_robust(pts, new_pts, pvalid & status)
    warp = np.asarray(warp)
    assert float(n_inl) >= 12

    gray0 = cv2.cvtColor(prev, cv2.COLOR_BGR2GRAY)
    gray1 = cv2.cvtColor(curr, cv2.COLOR_BGR2GRAY)
    cv_pts = cv2.goodFeaturesToTrack(gray0, maxCorners=500, qualityLevel=0.01, minDistance=8)
    cv_new, cv_st, _ = cv2.calcOpticalFlowPyrLK(gray0, gray1, cv_pts, None)
    ok = cv_st.reshape(-1) == 1
    cv_warp, _ = cv2.estimateAffinePartial2D(
        cv_pts.reshape(-1, 2)[ok], cv_new.reshape(-1, 2)[ok], method=cv2.RANSAC,
        ransacReprojThreshold=3.0,
    )
    np.testing.assert_allclose(warp[:, :2], cv_warp[:, :2], atol=5e-3)
    np.testing.assert_allclose(warp[:, 2], cv_warp[:, 2], atol=0.5)


def test_pipeline_runs_with_features_gmc():
    """The scan path compiles and runs with gmc='features' and differs
    from gmc='affine' only through the warp (same shapes, finite
    outputs, same detections tracked)."""
    import sys

    sys.path.insert(0, "tests")
    from oracles import oracle_detector_fn, oracle_keypoint_fn

    from eagle_tpu.config import DEFAULT_CONFIG
    from eagle_tpu.pipeline.coordinate_model import CoordinateModel

    scene = make_scene(num_frames=8, width=640, height=360, num_players=4, fps=8, seed=13, pan_speed=2.0)
    coords = {}
    for mode in ("affine", "features"):
        import dataclasses

        cfg = DEFAULT_CONFIG.replace(
            tracker=dataclasses.replace(DEFAULT_CONFIG.tracker, gmc=mode)
        )
        m = CoordinateModel(
            config=cfg,
            keypoint_fn=oracle_keypoint_fn(scene),
            detector_fn=oracle_detector_fn(scene),
            verbose_init=False,
        )
        coords[mode] = m.get_coordinates(scene.frames, 8, num_keypoint_detection=2, verbose=False)
    for mode, res in coords.items():
        assert len(res) == 8
        n_players = np.mean([len(res[t]["Coordinates"].get("Player", {})) for t in range(8)])
        assert n_players >= 3, (mode, n_players)
