"""Line-fit / intersection / keypoint-synthesis ops vs cv2 and the
reference algorithm re-run in pure Python."""

import cv2
import jax.numpy as jnp
import numpy as np

from eagle_tpu import pitch
from eagle_tpu.ops.geometry import fit_lines, intersect_lines, synthesize_keypoints
from eagle_tpu.utils.synthetic import default_camera_homography, project


def test_fit_lines_matches_cv2(rng):
    pts = rng.uniform(0, 100, size=(12, 2))
    # put the points roughly on a line
    t = np.linspace(0, 1, 12)
    pts = np.stack([10 + 80 * t, 5 + 40 * t], -1) + rng.normal(scale=0.5, size=(12, 2))
    masks = jnp.ones((1, 12), bool)
    lines, ok = fit_lines(jnp.asarray(pts), masks)
    assert bool(ok[0])
    vx, vy, x0, y0 = np.asarray(lines[0])
    cvx, cvy, cx0, cy0 = cv2.fitLine(pts.astype(np.float32), cv2.DIST_L2, 0, 0.01, 0.01).ravel()
    # directions may differ by sign
    dot = abs(vx * cvx + vy * cvy)
    assert dot > 0.99999
    # cv2 anchor is the centroid too
    np.testing.assert_allclose([x0, y0], [cx0, cy0], atol=1e-3)


def test_fit_lines_masked(rng):
    t = np.linspace(0, 1, 8)
    line_pts = np.stack([t * 50, t * 25], -1)
    garbage = rng.uniform(0, 1000, size=(4, 2))
    pts = np.concatenate([line_pts, garbage])
    masks = jnp.asarray(np.r_[np.ones(8, bool), np.zeros(4, bool)])[None]
    lines, ok = fit_lines(jnp.asarray(pts), masks)
    vx, vy = np.asarray(lines[0, :2])
    expected = np.array([50.0, 25.0]) / np.hypot(50, 25)
    assert abs(vx * expected[0] + vy * expected[1]) > 0.999999


def test_intersect_lines():
    l1 = jnp.array([1.0, 0.0, 0.0, 5.0])  # horizontal through y=5
    l2 = jnp.array([0.0, 1.0, 3.0, 0.0])  # vertical through x=3
    pt, ok = intersect_lines(l1, l2)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(pt), [3.0, 5.0], atol=1e-6)
    # parallel lines
    l3 = jnp.array([1.0, 0.0, 0.0, 9.0])
    _, ok2 = intersect_lines(l1, l3)
    assert not bool(ok2)


def test_synthesis_recovers_undetected_landmarks():
    """Project all landmarks with a known homography, drop some, and check
    synthesis reconstructs the dropped ones at the right image position."""
    H = default_camera_homography(1280, 720)
    all_img = project(H, pitch.WORLD_XY)  # (57, 2)

    # detect the goal line (x=0) via 4 landmarks and the y=54.16 / y=13.84
    # penalty-box edges via their 16.5m-line endpoints on both pitch halves;
    # the left penalty-area goal-line corners are then synthesizable as
    # (x=0) x (y=54.16) and (x=0) x (y=13.84)
    detected_ids = [
        pitch.NAME_TO_ID[n]
        for n in [
            "TL_PITCH_CORNER",
            "BL_PITCH_CORNER",
            "L_GOAL_AREA_TL_CORNER",
            "L_GOAL_AREA_BL_CORNER",
            "L_PENALTY_AREA_TR_CORNER",
            "R_PENALTY_AREA_TL_CORNER",
            "L_PENALTY_AREA_BR_CORNER",
            "R_PENALTY_AREA_BL_CORNER",
        ]
    ]
    kp_xy = np.zeros((57, 2))
    kp_valid = np.zeros(57, bool)
    for i in detected_ids:
        kp_xy[i] = all_img[i]
        kp_valid[i] = True

    out_xy, out_valid = synthesize_keypoints(jnp.asarray(kp_xy), jnp.asarray(kp_valid))
    out_xy, out_valid = np.asarray(out_xy), np.asarray(out_valid)

    # originals untouched
    for i in detected_ids:
        assert out_valid[i]
        np.testing.assert_allclose(out_xy[i], kp_xy[i], atol=1e-9)

    for name in ["L_PENALTY_AREA_TL_CORNER", "L_PENALTY_AREA_BL_CORNER"]:
        i = pitch.NAME_TO_ID[name]
        assert out_valid[i], f"{name} should have been synthesized"
        np.testing.assert_allclose(out_xy[i], np.round(all_img[i]), atol=1.5)

    # landmarks on lines with < 2 detections must NOT be synthesized
    for name in ["L_GOAL_AREA_TR_CORNER", "R_PENALTY_AREA_TR_CORNER", "CENTER_MARK"]:
        assert not out_valid[pitch.NAME_TO_ID[name]]

    # every synthesized point must be geometrically consistent
    for i in range(57):
        if out_valid[i] and not kp_valid[i]:
            np.testing.assert_allclose(out_xy[i], np.round(all_img[i]), atol=1.5)


def test_synthesis_matches_reference_algorithm():
    """Re-run the reference's dict-based synthesis logic in pure Python on
    the same input and compare the resulting landmark sets."""
    H = default_camera_homography(1280, 720)
    all_img = project(H, pitch.WORLD_XY)
    rng = np.random.default_rng(5)
    detected_ids = sorted(
        rng.choice(np.flatnonzero(pitch.ON_PLANE_MASK), size=14, replace=False).tolist()
    )
    kp_xy = np.zeros((57, 2))
    kp_valid = np.zeros(57, bool)
    for i in detected_ids:
        kp_xy[i] = np.round(all_img[i])
        kp_valid[i] = True

    # --- reference algorithm, reimplemented with dicts + cv2 ---
    def ref_synthesize(keypoints: dict) -> dict:
        x_groups, y_groups, coord_to_label = {}, {}, {}
        for i in range(57):
            if not pitch.ON_PLANE_MASK[i]:
                continue
            x, y, _ = pitch.WORLD_XYZ[i]
            xr, yr = round(float(x), 2), round(float(y), 2)
            coord_to_label.setdefault((xr, yr), i)
            x_groups.setdefault(xr, set()).add(i)
            y_groups.setdefault(yr, set()).add(i)

        def fit(pts):
            if len(pts) < 2:
                return None
            vx, vy, x0, y0 = cv2.fitLine(
                np.array(pts, np.float32).reshape(-1, 1, 2), cv2.DIST_L2, 0, 0.01, 0.01
            ).ravel()
            return float(vx), float(vy), float(x0), float(y0)

        lines_y = {}
        for yv, labels in y_groups.items():
            pts = [keypoints[l] for l in labels if l in keypoints]
            if len(pts) >= 2:
                line = fit(pts)
                if line:
                    lines_y[yv] = line
        lines_x = {}
        for xv, labels in x_groups.items():
            pts = [keypoints[l] for l in labels if l in keypoints]
            if len(pts) >= 2:
                line = fit(pts)
                if line:
                    lines_x[xv] = line
        added = {}
        for yv, ly in lines_y.items():
            for xv, lx in lines_x.items():
                label = coord_to_label.get((round(xv, 2), round(yv, 2)))
                if label is None or label in keypoints:
                    continue
                vx1, vy1, x01, y01 = ly
                vx2, vy2, x02, y02 = lx
                det = vx1 * (-vy2) - vy1 * (-vx2)
                if abs(det) < 1e-8:
                    continue
                A = np.array([[vx1, -vx2], [vy1, -vy2]])
                t, _ = np.linalg.solve(A, np.array([x02 - x01, y02 - y01]))
                added[label] = (int(round(x01 + t * vx1)), int(round(y01 + t * vy1)))
                if len(added) >= 30:
                    break
            if len(added) >= 30:
                break
        return {**keypoints, **added}

    ref_out = ref_synthesize({i: tuple(kp_xy[i]) for i in detected_ids})
    out_xy, out_valid = synthesize_keypoints(jnp.asarray(kp_xy), jnp.asarray(kp_valid))
    out_xy, out_valid = np.asarray(out_xy), np.asarray(out_valid)

    assert set(np.flatnonzero(out_valid)) == set(ref_out)
    for i, (x, y) in ref_out.items():
        np.testing.assert_allclose(out_xy[i], [x, y], atol=1.0)
