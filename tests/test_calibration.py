"""Brightness-snap keypoint calibration vs a numpy re-run of the
reference's algorithm (coordinate_model.py:520-555)."""

import cv2
import jax.numpy as jnp
import numpy as np

from eagle_tpu.pipeline.temporal import calibrate_keypoints


def _ref_calibrate(frame, keypoints, offset=3, threshold=150):
    out = {}
    for key, (x, y) in keypoints.items():
        if not (0 <= x < frame.shape[1] and 0 <= y < frame.shape[0]):
            out[key] = (x, y)
            continue
        v = cv2.cvtColor(frame[y, x].reshape(1, 1, 3), cv2.COLOR_BGR2HSV)[0, 0, 2]
        if v >= threshold:
            out[key] = (x, y)
        else:
            x_min, x_max = max(0, x - offset), min(frame.shape[1], x + offset)
            y_min, y_max = max(0, y - offset), min(frame.shape[0], y + offset)
            grid = cv2.cvtColor(frame[y_min:y_max, x_min:x_max], cv2.COLOR_BGR2HSV)
            by, bx = np.unravel_index(np.argmax(grid[:, :, 2]), grid[:, :, 2].shape)
            out[key] = (
                int(np.clip(x + bx - offset, 0, frame.shape[1] - 1)),
                int(np.clip(y + by - offset, 0, frame.shape[0] - 1)),
            )
    return out


def test_calibration_matches_reference(rng):
    frame = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    # plant a bright pixel near a dim keypoint
    frame[20:26, 30:36] = 40
    frame[22, 33] = 250
    pts = {0: (32, 23), 1: (10, 10), 2: (90, 5), 3: (-5, 10), 4: (95, 63)}

    kp_xy = np.zeros((57, 2), np.float32)
    kp_valid = np.zeros(57, bool)
    for k, (x, y) in pts.items():
        kp_xy[k] = (x, y)
        kp_valid[k] = True

    out = np.asarray(calibrate_keypoints(jnp.asarray(frame), jnp.asarray(kp_xy), jnp.asarray(kp_valid)))
    expected = _ref_calibrate(frame, pts)
    for k, (x, y) in expected.items():
        assert tuple(out[k].astype(int)) == (x, y), (k, tuple(out[k]), (x, y))
