"""End-to-end CoordinateModel test on the synthetic scene with oracle
models injected: validates homography recovery, pitch-coordinate accuracy,
stable tracking, and the raw_coordinates output schema."""

import numpy as np
import pytest

from eagle_tpu import pitch
from eagle_tpu.pipeline.coordinate_model import CoordinateModel
from eagle_tpu.utils.synthetic import make_scene


@pytest.fixture(scope="module")
def scene():
    return make_scene(num_frames=20, width=960, height=540, num_players=6, fps=20, seed=11)


def _oracle_keypoint_fn(scene):
    kp_img = scene.keypoints_image  # static camera
    h, w = scene.frames.shape[1:3]
    valid = (
        (kp_img[:, 0] >= 5)
        & (kp_img[:, 0] < w - 5)
        & (kp_img[:, 1] >= 5)
        & (kp_img[:, 1] < h - 5)
        & pitch.ON_PLANE_MASK
    )

    def fn(frames_batch):
        b = len(frames_batch)
        kp = np.zeros((b, 57, 3), np.float32)
        kp[:, :, 0] = np.trunc(kp_img[:, 0])
        kp[:, :, 1] = np.trunc(kp_img[:, 1])
        kp[:, :, 2] = 0.9
        return kp, np.tile(valid, (b, 1))

    return fn


def _oracle_detector_fn(scene, max_det=128):
    cursor = [0]

    def fn(frames_batch):
        b = len(frames_batch)
        t0 = cursor[0]
        cursor[0] += b
        boxes = np.zeros((b, max_det, 4), np.float32)
        conf = np.zeros((b, max_det), np.float32)
        cls = np.zeros((b, max_det), np.int32)
        valid = np.zeros((b, max_det), bool)
        P = scene.player_boxes.shape[1]
        for k in range(b):
            t = t0 + k
            boxes[k, :P] = scene.player_boxes[t]
            conf[k, :P] = 0.9
            cls[k, :P] = 0  # Player
            valid[k, :P] = True
            bx, by = scene.ball_image[t]
            boxes[k, P] = [bx - 5, by - 10, bx + 5, by]
            conf[k, P] = 0.8
            cls[k, P] = 2  # Ball
            valid[k, P] = True
        return boxes, conf, cls, valid

    return fn


@pytest.fixture(scope="module")
def coords(scene):
    model = CoordinateModel(
        keypoint_fn=_oracle_keypoint_fn(scene),
        detector_fn=_oracle_detector_fn(scene),
        verbose_init=False,
    )
    return model.get_coordinates(
        scene.frames, scene.fps, num_homography=1, num_keypoint_detection=3, verbose=False
    )


def test_schema(coords, scene):
    assert set(coords) == set(range(len(scene.frames)))
    fr = coords[0]
    assert set(fr) == {"Coordinates", "Time", "Keypoints", "Boundaries"}
    assert fr["Time"] == "00:00"
    assert isinstance(fr["Keypoints"], dict)
    for name, (x, y) in fr["Keypoints"].items():
        assert name in pitch.NAME_TO_ID
        assert isinstance(x, int) and isinstance(y, int)
    assert len(fr["Boundaries"]) == 4
    players = fr["Coordinates"]["Player"]
    assert players, "players must be tracked on the first frame"
    for pid, item in players.items():
        assert set(item) >= {"BBox", "Confidence", "Transformed_Coordinates"}
        assert len(item["BBox"]) == 4


def test_pitch_coordinates_accuracy(coords, scene):
    """Projected player positions must match the known world positions:
    this validates keypoint->RANSAC->projection end to end."""
    errs = []
    for t, fr in coords.items():
        players = fr["Coordinates"].get("Player", {})
        got = []
        for item in players.values():
            tc = item["Transformed_Coordinates"]
            if tc is not None:
                got.append(tc)
        # match each projection to its nearest true world position
        for g in got:
            d = np.linalg.norm(scene.player_world[t] - np.asarray(g), axis=1)
            errs.append(d.min())
    errs = np.asarray(errs)
    assert len(errs) > 50
    # int truncation of keypoints and projections costs < ~1.2 m worst case
    assert np.median(errs) < 0.8, np.median(errs)
    assert errs.max() < 2.0, errs.max()


def test_ball_present_and_projected(coords, scene):
    n_ball = sum(1 for fr in coords.values() if "Ball" in fr["Coordinates"])
    assert n_ball == len(coords)
    tc = coords[5]["Coordinates"]["Ball"][0]["Transformed_Coordinates"]
    assert tc is not None
    d = np.linalg.norm(scene.ball_world[5] - np.asarray(tc))
    assert d < 1.5


def test_track_ids_stable(coords, scene):
    first_ids = set(coords[0]["Coordinates"]["Player"])
    assert len(first_ids) == scene.player_world.shape[1]
    for t, fr in coords.items():
        ids = set(fr["Coordinates"].get("Player", {}))
        assert ids == first_ids, f"frame {t}: {ids} != {first_ids}"


def test_boundaries_reasonable(coords, scene):
    b = coords[3]["Boundaries"]
    assert all(x is not None for x in b)
    (blx, bly), (tlx, tly), (trx, try_), (brx, bry) = b
    assert bly == 0 and bry == 0 and tly == 68 and try_ == 68
    assert blx < brx and tlx < trx
