"""Pitch-geometry layer tests: internal consistency + (when the reference
checkout is present) bit-exact parity with the reference constant tables."""

import os

import numpy as np
import pytest

from eagle_tpu import pitch

REFERENCE = "/root/reference"


def test_shapes_and_names():
    assert pitch.NUM_KEYPOINTS == 57
    assert len(pitch.KEYPOINT_NAMES) == 57
    assert pitch.WORLD_XYZ.shape == (57, 3)
    assert len(set(pitch.KEYPOINT_NAMES)) == 57
    assert pitch.NAME_TO_ID["CENTER_MARK"] == 42


def test_known_coordinates():
    assert tuple(pitch.WORLD_XYZ[pitch.NAME_TO_ID["CENTER_MARK"]]) == (52.5, 34.0, 0.0)
    assert tuple(pitch.WORLD_XYZ[pitch.NAME_TO_ID["BL_PITCH_CORNER"]]) == (0.0, 0.0, 0.0)
    assert tuple(pitch.WORLD_XYZ[pitch.NAME_TO_ID["TR_PITCH_CORNER"]]) == (105.0, 68.0, 0.0)
    # derived tangent constants (reference pitch.py:249,261)
    np.testing.assert_allclose(
        pitch.WORLD_XYZ[pitch.NAME_TO_ID["CENTER_CIRCLE_TANGENT_TR"]],
        (61.31243189346428, 36.462426470588234, 0.0),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        pitch.WORLD_XYZ[pitch.NAME_TO_ID["LEFT_CIRCLE_TANGENT_T"]],
        (19.9906727467215, 35.70008928040832, 0.0),
        atol=1e-10,
    )


def test_on_plane_mask():
    assert pitch.NOT_ON_PLANE == [0, 1, 24, 25]
    assert pitch.ON_PLANE_MASK.sum() == 53


def test_flip_maps_are_involutions():
    ids = np.arange(57)
    assert (pitch.LR_FLIP_IDS[pitch.LR_FLIP_IDS] == ids).all()
    assert (pitch.TB_FLIP_IDS[pitch.TB_FLIP_IDS] == ids).all()
    # flips preserve world geometry
    lr = pitch.WORLD_XYZ[pitch.LR_FLIP_IDS]
    np.testing.assert_allclose(lr[:, 0], pitch.PITCH_LENGTH - pitch.WORLD_XYZ[:, 0], atol=1e-9)
    np.testing.assert_allclose(lr[:, 1], pitch.WORLD_XYZ[:, 1], atol=1e-9)


def test_line_families():
    # every on-plane landmark belongs to exactly one x-line and one y-line
    assert (pitch.X_LINE_MASKS.sum(axis=0) == pitch.ON_PLANE_MASK.astype(int)).all()
    assert (pitch.Y_LINE_MASKS.sum(axis=0) == pitch.ON_PLANE_MASK.astype(int)).all()
    # grid ids point back to landmarks on the right lines
    nx, ny = pitch.LINE_GRID_IDS.shape
    for a in range(nx):
        for b in range(ny):
            i = pitch.LINE_GRID_IDS[a, b]
            if i < 0:
                continue
            assert round(float(pitch.WORLD_XYZ[i, 0]), 2) == round(float(pitch.X_LINE_VALUES[a]), 2)
            assert round(float(pitch.WORLD_XYZ[i, 1]), 2) == round(float(pitch.Y_LINE_VALUES[b]), 2)


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference checkout not available")
def test_parity_with_reference():
    import sys

    sys.path.insert(0, REFERENCE)
    try:
        from eagle.utils import pitch as ref
    finally:
        sys.path.remove(REFERENCE)

    assert dict(enumerate(pitch.KEYPOINT_NAMES)) == ref.INTERSECTION_TO_PITCH_POINTS
    for name, (x, y, z) in ref.GROUND_TRUTH_POINTS.items():
        np.testing.assert_allclose(pitch.WORLD_XYZ[pitch.NAME_TO_ID[name]], (x, y, z), atol=1e-9)
    assert pitch.NOT_ON_PLANE == ref.NOT_ON_PLANE
    assert sorted(pitch.POINTS_LEFT) == sorted(ref.POINTS_LEFT)
    assert sorted(pitch.POINTS_RIGHT) == sorted(ref.POINTS_RIGHT)
    assert pitch.LR_SIDES_MAPPING == ref.LR_SIDES_MAPPING
    assert pitch.TOP_BOTTOM_MAPPING == ref.TOP_BOTTOM_MAPPING
    assert pitch.PERP_LINES == ref.PERP_LINES
