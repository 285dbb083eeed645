"""Processor tests: full-output parity against the reference processor
module (imported from the read-only checkout and run on identical inputs),
plus unit tests of the intended fragment merge the reference lost to its
inverted overlap check."""

import importlib.util
import math
import os

import numpy as np
import pandas as pd
import pytest

from eagle_tpu.config import ProcessorConfig
from eagle_tpu.pipeline.coordinate_model import CoordinateModel
from eagle_tpu.pipeline.processor import Processor, interpolate_df, smooth_df
from eagle_tpu.utils.synthetic import make_scene

from .oracles import oracle_detector_fn, oracle_keypoint_fn

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def scene():
    return make_scene(num_frames=20, width=960, height=540, num_players=6, fps=20, seed=11)


@pytest.fixture(scope="module")
def coords(scene):
    model = CoordinateModel(
        keypoint_fn=oracle_keypoint_fn(scene),
        detector_fn=oracle_detector_fn(scene),
        verbose_init=False,
    )
    return model.get_coordinates(
        scene.frames, scene.fps, num_homography=1, num_keypoint_detection=3, verbose=False
    )


def _ref_processor():
    spec = importlib.util.spec_from_file_location(
        "ref_processor", os.path.join(REFERENCE, "eagle/processor.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _cmp_cell(a, b, path):
    if isinstance(a, float) and isinstance(b, float) and math.isnan(a) and math.isnan(b):
        return
    if isinstance(a, (tuple, list)) and isinstance(b, (tuple, list)):
        np.testing.assert_allclose(np.asarray(a, float), np.asarray(b, float), atol=1e-6, err_msg=path)
        return
    if (isinstance(a, float) and math.isnan(a)) != (isinstance(b, float) and math.isnan(b)):
        raise AssertionError(f"{path}: {a!r} != {b!r}")
    assert a == b, f"{path}: {a!r} != {b!r}"


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference checkout not available")
@pytest.mark.parametrize("smooth,filter_ball", [(False, False), (True, False), (False, True)])
def test_full_parity_with_reference_processor(coords, scene, smooth, filter_ball):
    """Identical raw coordinates in, identical tables out (fragment merge
    disabled for bug-compatibility with the reference's no-op merge);
    covers the smoothing path and the ball jump-filter path (including the
    reference's broadcast-distance quirk)."""
    ref = _ref_processor()

    ours = Processor(
        coords,
        list(scene.frames),
        scene.fps,
        filter_ball_detections=filter_ball,
        config=ProcessorConfig(enable_fragment_merge=False),
    )
    theirs = ref.Processor(coords, list(scene.frames), scene.fps, filter_ball_detections=filter_ball)

    df_a, map_a = ours.process_data(smooth=smooth)
    df_b, map_b = theirs.process_data(smooth=smooth)

    assert map_a == map_b
    assert list(df_a.columns) == list(df_b.columns)
    assert list(df_a.index) == list(df_b.index)
    for col in df_a.columns:
        for idx in df_a.index:
            _cmp_cell(df_a.loc[idx, col], df_b.loc[idx, col], f"{col}@{idx}")

    fa = ours.format_data(df_a)
    fb = theirs.format_data(df_b)
    assert list(fa.columns) == list(fb.columns)
    assert len(fa) == len(fb)
    for i in range(len(fa)):
        for col in ("Coordinates", "Coordinates_video"):
            items_a, items_b = fa.loc[i, col], fb.loc[i, col]
            assert len(items_a) == len(items_b), f"{col}@{i}"
            for x, y in zip(items_a, items_b):
                assert x["ID"] == y["ID"]
                _cmp_cell(x["Coordinates"], y["Coordinates"], f"{col}@{i}")


def test_no_detection_clip_yields_empty_outputs():
    """A clip with zero detections (e.g. untrained weights) must flow
    through process_data AND format_data without error, like the
    reference's never-iterating loops (processor.py:92-123)."""
    n = 4
    coords = {
        i: {
            "Coordinates": {},
            "Time": "00:00",
            "Keypoints": {},
            "Boundaries": [[0.0, 0.0], [0.0, 0.0], [105.0, 0.0], [105.0, 68.0]],
        }
        for i in range(n)
    }
    frames = np.zeros((n, 64, 64, 3), np.uint8)
    proc = Processor(coords, list(frames), 24)
    df, team_mapping = proc.process_data()
    assert df.empty and team_mapping == {}
    assert proc.format_data(df).empty


def test_process_data_output_sanity(coords, scene):
    proc = Processor(coords, list(scene.frames), scene.fps)
    df, team_mapping = proc.process_data()
    assert not df.empty
    assert {"Bottom_Left", "Top_Left", "Top_Right", "Bottom_Right", "Ball", "Ball_video"} <= set(
        df.columns
    )
    # two teams detected, every tracked player mapped
    assert set(team_mapping.values()) <= {0, 1}
    assert len(set(team_mapping.values())) == 2
    player_ids = {int(c.split("_")[1]) for c in df.columns if c.startswith("Player_")}
    assert set(team_mapping) == player_ids
    # team split of the synthetic scene is even
    counts = [list(team_mapping.values()).count(t) for t in (0, 1)]
    assert counts[0] == counts[1]


def test_interpolation_semantics():
    df = pd.DataFrame({"c": [(0.0, 0.0), np.nan, (2.0, 4.0), np.nan]})
    out = interpolate_df(df.copy(), "c", fill=False)
    np.testing.assert_allclose(out["c"].iloc[1], (1.0, 2.0))
    assert isinstance(out["c"].iloc[3], float) and math.isnan(out["c"].iloc[3])  # inside-only
    out = interpolate_df(df.copy(), "c", fill=True)
    np.testing.assert_allclose(out["c"].iloc[3], (2.0, 4.0))  # edge-extended


def test_smooth_semantics():
    df = pd.DataFrame({"c": [(0.0, 0.0), (10.0, 0.0), (2.0, 2.0), (12.0, 2.0), (4.0, 4.0)]})
    out = smooth_df(df.copy(), "c")
    # even samples re-interpolated from odd neighbors
    np.testing.assert_allclose(out["c"].iloc[2], (11.0, 1.0))


def test_fragment_merge_intended_behavior():
    """Two temporally-disjoint close fragments of the same player must
    merge into one column (the capability the reference lost)."""
    idx = list(range(30))
    a = [(10.0 + i, 20.0) if i <= 9 else np.nan for i in idx]
    b = [(21.0 + (i - 12), 20.0) if 12 <= i <= 21 else np.nan for i in idx]
    df = pd.DataFrame(
        {"Player_1_video": a, "Player_2_video": b, "Player_1": a, "Player_2": b}, index=idx
    )
    proc = Processor.__new__(Processor)
    proc.fps = 10
    proc.debug = False
    proc.config = ProcessorConfig()
    out = proc.merge_data(df.copy(), {1: 0, 2: 0})
    assert "Player_2_video" not in out.columns
    assert out["Player_1_video"].notna().sum() == 20

    # different teams must NOT merge
    out2 = proc.merge_data(df.copy(), {1: 0, 2: 1})
    assert "Player_2_video" in out2.columns

    # too-large spatial jump must NOT merge
    c = [(500.0, 500.0) if 12 <= i <= 21 else np.nan for i in idx]
    df3 = pd.DataFrame(
        {"Player_1_video": a, "Player_2_video": c, "Player_1": a, "Player_2": c}, index=idx
    )
    out3 = proc.merge_data(df3.copy(), {1: 0, 2: 0})
    assert "Player_2_video" in out3.columns
