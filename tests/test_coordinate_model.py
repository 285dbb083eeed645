"""End-to-end CoordinateModel test on the synthetic scene with oracle
models injected: validates homography recovery, pitch-coordinate accuracy,
stable tracking, and the raw_coordinates output schema."""

import numpy as np
import pytest

from eagle_tpu import pitch
from eagle_tpu.pipeline.coordinate_model import CoordinateModel
from eagle_tpu.utils.synthetic import make_scene

from .oracles import oracle_detector_fn, oracle_keypoint_fn


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


def test_calibration_flag_pipeline(scene):
    """calibration=True must run end to end and keep keypoints usable."""
    model = CoordinateModel(
        keypoint_fn=oracle_keypoint_fn(scene),
        detector_fn=oracle_detector_fn(scene),
        verbose_init=False,
    )
    coords = model.get_coordinates(
        scene.frames[:6], scene.fps, num_keypoint_detection=3, verbose=False, calibration=True
    )
    assert len(coords) == 6
    assert len(coords[0]["Keypoints"]) >= 4


def test_on_demand_keypoint_fallback():
    """A hard scene cut kills optical flow on non-cadence frames; the
    pipeline must detect the collapse, run the keypoint model on demand
    for the flagged frames (reference :316-319), and recover."""
    base = make_scene(num_frames=8, width=640, height=360, num_players=0, fps=8, seed=1)
    frames = base.frames.copy()
    frames[4:] = 127  # cut to featureless frames: LK gradient matrix singular

    calls = [0]
    inner = oracle_keypoint_fn(base)

    def counting_kp(batch):
        calls[0] += 1
        return inner(batch)

    def no_dets(batch):
        b = len(batch)
        return (
            np.zeros((b, 128, 4), np.float32),
            np.zeros((b, 128), np.float32),
            np.zeros((b, 128), np.int32),
            np.zeros((b, 128), bool),
        )

    model = CoordinateModel(keypoint_fn=counting_kp, detector_fn=no_dets, verbose_init=False)
    # cadence 1/s at 8 fps -> model frames {0}; frames 4.. have no memo
    coords = model.get_coordinates(frames, 8, num_keypoint_detection=1, verbose=False)
    assert calls[0] >= 2, "on-demand pass must invoke the keypoint model again"
    # flagged noise frames recovered >= 4 keypoints from the model
    assert len(coords[4]["Keypoints"]) >= 4


def test_on_demand_fallback_resumes_from_flagged_chunk():
    """The on-demand re-scan must NOT recompute chunks before the first
    flagged frame: per-chunk carries are checkpointed and the scan resumes
    from the first chunk whose inputs changed."""
    from eagle_tpu.config import DEFAULT_CONFIG

    base = make_scene(num_frames=64, width=640, height=360, num_players=0, fps=8, seed=3)
    frames = base.frames.copy()
    frames[40:] = 127  # flow collapses; cadence frames keep oracle memos

    def no_dets(batch):
        b = len(batch)
        return (
            np.zeros((b, 128, 4), np.float32),
            np.zeros((b, 128), np.float32),
            np.zeros((b, 128), np.int32),
            np.zeros((b, 128), bool),
        )

    cfg = DEFAULT_CONFIG.replace(chunk_frames=32)  # 64 frames -> 2 chunks
    model = CoordinateModel(
        keypoint_fn=oracle_keypoint_fn(base),
        detector_fn=no_dets,
        config=cfg,
        verbose_init=False,
    )
    coords = model.get_coordinates(frames, 8, num_keypoint_detection=1, verbose=False)
    assert len(coords) == 64
    # first pass: chunks 0+1; flagged frames are all >= 40 (chunk 1), so
    # the second pass re-runs chunk 1 only: 3 chunk executions, not 4
    assert model.scan_chunks_run == 3, model.scan_chunks_run
    assert len(coords[41]["Keypoints"]) >= 4


def test_on_demand_eager_gather_matches_pattern_runner():
    """The on-demand fallback's eager row gather + fixed-shape batch runner
    must produce exactly what the jitted per-pattern gather produces (the
    fallback avoids the latter because data-dependent patterns would
    re-trace the network per flow-collapse event)."""
    import jax.numpy as jnp

    from eagle_tpu.pipeline.coordinate_model import PIECE, CoordinateModel, _DevicePieces

    scene = make_scene(num_frames=2 * PIECE + 3, width=640, height=360, num_players=2, fps=8)
    model = CoordinateModel(verbose_init=False)
    geom = model._geometry((360, 640))  # identity at this size
    pieces = _DevicePieces(scene.frames, PIECE, geom if geom.enabled else None)

    idx = [1, 5, PIECE + 2, 2 * PIECE + 1, 7, 0, PIECE, 3]  # KP_BATCH rows
    eager = np.asarray(
        model._kp_on_demand_batch(pieces, idx, geom, (360, 640))
    )

    slots = sorted({k // PIECE for k in idx})
    pattern = tuple((slots.index(k // PIECE), k % PIECE) for k in idx)
    run = model._kp_pieces_runner(geom, (360, 640), pattern)
    patterned = np.asarray(run(*[pieces.at(s) for s in slots]))

    np.testing.assert_array_equal(eager, patterned)


def test_prescaled_pieces_match_inline_prescale():
    """precompute_host + _DevicePieces(precomputed=...) must produce the
    same host and device pieces as the inline prescale, on both the
    working-resolution 4:2:0 path (720p -> 544x960 canvas planes) and the
    identity raw-BGR path; a config/mode mismatch must be rejected."""
    import pytest

    from eagle_tpu.pipeline.coordinate_model import (
        PIECE,
        CoordinateModel,
        _DevicePieces,
    )
    from eagle_tpu.ops.preprocess import resolve_upload_format

    model = CoordinateModel(verbose_init=False)
    rng = np.random.default_rng(5)

    for hw in ((720, 1280), (360, 640)):
        frames = rng.integers(0, 256, (PIECE + 3, *hw, 3), np.uint8)
        geom = model._geometry(hw)
        g = geom if geom.enabled else None
        fmt = resolve_upload_format(model.config.upload_format, geom.enabled)
        pre = _DevicePieces.precompute_host(frames, PIECE, g, fmt=fmt)
        inline = _DevicePieces(frames, PIECE, g, fmt=fmt)
        cached = _DevicePieces(frames, PIECE, g, fmt=fmt, precomputed=pre)
        assert len(pre.pieces) == len(inline.host_pieces) == 2
        for a, b in zip(pre.pieces, inline.host_pieces):
            np.testing.assert_array_equal(a, b)
        for a, b in zip(cached.pieces, inline.pieces):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # consumer asked for a different transport -> loud failure, not silence
    frames = rng.integers(0, 256, (4, 720, 1280, 3), np.uint8)
    geom = model._geometry((720, 1280))
    pre = _DevicePieces.precompute_host(
        frames, PIECE, geom, fmt="yuv420"
    )
    with pytest.raises(AssertionError, match="prescaled pieces"):
        _DevicePieces(frames, PIECE, geom, fmt="bgr", precomputed=pre)


def test_get_coordinates_accepts_prescaled(scene, coords):
    """get_coordinates(prescaled=model.prescale_clip(frames)) is
    bit-identical to the inline-prescale run (the `coords` fixture)."""

    def norm(o):
        if isinstance(o, dict):
            return {k: norm(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return [norm(v) for v in o]
        if isinstance(o, np.ndarray):
            return o.tolist()
        if isinstance(o, np.generic):
            return o.item()
        return o

    model = CoordinateModel(
        keypoint_fn=oracle_keypoint_fn(scene),
        detector_fn=oracle_detector_fn(scene),
        verbose_init=False,
    )
    got = model.get_coordinates(
        scene.frames,
        scene.fps,
        num_homography=1,
        num_keypoint_detection=3,
        verbose=False,
        prescaled=model.prescale_clip(scene.frames),
    )
    assert norm(got) == norm(coords)
