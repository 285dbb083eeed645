"""Cross-feature config-matrix smoke: every combination of the major
pipeline toggles must run the oracle-model pipeline end to end, produce
the full per-frame schema, and be deterministic (two runs with the same
config agree exactly).

Each toggle has dedicated equality/parity tests elsewhere; what this file
guards is the INTERACTIONS -- e.g. appearance embeddings + the auction
solver + streaming, or calibration + exact assignment -- which otherwise
only meet in production.
"""

import numpy as np
import pytest

from eagle_tpu.config import DEFAULT_CONFIG, DetectorConfig, TrackerConfig
from eagle_tpu.pipeline.coordinate_model import CoordinateModel
from eagle_tpu.utils.synthetic import make_scene

from .oracles import oracle_detector_fn, oracle_keypoint_fn

CASES = {
    "hist-appearance+auction": dict(
        tracker=TrackerConfig(
            max_tracks=16, use_appearance=True, embedder="histogram", embed_dim=64,
            assignment="auction",
        ),
    ),
    "osnet+exact+calibration": dict(
        detector=DetectorConfig(use_bf16=False),
        tracker=TrackerConfig(
            max_tracks=16, use_appearance=True, embedder="osnet", embed_dim=16,
            reid_slots=4, assignment="exact", gmc="off",
        ),
        calibration=True,
    ),
    "gmc-translation+smoothless": dict(
        tracker=TrackerConfig(max_tracks=16, gmc="translation", assignment="exact"),
    ),
    "calibration+auction+stream": dict(
        tracker=TrackerConfig(max_tracks=16, assignment="auction", gmc="affine"),
        calibration=True,
        _stream=True,
    ),
    "hist-appearance+stream": dict(
        tracker=TrackerConfig(
            max_tracks=16, use_appearance=True, embedder="histogram", embed_dim=64
        ),
        _stream=True,
    ),
}


def _run(scene, cfg, stream, calibration):
    model = CoordinateModel(
        keypoint_fn=oracle_keypoint_fn(scene),
        detector_fn=oracle_detector_fn(scene),
        config=cfg,
        verbose_init=False,
    )
    kw = dict(num_homography=1, num_keypoint_detection=2, calibration=calibration)
    if stream:
        out = {}
        for block in model.stream_coordinates(
            [scene.frames[:16], scene.frames[16:]], 8, prefetch=False, **kw
        ):
            out.update(block)
        return out
    return model.get_coordinates(scene.frames, 8, verbose=False, **kw)


@pytest.mark.parametrize("name", sorted(CASES))
def test_config_combination_runs_and_is_deterministic(name):
    spec = dict(CASES[name])
    stream = spec.pop("_stream", False)
    calibration = spec.pop("calibration", False)
    cfg = DEFAULT_CONFIG.replace(chunk_frames=16, **spec)

    scene = make_scene(num_frames=32, width=480, height=270, num_players=5, fps=8, seed=21)
    a = _run(scene, cfg, stream, calibration)
    b = _run(scene, cfg, stream, calibration)

    assert set(a) == set(range(32))
    for t in a:
        # full per-frame schema (docs/data.md contract)
        assert set(a[t]) >= {"Coordinates", "Time", "Keypoints", "Boundaries"}
        assert isinstance(a[t]["Coordinates"], dict)
    # determinism: identical inputs + config -> identical outputs
    sa, sb = _normalize(a), _normalize(b)
    assert sa == sb, f"{name}: nondeterministic output"
    # the oracle scene has 5 players: tracking must find them
    n_tracked = np.mean([len(a[t]["Coordinates"].get("Player", {})) for t in a])
    assert n_tracked >= 3, f"{name}: only {n_tracked} players/frame tracked"


def _normalize(o):
    if isinstance(o, dict):
        return {k: _normalize(v) for k, v in o.items()}
    if isinstance(o, (list, tuple)):
        return [_normalize(v) for v in o]
    if isinstance(o, np.ndarray):
        return o.tolist()
    if isinstance(o, np.generic):
        return o.item()
    return o
