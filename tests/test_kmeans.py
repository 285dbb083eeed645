"""Device KMeans / crop gathering / team-color voting ops, and agreement
of the device team-assignment backend with the host (sklearn) backend."""

import jax.numpy as jnp
import numpy as np
import pytest

from eagle_tpu.config import ProcessorConfig
from eagle_tpu.ops.kmeans import COLOR_NAMES, crop_color_votes, gather_crops, kmeans2
from eagle_tpu.pipeline.coordinate_model import CoordinateModel
from eagle_tpu.pipeline.processor import Processor
from eagle_tpu.utils.synthetic import make_scene

from .oracles import oracle_detector_fn, oracle_keypoint_fn


def test_kmeans2_separates_clusters(rng):
    a = rng.normal(loc=(0, 0, 0), scale=0.5, size=(1, 50, 3))
    b = rng.normal(loc=(10, 10, 10), scale=0.5, size=(1, 50, 3))
    pixels = jnp.asarray(np.concatenate([a, b], axis=1).astype(np.float32))
    labels = np.asarray(kmeans2(pixels, jnp.ones((1, 100), bool)))
    assert len(set(labels[0, :50])) == 1
    assert len(set(labels[0, 50:])) == 1
    assert labels[0, 0] != labels[0, 99]


def test_gather_crops_matches_slice_resize(rng):
    frame = rng.integers(0, 255, (1, 64, 96, 3), dtype=np.uint8)
    box = np.array([[10.0, 8.0, 42.0, 56.0]], np.float32)
    crop = np.asarray(gather_crops(jnp.asarray(frame), jnp.zeros(1, jnp.int32), jnp.asarray(box), grid_hw=(24, 16)))[0]
    import cv2

    ref = cv2.resize(frame[0, 8:56, 10:42], (16, 24), interpolation=cv2.INTER_LINEAR)
    assert np.abs(crop - ref).max() <= 2.0


def test_matmul_crops_matches_gather_crops(rng):
    """matmul_crops (the ReID hot path: one-hot interpolation matmuls,
    no XLA gathers) must reproduce gather_crops' bilinear samples exactly
    in f32 — same position convention, two-tap rows, fractional and
    out-of-range boxes included (clipping handles both)."""
    from eagle_tpu.ops.kmeans import matmul_crops

    frame = rng.integers(0, 255, (48, 72, 3), dtype=np.uint8)
    boxes = np.array(
        [
            [10.0, 8.0, 42.0, 40.0],  # integer box
            [3.7, 1.2, 55.9, 44.4],  # fractional
            [-6.0, -3.0, 80.0, 60.0],  # clipped at every edge
            [20.0, 30.0, 21.0, 31.0],  # tiny
        ],
        np.float32,
    )
    want = np.asarray(
        gather_crops(
            jnp.asarray(frame)[None],
            jnp.zeros(len(boxes), jnp.int32),
            jnp.asarray(boxes),
            grid_hw=(24, 16),
        )
    )
    got = np.asarray(
        matmul_crops(jnp.asarray(frame), jnp.asarray(boxes), grid_hw=(24, 16))
    )
    np.testing.assert_allclose(got, want, atol=1e-2)  # f32 sum-order noise, <<1 LSB
    # bf16 taps: two compounding bf16 matmuls stay within 2 uint8 LSB
    # (the ReID-path dtype; OSNet itself runs bf16)
    got16 = np.asarray(
        matmul_crops(
            jnp.asarray(frame), jnp.asarray(boxes), grid_hw=(24, 16), dtype=jnp.bfloat16
        ).astype(jnp.float32)
    )
    assert np.abs(got16 - want).max() <= 2.0


def test_crop_color_votes_detects_jersey():
    # red jersey on green background
    crop = np.zeros((1, 64, 32, 3), np.float32)
    crop[..., 1] = 150  # green bg (BGR)
    crop[0, 16:48, 8:24] = (20, 20, 220)  # red block
    votes = np.asarray(crop_color_votes(jnp.asarray(crop)))
    red = votes[0, COLOR_NAMES.index("red")]
    assert red > 0
    assert red == votes[0].max()
    assert votes[0, COLOR_NAMES.index("red2")] == 0


def test_device_team_assignment_matches_host():
    scene = make_scene(num_frames=12, width=960, height=540, num_players=6, fps=12, seed=11)
    model = CoordinateModel(
        keypoint_fn=oracle_keypoint_fn(scene),
        detector_fn=oracle_detector_fn(scene),
        verbose_init=False,
    )
    coords = model.get_coordinates(scene.frames, scene.fps, 1, 3, verbose=False)

    host = Processor(coords, list(scene.frames), scene.fps).get_team_mapping()
    dev = Processor(
        coords, list(scene.frames), scene.fps, config=ProcessorConfig(team_assign="device")
    ).get_team_mapping()
    assert set(host) == set(dev)
    # same partition into two teams (labels 0/1 may swap)
    groups_h = {t: {p for p in host if host[p] == t} for t in set(host.values())}
    groups_d = {t: {p for p in dev if dev[p] == t} for t in set(dev.values())}
    assert set(map(frozenset, groups_h.values())) == set(map(frozenset, groups_d.values()))
