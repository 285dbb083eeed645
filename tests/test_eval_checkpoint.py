"""Eval harness metrics + checkpoint persistence round-trips."""

import jax
import numpy as np

from eagle_tpu.eval import detection_metrics, pitch_rmse, point_metrics
from eagle_tpu.models import hrnet
from eagle_tpu.models.checkpoint import load_params, save_params


def test_point_metrics_perfect():
    gt = np.random.default_rng(0).uniform(0, 500, (4, 57, 2))
    valid = np.random.default_rng(1).uniform(size=(4, 57)) > 0.3
    m = point_metrics(gt, valid, gt, valid)
    for t in (2, 4, 8, 12):
        assert m["metrics"][str(t)] == 1.0
        assert m["classification"][f"f1_{t}"] == 1.0
    assert m["classification"]["pdj"] == 1.0


def test_point_metrics_thresholds():
    gt = np.zeros((1, 4, 2))
    pred = np.array([[[1.0, 0], [3.0, 0], [6.0, 0], [100.0, 0]]])
    valid = np.ones((1, 4), bool)
    m = point_metrics(pred, valid, gt, valid)
    assert m["metrics"]["2"] == 0.25
    assert m["metrics"]["4"] == 0.5
    assert m["metrics"]["8"] == 0.75
    assert m["metrics"]["12"] == 0.75


def test_point_metrics_unlabeled_matching():
    gt = np.array([[[0.0, 0], [10.0, 0]]])
    pred = np.array([[[10.0, 0], [0.0, 0]]])  # swapped order
    valid = np.ones((1, 2), bool)
    m = point_metrics(pred, valid, gt, valid, labeled=False)
    assert m["metrics"]["2"] == 1.0


def test_detection_metrics():
    gt = np.array([[[0, 0, 10, 10], [50, 50, 70, 70]]], float)
    pred = np.array([[[1, 1, 11, 11], [200, 200, 220, 220]]], float)
    valid = np.ones((1, 2), bool)
    m = detection_metrics(pred, valid, gt, valid, iou_threshold=0.5)
    assert m["precision"] == 0.5 and m["recall"] == 0.5
    assert 0.5 < m["mean_iou"] <= 1.0


def test_pitch_rmse():
    gt = np.zeros((2, 3, 2))
    pred = gt + 0.01
    valid = np.ones((2, 3), bool)
    rmse = pitch_rmse(pred, valid, gt, valid)
    np.testing.assert_allclose(rmse, 0.01 * np.sqrt(2), rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    params = hrnet.init_params(jax.random.key(0))
    path = str(tmp_path / "hrnet.msgpack")
    save_params(params, path)
    loaded = load_params(path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # structural equality too
    assert jax.tree.structure(params) == jax.tree.structure(loaded)
