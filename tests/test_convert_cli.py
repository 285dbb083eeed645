"""End-to-end weight-conversion CLI test (VERDICT round-2 item 7): a
random ultralytics-layout ``.pt`` / reference-layout ``.pth`` goes through
``scripts/convert_weights.py`` (a real subprocess) and the resulting
msgpack loads into a running CoordinateModel -- the role of the
reference's get_weights.sh + torch.load path (eagle/models/get_weights.sh,
coordinate_model.py:54-59)."""

import importlib.util
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def _run_convert(kind, src, out):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # prepend the repo but keep existing entries (/root/.axon_site must
    # survive or the TPU plugin never registers in child processes)
    env["PYTHONPATH"] = REPO + (os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "convert_weights.py"),
         "--kind", kind, "--src", str(src), "--out", str(out)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert os.path.exists(out)


def test_yolov8_pt_convert_cli_and_pipeline(tmp_path):
    from .torch_graphs import YoloV8Torch, randomize_

    import jax.numpy as jnp

    from eagle_tpu.config import DetectorConfig, KeypointConfig, PipelineConfig
    from eagle_tpu.models import yolov8
    from eagle_tpu.models.checkpoint import load_params
    from eagle_tpu.pipeline.coordinate_model import CoordinateModel

    tm = randomize_(YoloV8Torch(variant="m", nc=5), seed=11)
    pt = tmp_path / "detector_medium.pt"
    torch.save(tm.state_dict(), pt)
    out = tmp_path / "yolov8m.msgpack"
    _run_convert("yolov8", pt, out)

    # converted tree == direct in-process conversion, leaf for leaf
    import jax

    direct = yolov8.yolov8_from_torch(tm.state_dict())
    loaded = load_params(str(out))
    for a, b in zip(jax.tree.leaves(direct), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and the converted checkpoint drives a real pipeline run
    cfg = PipelineConfig().replace(
        detector=DetectorConfig(variant="medium", image_size=96, max_detections=16, nms_pre_topk=64),
        keypoint=KeypointConfig(input_hw=(72, 96)),
        chunk_frames=32,
    )
    model = CoordinateModel(
        config=cfg, detector_checkpoint=str(out), verbose_init=False
    )
    frames = np.random.default_rng(0).integers(0, 255, (4, 96, 128, 3), dtype=np.uint8)
    coords = model.get_coordinates(frames, 4, num_keypoint_detection=4, verbose=False)
    assert set(coords) == set(range(4))


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference checkout not available")
def test_hrnet_pth_convert_cli_and_pipeline(tmp_path):
    """A .pth in the reference's own KeypointModel layout converts via the
    CLI and loads into the pipeline."""
    import jax

    from eagle_tpu.config import DetectorConfig, KeypointConfig, PipelineConfig
    from eagle_tpu.models.checkpoint import load_params
    from eagle_tpu.models.convert import hrnet_from_torch
    from eagle_tpu.pipeline.coordinate_model import CoordinateModel

    spec = importlib.util.spec_from_file_location(
        "ref_hrnet", os.path.join(REFERENCE, "eagle/models/keypoint_hrnet.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ref = mod.KeypointModel(57).eval()
    pth = tmp_path / "keypoints_main.pth"
    torch.save(ref.state_dict(), pth)
    out = tmp_path / "hrnet.msgpack"
    _run_convert("hrnet", pth, out)

    direct = hrnet_from_torch(ref.state_dict())
    loaded = load_params(str(out))
    for a, b in zip(jax.tree.leaves(direct), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    cfg = PipelineConfig().replace(
        detector=DetectorConfig(variant="medium", image_size=96, max_detections=16, nms_pre_topk=64),
        keypoint=KeypointConfig(input_hw=(72, 96)),
        chunk_frames=32,
    )
    model = CoordinateModel(config=cfg, keypoint_checkpoint=str(out), verbose_init=False)
    frames = np.random.default_rng(1).integers(0, 255, (4, 96, 128, 3), dtype=np.uint8)
    coords = model.get_coordinates(frames, 4, num_keypoint_detection=4, verbose=False)
    assert set(coords) == set(range(4))
