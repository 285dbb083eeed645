"""End-to-end output pipeline: JSON artifacts with the documented schemas,
annotated-video rendering, the analytics example scripts, and
empty-detection robustness."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from eagle_tpu.io import write_video
from eagle_tpu.pipeline.coordinate_model import CoordinateModel
from eagle_tpu.pipeline.processor import Processor
from eagle_tpu.utils.render import render_annotated_frames
from eagle_tpu.utils.synthetic import make_scene

from .oracles import oracle_detector_fn, oracle_keypoint_fn

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def scene():
    return make_scene(num_frames=16, width=960, height=540, num_players=6, fps=16, seed=11)


@pytest.fixture(scope="module")
def output_dir(scene, tmp_path_factory):
    """Run the full main.py flow (with oracle models) into a directory."""
    root = tmp_path_factory.mktemp("output") / "clip"
    root.mkdir()
    model = CoordinateModel(
        keypoint_fn=oracle_keypoint_fn(scene),
        detector_fn=oracle_detector_fn(scene),
        verbose_init=False,
    )
    coords = model.get_coordinates(scene.frames, scene.fps, 1, 3, verbose=False)
    with open(root / "raw_coordinates.json", "w") as f:
        json.dump(coords, f, default=float)
    proc = Processor(coords, list(scene.frames), scene.fps, filter_ball_detections=False)
    df, team_mapping = proc.process_data(smooth=False)
    df.to_json(root / "raw_data.json", orient="records")
    with open(root / "metadata.json", "w") as f:
        json.dump({"fps": scene.fps, "team_mapping": team_mapping}, f, default=str)
    proc.format_data(df).to_json(root / "processed_data.json", orient="records")
    annotated = list(render_annotated_frames(df, scene.frames, coords, team_mapping))
    write_video(annotated, str(root / "annotated.mp4"), scene.fps)
    return root


def test_output_files_and_schemas(output_dir):
    for name in ("raw_coordinates.json", "raw_data.json", "metadata.json", "processed_data.json"):
        assert (output_dir / name).exists()
    assert (output_dir / "annotated.mp4").stat().st_size > 1000

    with open(output_dir / "raw_coordinates.json") as f:
        raw = json.load(f)
    fr = raw["0"]
    assert set(fr) == {"Coordinates", "Time", "Keypoints", "Boundaries"}

    with open(output_dir / "metadata.json") as f:
        meta = json.load(f)
    assert set(meta) == {"fps", "team_mapping"}

    df = pd.read_json(output_dir / "raw_data.json")
    assert {"Bottom_Left", "Top_Left", "Top_Right", "Bottom_Right", "Ball", "Ball_video"} <= set(
        df.columns
    )

    pdf = pd.read_json(output_dir / "processed_data.json")
    assert list(pdf.columns) == ["Boundaries", "Coordinates", "Coordinates_video"]
    row = pdf.iloc[0]
    ids = [x["ID"] for x in row["Coordinates"]]
    assert "Ball" in ids
    typed = [x for x in row["Coordinates"] if x["ID"] != "Ball"]
    assert all(x["Type"] in ("Player", "Goalkeeper") for x in typed)


@pytest.mark.parametrize(
    "script,args,artifact",
    [
        ("voronoi.py", ["--frame", "0"], "voronoi.png"),
        ("pass.py", ["--start_frame", "0", "--end_frame", "10"], "pass.png"),
        ("trajectory.py", ["--step", "2"], "trajectory.png"),
        ("minimap.py", [], "output_test.mp4"),
    ],
)
def test_examples_run(output_dir, tmp_path, script, args, artifact):
    out = tmp_path / artifact
    env = dict(os.environ, JAX_PLATFORMS="cpu", MPLBACKEND="Agg")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script),
         "--input_dir", str(output_dir), "--output", str(out), *args],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists() and out.stat().st_size > 0


def test_empty_detections_robust(scene):
    """No detections at all: the pipeline must complete and produce an
    empty table without crashing (reference would too via df.empty)."""

    def empty_detector(frames_batch):
        b = len(frames_batch)
        return (
            np.zeros((b, 128, 4), np.float32),
            np.zeros((b, 128), np.float32),
            np.zeros((b, 128), np.int32),
            np.zeros((b, 128), bool),
        )

    model = CoordinateModel(
        keypoint_fn=oracle_keypoint_fn(scene), detector_fn=empty_detector, verbose_init=False
    )
    coords = model.get_coordinates(scene.frames[:6], scene.fps, verbose=False)
    assert len(coords) == 6
    assert coords[0]["Coordinates"] == {}
    proc = Processor(coords, list(scene.frames[:6]), scene.fps)
    df, mapping = proc.process_data()
    assert df.empty and mapping == {}
    assert proc.format_data(df).empty  # the eager column lookups must not KeyError


def test_main_cli_help():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "main.py"), "--help"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=240,
    )
    assert r.returncode == 0
    for flag in ("--video_path", "--fps", "--num_homography", "--calibration",
                 "--reid_weights", "--profile"):
        assert flag in r.stdout


def test_reid_misconfiguration_raises(tmp_path):
    """Weights that the tracker config would silently drop must raise
    loudly, and a checkpoint whose feature dim disagrees with
    TrackerConfig.embed_dim must fail at load, not as a shape error
    inside the scan."""
    import dataclasses

    import jax
    import pytest

    from eagle_tpu.config import PipelineConfig
    from eagle_tpu.models import osnet
    from eagle_tpu.models.checkpoint import save_params

    params = osnet.init_params(jax.random.key(0), "x0_25", feature_dim=32)
    path = str(tmp_path / "osnet32.msgpack")
    save_params(params, path)

    # EXPLICIT use_appearance=False wins over supplied weights -> the
    # weights would be silently ignored, so it must raise
    base_off = PipelineConfig()
    cfg_off = base_off.replace(
        tracker=dataclasses.replace(base_off.tracker, use_appearance=False)
    )
    with pytest.raises(ValueError, match="use_appearance"):
        CoordinateModel(config=cfg_off, reid_checkpoint=path, verbose_init=False)

    # default config is "auto": weights present -> appearance on; the
    # 32-d checkpoint then fails the embed_dim (512 default) gate loudly
    with pytest.raises(ValueError, match="feature dim 32"):
        CoordinateModel(reid_checkpoint=path, verbose_init=False)

    # appearance on, but embed_dim (512 default) != checkpoint dim (32)
    base = PipelineConfig()
    cfg = base.replace(
        tracker=dataclasses.replace(base.tracker, use_appearance=True, embedder="osnet")
    )
    with pytest.raises(ValueError, match="feature dim 32"):
        CoordinateModel(config=cfg, reid_checkpoint=path, verbose_init=False)


def test_reid_auto_enable_follows_weights(tmp_path):
    """The config's use_appearance default is "auto" (None): appearance
    turns on exactly when ReID weights are supplied (the reference's
    weights-present-implies-ReID construction, coordinate_model.py:68-72)
    and stays off otherwise; explicit False always wins
    (docs/parity.md deviation #10)."""
    import dataclasses

    import jax

    from eagle_tpu.config import PipelineConfig
    from eagle_tpu.models import osnet
    from eagle_tpu.models.checkpoint import save_params

    # no weights -> appearance resolves OFF (deviation #10 default)
    m_off = CoordinateModel(verbose_init=False)
    assert m_off.config.tracker.use_appearance is False
    assert m_off._reid_params is None

    # weights via checkpoint -> appearance resolves ON, embedder osnet
    params = osnet.init_params(jax.random.key(0), "x0_25", feature_dim=512)
    path = str(tmp_path / "osnet512.msgpack")
    save_params(params, path)
    m_on = CoordinateModel(reid_checkpoint=path, verbose_init=False)
    assert m_on.config.tracker.use_appearance is True
    assert m_on._reid_params is not None

    # weights via params object -> same auto-enable
    m_on2 = CoordinateModel(reid_params=params, verbose_init=False)
    assert m_on2.config.tracker.use_appearance is True

    # explicit False + no weights: stays off, no error
    base = PipelineConfig()
    cfg_off = base.replace(tracker=dataclasses.replace(base.tracker, use_appearance=False))
    assert CoordinateModel(config=cfg_off, verbose_init=False).config.tracker.use_appearance is False


def test_reid_checkpoint_msgpack_load(tmp_path):
    """The --reid_weights CLI path: a converted OSNet .msgpack checkpoint
    loads into CoordinateModel's appearance embedder (the reference's
    osnet_x0_25_msmt17.pt role, coordinate_model.py:68-72)."""
    import dataclasses

    import jax

    from eagle_tpu.config import PipelineConfig
    from eagle_tpu.models import osnet
    from eagle_tpu.models.checkpoint import save_params

    params = osnet.init_params(jax.random.key(0), "x0_25", feature_dim=32)
    path = str(tmp_path / "osnet.msgpack")
    save_params(params, path)

    base = PipelineConfig()
    cfg = base.replace(
        tracker=dataclasses.replace(
            base.tracker, use_appearance=True, embedder="osnet", embed_dim=32
        )
    )
    model = CoordinateModel(config=cfg, reid_checkpoint=path, verbose_init=False)
    assert model._reid_params is not None
    chex = jax.tree.leaves(model._reid_params)
    orig = jax.tree.leaves(params)
    assert len(chex) == len(orig)
    for a, b in zip(chex, orig):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
