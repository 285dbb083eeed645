"""Video IO round-trip and synthetic-scene ground-truth consistency."""

import numpy as np

from eagle_tpu.io import read_video, read_video_array, write_video
from eagle_tpu.utils.synthetic import make_scene, project


def test_video_roundtrip(tmp_path, scene):
    path = str(tmp_path / "clip.mp4")
    write_video(scene.frames, path, fps=scene.fps)
    frames, fps = read_video(path, fps=scene.fps)
    assert fps == scene.fps
    assert len(frames) == len(scene.frames)
    assert frames[0].shape == scene.frames[0].shape
    # lossy codec: just require the content to be broadly similar
    diff = np.abs(frames[0].astype(int) - scene.frames[0].astype(int)).mean()
    assert diff < 12.0


def test_video_fps_subsampling(tmp_path, scene):
    path = str(tmp_path / "clip.mp4")
    write_video(scene.frames, path, fps=24)
    arr, fps = read_video_array(path, fps=12)
    assert fps == 12
    assert len(arr) == (len(scene.frames) + 1) // 2


def test_scene_homography_consistency(scene):
    # feet image positions must equal the projection of world positions
    proj = project(scene.H_world_to_image, scene.player_world[0])
    np.testing.assert_allclose(proj, scene.player_feet_image[0], atol=1e-6)
    # inverse homography recovers world coords
    back = project(scene.H_image_to_world, scene.player_feet_image[0])
    np.testing.assert_allclose(back, scene.player_world[0], atol=1e-6)


def test_scene_determinism():
    a = make_scene(num_frames=3, width=320, height=180, num_players=4, seed=7)
    b = make_scene(num_frames=3, width=320, height=180, num_players=4, seed=7)
    assert (a.frames == b.frames).all()
