"""Bounded-memory streaming: stream_coordinates must reproduce the
one-shot get_coordinates results exactly (carry + previous-frame handoff
across blocks), and the streaming video IO must match the load-everything
readers frame for frame."""

import os

import numpy as np
import pytest

from eagle_tpu.config import DEFAULT_CONFIG
from eagle_tpu.io.video import (
    VideoFrameSource,
    iter_video,
    read_video_array,
    write_video,
)
from eagle_tpu.pipeline.coordinate_model import CoordinateModel
from eagle_tpu.utils.synthetic import make_scene

from .oracles import oracle_detector_fn, oracle_keypoint_fn


def _norm(o):
    """Recursively normalize numpy leaves so == is a deep exact compare."""
    if isinstance(o, dict):
        return {k: _norm(v) for k, v in o.items()}
    if isinstance(o, (list, tuple)):
        return [_norm(v) for v in o]
    if isinstance(o, np.ndarray):
        return o.tolist()
    if isinstance(o, np.generic):
        return o.item()
    return o


def _models(scene, det_fn=None):
    return dict(
        keypoint_fn=oracle_keypoint_fn(scene),
        detector_fn=det_fn or oracle_detector_fn(scene),
        verbose_init=False,
    )


def test_stream_matches_oneshot_exactly():
    """Ragged segments (10+23+15 frames) through stream_coordinates must
    equal one get_coordinates call on the concatenation, bit for bit:
    global keys/Time, keypoint cadence on the global index, tracker
    identities carried across block boundaries."""
    scene = make_scene(num_frames=48, width=640, height=360, num_players=4, fps=8, seed=7)
    cfg = DEFAULT_CONFIG.replace(chunk_frames=16)

    one = CoordinateModel(config=cfg, **_models(scene)).get_coordinates(
        scene.frames, 8, num_homography=1, num_keypoint_detection=2, verbose=False
    )

    for prefetch in (False, True):
        segments = [scene.frames[:10], scene.frames[10:33], scene.frames[33:]]
        streamed = {}
        blocks = list(
            CoordinateModel(config=cfg, **_models(scene)).stream_coordinates(
                segments, 8, num_homography=1, num_keypoint_detection=2,
                prefetch=prefetch,
            )
        )
        # 10 -> buffered; 33 -> 32 processed + 1 held; 16 -> processed
        assert [len(b) for b in blocks] == [32, 16]
        for b in blocks:
            streamed.update(b)

        assert set(streamed) == set(one) == set(range(48))
        assert _norm(streamed) == _norm(one)


def test_stream_with_osnet_appearance_matches_oneshot():
    """Appearance association (OSNet embeddings computed per piece in the
    embed step) must stream bit-identically to one-shot: embeddings are
    per-frame detector features, so block boundaries cannot change the
    association the tracker carry sees."""
    from eagle_tpu.config import DetectorConfig, TrackerConfig

    scene = make_scene(num_frames=24, width=480, height=270, num_players=5, fps=8, seed=9)
    cfg = DEFAULT_CONFIG.replace(
        chunk_frames=16,
        # f32: the CPU backend compiles bf16 convs ~6x slower
        detector=DetectorConfig(use_bf16=False),
        tracker=TrackerConfig(
            max_tracks=16,
            use_appearance=True,
            embedder="osnet",
            embed_dim=32,
            reid_slots=8,
            gmc="off",
        ),
    )
    one = CoordinateModel(config=cfg, **_models(scene)).get_coordinates(
        scene.frames, 8, num_homography=1, num_keypoint_detection=2, verbose=False
    )
    segments = [scene.frames[:9], scene.frames[9:]]
    streamed = {}
    for b in CoordinateModel(config=cfg, **_models(scene)).stream_coordinates(
        segments, 8, num_homography=1, num_keypoint_detection=2
    ):
        streamed.update(b)
    assert set(streamed) == set(one) == set(range(24))
    assert _norm(streamed) == _norm(one)


def test_stream_profile_accumulates_stages():
    """stream_coordinates(profile=StageTimer()) accumulates per-stage
    wall clock across blocks (the main.py --profile plumbing)."""
    from eagle_tpu.utils.profiling import StageTimer

    scene = make_scene(num_frames=32, width=480, height=270, num_players=4, fps=8, seed=11)
    cfg = DEFAULT_CONFIG.replace(chunk_frames=16)
    timer = StageTimer()
    for _ in CoordinateModel(config=cfg, **_models(scene)).stream_coordinates(
        [scene.frames[:16], scene.frames[16:]], 8,
        num_homography=1, num_keypoint_detection=2, profile=timer, prefetch=False,
    ):
        pass
    s = timer.summary()
    assert {"scan", "assembly"} <= set(s), s.keys()
    assert all(v["total_s"] >= 0 and v["calls"] >= 1 for v in s.values())
    assert s["scan"]["calls"] >= 2  # accumulated across both blocks


def test_stream_final_short_block():
    """A stream whose total is not a chunk multiple pads only the FINAL
    block (no more carry consumers), still matching one-shot exactly."""
    scene = make_scene(num_frames=40, width=640, height=360, num_players=3, fps=8, seed=9)
    cfg = DEFAULT_CONFIG.replace(chunk_frames=16)

    one = CoordinateModel(config=cfg, **_models(scene)).get_coordinates(
        scene.frames, 8, num_homography=1, num_keypoint_detection=2, verbose=False
    )
    streamed = {}
    for b in CoordinateModel(config=cfg, **_models(scene)).stream_coordinates(
        [scene.frames[i : i + 16] for i in range(0, 40, 16)],
        8,
        num_homography=1,
        num_keypoint_detection=2,
    ):
        streamed.update(b)
    assert set(streamed) == set(range(40))
    assert _norm(streamed) == _norm(one)


def test_stream_on_demand_recovery_matches_oneshot():
    """Flow collapse entirely inside a later block: the on-demand keypoint
    fallback fires within that block's call and the streamed results still
    equal the one-shot run."""
    base = make_scene(num_frames=32, width=640, height=360, num_players=0, fps=8, seed=3)
    frames = base.frames.copy()
    frames[20:] = 127  # featureless: LK gradient singular, flow collapses

    def no_dets(batch):
        b = len(batch)
        return (
            np.zeros((b, 128, 4), np.float32),
            np.zeros((b, 128), np.float32),
            np.zeros((b, 128), np.int32),
            np.zeros((b, 128), bool),
        )

    cfg = DEFAULT_CONFIG.replace(chunk_frames=16)
    one = CoordinateModel(config=cfg, **_models(base, no_dets)).get_coordinates(
        frames, 8, num_homography=1, num_keypoint_detection=1, verbose=False
    )

    calls = [0]
    inner = oracle_keypoint_fn(base)

    def counting_kp(batch):
        calls[0] += 1
        return inner(batch)

    model = CoordinateModel(
        config=cfg, keypoint_fn=counting_kp, detector_fn=no_dets, verbose_init=False
    )
    streamed = {}
    for b in model.stream_coordinates(
        [frames[:16], frames[16:]], 8, num_homography=1, num_keypoint_detection=1
    ):
        streamed.update(b)

    assert calls[0] >= 3, "cadence batches + an on-demand pass in block 2"
    assert len(streamed[21]["Keypoints"]) >= 4, "flagged frames recovered"
    assert _norm(streamed) == _norm(one)


def test_stream_single_short_stream():
    """A stream shorter than one chunk still produces output (final-block
    flush) identical to one-shot."""
    scene = make_scene(num_frames=6, width=640, height=360, num_players=2, fps=6, seed=5)
    one = CoordinateModel(**_models(scene)).get_coordinates(
        scene.frames, 6, num_homography=1, num_keypoint_detection=2, verbose=False
    )
    blocks = list(
        CoordinateModel(**_models(scene)).stream_coordinates(
            [scene.frames[:4], scene.frames[4:]], 6, num_homography=1, num_keypoint_detection=2
        )
    )
    assert len(blocks) == 1
    assert _norm(blocks[0]) == _norm(one)


# ---------------------------------------------------------------- video IO


@pytest.fixture(scope="module")
def small_video(tmp_path_factory):
    rng = np.random.default_rng(0)
    # smooth-ish content so the lossy mp4 encode is stable to decode twice
    base = rng.integers(60, 196, (1, 48, 64, 3), dtype=np.uint8)
    drift = (np.arange(20, dtype=np.uint8) * 3)[:, None, None, None]
    frames = np.clip(base + drift, 0, 255).astype(np.uint8)
    path = str(tmp_path_factory.mktemp("vid") / "clip.mp4")
    write_video(frames, path, fps=24)
    return path


def test_iter_video_matches_read_video_array(small_video):
    whole, _ = read_video_array(small_video, 24)
    parts = list(iter_video(small_video, 24, segment_frames=7))
    assert [len(p) for p in parts] == [7, 7, 6]
    np.testing.assert_array_equal(np.concatenate(parts), whole)


def test_iter_video_sampled(small_video):
    whole, _ = read_video_array(small_video, 12)  # skip=2 sampling
    parts = list(iter_video(small_video, 12, segment_frames=4))
    np.testing.assert_array_equal(np.concatenate(parts), whole)


def test_video_frame_source(small_video):
    whole, _ = read_video_array(small_video, 24)
    src = VideoFrameSource(small_video, 24)
    assert len(src) == len(whole)
    for i in [0, 3, 19, 5, 19, 18]:  # forward, backward jump, repeat
        np.testing.assert_array_equal(src[i], whole[i])
    np.testing.assert_array_equal(src[-1], whole[-1])
    with pytest.raises(IndexError):
        src[len(whole)]
    src.close()


def test_video_frame_source_sampled(small_video):
    whole, _ = read_video_array(small_video, 12)
    src = VideoFrameSource(small_video, 12)
    assert len(src) == len(whole)
    for i in range(len(whole)):
        np.testing.assert_array_equal(src[i], whole[i])
    src.close()


def test_processor_and_render_on_frame_source(tmp_path):
    """The streamed host path end to end: perception via
    stream_coordinates, then the Processor's team-assignment crops and the
    annotated render consuming a lazy VideoFrameSource instead of an
    in-RAM clip (main.py --segment_frames)."""
    from eagle_tpu.pipeline.processor import Processor
    from eagle_tpu.utils.render import render_annotated_frames

    scene = make_scene(num_frames=16, width=960, height=540, num_players=5, fps=16, seed=11)
    path = str(tmp_path / "clip.mp4")
    write_video(scene.frames, path, fps=16)
    decoded, _ = read_video_array(path, 16)  # oracles need the true count
    assert len(decoded) == 16

    model = CoordinateModel(**_models(scene))
    coords = {}
    for b in model.stream_coordinates(
        iter_video(path, 16, segment_frames=8), 16, num_homography=1, num_keypoint_detection=3
    ):
        coords.update(b)
    assert set(coords) == set(range(16))

    src = VideoFrameSource(path, 16)
    proc = Processor(coords, src, 16, filter_ball_detections=False)
    df, team_mapping = proc.process_data(smooth=False)
    assert len(df) > 0 and len(team_mapping) > 0
    out = str(tmp_path / "annotated.mp4")
    write_video(render_annotated_frames(df, src, coords, team_mapping), out, fps=16)
    assert os.path.getsize(out) > 1000
    src.close()


def test_write_video_iterable(tmp_path, small_video):
    whole, _ = read_video_array(small_video, 24)
    p = str(tmp_path / "copy.mp4")
    write_video(iter(list(whole)), p, fps=24)  # generator input
    again, _ = read_video_array(p, 24)
    assert again.shape == whole.shape
    with pytest.raises(ValueError):
        write_video(iter([]), str(tmp_path / "empty.mp4"), fps=24)
