"""Time-sharded scan + ppermute halo exchange on the 8-device CPU mesh:
shard-boundary frames see the true previous frame, and when segment
boundaries align with the keypoint/homography cadences the two-pass
warm-start scan reproduces the sequential scan exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eagle_tpu.config import DEFAULT_CONFIG, MeshConfig
from eagle_tpu.parallel.mesh import make_mesh, shard_batch
from eagle_tpu.parallel.timeshard import halo_exchange_prev, timesharded_keypoint_scan
from eagle_tpu.pipeline import temporal
from eagle_tpu.pipeline.temporal import scan_chunk
from eagle_tpu.utils.synthetic import make_scene

from .oracles import oracle_keypoint_fn


def test_halo_exchange_prev():
    mesh = make_mesh(MeshConfig())
    frames = np.arange(16, dtype=np.uint8)[:, None, None, None] * np.ones(
        (16, 4, 4, 3), np.uint8
    )
    prev = np.asarray(halo_exchange_prev(shard_batch(frames, mesh), mesh))
    # prev[t] == frames[t-1], frame 0 repeats itself
    np.testing.assert_array_equal(prev[0], frames[0])
    for t in range(1, 16):
        np.testing.assert_array_equal(prev[t], frames[t - 1])


def _build_xs(scene, n, kp_interval, h_interval, mem_kp, mem_valid):
    frames = jnp.asarray(scene.frames[:n])
    prev_idx = np.maximum(np.arange(n) - 1, 0)
    D = 8
    return temporal.FrameInputs(
        frame_bgr=frames,
        prev_frame_bgr=frames[jnp.asarray(prev_idx)],
        model_kp=jnp.asarray(mem_kp),
        model_kp_valid=jnp.asarray(mem_valid),
        is_kp_frame=jnp.asarray(np.arange(n) % kp_interval == 0),
        is_h_frame=jnp.asarray(np.arange(n) % h_interval == 0),
        det_boxes=jnp.zeros((n, D, 4)),
        det_conf=jnp.zeros((n, D)),
        det_cls=jnp.zeros((n, D), jnp.int32),
        det_valid=jnp.zeros((n, D), bool),
        det_embed=jnp.zeros((n, D, 1)),
        t=jnp.arange(n, dtype=jnp.int32),
    )


def test_timesharded_scan_matches_sequential():
    n = 32  # 8 shards x 4 frames; cadences align with segment boundaries
    kp_interval, h_interval = 2, 4
    scene = make_scene(num_frames=n, width=640, height=360, num_players=0, fps=8, seed=4)

    kp_fn = oracle_keypoint_fn(scene)
    mem_kp = np.zeros((n, 57, 3), np.float32)
    mem_valid = np.zeros((n, 57), bool)
    sampled = list(range(0, n, kp_interval))
    kp, valid = kp_fn(scene.frames[sampled])
    mem_kp[sampled] = kp
    mem_valid[sampled] = valid

    cfg = DEFAULT_CONFIG.replace(chunk_frames=n)
    key = jax.random.key(0)
    xs = _build_xs(scene, n, kp_interval, h_interval, mem_kp, mem_valid)

    # sequential reference
    carry = temporal.init_carry(cfg)
    _, seq = scan_chunk(carry, xs, cfg, key)

    # time-sharded with halo exchange
    mesh = make_mesh(MeshConfig())
    xs_sh = xs._replace(
        frame_bgr=shard_batch(np.asarray(xs.frame_bgr), mesh),
        prev_frame_bgr=halo_exchange_prev(shard_batch(np.asarray(xs.frame_bgr), mesh), mesh),
    )
    kp_xy, kp_valid, H, H_ok = timesharded_keypoint_scan(mesh, cfg, key, xs_sh)

    np.testing.assert_array_equal(np.asarray(kp_valid), np.asarray(seq.kp_valid))
    np.testing.assert_allclose(np.asarray(kp_xy), np.asarray(seq.kp_xy), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(H_ok), np.asarray(seq.H_ok))
    ok = np.asarray(seq.H_ok)
    np.testing.assert_allclose(np.asarray(H)[ok], np.asarray(seq.H)[ok], rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seg_len", [5, 6, 7])
def test_timesharded_scan_exact_off_cadence(seg_len):
    """Segment boundaries NOT aligned to the keypoint/homography cadences:
    the two-pass warm start is still exact as long as every segment
    contains a full refresh (a model-keypoint frame with >=4 points
    followed by a successful homography frame) -- the cold-start transient
    cannot leak past the refresh, so every pass-1 final carry equals the
    sequential carry."""
    n = 8 * seg_len
    kp_interval, h_interval = 2, 4  # seg_len 5/6/7 never aligns with 4
    scene = make_scene(num_frames=n, width=640, height=360, num_players=0, fps=8, seed=4)

    kp_fn = oracle_keypoint_fn(scene)
    mem_kp = np.zeros((n, 57, 3), np.float32)
    mem_valid = np.zeros((n, 57), bool)
    sampled = list(range(0, n, kp_interval))
    kp, valid = kp_fn(scene.frames[sampled])
    mem_kp[sampled] = kp
    mem_valid[sampled] = valid

    cfg = DEFAULT_CONFIG.replace(chunk_frames=n)
    key = jax.random.key(0)
    xs = _build_xs(scene, n, kp_interval, h_interval, mem_kp, mem_valid)

    carry = temporal.init_carry(cfg)
    _, seq = scan_chunk(carry, xs, cfg, key)

    mesh = make_mesh(MeshConfig())
    xs_sh = xs._replace(
        frame_bgr=shard_batch(np.asarray(xs.frame_bgr), mesh),
        prev_frame_bgr=halo_exchange_prev(shard_batch(np.asarray(xs.frame_bgr), mesh), mesh),
    )
    kp_xy, kp_valid, H, H_ok = timesharded_keypoint_scan(mesh, cfg, key, xs_sh)

    np.testing.assert_array_equal(np.asarray(kp_valid), np.asarray(seq.kp_valid))
    np.testing.assert_allclose(np.asarray(kp_xy), np.asarray(seq.kp_xy), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(H_ok), np.asarray(seq.H_ok))
    ok = np.asarray(seq.H_ok)
    np.testing.assert_allclose(np.asarray(H)[ok], np.asarray(seq.H)[ok], rtol=1e-4, atol=1e-4)


def test_timesharded_scan_envelope_without_refresh():
    """Segments shorter than the keypoint cadence cannot refresh, so the
    warm start only guarantees exactness for the first ``passes`` segments
    (segment 0 is cold==sequential; each pass promotes one more segment).
    This pins the documented envelope."""
    n = 40  # 8 segments x 5 frames, kp cadence 16 > segment length
    kp_interval, h_interval = 16, 16
    scene = make_scene(num_frames=n, width=640, height=360, num_players=0, fps=8, seed=6)

    kp_fn = oracle_keypoint_fn(scene)
    mem_kp = np.zeros((n, 57, 3), np.float32)
    mem_valid = np.zeros((n, 57), bool)
    sampled = list(range(0, n, kp_interval))
    kp, valid = kp_fn(scene.frames[sampled])
    mem_kp[sampled] = kp
    mem_valid[sampled] = valid

    cfg = DEFAULT_CONFIG.replace(chunk_frames=n)
    key = jax.random.key(0)
    xs = _build_xs(scene, n, kp_interval, h_interval, mem_kp, mem_valid)
    carry = temporal.init_carry(cfg)
    _, seq = scan_chunk(carry, xs, cfg, key)

    mesh = make_mesh(MeshConfig())
    xs_sh = xs._replace(
        frame_bgr=shard_batch(np.asarray(xs.frame_bgr), mesh),
        prev_frame_bgr=halo_exchange_prev(shard_batch(np.asarray(xs.frame_bgr), mesh), mesh),
    )
    for passes in (2, 3):
        kp_xy, kp_valid, H, H_ok = timesharded_keypoint_scan(
            mesh, cfg, key, xs_sh, passes=passes
        )
        exact_until = passes * 5  # segments 0..passes-1
        np.testing.assert_array_equal(
            np.asarray(kp_valid)[:exact_until], np.asarray(seq.kp_valid)[:exact_until]
        )
        np.testing.assert_allclose(
            np.asarray(kp_xy)[:exact_until], np.asarray(seq.kp_xy)[:exact_until], atol=1e-3
        )


# ---------------------------------------------------------------------------
# time-sharded ball selector
# ---------------------------------------------------------------------------


def _ball_stream(n=160, seed=0, none_rate=0.08, decoy=True):
    rng = np.random.default_rng(seed)
    pos = np.stack(
        [640 + 400 * np.sin(np.arange(n) / 17.0), 360 + 200 * np.cos(np.arange(n) / 23.0)],
        axis=1,
    )
    stream = []
    for t in range(n):
        if rng.uniform() < none_rate and t > 2:
            stream.append(None)
            continue
        cands = [tuple(pos[t] + rng.normal(0, 1.5, 2))]
        if decoy and rng.uniform() < 0.5:
            cands.append(tuple(pos[t] + rng.uniform(40, 120, 2)))
        stream.append(cands)
    return stream


@pytest.mark.parametrize("segments,passes", [(4, 2), (8, 2), (8, 3)])
@pytest.mark.parametrize("filt", [False, True])
def test_segmented_ball_selection_converges(segments, passes, filt):
    from eagle_tpu.pipeline.processor import Processor

    stream = _ball_stream(seed=segments + 10 * passes)
    proc = Processor({0: {"Coordinates": {}, "Boundaries": [None] * 4, "Keypoints": {}}},
                     np.zeros((1, 8, 8, 3), np.uint8), 8)
    seq = proc.parse_ball_detections_with_kalman(stream, filter=filt, threshold=100)
    seg = proc.parse_ball_detections_segmented(
        stream, segments=segments, filter=filt, threshold=100, passes=passes
    )
    assert len(seq) == len(seg)
    n = len(stream)
    bounds = [round(k * n / segments) for k in range(segments + 1)]
    # exact through the first `passes` segments
    exact_until = bounds[passes]
    assert seq[:exact_until] == seg[:exact_until]
    # beyond: the KF forgets the cold start quickly -- require agreement in
    # the second half of every segment and overall near-total agreement
    agree = [a == b for a, b in zip(seq, seg)]
    assert np.mean(agree) > 0.9, np.mean(agree)
    if not filt:
        # without the jump filter the selector's memory is the KF + the
        # previous pick: the cold-start transient dies within half a
        # segment.  (The jump filter adds prev-index hysteresis whose
        # influence can persist longer -- documented envelope.)
        for k in range(passes, segments):
            s0, s1 = bounds[k], bounds[k + 1]
            half = (s0 + s1) // 2
            assert all(agree[half:s1]), f"segment {k} tail disagrees"


def test_segmented_ball_selection_never_leaks_raw_candidates():
    """A segment that can neither init its own KF nor inherit a warm carry
    must NOT ship raw candidate lists: the selector falls back to the
    exact sequential pass (same (x, y)|None contract)."""
    from eagle_tpu.pipeline.processor import Processor

    # ball visible only in the first quarter: segments 2-3 have no
    # candidates at all, segment 1 has one (not enough to init)
    stream = _ball_stream(n=40, seed=3, none_rate=0.0)
    for t in range(12, 40):
        stream[t] = None
    stream[20] = [(125.0, 100.0), (500.0, 500.0)]

    proc = Processor({0: {"Coordinates": {}, "Boundaries": [None] * 4, "Keypoints": {}}},
                     np.zeros((1, 8, 8, 3), np.uint8), 8)
    seq = proc.parse_ball_detections_with_kalman(stream, filter=False, threshold=100)
    seg = proc.parse_ball_detections_segmented(
        stream, segments=4, filter=False, threshold=100, passes=2
    )
    assert seq == seg
    for v in seg:
        assert v is None or (isinstance(v, tuple) and len(v) == 2)
