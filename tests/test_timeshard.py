"""Time-sharded scan + ppermute halo exchange on the 8-device CPU mesh:
shard-boundary frames see the true previous frame, and when segment
boundaries align with the keypoint/homography cadences the two-pass
warm-start scan reproduces the sequential scan exactly."""

import jax
import jax.numpy as jnp
import numpy as np

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
