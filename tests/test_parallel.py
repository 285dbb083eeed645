"""Multi-device sharding tests on the 8-device virtual CPU mesh: the
driver's dryrun path, frame sharding, and single- vs multi-device
numerical equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from eagle_tpu.config import MeshConfig
from eagle_tpu.parallel.mesh import batch_sharding, make_mesh, pad_to_multiple, shard_batch


def test_mesh_and_padding():
    mesh = make_mesh(MeshConfig())
    assert mesh.devices.size == 8
    x = np.arange(10 * 3).reshape(10, 3).astype(np.float32)
    padded, n = pad_to_multiple(x, 8)
    assert padded.shape == (16, 3) and n == 10
    y = shard_batch(padded, mesh)
    assert y.sharding.is_equivalent_to(batch_sharding(mesh, 2), 2)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    kp, valid = out
    assert kp.shape == (1, 57, 3)


def test_sharded_matches_single_device():
    """The frame-sharded keypoint step must produce identical results to
    the unsharded path."""
    from eagle_tpu.config import DEFAULT_CONFIG
    from eagle_tpu.models import hrnet
    from eagle_tpu.ops.heatmap import decode_heatmaps
    from eagle_tpu.ops.preprocess import preprocess_keypoint
    from eagle_tpu.parallel.pipeline import sharded_keypoint_step

    cfg = DEFAULT_CONFIG.replace(
        keypoint=DEFAULT_CONFIG.keypoint.__class__(input_hw=(64, 96), use_bf16=False)
    )
    mesh = make_mesh(MeshConfig())
    params = hrnet.init_params(jax.random.key(0))
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (8, 64, 96, 3), dtype=np.uint8)

    step = sharded_keypoint_step(mesh, params, cfg, (64, 96))
    kp_sharded, valid_sharded = step(shard_batch(frames, mesh))

    pre = preprocess_keypoint(jnp.asarray(frames), out_hw=(64, 96))
    hm = hrnet.apply(params, pre)
    kp_single, valid_single = decode_heatmaps(hm, 0.3, (64, 96))

    np.testing.assert_allclose(np.asarray(kp_sharded), np.asarray(kp_single), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(valid_sharded), np.asarray(valid_single))


def test_hierarchical_mesh_matches_flat():
    """Multi-host layout: a (2 hosts x 4 chips) hierarchical mesh must
    shard the batch host-major over both axes and produce results
    identical to the flat 8-device mesh (pure data parallelism -- nothing
    crosses the dcn axis in the steady state)."""
    from eagle_tpu.config import DEFAULT_CONFIG
    from eagle_tpu.models import hrnet
    from eagle_tpu.parallel.pipeline import sharded_keypoint_step

    cfg = DEFAULT_CONFIG.replace(
        keypoint=DEFAULT_CONFIG.keypoint.__class__(input_hw=(64, 96), use_bf16=False)
    )
    mesh2d = make_mesh(MeshConfig(hosts=2))
    assert mesh2d.axis_names == ("dcn", "data") and mesh2d.devices.shape == (2, 4)
    flat = make_mesh(MeshConfig())

    params = hrnet.init_params(jax.random.key(0))
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, (16, 64, 96, 3), dtype=np.uint8)

    # host-major batch layout: shard i of 8 owns frames [2i, 2i+2)
    sharded = shard_batch(frames, mesh2d)
    assert [s.index[0] for s in sorted(sharded.addressable_shards, key=lambda s: s.device.id)] == [
        slice(2 * i, 2 * i + 2, None) for i in range(8)
    ]

    kp2, v2 = sharded_keypoint_step(mesh2d, params, cfg, (64, 96))(sharded)
    kp1, v1 = sharded_keypoint_step(flat, params, cfg, (64, 96))(shard_batch(frames, flat))
    np.testing.assert_allclose(np.asarray(kp2), np.asarray(kp1), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v1))


def test_hierarchical_mesh_clip_scan():
    """The clip-parallel temporal scan on the (dcn, data) mesh: 8 clips
    shard over all 8 devices and the scan executes without any cross-host
    collective (numerics equal to the flat mesh)."""
    from eagle_tpu.config import DEFAULT_CONFIG
    from eagle_tpu.parallel.pipeline import multi_clip_scan
    from eagle_tpu.pipeline import temporal

    cfg = DEFAULT_CONFIG.replace(
        detector=DEFAULT_CONFIG.detector.__class__(max_detections=8),
    )
    C, L, hw = 8, 2, (32, 48)
    rng = np.random.default_rng(3)
    clips = rng.integers(0, 255, (C, L, *hw, 3), dtype=np.uint8)
    kp = rng.uniform(0, 32, (C, L, 57, 3)).astype(np.float32)
    xs = temporal.FrameInputs(
        frame_bgr=jnp.asarray(clips),
        prev_frame_bgr=jnp.asarray(clips[:, [0, 0]]),
        model_kp=jnp.asarray(kp),
        model_kp_valid=jnp.asarray(rng.random((C, L, 57)) > 0.3),
        is_kp_frame=jnp.ones((C, L), bool),
        is_h_frame=jnp.ones((C, L), bool),
        det_boxes=jnp.asarray(rng.uniform(0, 30, (C, L, 8, 4)).astype(np.float32)),
        det_conf=jnp.asarray(rng.random((C, L, 8)).astype(np.float32)),
        det_cls=jnp.zeros((C, L, 8), jnp.int32),
        det_valid=jnp.asarray(rng.random((C, L, 8)) > 0.5),
        det_embed=jnp.zeros((C, L, 8, 1), jnp.float32),
        t=jnp.tile(jnp.arange(L, dtype=jnp.int32), (C, 1)),
    )
    carries = jax.vmap(lambda _: temporal.init_carry(cfg))(jnp.arange(C))

    outs = {}
    for name, mesh in (("flat", make_mesh(MeshConfig())), ("2d", make_mesh(MeshConfig(hosts=2)))):
        scan = multi_clip_scan(mesh, cfg, jax.random.key(5))
        _, out = scan(carries, xs)
        outs[name] = jax.tree.map(np.asarray, out)
    for a, b in zip(jax.tree.leaves(outs["flat"]), jax.tree.leaves(outs["2d"])):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_timeshard_requires_flat_mesh():
    """The warm-start ppermute ring must refuse a hierarchical mesh (it
    would hop DCN); the caller builds a per-host 1-D submesh instead."""
    import pytest

    from eagle_tpu.parallel.timeshard import halo_exchange_prev

    mesh2d = make_mesh(MeshConfig(hosts=2))
    frames = jnp.zeros((8, 4, 4, 3), jnp.uint8)
    with pytest.raises(AssertionError, match="1-D"):
        halo_exchange_prev(frames, mesh2d)
