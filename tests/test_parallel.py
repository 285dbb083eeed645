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
