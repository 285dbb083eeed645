"""Worker process for the real multi-process mesh test
(tests/test_multiprocess.py).  Each of the 2 processes owns 4 virtual CPU
devices; `jax.distributed.initialize` joins them into one 8-device
runtime, and the worker runs the sharded perception step + the
clip-parallel temporal scan on the hierarchical ``(dcn, data)`` mesh with
genuinely process-local shards.  Process 0 writes the gathered results.

Run (by the test):
    python tests/mp_worker.py --pid K --nprocs 2 --port P --out OUT.npz
"""

import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--out", type=str, required=True)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.nprocs,
        process_id=args.pid,
    )
    assert jax.process_count() == args.nprocs
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 4 * args.nprocs

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from eagle_tpu.config import DEFAULT_CONFIG, MeshConfig
    from eagle_tpu.models import hrnet
    from eagle_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
    from eagle_tpu.parallel.pipeline import multi_clip_scan, sharded_keypoint_step
    from eagle_tpu.pipeline import temporal

    mesh = make_mesh(MeshConfig(hosts=args.nprocs))
    assert mesh.devices.shape == (args.nprocs, 4)
    # each (dcn) row must be exactly one process's devices -- this is the
    # property that keeps the data axis off DCN on a real multi-host slice
    for r, row in enumerate(mesh.devices):
        owners = {d.process_index for d in row}
        assert len(owners) == 1, f"row {r} spans processes {owners}"

    def to_global(np_tree, sharded_leading=True):
        """Identical host-local numpy (same seed on every process) ->
        global jax.Arrays: leading axis sharded over the whole mesh."""

        def conv(x):
            x = np.asarray(x)
            sh = (
                batch_sharding(mesh, x.ndim)
                if sharded_leading and x.ndim > 0
                else replicated(mesh)
            )
            return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

        return jax.tree.map(conv, np_tree)

    # ---------------- inputs (same seed everywhere => identical globals)
    cfg = DEFAULT_CONFIG.replace(
        keypoint=DEFAULT_CONFIG.keypoint.__class__(input_hw=(64, 96), use_bf16=False),
        detector=DEFAULT_CONFIG.detector.__class__(max_detections=8),
    )
    params = hrnet.init_params(jax.random.key(0))
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, (16, 64, 96, 3), dtype=np.uint8)

    # ---------------- frame-sharded keypoint inference
    kstep = sharded_keypoint_step(mesh, params, cfg, (64, 96))
    kp, kp_valid = kstep(to_global(frames))
    kp_np = multihost_utils.process_allgather(kp, tiled=True)
    kv_np = multihost_utils.process_allgather(kp_valid, tiled=True)

    # ---------------- clip-parallel temporal scan (8 clips x 2 frames)
    C, L, hw = 8, 2, (32, 48)
    rng = np.random.default_rng(3)
    clips = rng.integers(0, 255, (C, L, *hw, 3), dtype=np.uint8)
    kp_in = rng.uniform(0, 32, (C, L, 57, 3)).astype(np.float32)
    xs = temporal.FrameInputs(
        frame_bgr=clips,
        prev_frame_bgr=clips[:, [0, 0]],
        model_kp=kp_in,
        model_kp_valid=rng.random((C, L, 57)) > 0.3,
        is_kp_frame=np.ones((C, L), bool),
        is_h_frame=np.ones((C, L), bool),
        det_boxes=rng.uniform(0, 32, (C, L, 8, 4)).astype(np.float32),
        det_conf=rng.uniform(0, 1, (C, L, 8)).astype(np.float32),
        det_cls=np.zeros((C, L, 8), np.int32),
        det_valid=rng.random((C, L, 8)) > 0.4,
        det_embed=np.zeros((C, L, 8, 1), np.float32),
        t=np.tile(np.arange(L, dtype=np.int32), (C, 1)),
    )
    carries_np = jax.tree.map(
        np.asarray, jax.vmap(lambda _: temporal.init_carry(cfg))(jnp.arange(C))
    )
    scan = multi_clip_scan(mesh, cfg, jax.random.key(7))
    new_carries, outs = scan(to_global(carries_np), to_global(xs._replace()))
    out_kp = multihost_utils.process_allgather(outs.kp_xy, tiled=True)
    out_tid = multihost_utils.process_allgather(outs.track_id, tiled=True)
    out_h = multihost_utils.process_allgather(outs.H, tiled=True)

    if args.pid == 0:
        np.savez(
            args.out,
            kp=kp_np,
            kp_valid=kv_np,
            scan_kp=out_kp,
            scan_tid=out_tid,
            scan_h=out_h,
        )
    multihost_utils.sync_global_devices("done")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
