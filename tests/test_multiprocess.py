"""REAL multi-process mesh execution (VERDICT r3 #3).

The hierarchical ``(dcn, data)`` mesh (`MeshConfig(hosts=N)`) was
previously verified only on a virtual single-process mesh.  This test
runs it across genuine process boundaries: 2 local CPU processes x 4
virtual devices each, joined by ``jax.distributed.initialize``, running
the frame-sharded keypoint step and the clip-parallel temporal scan with
process-local shards -- and the gathered result must equal the
single-process 8-device run bit for bit.

This exercises the device-grid plumbing, the process-grouped mesh rows
(data axis never crossing DCN), `make_array_from_callback` shard
construction, and cross-process allgather -- the strongest multi-host
evidence available without real multi-host hardware.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_mesh_matches_single_process(tmp_path):
    port = _free_port()
    out = tmp_path / "mp_out.npz"
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                worker,
                "--pid",
                str(pid),
                "--nprocs",
                "2",
                "--port",
                str(port),
                "--out",
                str(out),
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    assert out.exists(), f"worker 0 wrote no output:\n{logs[0][-3000:]}"
    got = np.load(out)

    # ---- single-process expectation on this process's own 8-device mesh
    import jax
    import jax.numpy as jnp

    from eagle_tpu.config import DEFAULT_CONFIG, MeshConfig
    from eagle_tpu.models import hrnet
    from eagle_tpu.parallel.mesh import make_mesh, shard_batch
    from eagle_tpu.parallel.pipeline import multi_clip_scan, sharded_keypoint_step
    from eagle_tpu.pipeline import temporal

    cfg = DEFAULT_CONFIG.replace(
        keypoint=DEFAULT_CONFIG.keypoint.__class__(input_hw=(64, 96), use_bf16=False),
        detector=DEFAULT_CONFIG.detector.__class__(max_detections=8),
    )
    params = hrnet.init_params(jax.random.key(0))
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, (16, 64, 96, 3), dtype=np.uint8)
    mesh = make_mesh(MeshConfig())
    kstep = sharded_keypoint_step(mesh, params, cfg, (64, 96))
    kp, kp_valid = kstep(shard_batch(frames, mesh))
    np.testing.assert_array_equal(got["kp"], np.asarray(kp))
    np.testing.assert_array_equal(got["kp_valid"], np.asarray(kp_valid))

    C, L, hw = 8, 2, (32, 48)
    rng = np.random.default_rng(3)
    clips = rng.integers(0, 255, (C, L, *hw, 3), dtype=np.uint8)
    kp_in = rng.uniform(0, 32, (C, L, 57, 3)).astype(np.float32)
    xs = temporal.FrameInputs(
        frame_bgr=jnp.asarray(clips),
        prev_frame_bgr=jnp.asarray(clips[:, [0, 0]]),
        model_kp=jnp.asarray(kp_in),
        model_kp_valid=jnp.asarray(rng.random((C, L, 57)) > 0.3),
        is_kp_frame=jnp.ones((C, L), bool),
        is_h_frame=jnp.ones((C, L), bool),
        det_boxes=jnp.asarray(rng.uniform(0, 32, (C, L, 8, 4)).astype(np.float32)),
        det_conf=jnp.asarray(rng.uniform(0, 1, (C, L, 8)).astype(np.float32)),
        det_cls=jnp.zeros((C, L, 8), jnp.int32),
        det_valid=jnp.asarray(rng.random((C, L, 8)) > 0.4),
        det_embed=jnp.zeros((C, L, 8, 1), jnp.float32),
        t=jnp.tile(jnp.arange(L, dtype=jnp.int32), (C, 1)),
    )
    carries = jax.vmap(lambda _: temporal.init_carry(cfg))(jnp.arange(C))
    scan = multi_clip_scan(mesh, cfg, jax.random.key(7))
    _, outs = scan(carries, xs)
    np.testing.assert_array_equal(got["scan_kp"], np.asarray(outs.kp_xy))
    np.testing.assert_array_equal(got["scan_tid"], np.asarray(outs.track_id))
    np.testing.assert_array_equal(got["scan_h"], np.asarray(outs.H))
