"""Scaling-shape measurement on a virtual 8-device CPU mesh.

The extrapolation "single-chip fps x 8 = v5e-8 fps" is only defensible if
the sharded programs actually divide their compute by the mesh size and
insert (near-)zero collective traffic.  Real multi-chip hardware is not
reachable from this environment, but both properties are *compiler-level*
facts checkable on any backend: this script compiles the production
sharded steps on a virtual 8-device CPU mesh
(``xla_force_host_platform_device_count``) and reports

- ``det/kp_flops_per_device_ratio``: HLO-reported per-device FLOPs of the
  8-way frame-sharded step vs the single-device step at the same
  per-device batch (ideal 1.0 = GSPMD partitions the model instead of
  replicating work),
- ``*_collective_bytes``: bytes moved by all-gather / all-reduce /
  reduce-scatter / collective-permute in the sharded modules (ideal 0 for
  pure data parallelism; the temporal scan is clip-parallel and must also
  be collective-free),
- ``scan_cpu_work_scale``: process-CPU-seconds of the clip-parallel scan
  at C=8 clips on the 8-device mesh over C=1 on one device (ideal 8.0 on
  shared host cores; materially above 8 would mean the vmapped step does
  extra per-clip work, e.g. a lax.cond lowered to both-branches select).

The companion extrapolation model lives in bench.py (which runs this
script as a subprocess) and docs/architecture.md.

Run standalone:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python bench_scaling.py
"""

import json
import os
import sys
import time


def _collective_bytes(compiled) -> int:
    """Total bytes produced by collective ops in a compiled module's HLO
    (0 for a pure data-parallel program)."""
    import re

    total = 0
    for line in compiled.as_text().splitlines():
        m = re.search(
            r"=\s*(?:\([^)]*\)\s*)?"
            r"(all-gather|all-reduce|reduce-scatter|collective-permute|all-to-all)\(",
            line,
        )
        if not m:
            continue
        # parse the result shapes on the lhs, e.g. f32[8,16,4]{...}
        for dtype, dims in re.findall(
            r"(f32|f64|bf16|f16|s32|u32|s8|u8|pred)\[([\d,]*)\]", line.split("=")[0]
        ):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * {
                "f64": 8, "f32": 4, "s32": 4, "u32": 4,
                "bf16": 2, "f16": 2, "s8": 1, "u8": 1, "pred": 1,
            }[dtype]
    return total


def _flops(compiled) -> float:
    """Per-device HLO FLOPs (verified: cost_analysis reports the partition
    module's flops under SPMD, not the global program's)."""
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per partition
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def main():
    # must run under the virtual CPU mesh; refuse to claim a TPU
    if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        print(json.dumps({"error": "set XLA_FLAGS=--xla_force_host_platform_device_count=8"}))
        return
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from eagle_tpu.config import DEFAULT_CONFIG, MeshConfig
    from eagle_tpu.models import hrnet, yolov8
    from eagle_tpu.parallel.mesh import make_mesh, shard_batch
    from eagle_tpu.parallel.pipeline import (
        multi_clip_scan,
        sharded_detector_step,
        sharded_keypoint_step,
    )
    from eagle_tpu.pipeline import temporal

    n_dev = 8
    assert len(jax.devices()) >= n_dev
    mesh8 = make_mesh(MeshConfig(data_parallel=n_dev))
    mesh1 = make_mesh(MeshConfig(data_parallel=1))

    # small-resolution variants: the *sharding shape* (partitioned compute,
    # collective count) is resolution-independent, and full-res CPU
    # compiles of YOLOv8-l/HRNet-W48 cost minutes
    img_hw = (96, 160)
    cfg = DEFAULT_CONFIG.replace(
        detector=DEFAULT_CONFIG.detector.__class__(variant="n", image_size=96, max_detections=32),
        keypoint=DEFAULT_CONFIG.keypoint.__class__(input_hw=(96, 160)),
    )
    per_dev_batch = 2
    kp_params = hrnet.init_params(jax.random.key(0))
    det_params = yolov8.init_params(jax.random.key(1), variant="n", num_classes=5)

    rng = np.random.default_rng(0)
    out = {}

    # ---- frame-sharded perception: per-device FLOPs + collective bytes
    for name, make_step in (
        ("det", lambda mesh: sharded_detector_step(mesh, det_params, cfg, img_hw, variant="n")),
        ("kp", lambda mesh: sharded_keypoint_step(mesh, kp_params, cfg, img_hw)),
    ):
        lowered = {}
        for tag, mesh, batch in (("1", mesh1, per_dev_batch), ("8", mesh8, per_dev_batch * n_dev)):
            frames = rng.integers(0, 255, (batch, *img_hw, 3), dtype=np.uint8)
            step = make_step(mesh)
            lowered[tag] = step.lower(shard_batch(frames, mesh)).compile()
        f1, f8 = _flops(lowered["1"]), _flops(lowered["8"])
        out[f"{name}_flops_per_device_ratio"] = round(f8 / f1, 4) if f1 else None
        out[f"{name}_collective_bytes"] = _collective_bytes(lowered["8"])
        if name == "det":
            det_f1 = f1

    # ---- hierarchical (dcn, data) multi-host mesh: the same partition
    # facts must hold with the batch sharded host-major over both axes
    # (zero DCN traffic is the multi-host design claim, docs/roadmap.md)
    mesh2d = make_mesh(MeshConfig(hosts=2))
    frames = rng.integers(0, 255, (per_dev_batch * n_dev, *img_hw, 3), dtype=np.uint8)
    c2d = (
        sharded_detector_step(mesh2d, det_params, cfg, img_hw, variant="n")
        .lower(shard_batch(frames, mesh2d))
        .compile()
    )
    out["det_2d_flops_per_device_ratio"] = (
        round(_flops(c2d) / det_f1, 4) if det_f1 else None
    )
    out["det_2d_collective_bytes"] = _collective_bytes(c2d)

    # ---- clip-parallel scan: CPU-work scale C=8/mesh8 vs C=1/mesh1
    L = 16
    D = cfg.detector.max_detections

    def run_scan(mesh, C):
        frames = rng.integers(0, 255, (C, L, *img_hw, 3), dtype=np.uint8)
        kp = rng.uniform(0, 90, (C, L, 57, 3)).astype(np.float32)
        xs = temporal.FrameInputs(
            frame_bgr=jnp.asarray(frames),
            prev_frame_bgr=jnp.asarray(np.concatenate([frames[:, :1], frames[:, :-1]], 1)),
            model_kp=jnp.asarray(kp),
            model_kp_valid=jnp.ones((C, L, 57), bool),
            is_kp_frame=jnp.tile(jnp.asarray(np.arange(L) % 8 == 0), (C, 1)),
            is_h_frame=jnp.tile(jnp.asarray(np.arange(L) % 8 == 0), (C, 1)),
            det_boxes=jnp.asarray(rng.uniform(0, 90, (C, L, D, 4)).astype(np.float32)),
            det_conf=jnp.asarray(rng.uniform(0.5, 1, (C, L, D)).astype(np.float32)),
            det_cls=jnp.zeros((C, L, D), jnp.int32),
            det_valid=jnp.asarray(rng.uniform(0, 1, (C, L, D)) > 0.5),
            det_embed=jnp.zeros((C, L, D, 1), jnp.float32),
            t=jnp.tile(jnp.arange(L, dtype=jnp.int32), (C, 1)),
        )
        carries = jax.vmap(lambda _: temporal.init_carry(cfg))(jnp.arange(C))
        key = jax.random.key(7)
        scan = multi_clip_scan(mesh, cfg, key)
        compiled = scan.func.lower(carries, xs, key).compile()
        c, o = compiled(carries, xs, key)  # warm
        jax.block_until_ready(o.kp_xy)
        best = float("inf")
        for _ in range(3):
            t0 = time.process_time()
            c, o = compiled(carries, xs, key)
            jax.block_until_ready(o.kp_xy)
            best = min(best, time.process_time() - t0)
        return best, compiled

    t1, _ = run_scan(mesh1, 1)
    t8, compiled8 = run_scan(mesh8, n_dev)
    out["scan_cpu_work_scale"] = round(t8 / t1, 2) if t1 > 0 else None
    out["scan_collective_bytes"] = _collective_bytes(compiled8)
    out["devices"] = n_dev
    print(json.dumps(out))


if __name__ == "__main__":
    main()
