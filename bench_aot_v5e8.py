"""Production-shape v5e-8 AOT compile evidence (VERDICT r4 #3).

``bench_scaling.py`` checks the sharding facts (per-device FLOPs ratio,
collective bytes) on a virtual 8-device CPU mesh at small resolutions --
compiler-level facts, but from the CPU backend at toy shapes.  This
script closes the remaining gap: it AOT-compiles the PRODUCTION-shape
sharded programs against a virtual ``v5e:2x4`` TPU topology
(``jax.experimental.topologies`` -- the real TPU compiler, no hardware
needed) and reports, per program:

- per-device HLO FLOPs of the 8-way step vs the 1-device step at the
  same per-device batch (ideal 1.0: GSPMD partitions, never replicates),
- collective bytes in the partitioned module (ideal 0 for the pure
  data/clip parallelism this pipeline ships),
- per-device memory from the TPU compiler's memory analysis
  (arguments + outputs + temps; must fit v5e's 16 GiB HBM).

Production shapes (the ones the single-chip bench actually runs):
YOLOv8-l on the 544x960 working canvas at PIECE=16 frames/device with
128 detection slots; HRNet-W48 at 540x960, KP_BATCH=8/device; the
clip-parallel temporal scan at 8 clips x chunk_frames=96 frames with 64
track slots.  Compare docs/architecture.md "v5e-8 extrapolation".

Run standalone (takes minutes: full-size TPU compiles):
    python bench_aot_v5e8.py
The TPU *compiler* runs locally/via the plugin; nothing is enqueued on
any real chip, so this never contends with a running bench for the
device -- but it does instantiate the TPU client, so do not run it
concurrently with another TPU process (the axon claim is per-process).
"""

import json
import sys
import time

V5E_HBM_BYTES = 16 * 1024**3


def _collective_bytes(compiled) -> int:
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
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def _mem(compiled) -> dict:
    m = compiled.memory_analysis()
    per_dev = (
        m.argument_size_in_bytes + m.output_size_in_bytes + m.temp_size_in_bytes
    )
    return {
        "arg_MB": round(m.argument_size_in_bytes / 1e6, 1),
        "out_MB": round(m.output_size_in_bytes / 1e6, 1),
        "temp_MB": round(m.temp_size_in_bytes / 1e6, 1),
        "per_device_total_MB": round(per_dev / 1e6, 1),
        "fits_v5e_hbm": bool(per_dev < V5E_HBM_BYTES),
    }


def main():
    # NOTE: do NOT enable the persistent compilation cache here -- with
    # the axon plugin registered, the cache key computation wedges the
    # topology-AOT path before the first compile (reproduced twice,
    # identical 569 MB RSS stall; the same script runs fine without it).
    # Reruns therefore recompile cold (~22 min); the stored
    # AOT_V5E8.json artifact is the product.
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from eagle_tpu.config import DEFAULT_CONFIG
    from eagle_tpu.models import hrnet, yolov8
    from eagle_tpu.ops.preprocess import compute_work_geometry
    from eagle_tpu.parallel.pipeline import (
        multi_clip_scan,
        sharded_detector_step,
        sharded_keypoint_step,
    )
    from eagle_tpu.pipeline import temporal
    from eagle_tpu.pipeline.coordinate_model import KP_BATCH, PIECE

    t_start = time.monotonic()
    topo = topologies.get_topology_desc(
        platform="tpu", topology_name="v5e:2x4", chips_per_host_bounds=(2, 4, 1), num_slices=1
    )
    n_dev = len(topo.devices)
    assert n_dev == 8, n_dev
    mesh8 = Mesh(np.array(topo.devices), ("data",))
    mesh1 = Mesh(np.array(topo.devices[:1]), ("data",))
    mesh2d = Mesh(np.array(topo.devices).reshape(2, 4), ("dcn", "data"))

    # production configuration: 720p input -> 544x960 working canvas
    img_hw = (720, 1280)
    geom = compute_work_geometry(img_hw, DEFAULT_CONFIG.detector.image_size)
    canvas_hw = (geom.canvas_h, geom.canvas_w)
    cfg = DEFAULT_CONFIG.replace(work=geom)
    out = {
        "topology": "v5e:2x4",
        "canvas_hw": list(canvas_hw),
        "piece": PIECE,
        "kp_batch": KP_BATCH,
        "det_slots": cfg.detector.max_detections,
        "track_slots": cfg.tracker.max_tracks,
        "chunk_frames": cfg.chunk_frames,
    }

    kp_params = hrnet.init_params(jax.random.key(0))
    det_params = yolov8.init_params(jax.random.key(1), variant="l", num_classes=5)

    def frames_spec(batch, mesh):
        return jax.ShapeDtypeStruct(
            (batch, *canvas_hw, 3),
            jnp.uint8,
            sharding=NamedSharding(mesh, P(tuple(mesh.axis_names), None, None, None)),
        )

    # ---- detector (YOLOv8-l @ 960 letterbox from the canvas, 128 slots)
    # and keypoint model (HRNet-W48 @ 540x960), each 1-dev vs 8-way
    for name, make_step, per_dev in (
        ("det", lambda mesh: sharded_detector_step(mesh, det_params, cfg, canvas_hw, variant="l"), PIECE),
        ("kp", lambda mesh: sharded_keypoint_step(mesh, kp_params, cfg, canvas_hw), KP_BATCH),
    ):
        compiled = {}
        for tag, mesh, batch in (("1", mesh1, per_dev), ("8", mesh8, per_dev * n_dev)):
            t0 = time.monotonic()
            compiled[tag] = make_step(mesh).lower(frames_spec(batch, mesh)).compile()
            print(
                f"# {name} mesh{tag} compiled in {time.monotonic() - t0:.0f}s",
                file=sys.stderr,
                flush=True,
            )
        f1, f8 = _flops(compiled["1"]), _flops(compiled["8"])
        out[f"{name}_flops_per_device_ratio"] = round(f8 / f1, 4) if f1 else None
        out[f"{name}_collective_bytes"] = _collective_bytes(compiled["8"])
        out[f"{name}_memory"] = _mem(compiled["8"])
        if name == "det":
            det_f1 = f1

    # ---- hierarchical (dcn, data) 2-host layout: same facts must hold
    t0 = time.monotonic()
    c2d = (
        sharded_detector_step(mesh2d, det_params, cfg, canvas_hw, variant="l")
        .lower(frames_spec(PIECE * n_dev, mesh2d))
        .compile()
    )
    print(f"# det mesh2d compiled in {time.monotonic() - t0:.0f}s", file=sys.stderr, flush=True)
    out["det_2d_flops_per_device_ratio"] = round(_flops(c2d) / det_f1, 4) if det_f1 else None
    out["det_2d_collective_bytes"] = _collective_bytes(c2d)

    # ---- clip-parallel temporal scan at production shape
    C, L, D = n_dev, cfg.chunk_frames, cfg.detector.max_detections

    def clip_spec(shape, dtype, mesh):
        return jax.ShapeDtypeStruct(
            shape, dtype, sharding=NamedSharding(mesh, P(tuple(mesh.axis_names), *([None] * (len(shape) - 1))))
        )

    def scan_compiled(mesh, C):
        xs = temporal.FrameInputs(
            frame_bgr=clip_spec((C, L, *canvas_hw, 3), jnp.uint8, mesh),
            prev_frame_bgr=clip_spec((C, L, *canvas_hw, 3), jnp.uint8, mesh),
            model_kp=clip_spec((C, L, 57, 3), jnp.float32, mesh),
            model_kp_valid=clip_spec((C, L, 57), jnp.bool_, mesh),
            is_kp_frame=clip_spec((C, L), jnp.bool_, mesh),
            is_h_frame=clip_spec((C, L), jnp.bool_, mesh),
            det_boxes=clip_spec((C, L, D, 4), jnp.float32, mesh),
            det_conf=clip_spec((C, L, D), jnp.float32, mesh),
            det_cls=clip_spec((C, L, D), jnp.int32, mesh),
            det_valid=clip_spec((C, L, D), jnp.bool_, mesh),
            det_embed=clip_spec((C, L, D, 1), jnp.float32, mesh),
            t=clip_spec((C, L), jnp.int32, mesh),
        )
        carry0 = jax.eval_shape(lambda: jax.vmap(lambda _: temporal.init_carry(cfg))(jnp.arange(C)))
        carry_specs = jax.tree.map(
            lambda s: clip_spec(s.shape, s.dtype, mesh), carry0
        )
        key_spec = jax.ShapeDtypeStruct((), jax.random.key(0).dtype)
        scan = multi_clip_scan(mesh, cfg, jax.random.key(7))
        return scan.func.lower(carry_specs, xs, key_spec).compile()

    t0 = time.monotonic()
    s1 = scan_compiled(mesh1, 1)
    s8 = scan_compiled(mesh8, C)
    print(f"# scan compiled in {time.monotonic() - t0:.0f}s", file=sys.stderr, flush=True)
    f1, f8 = _flops(s1), _flops(s8)
    out["scan_flops_per_device_ratio"] = round(f8 / f1, 4) if f1 else None
    out["scan_collective_bytes"] = _collective_bytes(s8)
    out["scan_memory"] = _mem(s8)
    out["compile_wall_s"] = round(time.monotonic() - t_start, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
