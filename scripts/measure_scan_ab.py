"""A/B the FUSED temporal-scan program between two checkouts.

Claims the TPU.  Run against the repo root and a `git worktree` of the
comparison commit (identical synthetic inputs, chained slope protocol
so tunnel constants cancel):

    python scripts/measure_scan_ab.py /root/repo
    python scripts/measure_scan_ab.py /tmp/prefix     # worktree of the old commit

Exists because op-level wins measured standalone can mostly vanish once
XLA fuses the op into the scan step (round 5: a ~0.5 ms/frame summed
standalone gather saving became 0.07 ms/frame in-scan, reproducibly --
docs/architecture.md "Round-5 refinement").  Any hot-loop optimization
must be re-verified with THIS kind of fused-program A/B before its
number is quoted."""
import sys, time, functools
import numpy as np

root = sys.argv[1]
sys.path.insert(0, root)

import jax, jax.numpy as jnp
from eagle_tpu.config import PipelineConfig
from eagle_tpu.pipeline import temporal
from eagle_tpu.pipeline.temporal import FrameInputs, temporal_step

cfg = PipelineConfig()
D = cfg.detector.max_detections
T = 32
H, W = 544, 960
rng = np.random.default_rng(0)

frames = rng.integers(0, 255, (T, H, W, 3), np.uint8)
prev = np.concatenate([frames[:1], frames[:-1]], 0)
kp = np.stack([rng.uniform(60, W-60, (T, 57)), rng.uniform(60, H-60, (T, 57))], -1).astype(np.float32)
xs = FrameInputs(
    frame_bgr=jnp.asarray(frames),
    prev_frame_bgr=jnp.asarray(prev),
    model_kp=jnp.asarray(np.concatenate([kp, rng.uniform(0.5, 1, (T, 57, 1)).astype(np.float32)], -1)),
    model_kp_valid=jnp.asarray(rng.random((T, 57)) < 0.8),
    is_kp_frame=jnp.asarray((np.arange(T) % 8) == 0),
    is_h_frame=jnp.asarray((np.arange(T) % 8) == 0),
    det_boxes=jnp.asarray(rng.uniform(0, 500, (T, D, 4)).astype(np.float32)),
    det_conf=jnp.asarray(rng.uniform(0, 1, (T, D)).astype(np.float32)),
    det_cls=jnp.asarray(rng.integers(0, 3, (T, D)).astype(np.int32)),
    det_valid=jnp.asarray(rng.random((T, D)) < 0.1),
    det_embed=jnp.zeros((T, D, 1), jnp.float32),
    t=jnp.asarray(np.arange(T, dtype=np.int32)),
)
carry0 = temporal.init_carry(cfg)
key = jax.random.key(0)

def one_scan(carry, xs):
    return jax.lax.scan(lambda c, x: temporal_step(c, x, cfg, key), carry, xs)

def make(k):
    @jax.jit
    def run(carry, xs):
        def body(i, c):
            c2, out = one_scan(c, xs)
            return c2
        c = jax.lax.fori_loop(0, k, body, carry)
        return c.kp_xy.sum()
    return run

def timed(k, reps=5):
    r = make(k)
    np.asarray(r(carry0, xs))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(r(carry0, xs))
        best = min(best, time.perf_counter() - t0)
    return best

lo, hi = 2, 8
sl = (timed(hi) - timed(lo)) / (hi - lo) / T
print(f"{root}: scan step {sl*1e3:.3f} ms/frame", flush=True)
