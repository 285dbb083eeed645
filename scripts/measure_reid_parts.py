"""Decompose the OSNet ReID pipeline cost on the TPU (diagnosis for the
201.9 ms/frame measured by measure_reid_tpu.py) and time the fix
candidates side by side:

crop extraction (64 slots x 256x128 from a 544x960 canvas):
  (a) current: 4-tap advanced-index gather (ops/kmeans.gather_crops)
  (b) one-hot interpolation matmuls, f32 and bf16 (CLAUDE.md idiom)
  (c) vmapped dynamic_slice of a fixed window + small per-crop interp
      matmuls (exact for boxes that fit the window)

OSNet forward (1024 crops, bf16):
  (d) current: lax.conv feature_group_count depthwise
  (e) 9-shift multiply-add depthwise (pure VPU, static slices)

Run: python scripts/measure_reid_parts.py   (claims the TPU)
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from profile_detector import slope_time

    from eagle_tpu.models import osnet

    B, K = 16, 64  # PIECE frames x reid slots
    H, W = 544, 960  # canvas
    GH, GW = 256, 128
    rng = np.random.default_rng(0)
    frames = jax.device_put(rng.integers(0, 255, (B, H, W, 3), dtype=np.uint8))
    # realistic player boxes: 26-85 px tall in canvas space
    wh = rng.uniform([18, 40], [40, 90], (B, K, 2)).astype(np.float32)
    xy = rng.uniform([0, 0], [W - 100, H - 100], (B, K, 2)).astype(np.float32)
    boxes = jax.device_put(np.concatenate([xy, xy + wh], axis=-1))
    crops = jax.device_put(
        rng.normal(0, 1, (B * K, GH, GW, 3)).astype(np.float32)
    )
    params = osnet.init_params(jax.random.key(0), "x0_25")

    results = {}

    def report(name, t):
        results[name] = t * 1e3 / B
        print(f"{name}: {results[name]:.3f} ms/frame", file=sys.stderr)

    # ---------------------------------------------- (a) current gather
    from eagle_tpu.ops.kmeans import gather_crops

    def gather_part(_p, f):
        zero_idx = jnp.zeros((K,), jnp.int32)
        out = jax.vmap(
            lambda fr, b: gather_crops(fr[None], zero_idx, b, grid_hw=(GH, GW))
        )(f, boxes)
        return out.mean()  # tiny readback

    report("a_gather", slope_time(gather_part, None, frames))

    # ------------------------------- (b) one-hot interpolation matmuls
    def _interp_mat(pos, size, dtype):
        # pos (K, G) float sample coords -> (K, G, size) two-tap rows
        p0 = jnp.floor(pos)
        fr = (pos - p0)[..., None]
        idx = jnp.arange(size, dtype=pos.dtype)
        m = (idx == p0[..., None]) * (1 - fr) + (idx == p0[..., None] + 1) * fr
        return m.astype(dtype)

    def _boxes_to_pos(b):
        x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
        ty = (jnp.arange(GH, dtype=jnp.float32) + 0.5) / GH
        tx = (jnp.arange(GW, dtype=jnp.float32) + 0.5) / GW
        ys = jnp.clip(y1[:, None] + ty[None] * (y2 - y1)[:, None] - 0.5, 0, H - 1.001)
        xs = jnp.clip(x1[:, None] + tx[None] * (x2 - x1)[:, None] - 0.5, 0, W - 1.001)
        return ys, xs

    # times the SHIPPED op (ops/kmeans.py::matmul_crops — the production
    # ReID crop path adopted from this diagnosis), so these numbers keep
    # describing the shipping code if it ever changes
    from eagle_tpu.ops.kmeans import matmul_crops

    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):

        def mm_part(_p, f, dt=dt):
            out = jax.vmap(
                lambda fr, b: matmul_crops(fr, b, grid_hw=(GH, GW), dtype=dt)
            )(f, boxes)
            return out.astype(jnp.float32).mean()

        report(f"b_matmul_{tag}", slope_time(mm_part, None, frames))

    # -------------------- (c) dynamic_slice window + small interp matmul
    WH, WW = 128, 96  # window must cover the largest expected box

    def window_crop(f, b):
        # f (H, W, 3) uint8, b (K, 4)
        x1, y1 = b[:, 0], b[:, 1]
        oy = jnp.clip(jnp.floor(y1 - 1), 0, H - WH).astype(jnp.int32)
        ox = jnp.clip(jnp.floor(x1 - 1), 0, W - WW).astype(jnp.int32)
        win = jax.vmap(
            lambda y, x: jax.lax.dynamic_slice(f, (y, x, 0), (WH, WW, 3))
        )(oy, ox)  # (K, WH, WW, 3) uint8
        ys, xs = _boxes_to_pos(b)
        ys = ys - oy[:, None].astype(ys.dtype)
        xs = xs - ox[:, None].astype(xs.dtype)
        ry = _interp_mat(ys, WH, jnp.float32)  # (K, GH, WH)
        rx = _interp_mat(xs, WW, jnp.float32)  # (K, GW, WW)
        t = jnp.einsum("kvwc,kgw->kvgc", win.astype(jnp.float32), rx)
        return jnp.einsum("kvgc,kfv->kfgc", t, ry)

    def win_part(_p, f):
        out = jax.vmap(window_crop)(f, boxes)
        return out.mean()

    report("c_window", slope_time(win_part, None, frames))

    # exactness of (c) vs (a) on boxes that fit the window
    a = jax.vmap(
        lambda fr, b: gather_crops(
            fr[None], jnp.zeros((K,), jnp.int32), b, grid_hw=(GH, GW)
        )
    )(frames, boxes)
    c = jax.vmap(window_crop)(frames, boxes)
    err = float(jnp.max(jnp.abs(a - c)))
    print(f"window vs gather max|err|: {err:.2e}", file=sys.stderr)
    results["c_window_err"] = err

    # ------------------------------------ (d) OSNet fwd, conv depthwise
    def osnet_part(p, c):
        return osnet.apply(p, c, use_bf16=True).mean()

    report("d_osnet_convdw", slope_time(osnet_part, params, crops))

    # ------------------------------------ (e) OSNet fwd, shift depthwise
    orig_dw = osnet._depthwise

    def shift_depthwise(x, w):
        h_, w_sz = x.shape[1], x.shape[2]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        wc = w.astype(x.dtype)[:, :, 0, :]  # (3, 3, C)
        acc = None
        for i in range(3):
            for j in range(3):
                part = xp[:, i : i + h_, j : j + w_sz, :] * wc[i, j]
                acc = part if acc is None else acc + part
        return acc

    osnet._depthwise = shift_depthwise
    try:
        report("e_osnet_shiftdw", slope_time(osnet_part, params, crops))
        ref = osnet.apply(params, crops[:8], use_bf16=True)
        osnet._depthwise = orig_dw
        got = osnet.apply(params, crops[:8], use_bf16=True)
        err = float(jnp.max(jnp.abs(ref - got)))
        print(f"shift-dw vs conv-dw embed max|err|: {err:.2e}", file=sys.stderr)
        results["e_shiftdw_err"] = err
    finally:
        osnet._depthwise = orig_dw

    print(json.dumps({k: round(float(v), 4) for k, v in results.items()}))


if __name__ == "__main__":
    main()
