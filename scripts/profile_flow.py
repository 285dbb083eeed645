"""LK-flow composition profiling (roadmap item 5: is a flow v3 worth it?).

Slope-times the shipped ``ops/optical_flow.py::lk_flow`` at the
production scan shape (K=57 points, 544x960 working-canvas frames) on
the attached TPU, then times its internal stages and the two v3
candidates:

- shifted-add pyrDown: the 5-tap [1,4,6,4,1]/16 separable kernel as
  strided slices + adds on the VPU instead of dense (n/2, n) HIGHEST
  matmuls carrying a 5-wide band (19x zero waste);
- sub-ROI re-centered iterations: one vmapped dynamic_slice per level
  re-centers each point's search window into a small (64x64) tile, so
  the 10 Newton iterations sample from 64^2 instead of the full 192^2
  ROI (16x fewer MACs in the dominant einsum).

Timing protocol (CLAUDE.md): slope of K data-dependency-chained
executions ending in one small readback -- single calls through the
tunnel are swamped by the ~25 ms RTT and block_until_ready returns
early.

Usage:  python scripts/profile_flow.py            (claims the TPU)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope_time(fn, args, k_lo=2, k_hi=8, reps=3):
    """Seconds per fn(*args) call: slope between two K values of a
    fori_loop chaining iterations through a data dependency."""
    import jax
    import jax.numpy as jnp

    def make(k):
        def run(*a):
            def body(i, carry):
                out = fn(*a[:-1], a[-1] + carry)
                s = sum(
                    leaf.astype(jnp.float32).mean()
                    for leaf in jax.tree_util.tree_leaves(out)
                )
                return (s * 1e-20).astype(a[-1].dtype)

            return jax.lax.fori_loop(0, k, body, jnp.zeros((), a[-1].dtype))

        return jax.jit(run)

    def timed(k):
        r = make(k)
        np.asarray(r(*args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(r(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(k_hi) - timed(k_lo)) / (k_hi - k_lo)


def main():
    import jax
    import jax.numpy as jnp

    from eagle_tpu.ops import optical_flow as of

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    H, W, K = 544, 960, 57
    prev = jax.device_put(rng.integers(0, 255, (H, W, 3), np.uint8))
    curr = jax.device_put(rng.integers(0, 255, (H, W, 3), np.uint8))
    pts_np = np.stack(
        [rng.uniform(40, W - 40, K), rng.uniform(40, H - 40, K)], -1
    ).astype(np.float32)
    pts = jax.device_put(pts_np)
    valid = jax.device_put(np.ones(K, bool))

    # jitter input so the chained loop can't fold anything constant
    def full(prev, curr, pts, valid, eps):
        return of.lk_flow(prev, curr, pts + eps, valid)

    t = slope_time(full, (prev, curr, pts, valid, jnp.zeros((), jnp.float32)))
    print(f"lk_flow full (K={K}):            {t * 1e3:7.3f} ms")

    # ---- stage: ROI extract + gray ------------------------------------
    side = min(of.ROI_SIDE, H - H % 4, W - W % 4)

    def rois_only(prev, curr, pts, eps):
        p = pts + eps
        origin = jnp.stack(
            [
                jnp.clip(jnp.floor(p[:, 0]).astype(jnp.int32) - side // 2, 0, W - side)
                // 4
                * 4,
                jnp.clip(jnp.floor(p[:, 1]).astype(jnp.int32) - side // 2, 0, H - side)
                // 4
                * 4,
            ],
            -1,
        )
        gw = jnp.asarray(of._GRAY_W)
        a = jnp.round(of._extract_color_rois(prev, origin, side).astype(jnp.float32) @ gw)
        b = jnp.round(of._extract_color_rois(curr, origin, side).astype(jnp.float32) @ gw)
        return a, b

    t_roi = slope_time(rois_only, (prev, curr, pts, jnp.zeros((), jnp.float32)))
    print(f"  ROI extract+gray x2:           {t_roi * 1e3:7.3f} ms")

    # ---- stage: pyramid build (matmul vs shifted-add) -----------------
    roi0 = jax.device_put(rng.uniform(0, 255, (K, side, side)).astype(np.float32))

    def pyr_matmul(x, eps):
        a = x + eps
        p1 = of.pyr_down(a)
        p2 = of.pyr_down(p1)
        return p1, p2

    t_pyr = slope_time(pyr_matmul, (roi0, jnp.zeros((), jnp.float32)))
    print(f"  pyramid build (matmul) x1 roi: {t_pyr * 1e3:7.3f} ms  (x2 frames in full)")

    def pyr_down_shift(x):
        # reflect-101 pad by 2 on both spatial dims, 5-tap + stride 2
        k5 = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
        h = x.shape[-2]
        w = x.shape[-1]

        def along_rows(v):
            vp = jnp.concatenate([v[:, 2:0:-1, :], v, v[:, -2:-4:-1, :]], axis=1)
            out = sum(k5[t] * vp[:, t : t + h : 1, :][:, ::2, :] for t in range(5))
            return out

        def along_cols(v):
            vp = jnp.concatenate([v[:, :, 2:0:-1], v, v[:, :, -2:-4:-1]], axis=2)
            out = sum(k5[t] * vp[:, :, t : t + w : 1][:, :, ::2] for t in range(5))
            return out

        return along_cols(along_rows(x))

    def pyr_shift(x, eps):
        a = x + eps
        p1 = pyr_down_shift(a)
        p2 = pyr_down_shift(p1)
        return p1, p2

    # numerics check vs the matmul path
    ref1 = np.asarray(of.pyr_down(roi0))
    got1 = np.asarray(jax.jit(pyr_down_shift)(roi0))
    err = np.abs(ref1 - got1).max()
    t_pyr2 = slope_time(pyr_shift, (roi0, jnp.zeros((), jnp.float32)))
    print(f"  pyramid build (shift)  x1 roi: {t_pyr2 * 1e3:7.3f} ms  max|err|={err:.2e}")

    # ---- stage: level-0 iteration loop (dominant einsums) -------------
    prev_roi = roi0
    curr_roi = jax.device_put(rng.uniform(0, 255, (K, side, side)).astype(np.float32))
    window, iters = 15, 10
    half = (window - 1) / 2.0
    tl0 = jax.device_put(
        np.tile(np.float32(side // 2 - half), (K, 2)) + rng.uniform(-20, 20, (K, 2)).astype(np.float32)
    )

    def iter_loop_full(curr_roi, tl, eps):
        g = tl + eps

        def body(i, gcur):
            patch = of._sample_patches(curr_roi, gcur - half, window)
            return gcur + 1e-6 * patch.mean(axis=(1, 2), keepdims=False)[:, None]

        return jax.lax.fori_loop(0, iters, body, g)

    t_it = slope_time(iter_loop_full, (curr_roi, tl0, jnp.zeros((), jnp.float32)))
    print(f"  10-iter sample loop @{side}^2:  {t_it * 1e3:7.3f} ms")

    # sub-ROI variant: re-center into a 64x64 tile once, iterate there
    sub = 64

    def iter_loop_sub(curr_roi, tl, eps):
        g = tl + eps
        org = jnp.clip(jnp.floor(g - half).astype(jnp.int32) - (sub - window) // 2, 0, side - sub)

        def one(r, o):
            return jax.lax.dynamic_slice(r, (o[1], o[0]), (sub, sub))

        tiles = jax.vmap(one)(curr_roi, org)

        def body(i, gcur):
            patch = of._sample_patches(tiles, gcur - half - org.astype(jnp.float32), window)
            return gcur + 1e-6 * patch.mean(axis=(1, 2), keepdims=False)[:, None]

        return jax.lax.fori_loop(0, iters, body, g)

    t_sub = slope_time(iter_loop_sub, (curr_roi, tl0, jnp.zeros((), jnp.float32)))
    print(f"  10-iter sample loop @{sub}^2 +slice: {t_sub * 1e3:7.3f} ms")

    print("done", file=sys.stderr)


if __name__ == "__main__":
    main()
