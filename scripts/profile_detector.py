"""Detector MXU-utilization profiling (roadmap item 3).

Slope-times the YOLOv8-l forward per stage group at the production shape
(544x960 rect letterbox, batch 16, bf16) on the attached TPU, then
measures the two named optimization candidates:

- space-to-depth stem: the stride-2 3x3 conv on 3-channel input
  re-expressed as 2x2 space-to-depth (3 -> 12 channels) + stride-1 2x2
  conv with re-scattered weights (mathematically identical output);
- channel padding: zero-pad the narrow early stages to 128 lanes
  (exact: zero input-channel weights / sliced output channels).

Timing protocol (CLAUDE.md): the tunnel RTT (~25 ms) swamps single
calls and block_until_ready returns early through the tunnel, so each
measurement runs a fori_loop of K data-dependency-CHAINED executions
ending in one small real readback (np.asarray) and takes the slope
between two K values.  Validated against a 4096^3 bf16 matmul (known
~0.7 ms at peak: measured 0.72).

Usage:  python scripts/profile_detector.py            (claims the TPU)
"""

import sys
import time

import numpy as np


def slope_time(fn, params, x, k_lo=2, k_hi=8, reps=3):
    """Seconds per fn(params, x) call, measured as the slope between two
    K values of a fori_loop that CHAINS iterations through a data
    dependency (sum over every output leaf feeds the next input, so
    nothing can be elided, reordered, or overlapped -- repeated
    independent dispatches measure wrong through the tunnel)."""
    import jax
    import jax.numpy as jnp

    def make(k):
        def run(p, x0):
            def body(i, xc):
                out = fn(p, xc)
                s = sum(
                    leaf.astype(jnp.float32).mean()
                    for leaf in jax.tree_util.tree_leaves(out)
                )
                return x0 + (s * 1e-20).astype(x0.dtype)

            return jax.lax.fori_loop(0, k, body, x0)[..., :1, :1, :1]

        return jax.jit(run)

    def timed(k):
        r = make(k)
        np.asarray(r(params, x))  # compile + warm; block_until_ready
        # returns EARLY through the tunnel (CLAUDE.md) -- a real readback
        # of the tiny output is the only reliable sync
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(r(params, x))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(k_hi) - timed(k_lo)) / (k_hi - k_lo)


def main():
    import jax
    import jax.numpy as jnp

    from eagle_tpu.models import yolov8
    from eagle_tpu.models.layers import conv_bn

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    H, W, B = 544, 960, 16
    variant = "l"
    params = jax.device_put(yolov8.init_params(jax.random.key(0), variant=variant))
    x_np = np.random.default_rng(0).random((B, H, W, 3), np.float32)
    x = jax.device_put(x_np)

    # ---- per-stage-group prefixes of apply() ----------------------------
    def prefixes(params, x):
        """Yield (name, jitted_prefix_fn). Each prefix re-runs the net from
        the input up to and including the named group."""
        Bk = params["backbone"]

        def stem(p, x):
            x = x.astype(jnp.bfloat16)
            return conv_bn(x, p["backbone"]["stem"], stride=2, act="silu")

        def p2(p, x):
            h = stem(p, x)
            h = conv_bn(h, p["backbone"]["down2"], stride=2, act="silu")
            return yolov8.c2f(h, p["backbone"]["c2f2"], True)

        def p3(p, x):
            h = p2(p, x)
            h = conv_bn(h, p["backbone"]["down3"], stride=2, act="silu")
            return yolov8.c2f(h, p["backbone"]["c2f3"], True)

        def p4(p, x):
            h = p3(p, x)
            h = conv_bn(h, p["backbone"]["down4"], stride=2, act="silu")
            return yolov8.c2f(h, p["backbone"]["c2f4"], True)

        def p5(p, x):
            h = p4(p, x)
            h = conv_bn(h, p["backbone"]["down5"], stride=2, act="silu")
            h = yolov8.c2f(h, p["backbone"]["c2f5"], True)
            return yolov8.sppf(h, p["backbone"]["sppf"])

        def full(p, x):
            return yolov8.apply(p, x, variant=variant, use_bf16=True)

        return [
            ("stem(P1)", stem),
            ("+down2+c2f2(P2)", p2),
            ("+down3+c2f3(P3)", p3),
            ("+down4+c2f4(P4)", p4),
            ("+down5+c2f5+sppf(P5)", p5),
            ("full(+neck+head+decode)", full),
        ]

    times = {}
    prev = 0.0
    for name, fn in prefixes(params, x):
        t = slope_time(fn, params, x)
        times[name] = t
        print(
            f"{name:28s} cum {t * 1e3 / B:7.3f} ms/frame   delta {(t - prev) * 1e3 / B:7.3f}",
            file=sys.stderr,
        )
        prev = t

    t_full = times["full(+neck+head+decode)"]
    print(f"\nbaseline full forward: {t_full * 1e3 / B:.3f} ms/frame", file=sys.stderr)

    # ---- candidate A: space-to-depth stem -------------------------------
    # stride-2 3x3 conv (pad 1) == s2d(2x2, 3 -> 12 ch) + stride-1 2x2
    # conv in block space with pad ((1,0),(1,0)).  Output (i,j) of the
    # original conv reads input rows 2i-1..2i+1 = a 4x4 window rooted at
    # (2i-2, 2j-2) covering blocks (i-1, i) x (j-1, j); the 3x3 taps land
    # at positions [1:4, 1:4] of that 4x4 (row 0 / col 0 taps are zero,
    # which also zeroes the out-of-range -2 rows the block pad introduces).
    from eagle_tpu.models.layers import batch_norm

    def s2d_stem_weights(w):  # (3, 3, cin, C) -> (2, 2, 4*cin, C)
        cin, C = w.shape[2], w.shape[3]
        w4 = jnp.zeros((4, 4, cin, C), w.dtype).at[1:4, 1:4].set(w)
        # (abs_row, abs_col) = (2*br + r2, 2*bc + c2); s2d channel index
        # is r2*2*cin + c2*cin + ch
        w4 = w4.reshape(2, 2, 2, 2, cin, C).transpose(0, 2, 1, 3, 4, 5)
        return w4.reshape(2, 2, 4 * cin, C)

    def s2d(x):  # (N, H, W, C) -> (N, H/2, W/2, 4C)
        n, h, w, c = x.shape
        x = x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(n, h // 2, w // 2, 4 * c)

    def stem_s2d(p, x):
        x = x.astype(jnp.bfloat16)
        xs = s2d(x)
        w = s2d_stem_weights(p["w"]).astype(xs.dtype)
        y = jax.lax.conv_general_dilated(
            xs, w, (1, 1), ((1, 0), (1, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return jax.nn.silu(batch_norm(y, p["bn"]))

    # numerical check vs the plain stem, then timing
    def stem_plain(p, x):
        return conv_bn(x.astype(jnp.bfloat16), p, stride=2, act="silu")

    ref_fn = jax.jit(stem_plain)
    try:
        ref = ref_fn(params["backbone"]["stem"], x)
        got = jax.jit(stem_s2d)(params["backbone"]["stem"], x)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
        t_ref = slope_time(stem_plain, params["backbone"]["stem"], x)
        t_s2d = slope_time(stem_s2d, params["backbone"]["stem"], x)
        print(
            f"stem: plain {t_ref * 1e3 / B:.3f} ms/f  s2d {t_s2d * 1e3 / B:.3f} ms/f  max|err| {err:.2e}",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"s2d stem failed: {e}", file=sys.stderr)

    # ---- candidate B: pad early-stage channels to 128 lanes -------------
    # exact-preserving: extra INPUT channels get zero weights, extra OUTPUT
    # channels exist but are sliced off before the first untouched layer.
    def pad_conv(p, cin_to=None, cout_to=None):
        w = p["w"]
        kh, kw, ci, co = w.shape
        ci2, co2 = cin_to or ci, cout_to or co
        w2 = jnp.zeros((kh, kw, ci2, co2), w.dtype).at[:, :, :ci, :co].set(w)
        bn = {
            k: jnp.zeros((co2,), v.dtype).at[:co].set(v)
            if k != "var"
            else jnp.ones((co2,), v.dtype).at[:co].set(v)
            for k, v in p["bn"].items()
        }
        return {"w": w2, "bn": bn}

    def early_padded(p, x):
        """stem(64->128 lanes) + down2 with padded input, then c2f2
        unchanged: measures whether wider early convs are free."""
        x = x.astype(jnp.bfloat16)
        h = conv_bn(x, pad_conv(p["backbone"]["stem"], cout_to=128), stride=2, act="silu")
        h = conv_bn(h, pad_conv(p["backbone"]["down2"], cin_to=128), stride=2, act="silu")
        return yolov8.c2f(h, p["backbone"]["c2f2"], True)

    def early_plain(p, x):
        x = x.astype(jnp.bfloat16)
        h = conv_bn(x, p["backbone"]["stem"], stride=2, act="silu")
        h = conv_bn(h, p["backbone"]["down2"], stride=2, act="silu")
        return yolov8.c2f(h, p["backbone"]["c2f2"], True)

    try:
        a = jax.jit(early_plain)(params, x)
        b = jax.jit(early_padded)(params, x)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        t_a = slope_time(early_plain, params, x)
        t_b = slope_time(early_padded, params, x)
        print(
            f"early stages: plain {t_a * 1e3 / B:.3f} ms/f  lane-padded {t_b * 1e3 / B:.3f} ms/f  max|err| {err:.2e}",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"channel padding failed: {e}", file=sys.stderr)

    # ---- candidate C (round 4): im2col-matmul rewrite of the worst stage
    # group's 3x3 convs.  c2f2's bottleneck convs are 64->64 at 272x480 --
    # cout=64 fills half the 128-lane MXU, the structural cap behind P2's
    # cost.  Two exact rewrites that feed the MXU an explicit matmul:
    # (C1) materialized im2col: (B*H*W, 9*64) @ (9*64, 64) -- K=576 deep,
    #      at the price of a 9x activation blowup in HBM;
    # (C2) shifted-matmul accumulation: 9 x [(B*H*W, 64) @ (64, 64)],
    #      no blowup, K=64 shallow.
    from eagle_tpu.models.layers import batch_norm as _bn

    def _conv3x3_im2col(x, p):
        b_, h_, w_, c_ = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate(
            [xp[:, i : i + h_, j : j + w_, :] for i in range(3) for j in range(3)],
            axis=-1,
        )
        wm = p["w"].astype(x.dtype).reshape(9 * c_, -1)  # (i,j,cin) order
        y = cols.reshape(b_ * h_ * w_, 9 * c_) @ wm
        y = y.reshape(b_, h_, w_, -1)
        return jax.nn.silu(_bn(y, p["bn"]))

    def _conv3x3_shifted(x, p):
        b_, h_, w_, c_ = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        w_full = p["w"].astype(x.dtype)  # (3, 3, c, co)
        acc = None
        for i in range(3):
            for j in range(3):
                t = xp[:, i : i + h_, j : j + w_, :].reshape(b_ * h_ * w_, c_)
                part = t @ w_full[i, j]
                acc = part if acc is None else acc + part
        y = acc.reshape(b_, h_, w_, -1)
        return jax.nn.silu(_bn(y, p["bn"]))

    def _c2f2_with(conv3x3):
        def run(p, h):
            pp = p["backbone"]["c2f2"]
            y = conv_bn(h, pp["cv1"], act="silu")
            c = y.shape[-1] // 2
            parts = [y[..., :c], y[..., c:]]
            for bp in pp["m"]:
                z = conv3x3(parts[-1], bp["cv1"])
                z = conv3x3(z, bp["cv2"])
                parts.append(parts[-1] + z)
            return conv_bn(jnp.concatenate(parts, axis=-1), pp["cv2"], act="silu")

        return run

    def _c2f2_plain(p, h):
        return yolov8.c2f(h, p["backbone"]["c2f2"], True)

    try:
        h2 = jax.jit(
            lambda p, x: conv_bn(
                conv_bn(x.astype(jnp.bfloat16), p["backbone"]["stem"], stride=2, act="silu"),
                p["backbone"]["down2"],
                stride=2,
                act="silu",
            )
        )(params, x)
        h2 = jax.block_until_ready(h2)
        ref = jax.jit(_c2f2_plain)(params, h2)
        t_plain = slope_time(_c2f2_plain, params, h2)
        for name, conv in (("im2col", _conv3x3_im2col), ("shifted", _conv3x3_shifted)):
            fn = _c2f2_with(conv)
            got = jax.jit(fn)(params, h2)
            err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
            t_c = slope_time(fn, params, h2)
            print(
                f"c2f2: plain {t_plain * 1e3 / B:.3f} ms/f  {name} {t_c * 1e3 / B:.3f} ms/f  max|err| {err:.2e}",
                file=sys.stderr,
            )
    except Exception as e:
        print(f"im2col c2f2 failed: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
