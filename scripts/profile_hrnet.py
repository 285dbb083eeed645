"""HRNet-W48 utilization pass (the keypoint model is the largest
per-invocation device cost: ~12 ms/frame measured at the production
540x960 input, ~20-25% MXU utilization -- docs/architecture.md).

Decomposes the forward into stage groups with chained-slope timing
(profile_detector.py::slope_time) and measures the round-4 fix
candidates side by side:

  (a) fusion upsample precision: the align_corners interpolation
      matmuls run f32 Precision.HIGHEST today (6-pass bf16 on the MXU)
      even when the convs are bf16 -- candidate drops them to default
      bf16 precision inside a bf16 forward.
  (b) branch-0 space-to-depth: pack the 135x240x48 high-res branch as
      68x120x192 and run each BASIC-block 3x3 conv as a packed 3x3 conv
      192->192 whose kernel holds the original taps at phase-aligned
      offsets (exact rewrite, 4x the FLOPs at ~4x the lane fill).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_hrnet.py
(claims the TPU; one JSON line on stdout, human lines on stderr)
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

    from eagle_tpu.models import hrnet

    B = 8  # KP_BATCH
    H, W = 540, 960
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.normal(0, 1, (B, H, W, 3)).astype(np.float32))
    params = hrnet.init_params(jax.random.key(0))

    results = {}

    def report(name, t):
        results[name] = t * 1e3 / B
        print(f"{name}: {results[name]:.3f} ms/frame", file=sys.stderr)

    # ------------------------------------------------ stage-group slices
    def fwd_prefix(stop):
        def run(p, xc):
            h = xc.astype(jnp.bfloat16)
            h = hrnet.conv_bn(h, p["stem"]["conv1"], stride=2, relu=True)
            h = hrnet.conv_bn(h, p["stem"]["conv2"], stride=2, relu=True)
            if stop == "stem":
                return h.astype(jnp.float32).mean()
            for blk in p["layer1"]:
                h = hrnet.bottleneck_block(h, blk)
            if stop == "layer1":
                return h.astype(jnp.float32).mean()
            xs = []
            for t in p["transition1"]:
                if isinstance(t, list):
                    y = h
                    for cp in t:
                        y = hrnet.conv_bn(y, cp, stride=2, relu=True)
                    xs.append(y)
                else:
                    xs.append(hrnet.conv_bn(h, t, relu=True))
            for mod in p["stage2"]:
                xs = hrnet.hr_module(xs, mod, hrnet.STAGE2[1], True)
            if stop == "stage2":
                return sum(v.astype(jnp.float32).mean() for v in xs)
            xs = hrnet._transition(xs, p["transition2"])
            for mod in p["stage3"]:
                xs = hrnet.hr_module(xs, mod, hrnet.STAGE3[1], True)
            if stop == "stage3":
                return sum(v.astype(jnp.float32).mean() for v in xs)
            xs = hrnet._transition(xs, p["transition3"])
            n4 = len(p["stage4"])
            for m, mod in enumerate(p["stage4"]):
                xs = hrnet.hr_module(xs, mod, hrnet.STAGE4[1], multi_scale=(m < n4 - 1))
            y = hrnet.conv2d(xs[0], p["head"]["w"]) + p["head"]["b"].astype(xs[0].dtype)
            return jax.nn.sigmoid(y.astype(jnp.float32)).mean()

        return run

    prev = 0.0
    for stop in ("stem", "layer1", "stage2", "stage3", "full"):
        t = slope_time(fwd_prefix(stop), params, x)
        cum = t * 1e3 / B
        print(f"{stop:8s} cum {cum:7.3f} ms/frame  delta {cum - prev:7.3f}", file=sys.stderr)
        results[f"cum_{stop}"] = cum
        prev = cum

    # ------------------- (a) fusion upsample precision (SHIPPED default:
    # bf16 inputs run native-precision interp matmuls; this ablation
    # forces the old f32 Precision.HIGHEST path to document the delta)
    orig_up = hrnet.upsample_align_corners

    def upsample_highest(xc, out_hw):
        Ho, Wo = out_hw
        _, Hi, Wi, _ = xc.shape
        if (Hi, Wi) == (Ho, Wo):
            return xc
        Mh = jnp.asarray(hrnet._interp_matrix(Ho, Hi), dtype=jnp.float32)
        Mw = jnp.asarray(hrnet._interp_matrix(Wo, Wi), dtype=jnp.float32)
        y = jnp.einsum(
            "oh,nhwc->nowc", Mh, xc.astype(jnp.float32), precision=jax.lax.Precision.HIGHEST
        )
        y = jnp.einsum("ow,nhwc->nhoc", Mw, y, precision=jax.lax.Precision.HIGHEST)
        return y.astype(xc.dtype)

    def full_fwd(p, xc):
        return hrnet.apply(p, xc, use_bf16=True).mean()

    ref_out = jax.jit(lambda p, xc: hrnet.apply(p, xc, use_bf16=True))(params, x[:2])
    ref_out = jax.block_until_ready(ref_out)

    hrnet.upsample_align_corners = upsample_highest
    try:
        report("a_upsample_highest", slope_time(full_fwd, params, x))
        got = jax.jit(lambda p, xc: hrnet.apply(p, xc, use_bf16=True))(params, x[:2])
        err = float(jnp.max(jnp.abs(ref_out - got)))
        print(f"upsample bf16-native vs HIGHEST heatmap max|err|: {err:.2e}", file=sys.stderr)
        results["a_err"] = err
    finally:
        hrnet.upsample_align_corners = orig_up

    # --------------------------------- (b) branch-0 space-to-depth conv
    # pack (N, H, W, C) even-dims -> (N, H/2, W/2, 4C), phase-major last
    def s2d(v):
        n, h, w, c = v.shape
        v = v.reshape(n, h // 2, 2, w // 2, 2, c)
        return v.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)

    def d2s(v):
        n, h, w, c4 = v.shape
        c = c4 // 4
        v = v.reshape(n, h, w, 2, 2, c)
        return v.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, c)

    def pack_kernel(w):
        # w (3, 3, Cin, Cout) -> (3, 3, 4Cin, 4Cout): output phase (a, b)
        # at packed offset (di', dj') reads input phase (a', b') where
        # 2*(di'-1) + a' - a = di-1  for tap di in [0..2] (same for j)
        cin, cout = w.shape[2], w.shape[3]
        wp = np.zeros((3, 3, 4 * cin, 4 * cout), np.float32)
        for a in range(2):
            for b in range(2):
                for di in range(3):
                    for dj in range(3):
                        u, v = a + di - 1, b + dj - 1  # input abs offset
                        ap, bp = u % 2, v % 2
                        dip, djp = (u - ap) // 2 + 1, (v - bp) // 2 + 1
                        wp[
                            dip,
                            djp,
                            (2 * ap + bp) * cin : (2 * ap + bp + 1) * cin,
                            (2 * a + b) * cout : (2 * a + b + 1) * cout,
                        ] = np.asarray(w[di, dj])
        return jnp.asarray(wp)

    # exactness + speed on a stage-3 branch-0 MODULE (4 BASIC blocks = 8
    # convs + residuals), packed once at entry / unpacked once at exit so
    # the pack cost amortizes as it would in a real rewrite.  BN folds
    # into the packed space by tiling the per-channel params 4x.
    # k_lo/k_hi raised: at ~1 ms/call the default K=2..8 slope is tunnel
    # jitter (the first pass measured a negative time).
    c = 48
    hb, wb = 136, 240  # branch-0 is 135x240; even dims for the pack
    xb = jax.device_put(
        jnp.asarray(rng.normal(0, 1, (B, hb, wb, c)).astype(np.float32), jnp.bfloat16)
    )
    blocks = [
        {
            "w1": jnp.asarray(0.1 * rng.normal(0, 1, (3, 3, c, c)).astype(np.float32)),
            "w2": jnp.asarray(0.1 * rng.normal(0, 1, (3, 3, c, c)).astype(np.float32)),
        }
        for _ in range(4)
    ]

    def plain_module(p, v):
        for blk in p:
            y = jax.nn.relu(hrnet.conv2d(v, blk["w1"]))
            y = hrnet.conv2d(y, blk["w2"])
            v = jax.nn.relu(y + v)
        return v.astype(jnp.float32).mean()

    packed = [{k: pack_kernel(w) for k, w in blk.items()} for blk in blocks]

    def packed_module(p, v):
        h = s2d(v)
        for blk in p:
            y = jax.nn.relu(hrnet.conv2d(h, blk["w1"]))
            y = hrnet.conv2d(y, blk["w2"])
            h = jax.nn.relu(y + h)
        return d2s(h).astype(jnp.float32).mean()

    def plain_out(v):
        for blk in blocks:
            y = jax.nn.relu(hrnet.conv2d(v, blk["w1"]))
            y = hrnet.conv2d(y, blk["w2"])
            v = jax.nn.relu(y + v)
        return v

    def packed_out(v):
        h = s2d(v)
        for blk in packed:
            y = jax.nn.relu(hrnet.conv2d(h, blk["w1"]))
            y = hrnet.conv2d(y, blk["w2"])
            h = jax.nn.relu(y + h)
        return d2s(h)

    a = jax.jit(plain_out)(xb[:2]).astype(jnp.float32)
    bq = jax.jit(packed_out)(xb[:2]).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(a - bq)))
    print(f"s2d module vs plain max|err|: {err:.2e}", file=sys.stderr)
    results["b_err"] = err
    report("b_plain_module48", slope_time(plain_module, blocks, xb, k_lo=8, k_hi=40))
    report("b_s2d_module192", slope_time(packed_module, packed, xb, k_lo=8, k_hi=40))

    print(json.dumps({k: round(float(v), 4) for k, v in results.items()}))


if __name__ == "__main__":
    main()
