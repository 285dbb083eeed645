"""HRNet-W48 pitch-keypoint model, TPU-native.

Functional JAX re-implementation of the reference's KeypointModel
(eagle/models/keypoint_hrnet.py:61-595): HRNet-W48 backbone (stem ->
Bottleneck layer1 -> 3 multi-branch stages with SUM fusion) plus a 3x3
conv head producing 57 sigmoid heatmaps at input/4 resolution.

Architecture spec (keypoint_hrnet.py:505-539):
  stage2: 1 module, 2 branches, BASIC x4, channels [48, 96]
  stage3: 4 modules, 3 branches, BASIC x4, channels [48, 96, 192]
  stage4: 3 modules, 4 branches, BASIC x4, channels [48, 96, 192, 384]
  (last stage4 module fuses to the high-res branch only)

Design departures from the torch original:
- NHWC layout and HWIO kernels throughout (TPU-native conv layout).
- Pure function over an explicit parameter pytree; no module state.
- The align_corners=True bilinear upsample in the fusion layers
  (keypoint_hrnet.py:299-304) is expressed as two small dense
  interpolation matmuls (MXU-friendly, bit-stable) instead of a gather.
- Optional bfloat16 compute with f32 accumulation for the MXU.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5  # torch BatchNorm2d default

# stage spec: (num_modules, num_branches, blocks_per_branch, channels)
STAGE2 = (1, 2, 4, (48, 96))
STAGE3 = (4, 3, 4, (48, 96, 192))
STAGE4 = (3, 4, 4, (48, 96, 192, 384))

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Primitive layers
# ---------------------------------------------------------------------------


def conv2d(x: jax.Array, w: jax.Array, stride: int = 1, padding: int = 1) -> jax.Array:
    """3x3/1x1 conv, NHWC x HWIO -> NHWC, torch-compatible symmetric padding."""
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def batch_norm(x: jax.Array, p: Params) -> jax.Array:
    """Inference-mode BatchNorm2d over the channel (last) axis."""
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + BN_EPS)
    scale = (p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    bias = (p["bias"].astype(jnp.float32) - p["mean"].astype(jnp.float32) * inv * p["scale"].astype(jnp.float32)).astype(x.dtype)
    return x * scale + bias


def conv_bn(x: jax.Array, p: Params, stride: int = 1, padding: int = 1, relu: bool = False) -> jax.Array:
    y = batch_norm(conv2d(x, p["w"], stride, padding), p["bn"])
    return jax.nn.relu(y) if relu else y


@functools.lru_cache(maxsize=64)
def _interp_matrix(out_size: int, in_size: int) -> np.ndarray:
    """Dense 1-D align_corners=True linear interpolation matrix
    (out_size, in_size): row o holds the two blending weights for output
    position o.  Matches torch F.interpolate(mode='bilinear',
    align_corners=True) exactly."""
    M = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        M[:, 0] = 1.0
        return M
    scale = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
    for o in range(out_size):
        pos = o * scale
        lo = int(np.floor(pos))
        hi = min(lo + 1, in_size - 1)
        frac = pos - lo
        M[o, lo] += 1.0 - frac
        M[o, hi] += frac
    return M


def upsample_align_corners(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear align_corners=True resize of NHWC via two interpolation
    matmuls (static shapes, runs on the MXU).

    f32 inputs (the parity path vs the reference's torch module) keep
    Precision.HIGHEST.  bf16 inputs run native bf16 matmuls with the
    MXU's f32 accumulation: the two-tap rows' weight rounding (~2^-9
    relative) sits below the bf16 quantization every downstream conv
    applies anyway — measured identical full-forward heatmaps on random
    weights, at ~1/6 the matmul passes of f32 HIGHEST (full HRNet
    8.16 -> 6.79 ms/frame, scripts/profile_hrnet.py)."""
    Ho, Wo = out_hw
    _, Hi, Wi, _ = x.shape
    if (Hi, Wi) == (Ho, Wo):
        return x
    if x.dtype == jnp.bfloat16:
        Mh = jnp.asarray(_interp_matrix(Ho, Hi)).astype(x.dtype)
        Mw = jnp.asarray(_interp_matrix(Wo, Wi)).astype(x.dtype)
        y = jnp.einsum("oh,nhwc->nowc", Mh, x)
        return jnp.einsum("ow,nhwc->nhoc", Mw, y)
    Mh = jnp.asarray(_interp_matrix(Ho, Hi), dtype=jnp.float32)
    Mw = jnp.asarray(_interp_matrix(Wo, Wi), dtype=jnp.float32)
    y = jnp.einsum("oh,nhwc->nowc", Mh, x.astype(jnp.float32), precision=jax.lax.Precision.HIGHEST)
    y = jnp.einsum("ow,nhwc->nhoc", Mw, y, precision=jax.lax.Precision.HIGHEST)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def basic_block(x: jax.Array, p: Params) -> jax.Array:
    """Two 3x3 conv+BN with residual (keypoint_hrnet.py:70-99)."""
    out = conv_bn(x, p["conv1"], relu=True)
    out = conv_bn(out, p["conv2"])
    res = conv_bn(x, p["down"], padding=0) if "down" in p else x
    return jax.nn.relu(out + res)


def bottleneck_block(x: jax.Array, p: Params) -> jax.Array:
    """1x1 -> 3x3 -> 1x1 (x4 expansion) with residual
    (keypoint_hrnet.py:102-137)."""
    out = conv_bn(x, p["conv1"], padding=0, relu=True)
    out = conv_bn(out, p["conv2"], relu=True)
    out = conv_bn(out, p["conv3"], padding=0)
    res = conv_bn(x, p["down"], padding=0) if "down" in p else x
    return jax.nn.relu(out + res)


def hr_module(xs: list[jax.Array], p: Params, num_branches: int, multi_scale: bool) -> list[jax.Array]:
    """One HighResolutionModule: per-branch BASIC blocks then full SUM
    fusion with strided-conv downsampling / 1x1+bilinear upsampling
    (keypoint_hrnet.py:283-309)."""
    ys = []
    for b in range(num_branches):
        y = xs[b]
        for blk in p["branches"][b]:
            y = basic_block(y, blk)
        ys.append(y)

    n_out = num_branches if multi_scale else 1
    fused = []
    for i in range(n_out):
        acc = None
        for j in range(num_branches):
            fp = p["fuse"][i][j]
            if i == j:
                t = ys[j]
            elif j > i:
                t = conv_bn(ys[j], fp, padding=0)  # 1x1 channel align
                t = upsample_align_corners(t, ys[i].shape[1:3])
            else:  # j < i: chain of stride-2 3x3 convs
                t = ys[j]
                for k, cp in enumerate(fp):
                    t = conv_bn(t, cp, stride=2, relu=(k < len(fp) - 1))
            acc = t if acc is None else acc + t
        fused.append(jax.nn.relu(acc))
    return fused


# ---------------------------------------------------------------------------
# Full network
# ---------------------------------------------------------------------------


def apply(params: Params, x: jax.Array, *, use_bf16: bool = False) -> jax.Array:
    """Forward pass.

    Parameters
    ----------
    params : parameter pytree from :func:`init_params` or
        :func:`eagle_tpu.models.convert.hrnet_from_torch`
    x : (N, H, W, 3) float32, ImageNet-normalized RGB
    use_bf16 : run convs in bfloat16 (inference speed on the MXU)

    Returns
    -------
    (N, H/4, W/4, 57) float32 sigmoid heatmaps
    """
    if use_bf16:
        x = x.astype(jnp.bfloat16)

    # stem: two stride-2 3x3 convs (keypoint_hrnet.py:445-450)
    x = conv_bn(x, params["stem"]["conv1"], stride=2, relu=True)
    x = conv_bn(x, params["stem"]["conv2"], stride=2, relu=True)

    # layer1: 4x Bottleneck 64 -> 256 (keypoint_hrnet.py:451)
    for blk in params["layer1"]:
        x = bottleneck_block(x, blk)

    # transition1 + stage2
    xs = []
    for t in params["transition1"]:
        if t is None:
            xs.append(x)
        elif isinstance(t, list):  # downsample chain for a new branch
            y = x
            for cp in t:
                y = conv_bn(y, cp, stride=2, relu=True)
            xs.append(y)
        else:
            xs.append(conv_bn(x, t, relu=True))
    for mod in params["stage2"]:
        xs = hr_module(xs, mod, STAGE2[1], True)

    # transition2 + stage3
    xs = _transition(xs, params["transition2"])
    for mod in params["stage3"]:
        xs = hr_module(xs, mod, STAGE3[1], True)

    # transition3 + stage4 (last module fuses to branch 0 only)
    xs = _transition(xs, params["transition3"])
    n4 = len(params["stage4"])
    for m, mod in enumerate(params["stage4"]):
        xs = hr_module(xs, mod, STAGE4[1], multi_scale=(m < n4 - 1))

    # head: 3x3 conv to 57 heatmaps + sigmoid (keypoint_hrnet.py:549-573)
    y = conv2d(xs[0], params["head"]["w"]) + params["head"]["b"].astype(xs[0].dtype)
    return jax.nn.sigmoid(y.astype(jnp.float32))


def _transition(xs: list[jax.Array], trans: list) -> list[jax.Array]:
    """Apply a transition layer list (keypoint_hrnet.py:353-391): None =
    passthrough, dict = 3x3 channel-change conv, list = stride-2 chain off
    the last existing branch."""
    out = []
    for i, t in enumerate(trans):
        if t is None:
            out.append(xs[i])
        elif isinstance(t, list):
            y = xs[-1]
            for cp in t:
                y = conv_bn(y, cp, stride=2, relu=True)
            out.append(y)
        else:
            out.append(conv_bn(xs[i], t, relu=True))
    return out


# ---------------------------------------------------------------------------
# Initialization (structure is the single source of truth for the converter)
# ---------------------------------------------------------------------------


def _bn_init(c: int) -> Params:
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def _conv_init(key, kh, kw, cin, cout) -> Params:
    # reference init: normal(std=0.001) (keypoint_hrnet.py:483-499)
    w = 0.001 * jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)
    return {"w": w, "bn": _bn_init(cout)}


def _basic_init(key, cin, cout, with_down=False) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"conv1": _conv_init(k1, 3, 3, cin, cout), "conv2": _conv_init(k2, 3, 3, cout, cout)}
    if with_down or cin != cout:
        p["down"] = _conv_init(k3, 1, 1, cin, cout)
    return p


def _bottleneck_init(key, cin, planes, with_down) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "conv1": _conv_init(k1, 1, 1, cin, planes),
        "conv2": _conv_init(k2, 3, 3, planes, planes),
        "conv3": _conv_init(k3, 1, 1, planes, planes * 4),
    }
    if with_down:
        p["down"] = _conv_init(k4, 1, 1, cin, planes * 4)
    return p


def _module_init(key, num_branches, channels, multi_scale) -> Params:
    keys = jax.random.split(key, 2)
    branches = []
    bkeys = jax.random.split(keys[0], num_branches)
    for b in range(num_branches):
        blocks = []
        for i, bk in enumerate(jax.random.split(bkeys[b], 4)):
            blocks.append(_basic_init(bk, channels[b], channels[b]))
        branches.append(blocks)
    n_out = num_branches if multi_scale else 1
    fuse = []
    for i in range(n_out):
        row = []
        for j in range(num_branches):
            fk = jax.random.fold_in(keys[1], i * num_branches + j)
            if i == j:
                row.append(None)
            elif j > i:
                row.append(_conv_init(fk, 1, 1, channels[j], channels[i]))
            else:
                chain = []
                for k, ck in enumerate(jax.random.split(fk, i - j)):
                    cout = channels[i] if k == i - j - 1 else channels[j]
                    chain.append(_conv_init(ck, 3, 3, channels[j], cout))
                row.append(chain)
        fuse.append(row)
    return {"branches": branches, "fuse": fuse}


def init_params(key: jax.Array, num_keypoints: int = 57) -> Params:
    """Random parameter pytree with the reference architecture/shapes."""
    ks = jax.random.split(key, 12)
    params: Params = {}
    params["stem"] = {
        "conv1": _conv_init(ks[0], 3, 3, 3, 64),
        "conv2": _conv_init(ks[1], 3, 3, 64, 64),
    }
    l1 = []
    for i, bk in enumerate(jax.random.split(ks[2], 4)):
        l1.append(_bottleneck_init(bk, 64 if i == 0 else 256, 64, with_down=(i == 0)))
    params["layer1"] = l1

    # transition1: 256 -> [48 (3x3 s1), 96 (3x3 s2 chain)]
    params["transition1"] = [
        _conv_init(jax.random.fold_in(ks[3], 0), 3, 3, 256, STAGE2[3][0]),
        [_conv_init(jax.random.fold_in(ks[3], 1), 3, 3, 256, STAGE2[3][1])],
    ]
    params["stage2"] = [
        _module_init(jax.random.fold_in(ks[4], m), STAGE2[1], STAGE2[3], True)
        for m in range(STAGE2[0])
    ]

    # transition2: [48, 96] -> [48, 96, 192]: only the new branch gets a conv
    params["transition2"] = [None, None, [_conv_init(ks[5], 3, 3, STAGE2[3][1], STAGE3[3][2])]]
    params["stage3"] = [
        _module_init(jax.random.fold_in(ks[6], m), STAGE3[1], STAGE3[3], True)
        for m in range(STAGE3[0])
    ]

    params["transition3"] = [None, None, None, [_conv_init(ks[7], 3, 3, STAGE3[3][2], STAGE4[3][3])]]
    params["stage4"] = [
        _module_init(jax.random.fold_in(ks[8], m), STAGE4[1], STAGE4[3], multi_scale=(m < STAGE4[0] - 1))
        for m in range(STAGE4[0])
    ]

    params["head"] = {
        "w": 0.001 * jax.random.normal(ks[9], (3, 3, STAGE4[3][0], num_keypoints), jnp.float32),
        "b": jnp.zeros((num_keypoints,), jnp.float32),
    }
    return params
