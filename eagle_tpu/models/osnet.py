"""OSNet re-identification network (omni-scale feature learning), TPU-native.

The reference's tracker scores appearance with OSNet-x0.25 embeddings
(osnet_x0_25_msmt17.pt via boxmot -- coordinate_model.py:69).  This is a
functional NHWC re-implementation of the OSNet architecture (Zhou et al.,
ICCV'19): omni-scale residual blocks whose parallel depthwise-conv streams
of receptive field 3/5/7/9 are blended by a unified channel-attention
gate, with a 512-d embedding head.

Weight conversion follows the torchreid module layout (conv1, conv2..4 as
block+transition stacks, conv5, fc) -- see :func:`osnet_from_torch`.
Embeddings plug into the tracker's appearance slot
(:func:`eagle_tpu.track.botsort.step` ``det_embed``).
"""

from __future__ import annotations

import math
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from eagle_tpu.models.layers import bn_init, conv2d, conv_bn

Params = dict[str, Any]

#: stage channels for the x-scaled variants (x1.0 = [64, 256, 384, 512])
VARIANTS = {
    "x1_0": (64, 256, 384, 512),
    "x0_75": (48, 192, 288, 384),
    "x0_5": (32, 128, 192, 256),
    "x0_25": (16, 64, 96, 128),
}
BLOCKS_PER_STAGE = 2
FEATURE_DIM = 512
#: boxmot/torchreid ReID input resolution (H, W)
INPUT_HW = (256, 128)


def _depthwise(x: jax.Array, w: jax.Array) -> jax.Array:
    """3x3 depthwise conv, NHWC x HWIO(I=1) with C groups."""
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def light_conv3x3(x: jax.Array, p: Params) -> jax.Array:
    """1x1 pointwise + 3x3 depthwise + BN + relu (torchreid LightConv3x3)."""
    y = conv2d(x, p["pw"], padding=0)
    y = _depthwise(y, p["dw"])
    from eagle_tpu.models.layers import batch_norm

    return jax.nn.relu(batch_norm(y, p["bn"]))


def channel_gate(x: jax.Array, p: Params) -> jax.Array:
    """Squeeze-excite style unified aggregation gate."""
    s = x.mean(axis=(1, 2), keepdims=True)  # (N,1,1,C)
    s = jax.nn.relu(conv2d(s, p["fc1_w"], padding=0) + p["fc1_b"].astype(x.dtype))
    s = jax.nn.sigmoid(conv2d(s, p["fc2_w"], padding=0) + p["fc2_b"].astype(x.dtype))
    return x * s


def os_block(x: jax.Array, p: Params) -> jax.Array:
    """Omni-scale residual block: 4 gated multi-scale streams."""
    x1 = conv_bn(x, p["conv1"], padding=0, act="relu")
    acc = None
    for stream in p["streams"]:  # stream t = t+1 stacked LightConv3x3
        y = x1
        for lc in stream:
            y = light_conv3x3(y, lc)
        g = channel_gate(y, p["gate"])
        acc = g if acc is None else acc + g
    x3 = conv_bn(acc, p["conv3"], padding=0)
    res = conv_bn(x, p["down"], padding=0) if "down" in p else x
    return jax.nn.relu(x3 + res)


def _avgpool2(x: jax.Array) -> jax.Array:
    n, h, w, c = x.shape
    return x.reshape(n, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def _maxpool3x3s2(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x,
        -jnp.inf if x.dtype == jnp.float32 else jnp.finfo(x.dtype).min,
        jax.lax.max,
        (1, 3, 3, 1),
        (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def apply(params: Params, x: jax.Array, *, use_bf16: bool = False) -> jax.Array:
    """(N, 256, 128, 3) ImageNet-normalized RGB -> (N, 512) L2-normalized
    embeddings."""
    if use_bf16:
        x = x.astype(jnp.bfloat16)
    x = conv_bn(x, params["stem"], stride=2, padding=3, act="relu")  # 7x7 s2
    x = _maxpool3x3s2(x)
    for si, stage in enumerate((params["stage2"], params["stage3"], params["stage4"])):
        for blk in stage["blocks"]:
            x = os_block(x, blk)
        if "transition" in stage:
            x = conv_bn(x, stage["transition"], padding=0, act="relu")
            x = _avgpool2(x)
    x = conv_bn(x, params["conv5"], padding=0, act="relu")
    feat = x.mean(axis=(1, 2)).astype(jnp.float32)  # global average pool
    y = feat @ params["fc"]["w"] + params["fc"]["b"]
    # BN1d + relu head (torchreid fc block)
    bn = params["fc"]["bn"]
    inv = jax.lax.rsqrt(bn["var"] + 1e-5)
    y = jax.nn.relu((y - bn["mean"]) * inv * bn["scale"] + bn["bias"])
    return y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-12)


# ---------------------------------------------------------------------------
# init + conversion
# ---------------------------------------------------------------------------


def _light_init(key, cin, cout) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "pw": math.sqrt(2 / cin) * jax.random.normal(k1, (1, 1, cin, cout), jnp.float32),
        "dw": math.sqrt(2 / 9) * jax.random.normal(k2, (3, 3, 1, cout), jnp.float32),
        "bn": bn_init(cout),
    }


def _conv_init(key, k, cin, cout) -> Params:
    return {
        "w": math.sqrt(2 / (k * k * cin)) * jax.random.normal(key, (k, k, cin, cout), jnp.float32),
        "bn": bn_init(cout),
    }


def _block_init(key, cin, cout) -> Params:
    mid = cout // 4
    ks = jax.random.split(key, 16)
    p: Params = {
        "conv1": _conv_init(ks[0], 1, cin, mid),
        "streams": [
            [_light_init(jax.random.fold_in(ks[1 + t], j), mid, mid) for j in range(t + 1)]
            for t in range(4)
        ],
        "gate": {
            "fc1_w": math.sqrt(2 / mid) * jax.random.normal(ks[6], (1, 1, mid, mid // 16), jnp.float32),
            "fc1_b": jnp.zeros((mid // 16,), jnp.float32),
            "fc2_w": math.sqrt(2 / (mid // 16)) * jax.random.normal(ks[7], (1, 1, mid // 16, mid), jnp.float32),
            "fc2_b": jnp.zeros((mid,), jnp.float32),
        },
        "conv3": _conv_init(ks[8], 1, mid, cout),
    }
    if cin != cout:
        p["down"] = _conv_init(ks[9], 1, cin, cout)
    return p


def init_params(key: jax.Array, variant: str = "x0_25", feature_dim: int = FEATURE_DIM) -> Params:
    ch = VARIANTS[variant]
    ks = jax.random.split(key, 12)
    params: Params = {"stem": _conv_init(ks[0], 7, 3, ch[0])}
    ins = [ch[0], ch[1], ch[2]]
    outs = [ch[1], ch[2], ch[3]]
    for i, name in enumerate(("stage2", "stage3", "stage4")):
        blocks = [
            _block_init(jax.random.fold_in(ks[1 + i], b), ins[i] if b == 0 else outs[i], outs[i])
            for b in range(BLOCKS_PER_STAGE)
        ]
        stage: Params = {"blocks": blocks}
        if name != "stage4":  # spatial reduction after stages 2 and 3
            stage["transition"] = _conv_init(ks[4 + i], 1, outs[i], outs[i])
        params[name] = stage
    params["conv5"] = _conv_init(ks[8], 1, ch[3], ch[3])
    params["fc"] = {
        "w": math.sqrt(2 / ch[3]) * jax.random.normal(ks[9], (ch[3], feature_dim), jnp.float32),
        "b": jnp.zeros((feature_dim,), jnp.float32),
        "bn": bn_init(feature_dim),
    }
    return params


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _cv(sd: Mapping, prefix: str) -> Params:
    return {
        "w": _np(sd[f"{prefix}.conv.weight"]).transpose(2, 3, 1, 0),
        "bn": {
            "scale": _np(sd[f"{prefix}.bn.weight"]),
            "bias": _np(sd[f"{prefix}.bn.bias"]),
            "mean": _np(sd[f"{prefix}.bn.running_mean"]),
            "var": _np(sd[f"{prefix}.bn.running_var"]),
        },
    }


def _light(sd: Mapping, prefix: str) -> Params:
    return {
        "pw": _np(sd[f"{prefix}.conv1.weight"]).transpose(2, 3, 1, 0),
        "dw": _np(sd[f"{prefix}.conv2.weight"]).transpose(2, 3, 1, 0),
        "bn": {
            "scale": _np(sd[f"{prefix}.bn.weight"]),
            "bias": _np(sd[f"{prefix}.bn.bias"]),
            "mean": _np(sd[f"{prefix}.bn.running_mean"]),
            "var": _np(sd[f"{prefix}.bn.running_var"]),
        },
    }


def osnet_from_torch(state_dict: Mapping[str, Any]) -> Params:
    """Convert a torchreid OSNet state_dict (conv1 / conv2..4 block stacks
    with trailing transitions / conv5 / fc) into the pytree for
    :func:`apply`."""
    sd = state_dict
    params: Params = {"stem": _cv(sd, "conv1")}

    stream_names = ["conv2a", "conv2b", "conv2c", "conv2d"]
    for i, name in enumerate(("conv2", "conv3", "conv4")):
        blocks = []
        for b in range(BLOCKS_PER_STAGE):
            B = f"{name}.{b}"
            blk: Params = {
                "conv1": _cv(sd, f"{B}.conv1"),
                "conv3": _cv(sd, f"{B}.conv3"),
                "gate": {
                    "fc1_w": _np(sd[f"{B}.gate.fc1.weight"]).transpose(2, 3, 1, 0),
                    "fc1_b": _np(sd[f"{B}.gate.fc1.bias"]),
                    "fc2_w": _np(sd[f"{B}.gate.fc2.weight"]).transpose(2, 3, 1, 0),
                    "fc2_b": _np(sd[f"{B}.gate.fc2.bias"]),
                },
                "streams": [],
            }
            for t, sname in enumerate(stream_names):
                if t == 0:
                    blk["streams"].append([_light(sd, f"{B}.{sname}")])
                else:
                    blk["streams"].append(
                        [_light(sd, f"{B}.{sname}.{j}") for j in range(t + 1)]
                    )
            if f"{B}.downsample.conv.weight" in sd:
                blk["down"] = _cv(sd, f"{B}.downsample")
            blocks.append(blk)
        stage: Params = {"blocks": blocks}
        if f"{name}.{BLOCKS_PER_STAGE}.0.conv.weight" in sd:
            stage["transition"] = _cv(sd, f"{name}.{BLOCKS_PER_STAGE}.0")
        params[f"stage{i + 2}"] = stage

    params["conv5"] = _cv(sd, "conv5")
    params["fc"] = {
        "w": _np(sd["fc.0.weight"]).T,
        "b": _np(sd["fc.0.bias"]),
        "bn": {
            "scale": _np(sd["fc.1.weight"]),
            "bias": _np(sd["fc.1.bias"]),
            "mean": _np(sd["fc.1.running_mean"]),
            "var": _np(sd["fc.1.running_var"]),
        },
    }
    return params


def embed_boxes(
    params: Params, frames: jax.Array, boxes: jax.Array, *, use_bf16: bool = True
) -> jax.Array:
    """Per-frame ReID embeddings for use INSIDE a jitted (possibly
    GSPMD-sharded) detector program.

    frames : (B, H, W, 3) uint8 BGR; boxes : (B, K, 4) xyxy in frame
    pixels.  Returns (B, K, E) L2-normalized embeddings.

    Crops are resampled with :func:`~eagle_tpu.ops.kmeans.matmul_crops`
    (one-hot interpolation matmuls), NOT ``gather_crops``: the 4-tap
    advanced-index gather costs 187.6 ms/frame on the TPU at this shape
    vs ~1 ms/frame for the matmul form (scripts/measure_reid_parts.py;
    CLAUDE.md "no XLA gathers on hot paths").  The resample is vmapped
    over the frame axis (each frame samples only its own pixels), so a
    batch sharded on that axis partitions without cross-shard traffic
    under GSPMD.  bf16 crop taps wobble pixels by <=2 uint8 LSB — far
    below what a bf16 ReID forward resolves.
    """
    from eagle_tpu.ops.kmeans import matmul_crops
    from eagle_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD

    b, k = boxes.shape[:2]
    crop_dt = jnp.bfloat16 if use_bf16 else jnp.float32
    crops = jax.vmap(
        lambda f, bx: matmul_crops(f, bx, grid_hw=INPUT_HW, dtype=crop_dt)
    )(frames, boxes)  # (B, K, 256, 128, 3) BGR
    rgb = crops.reshape(b * k, *INPUT_HW, 3)[..., ::-1].astype(jnp.float32)
    mean = jnp.asarray(IMAGENET_MEAN) * 255.0
    std = jnp.asarray(IMAGENET_STD) * 255.0
    emb = apply(params, (rgb - mean) / std, use_bf16=use_bf16)
    return emb.reshape(b, k, -1)


def reid_embedding_fn(params: Params, *, use_bf16: bool = True):
    """Build a (frames, frame_idx, boxes) -> (B, 512) embedding callable
    compatible with the tracker's appearance slot: crops are resampled to
    256x128, ImageNet-normalized, embedded, L2-normalized."""
    import functools

    from eagle_tpu.ops.kmeans import gather_crops
    from eagle_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD

    @functools.partial(jax.jit)
    def fn(frames, frame_idx, boxes):
        crops = gather_crops(frames, frame_idx, boxes, grid_hw=INPUT_HW)  # BGR
        rgb = crops[..., ::-1]
        mean = jnp.asarray(IMAGENET_MEAN) * 255.0
        std = jnp.asarray(IMAGENET_STD) * 255.0
        return apply(params, (rgb - mean) / std, use_bf16=use_bf16)

    return fn
