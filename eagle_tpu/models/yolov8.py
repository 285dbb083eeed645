"""YOLOv8 detector, TPU-native.

Functional JAX re-implementation of the detector family the reference
consumes through ultralytics (coordinate_model.py:54-57: detector_medium
@640 on CPU, detector_large_hd @960 otherwise; 5 classes, :61): CSP/C2f
backbone, SPPF, PAN-FPN neck, and the anchor-free decoupled head with
Distribution-Focal-Loss box regression.

Everything is NHWC / HWIO, pure functions over an explicit parameter
pytree, with static shapes end to end; the raw head output is decoded to
(N, num_anchors, 4 + nc) boxes+scores on device and fed to the on-device
NMS in :mod:`eagle_tpu.ops.nms`.

Weight conversion from ultralytics checkpoints follows the standard module
numbering (model.0 .. model.22) -- see :func:`yolov8_from_torch`.
"""

from __future__ import annotations

import math
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from eagle_tpu.models.layers import conv_bn, conv_init

Params = dict[str, Any]

#: depth multiple, width multiple, ratio (P5 channel multiplier)
VARIANTS = {
    "n": (1 / 3, 0.25, 2.0),
    "s": (1 / 3, 0.50, 2.0),
    "m": (2 / 3, 0.75, 1.5),
    "l": (1.0, 1.00, 1.0),
    "x": (1.0, 1.25, 1.0),
}

REG_MAX = 16  # DFL bins per box side
STRIDES = (8, 16, 32)


def _scaled(variant: str):
    d, w, r = VARIANTS[variant]

    def ch(c):  # width-scaled channel count (ultralytics make_divisible by 8)
        return int(math.ceil(c * w / 8) * 8)

    def n(x):  # depth-scaled block count
        return max(1, round(x * d))

    return ch, n, r


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def bottleneck(x: jax.Array, p: Params, shortcut: bool) -> jax.Array:
    y = conv_bn(x, p["cv1"], act="silu")
    y = conv_bn(y, p["cv2"], act="silu")
    return x + y if shortcut else y


def c2f(x: jax.Array, p: Params, shortcut: bool) -> jax.Array:
    """Cross-stage partial block: split, n bottlenecks each appended to the
    concat list, 1x1 fuse."""
    y = conv_bn(x, p["cv1"], act="silu")
    c = y.shape[-1] // 2
    parts = [y[..., :c], y[..., c:]]
    for bp in p["m"]:
        parts.append(bottleneck(parts[-1], bp, shortcut))
    return conv_bn(jnp.concatenate(parts, axis=-1), p["cv2"], act="silu")


def sppf(x: jax.Array, p: Params) -> jax.Array:
    """Spatial pyramid pooling (fast): 3 chained 5x5 stride-1 maxpools."""
    y = conv_bn(x, p["cv1"], act="silu")
    outs = [y]
    for _ in range(3):
        outs.append(
            jax.lax.reduce_window(
                outs[-1],
                -jnp.inf if outs[-1].dtype == jnp.float32 else jnp.finfo(outs[-1].dtype).min,
                jax.lax.max,
                (1, 5, 5, 1),
                (1, 1, 1, 1),
                ((0, 0), (2, 2), (2, 2), (0, 0)),
            )
        )
    return conv_bn(jnp.concatenate(outs, axis=-1), p["cv2"], act="silu")


def _upsample2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x (torch nn.Upsample(scale_factor=2, 'nearest'))."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


# ---------------------------------------------------------------------------
# Network
# ---------------------------------------------------------------------------


def apply(
    params: Params, x: jax.Array, *, variant: str = "l", use_bf16: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Forward pass + box decode.

    Parameters
    ----------
    x : (N, S, S, 3) float32 in [0, 1] (letterboxed)

    Returns
    -------
    boxes : (N, A, 4) xyxy in input-pixel coordinates
    scores : (N, A, nc) per-class sigmoid scores
    where A = sum over strides of (S/stride)^2.
    """
    if use_bf16:
        x = x.astype(jnp.bfloat16)
    B = params["backbone"]
    x = conv_bn(x, B["stem"], stride=2, act="silu")  # P1
    x = conv_bn(x, B["down2"], stride=2, act="silu")  # P2
    x = c2f(x, B["c2f2"], True)
    x = conv_bn(x, B["down3"], stride=2, act="silu")
    p3 = c2f(x, B["c2f3"], True)
    x = conv_bn(p3, B["down4"], stride=2, act="silu")
    p4 = c2f(x, B["c2f4"], True)
    x = conv_bn(p4, B["down5"], stride=2, act="silu")
    x = c2f(x, B["c2f5"], True)
    p5 = sppf(x, B["sppf"])

    N = params["neck"]
    t = jnp.concatenate([_upsample2x(p5), p4], axis=-1)
    t1 = c2f(t, N["c2f_up4"], False)
    t = jnp.concatenate([_upsample2x(t1), p3], axis=-1)
    out3 = c2f(t, N["c2f_up3"], False)
    t = jnp.concatenate([conv_bn(out3, N["down34"], stride=2, act="silu"), t1], axis=-1)
    out4 = c2f(t, N["c2f_down4"], False)
    t = jnp.concatenate([conv_bn(out4, N["down45"], stride=2, act="silu"), p5], axis=-1)
    out5 = c2f(t, N["c2f_down5"], False)

    return _detect_head(params["head"], [out3, out4, out5], x_size=x.shape[1] * 4)


def _detect_head(head: Params, feats: list[jax.Array], x_size: int) -> tuple[jax.Array, jax.Array]:
    """Decoupled anchor-free head with DFL decode (per scale: two 3x3 conv
    stacks into 4*REG_MAX box logits and nc class logits)."""
    boxes_all, scores_all = [], []
    for i, f in enumerate(feats):
        hp = head["levels"][i]
        b = conv_bn(f, hp["box"][0], act="silu")
        b = conv_bn(b, hp["box"][1], act="silu")
        b = jax.lax.conv_general_dilated(
            b, hp["box_out"]["w"].astype(b.dtype), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + hp["box_out"]["b"].astype(b.dtype)
        c = conv_bn(f, hp["cls"][0], act="silu")
        c = conv_bn(c, hp["cls"][1], act="silu")
        c = jax.lax.conv_general_dilated(
            c, hp["cls_out"]["w"].astype(c.dtype), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + hp["cls_out"]["b"].astype(c.dtype)

        n, h, w, _ = b.shape
        stride = STRIDES[i]
        # DFL: softmax expectation over REG_MAX bins per box side
        dist = b.reshape(n, h * w, 4, REG_MAX).astype(jnp.float32)
        dist = jax.nn.softmax(dist, axis=-1) @ jnp.arange(REG_MAX, dtype=jnp.float32)
        # anchor centers in feature-grid units
        ay, ax = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32) + 0.5,
            jnp.arange(w, dtype=jnp.float32) + 0.5,
            indexing="ij",
        )
        anchors = jnp.stack([ax.reshape(-1), ay.reshape(-1)], axis=-1)  # (hw, 2)
        lt, rb = dist[..., :2], dist[..., 2:]
        x1y1 = (anchors[None] - lt) * stride
        x2y2 = (anchors[None] + rb) * stride
        boxes_all.append(jnp.concatenate([x1y1, x2y2], axis=-1))
        scores_all.append(jax.nn.sigmoid(c.reshape(n, h * w, -1).astype(jnp.float32)))
    return jnp.concatenate(boxes_all, axis=1), jnp.concatenate(scores_all, axis=1)


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _c2f_init(key, cin, cout, n) -> Params:
    c = cout // 2
    ks = jax.random.split(key, n + 2)
    return {
        "cv1": conv_init(ks[0], 1, cin, 2 * c),
        "cv2": conv_init(ks[1], 1, (2 + n) * c, cout),
        "m": [
            {
                "cv1": conv_init(jax.random.fold_in(ks[2 + i], 0), 3, c, c),
                "cv2": conv_init(jax.random.fold_in(ks[2 + i], 1), 3, c, c),
            }
            for i in range(n)
        ],
    }


def init_params(key: jax.Array, variant: str = "l", num_classes: int = 5) -> Params:
    ch, n, r = _scaled(variant)
    c5 = int(ch(512) * r)
    ks = jax.random.split(key, 24)
    backbone = {
        "stem": conv_init(ks[0], 3, 3, ch(64)),
        "down2": conv_init(ks[1], 3, ch(64), ch(128)),
        "c2f2": _c2f_init(ks[2], ch(128), ch(128), n(3)),
        "down3": conv_init(ks[3], 3, ch(128), ch(256)),
        "c2f3": _c2f_init(ks[4], ch(256), ch(256), n(6)),
        "down4": conv_init(ks[5], 3, ch(256), ch(512)),
        "c2f4": _c2f_init(ks[6], ch(512), ch(512), n(6)),
        "down5": conv_init(ks[7], 3, ch(512), c5),
        "c2f5": _c2f_init(ks[8], c5, c5, n(3)),
        "sppf": {
            "cv1": conv_init(ks[9], 1, c5, c5 // 2),
            "cv2": conv_init(ks[10], 1, c5 * 2, c5),
        },
    }
    neck = {
        "c2f_up4": _c2f_init(ks[11], c5 + ch(512), ch(512), n(3)),
        "c2f_up3": _c2f_init(ks[12], ch(512) + ch(256), ch(256), n(3)),
        "down34": conv_init(ks[13], 3, ch(256), ch(256)),
        "c2f_down4": _c2f_init(ks[14], ch(256) + ch(512), ch(512), n(3)),
        "down45": conv_init(ks[15], 3, ch(512), ch(512)),
        "c2f_down5": _c2f_init(ks[16], ch(512) + c5, c5, n(3)),
    }
    chans = (ch(256), ch(512), c5)
    c2 = max(16, chans[0] // 4, REG_MAX * 4)
    c3 = max(chans[0], min(num_classes, 100))
    levels = []
    for i, cf in enumerate(chans):
        k = jax.random.fold_in(ks[17], i)
        kk = jax.random.split(k, 6)
        levels.append(
            {
                "box": [conv_init(kk[0], 3, cf, c2), conv_init(kk[1], 3, c2, c2)],
                "box_out": {
                    "w": 0.01 * jax.random.normal(kk[2], (1, 1, c2, 4 * REG_MAX), jnp.float32),
                    "b": jnp.ones((4 * REG_MAX,), jnp.float32),
                },
                "cls": [conv_init(kk[3], 3, cf, c3), conv_init(kk[4], 3, c3, c3)],
                "cls_out": {
                    "w": 0.01 * jax.random.normal(kk[5], (1, 1, c3, num_classes), jnp.float32),
                    # bias init so initial class probabilities are small
                    "b": jnp.full((num_classes,), -4.0, jnp.float32),
                },
            }
        )
    return {"backbone": backbone, "neck": neck, "head": {"levels": levels}}


# ---------------------------------------------------------------------------
# Ultralytics weight conversion
# ---------------------------------------------------------------------------

# my pytree path -> ultralytics module index
_BACKBONE_MAP = [
    ("stem", 0), ("down2", 1), ("c2f2", 2), ("down3", 3), ("c2f3", 4),
    ("down4", 5), ("c2f4", 6), ("down5", 7), ("c2f5", 8), ("sppf", 9),
]
_NECK_MAP = [
    ("c2f_up4", 12), ("c2f_up3", 15), ("down34", 16),
    ("c2f_down4", 18), ("down45", 19), ("c2f_down5", 21),
]


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


#: ultralytics builds its Conv BatchNorm2d with eps=1e-3 (modules/conv.py),
#: while the runtime batch_norm uses the torch default 1e-5 (layers.BN_EPS,
#: correct for HRNet/OSNet).  The converter folds the difference into the
#: stored variance so sqrt(var' + 1e-5) == sqrt(var + 1e-3) exactly.
_ULTRALYTICS_BN_EPS = 1e-3


def _cv(sd: Mapping, prefix: str) -> Params:
    """ultralytics Conv module: {prefix}.conv.weight + {prefix}.bn.*"""
    from eagle_tpu.models.layers import BN_EPS

    return {
        "w": _np(sd[f"{prefix}.conv.weight"]).transpose(2, 3, 1, 0),
        "bn": {
            "scale": _np(sd[f"{prefix}.bn.weight"]),
            "bias": _np(sd[f"{prefix}.bn.bias"]),
            "mean": _np(sd[f"{prefix}.bn.running_mean"]),
            "var": _np(sd[f"{prefix}.bn.running_var"]) + (_ULTRALYTICS_BN_EPS - BN_EPS),
        },
    }


def _cv_c2f(sd: Mapping, prefix: str) -> Params:
    out = {"cv1": _cv(sd, f"{prefix}.cv1"), "cv2": _cv(sd, f"{prefix}.cv2"), "m": []}
    i = 0
    while f"{prefix}.m.{i}.cv1.conv.weight" in sd:
        out["m"].append(
            {"cv1": _cv(sd, f"{prefix}.m.{i}.cv1"), "cv2": _cv(sd, f"{prefix}.m.{i}.cv2")}
        )
        i += 1
    return out


def _identity_var() -> np.ndarray:
    """A float32 variance v with rsqrt(v + BN_EPS) == 1.0 exactly, so an
    identity BN wrapper around fused conv weights is a bit-exact no-op."""
    from eagle_tpu.models.layers import BN_EPS

    v = np.float32(1.0) - np.float32(BN_EPS)
    while np.float32(v + np.float32(BN_EPS)) < np.float32(1.0):
        v = np.nextafter(v, np.float32(2.0), dtype=np.float32)
    while np.float32(v + np.float32(BN_EPS)) > np.float32(1.0):
        v = np.nextafter(v, np.float32(0.0), dtype=np.float32)
    return v


def _cv_fused(weights: Mapping, prefix: str) -> Params:
    """Fused ultralytics Conv (BN folded at export, conv carries a bias):
    wrap in an exactly-identity BN holding the bias."""
    b = _np(weights[f"{prefix}.conv.bias"])
    c = b.shape[0]
    return {
        "w": _np(weights[f"{prefix}.conv.weight"]).transpose(2, 3, 1, 0),
        "bn": {
            "scale": np.ones((c,), np.float32),
            "bias": b,
            "mean": np.zeros((c,), np.float32),
            "var": np.full((c,), _identity_var(), np.float32),
        },
    }


def yolov8_from_fused(weights: Mapping[str, Any], prefix: str = "model.") -> Params:
    """Convert a BN-fused ultralytics weight mapping (what an ONNX export
    contains: ``model.fuse()`` folds every BatchNorm into its conv before
    serialization, reference CPU path coordinate_model.py:54-57) into the
    pytree consumed by :func:`apply`."""
    sd = weights

    def cv(p):
        return _cv_fused(sd, p)

    def c2f_(p):
        out = {"cv1": cv(f"{p}.cv1"), "cv2": cv(f"{p}.cv2"), "m": []}
        i = 0
        while f"{p}.m.{i}.cv1.conv.weight" in sd:
            out["m"].append({"cv1": cv(f"{p}.m.{i}.cv1"), "cv2": cv(f"{p}.m.{i}.cv2")})
            i += 1
        return out

    backbone: Params = {}
    for name, idx in _BACKBONE_MAP:
        p = f"{prefix}{idx}"
        if name.startswith("c2f"):
            backbone[name] = c2f_(p)
        elif name == "sppf":
            backbone[name] = {"cv1": cv(f"{p}.cv1"), "cv2": cv(f"{p}.cv2")}
        else:
            backbone[name] = cv(p)
    neck: Params = {}
    for name, idx in _NECK_MAP:
        p = f"{prefix}{idx}"
        neck[name] = c2f_(p) if name.startswith("c2f") else cv(p)

    levels = []
    for i in range(3):
        d = f"{prefix}22"
        levels.append(
            {
                "box": [cv(f"{d}.cv2.{i}.0"), cv(f"{d}.cv2.{i}.1")],
                "box_out": {
                    "w": _np(sd[f"{d}.cv2.{i}.2.weight"]).transpose(2, 3, 1, 0),
                    "b": _np(sd[f"{d}.cv2.{i}.2.bias"]),
                },
                "cls": [cv(f"{d}.cv3.{i}.0"), cv(f"{d}.cv3.{i}.1")],
                "cls_out": {
                    "w": _np(sd[f"{d}.cv3.{i}.2.weight"]).transpose(2, 3, 1, 0),
                    "b": _np(sd[f"{d}.cv3.{i}.2.bias"]),
                },
            }
        )
    return {"backbone": backbone, "neck": neck, "head": {"levels": levels}}


def yolov8_from_torch(state_dict: Mapping[str, Any], prefix: str = "model.") -> Params:
    """Convert an ultralytics YOLOv8 state_dict (module indices model.0 ..
    model.22, detect head cv2=box / cv3=cls branches) into the pytree
    consumed by :func:`apply`.  The DFL projection conv is implicit in the
    decode and is not converted."""
    sd = state_dict
    backbone: Params = {}
    for name, idx in _BACKBONE_MAP:
        p = f"{prefix}{idx}"
        if name.startswith("c2f"):
            backbone[name] = _cv_c2f(sd, p)
        elif name == "sppf":
            backbone[name] = {"cv1": _cv(sd, f"{p}.cv1"), "cv2": _cv(sd, f"{p}.cv2")}
        else:
            backbone[name] = _cv(sd, p)
    neck: Params = {}
    for name, idx in _NECK_MAP:
        p = f"{prefix}{idx}"
        neck[name] = _cv_c2f(sd, p) if name.startswith("c2f") else _cv(sd, p)

    levels = []
    for i in range(3):
        d = f"{prefix}22"
        levels.append(
            {
                "box": [_cv(sd, f"{d}.cv2.{i}.0"), _cv(sd, f"{d}.cv2.{i}.1")],
                "box_out": {
                    "w": _np(sd[f"{d}.cv2.{i}.2.weight"]).transpose(2, 3, 1, 0),
                    "b": _np(sd[f"{d}.cv2.{i}.2.bias"]),
                },
                "cls": [_cv(sd, f"{d}.cv3.{i}.0"), _cv(sd, f"{d}.cv3.{i}.1")],
                "cls_out": {
                    "w": _np(sd[f"{d}.cv3.{i}.2.weight"]).transpose(2, 3, 1, 0),
                    "b": _np(sd[f"{d}.cv3.{i}.2.bias"]),
                },
            }
        )
    return {"backbone": backbone, "neck": neck, "head": {"levels": levels}}
