"""Shared NHWC primitive layers for the model zoo (torch-compatible
inference semantics: symmetric conv padding, BatchNorm eps 1e-5)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

BN_EPS = 1e-5  # torch BatchNorm2d default

Params = dict[str, Any]


def conv2d(
    x: jax.Array, w: jax.Array, stride: int = 1, padding: int | None = None
) -> jax.Array:
    """Conv, NHWC x HWIO -> NHWC.  Default padding = k//2 ('same' for odd
    kernels, torch autopad convention)."""
    k = w.shape[0]
    if padding is None:
        padding = k // 2
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def batch_norm(x: jax.Array, p: Params) -> jax.Array:
    """Inference-mode BatchNorm2d over the channel (last) axis; the
    scale/bias fold is computed in f32 regardless of activation dtype."""
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + BN_EPS)
    g = p["scale"].astype(jnp.float32)
    scale = (g * inv).astype(x.dtype)
    bias = (p["bias"].astype(jnp.float32) - p["mean"].astype(jnp.float32) * g * inv).astype(x.dtype)
    return x * scale + bias


def conv_bn(
    x: jax.Array,
    p: Params,
    stride: int = 1,
    padding: int | None = None,
    act: str | None = None,
) -> jax.Array:
    """Conv + BN + optional activation ('relu' | 'silu')."""
    y = batch_norm(conv2d(x, p["w"], stride, padding), p["bn"])
    if act == "relu":
        return jax.nn.relu(y)
    if act == "silu":
        return jax.nn.silu(y)
    return y


def bn_init(c: int) -> Params:
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def conv_init(key: jax.Array, k: int, cin: int, cout: int, std: float | None = None) -> Params:
    """Conv + BN parameter bundle; kaiming-uniform-ish by default."""
    if std is None:
        std = (2.0 / (k * k * cin)) ** 0.5
    w = std * jax.random.normal(key, (k, k, cin, cout), jnp.float32)
    return {"w": w, "bn": bn_init(cout)}
