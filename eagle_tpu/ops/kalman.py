"""Kalman filters used by the pipeline.

Two flavors:

1. A batched 8-state constant-velocity filter on (x, y, w, h) boxes for
   the multi-object tracker -- the ByteTrack/BoT-SORT formulation with
   size-scaled noise (std_weight_position 1/20, std_weight_velocity
   1/160), vmapped over the fixed track budget.

2. :class:`CvKalman2D`, a bit-faithful host-side emulation of
   cv2.KalmanFilter(4, 2) with the exact pre/post state semantics the
   reference's ball selector depends on (processor.py:506-520; note the
   reference calls correct() before any predict(), which with cv2's
   zero-initialized errorCovPre makes the first correction a no-op --
   behavior preserved here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

STD_POS = 1.0 / 20.0
STD_VEL = 1.0 / 160.0

# host numpy constants (baked into jitted programs at trace time) -- a
# module-level jnp op would initialize the backend at import, hanging
# `import eagle_tpu` when the TPU is unreachable
_F = np.eye(8, dtype=np.float32) + np.eye(8, 8, 4, dtype=np.float32)  # const-velocity
_H = np.eye(4, 8, dtype=np.float32)  # observe xywh


def kf_initiate(xywh: jax.Array) -> tuple[jax.Array, jax.Array]:
    """New-track state from a measurement.  (4,) -> ((8,), (8, 8))."""
    mean = jnp.concatenate([xywh, jnp.zeros(4, xywh.dtype)])
    w, h = xywh[2], xywh[3]
    std = jnp.stack(
        [
            2 * STD_POS * w, 2 * STD_POS * h, 2 * STD_POS * w, 2 * STD_POS * h,
            10 * STD_VEL * w, 10 * STD_VEL * h, 10 * STD_VEL * w, 10 * STD_VEL * h,
        ]
    )
    return mean, jnp.diag(std * std)


def kf_predict(mean: jax.Array, cov: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Time update with size-scaled process noise."""
    w, h = mean[2], mean[3]
    std = jnp.stack(
        [
            STD_POS * w, STD_POS * h, STD_POS * w, STD_POS * h,
            STD_VEL * w, STD_VEL * h, STD_VEL * w, STD_VEL * h,
        ]
    )
    q = jnp.diag(std * std)
    mean = _F @ mean
    cov = _F @ cov @ _F.T + q
    return mean, cov


def kf_update(mean: jax.Array, cov: jax.Array, z: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Measurement update with size-scaled observation noise."""
    w, h = mean[2], mean[3]
    std = jnp.stack([STD_POS * w, STD_POS * h, STD_POS * w, STD_POS * h])
    r = jnp.diag(std * std)
    s = _H @ cov @ _H.T + r
    k = jnp.linalg.solve(s, _H @ cov).T  # (8, 4) Kalman gain
    innov = z - _H @ mean
    mean = mean + k @ innov
    cov = cov - k @ _H @ cov
    return mean, cov


kf_predict_batch = jax.vmap(kf_predict)
kf_update_batch = jax.vmap(kf_update)
kf_initiate_batch = jax.vmap(kf_initiate)


def xyxy_to_xywh(b: jax.Array) -> jax.Array:
    """(..., 4) corner boxes -> center/size."""
    wh = b[..., 2:] - b[..., :2]
    c = (b[..., 2:] + b[..., :2]) * 0.5
    return jnp.concatenate([c, wh], axis=-1)


def xywh_to_xyxy(b: jax.Array) -> jax.Array:
    half = b[..., 2:] * 0.5
    return jnp.concatenate([b[..., :2] - half, b[..., :2] + half], axis=-1)


class CvKalman2D:
    """Exact numpy emulation of cv2.KalmanFilter(4, 2) as configured by the
    reference ball selector: F couples position/velocity with dt=1,
    Q = 1e-5 I, R = 1e-1 I, errorCovPost = I, statePre set directly."""

    def __init__(self, initial_state, initial_velocity):
        self.F = np.array([[1, 0, 1, 0], [0, 1, 0, 1], [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
        self.H = np.array([[1, 0, 0, 0], [0, 1, 0, 0]], np.float32)
        self.Q = np.eye(4, dtype=np.float32) * 1e-5
        self.R = np.eye(2, dtype=np.float32) * 1e-1
        self.state_pre = np.array(
            [initial_state[0], initial_state[1], initial_velocity[0], initial_velocity[1]],
            np.float32,
        ).reshape(4, 1)
        self.state_post = np.zeros((4, 1), np.float32)
        self.p_pre = np.zeros((4, 4), np.float32)  # cv2 zero-initializes
        self.p_post = np.eye(4, dtype=np.float32)

    def predict(self) -> np.ndarray:
        self.state_pre = self.F @ self.state_post
        self.p_pre = self.F @ self.p_post @ self.F.T + self.Q
        # cv2 copies pre -> post so chained predicts keep advancing
        self.state_post = self.state_pre.copy()
        self.p_post = self.p_pre.copy()
        return self.state_pre

    def correct(self, measurement: np.ndarray) -> np.ndarray:
        z = np.asarray(measurement, np.float32).reshape(2, 1)
        s = self.H @ self.p_pre @ self.H.T + self.R
        k = self.p_pre @ self.H.T @ np.linalg.inv(s)
        self.state_post = self.state_pre + k @ (z - self.H @ self.state_pre)
        self.p_post = self.p_pre - k @ self.H @ self.p_pre
        return self.state_post
