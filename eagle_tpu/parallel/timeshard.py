"""Time-sharded processing with ICI halo exchange.

SURVEY.md sections 2.4/5.8: when a single clip's frame timeline is split
across chips, shard boundaries need cross-chip communication -- the
previous frame for optical flow and the carried (keypoint, homography)
state.  This module is that communication backend: ``jax.lax.ppermute``
neighbor exchange inside ``shard_map`` over the ``data`` mesh axis.

Two pieces:

- :func:`halo_exchange_prev` -- the frame halo: every shard receives its
  left neighbor's last frame so flow at shard-boundary frames sees the
  true previous frame.
- :func:`timesharded_keypoint_scan` -- the keypoint/homography scan over a
  time-sharded clip using the two-pass warm-start scheme: pass 1 scans
  every segment from a cold carry in parallel, final carries ppermute one
  shard to the right, pass 2 re-scans warm.  Because the keypoint state
  refreshes at the model cadence and the homography at its own cadence,
  segments whose boundaries land on refresh frames are *exact*; otherwise
  the cold-start transient washes out within one cadence interval.

Identity-critical tracking stays clip-parallel (one clip per device, see
:mod:`eagle_tpu.parallel.pipeline`) -- track identities cannot be split
mid-clip without changing semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from eagle_tpu.config import PipelineConfig
from eagle_tpu.pipeline import temporal


def _ici_axis(mesh) -> str:
    """Time-sharding splits ONE clip's timeline, so its warm-start ring
    must ride ICI: on a hierarchical (dcn, data) mesh run it per host over
    a 1-D submesh instead of letting the ring hop the slow DCN links."""
    assert len(mesh.axis_names) == 1, (
        "timeshard needs a 1-D (data,) mesh; build one per host with "
        "MeshConfig(hosts=1) over the host's local devices"
    )
    return mesh.axis_names[0]


def halo_exchange_prev(frames: jax.Array, mesh) -> jax.Array:
    """Previous-frame view of a time-sharded clip.

    frames : (N, H, W, 3), N divisible by the mesh size, sharded on axis 0.
    Returns prev (N, H, W, 3), also sharded: prev[t] = frames[t-1], with
    the shard-boundary entries delivered by a ppermute ring shift (frame 0
    repeats itself, like the sequential pipeline).
    """
    axis = _ici_axis(mesh)
    n_shards = mesh.devices.size

    def block(local):  # local: (N/S, H, W, 3)
        last = local[-1:]
        # send my last frame to my right neighbor
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        from_left = jax.lax.ppermute(last, axis, perm)
        idx = jax.lax.axis_index(axis)
        # shard 0's "left neighbor frame" is its own first frame
        from_left = jnp.where(idx == 0, local[:1], from_left)
        return jnp.concatenate([from_left, local[:-1]], axis=0)

    spec = P(axis, None, None, None)
    return shard_map(
        block, mesh=mesh, in_specs=(spec,), out_specs=spec, check_vma=False
    )(frames)


def timesharded_keypoint_scan(
    mesh,
    cfg: PipelineConfig,
    base_key: jax.Array,
    xs: temporal.FrameInputs,
    passes: int = 2,
):
    """Run the keypoint/homography portion of the temporal scan with the
    frame timeline sharded over the mesh.

    xs leaves are (N, ...) with N divisible by the mesh size; the
    ``prev_frame_bgr`` leaf should come from :func:`halo_exchange_prev`.

    Returns (kp_xy (N, 57, 2), kp_valid (N, 57), H (N, 3, 3), H_ok (N,)).
    """
    axis = _ici_axis(mesh)
    n_shards = mesh.devices.size
    cfg = cfg.replace(tracker=cfg.tracker)  # tracker state unused here

    def segment_scan(carry, seg_xs):
        def step(c, x):
            c2, out = temporal.temporal_step(c, x, cfg, base_key)
            return c2, (out.kp_xy, out.kp_valid, out.H, out.H_ok)

        return jax.lax.scan(step, carry, seg_xs)

    def block(seg_xs):
        idx = jax.lax.axis_index(axis)
        carry = temporal.init_carry(cfg)
        final, outs = segment_scan(carry, seg_xs)
        for _ in range(passes - 1):
            # warm-start: receive the left neighbor's final carry
            perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
            kp_xy = jax.lax.ppermute(final.kp_xy, axis, perm)
            kp_valid = jax.lax.ppermute(final.kp_valid, axis, perm)
            H = jax.lax.ppermute(final.H, axis, perm)
            H_ok = jax.lax.ppermute(final.H_ok, axis, perm)
            retry = jax.lax.ppermute(final.retry_h, axis, perm)
            cold = temporal.init_carry(cfg)
            warm = temporal.TemporalCarry(
                kp_xy=jnp.where(idx == 0, cold.kp_xy, kp_xy),
                kp_valid=jnp.where(idx == 0, cold.kp_valid, kp_valid),
                H=jnp.where(idx == 0, cold.H, H),
                H_ok=jnp.where(idx == 0, cold.H_ok, H_ok),
                retry_h=jnp.where(idx == 0, cold.retry_h, retry),
                tracker=cold.tracker,
            )
            final, outs = segment_scan(warm, seg_xs)
        return outs

    specs = jax.tree.map(lambda x: P(axis, *([None] * (x.ndim - 1))), xs)
    out_spec = (P(axis, None, None), P(axis, None), P(axis, None, None), P(axis))
    fn = shard_map(block, mesh=mesh, in_specs=(specs,), out_specs=out_spec, check_vma=False)
    return fn(xs)
