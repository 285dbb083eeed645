"""Pallas LK-flow kernel: interpreter-mode equivalence with the XLA path.

Only the lane-batched v2 kernel ships (``FlowConfig.backend="pallas2"``);
the per-point v1 kernel measured slower than both v2 and the XLA path and
was deleted (docs/architecture.md, "Pallas flow backends").
"""

import jax.numpy as jnp
import numpy as np
import pytest

from eagle_tpu.ops.optical_flow import lk_flow
from eagle_tpu.ops.pallas_flow2 import lk_flow_pallas2
from eagle_tpu.utils.synthetic import make_scene


def test_pallas2_flow_matches_xla_path():
    scene = make_scene(num_frames=2, width=640, height=360, num_players=0, seed=9, pan_speed=2.0)
    vis = scene.keypoints_image
    inb = (vis[:, 0] > 40) & (vis[:, 0] < 600) & (vis[:, 1] > 40) & (vis[:, 1] < 320)
    pts = jnp.asarray(vis[inb][:16].astype(np.float32))
    valid = jnp.ones(len(pts), bool)
    prev = jnp.asarray(scene.frames[0])
    curr = jnp.asarray(scene.frames[1])

    ref_pts, ref_ok = lk_flow(prev, curr, pts, valid)
    pal_pts, pal_ok = lk_flow_pallas2(prev, curr, pts, valid, interpret=True)

    np.testing.assert_array_equal(np.asarray(ref_ok), np.asarray(pal_ok))
    np.testing.assert_allclose(
        np.asarray(pal_pts)[np.asarray(ref_ok)],
        np.asarray(ref_pts)[np.asarray(ref_ok)],
        atol=1e-2,
    )


def test_unknown_flow_backend_raises():
    from eagle_tpu.config import FlowConfig, PipelineConfig
    from eagle_tpu.pipeline.temporal import flow_with_filters

    cfg = PipelineConfig(flow=FlowConfig(backend="pallas"))  # the deleted v1
    frame = jnp.zeros((32, 32, 3), jnp.uint8)
    pts = jnp.zeros((4, 2), jnp.float32)
    valid = jnp.ones(4, bool)
    with pytest.raises(ValueError, match="unknown flow backend"):
        flow_with_filters(frame, frame, pts, valid, cfg)
