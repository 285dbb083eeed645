"""Tracker GMC + appearance-hook behavior."""

import jax.numpy as jnp
import numpy as np

from eagle_tpu.config import TrackerConfig
from eagle_tpu.pipeline.temporal import masked_median
from eagle_tpu.track import botsort

D = 8


def _dets(boxes, confs):
    b = np.zeros((D, 4), np.float32)
    c = np.zeros((D,), np.float32)
    v = np.zeros((D,), bool)
    for i, (bb, cc) in enumerate(zip(boxes, confs)):
        b[i], c[i], v[i] = bb, cc, True
    return jnp.asarray(b), jnp.asarray(c), jnp.zeros((D,), jnp.int32), jnp.asarray(v)


def test_masked_median():
    v = jnp.asarray([5.0, 1.0, 9.0, 3.0])
    m = jnp.asarray([True, True, False, True])
    assert float(masked_median(v, m)) == 3.0
    assert float(masked_median(v, jnp.zeros(4, bool))) == 0.0


def test_gmc_keeps_id_under_camera_pan():
    """A large camera jump breaks IoU association unless the GMC shift
    compensates it."""
    cfg = TrackerConfig(max_tracks=8)
    box0 = [100.0, 100.0, 130.0, 160.0]
    jump = 55.0  # more than box width: zero IoU without compensation
    box1 = [100.0 + jump, 100.0, 130.0 + jump, 160.0]

    def run(shift):
        warp = jnp.asarray([[1.0, 0.0, shift[0]], [0.0, 1.0, shift[1]]])
        state = botsort.init_state(8)
        state, out0 = botsort.step(state, *_dets([box0], [0.9]), cfg)
        tid = int(out0.track_id[np.argmax(np.asarray(out0.valid))])
        state, out1 = botsort.step(state, *_dets([box1], [0.9]), cfg, gmc_warp=warp)
        ids = [int(out1.track_id[i]) for i in range(8) if bool(out1.valid[i])]
        return tid, ids

    tid, ids = run((jump, 0.0))
    assert ids == [tid], "compensated pan must keep the id"
    tid2, ids2 = run((0.0, 0.0))
    assert ids2 != [tid2], "uncompensated pan should break the match"


def test_appearance_resolves_ambiguous_association():
    """Two crossing targets with identical geometry: appearance embeddings
    must decide the assignment."""
    cfg = TrackerConfig(max_tracks=8, use_appearance=True, embed_dim=4, gmc="off")
    ea = np.array([1.0, 0, 0, 0], np.float32)
    eb = np.array([0, 1.0, 0, 0], np.float32)

    def embeds(order):
        e = np.zeros((D, 4), np.float32)
        e[0], e[1] = order
        return jnp.asarray(e)

    state = botsort.init_state(8, embed_dim=4)
    b0 = [100.0, 100.0, 200.0, 200.0]
    b1 = [160.0, 100.0, 260.0, 200.0]
    state, out = botsort.step(state, *_dets([b0, b1], [0.9, 0.9]), cfg, det_embed=embeds((ea, eb)))
    ids0 = {int(np.asarray(out.boxes[i])[0]): int(out.track_id[i]) for i in range(8) if bool(out.valid[i])}

    # both targets converge near the midpoint (IoU distance to both tracks
    # within the proximity gate): embeddings swapped in detection order
    # must decide the assignment
    d0 = [128.0, 100.0, 228.0, 200.0]  # embedding eb -> belongs to track B
    d1 = [132.0, 100.0, 232.0, 200.0]  # embedding ea -> belongs to track A
    state, out = botsort.step(
        state, *_dets([d0, d1], [0.9, 0.9]), cfg, det_embed=embeds((eb, ea))
    )
    got = {int(out.track_id[i]): int(out.det_idx[i]) for i in range(8) if bool(out.valid[i])}
    id_a = ids0[100]
    id_b = ids0[160]
    assert got[id_a] == 1 and got[id_b] == 0
