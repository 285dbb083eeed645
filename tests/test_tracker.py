"""Tracker behavior tests: stable IDs, BYTE low-conf recovery, lost-track
reacquisition, lifecycle, and scan compatibility."""

import jax
import jax.numpy as jnp
import numpy as np

from eagle_tpu.config import TrackerConfig
from eagle_tpu.track import botsort

CFG = TrackerConfig(max_tracks=16)
D = 8  # detection slots


def _dets(boxes, confs, cls=None):
    """Pack a ragged list of (box, conf) into fixed-shape det arrays."""
    n = len(boxes)
    b = np.zeros((D, 4), np.float32)
    c = np.zeros((D,), np.float32)
    k = np.zeros((D,), np.int32)
    v = np.zeros((D,), bool)
    for i, (bb, cc) in enumerate(zip(boxes, confs)):
        b[i] = bb
        c[i] = cc
        k[i] = 0 if cls is None else cls[i]
        v[i] = True
    return jnp.asarray(b), jnp.asarray(c), jnp.asarray(k), jnp.asarray(v)


def _run(frames_dets):
    state = botsort.init_state(CFG.max_tracks)
    outs = []
    for boxes, confs in frames_dets:
        b, c, k, v = _dets(boxes, confs)
        state, out = botsort.step(state, b, c, k, v, CFG)
        outs.append(
            {
                int(out.track_id[i]): np.asarray(out.boxes[i])
                for i in range(CFG.max_tracks)
                if bool(out.valid[i])
            }
        )
    return state, outs


def _moving_box(t, x0=100.0, y0=100.0, vx=5.0, vy=2.0, w=30.0, h=60.0):
    x, y = x0 + vx * t, y0 + vy * t
    return [x, y, x + w, y + h]


def test_stable_ids_two_objects():
    frames = []
    for t in range(10):
        frames.append(
            (
                [_moving_box(t), _moving_box(t, x0=400, y0=300, vx=-4)],
                [0.9, 0.85],
            )
        )
    _, outs = _run(frames)
    assert len(outs[0]) == 2  # first frame activates immediately
    ids0 = set(outs[0])
    for t in range(1, 10):
        assert set(outs[t]) == ids0, f"frame {t}: {set(outs[t])} != {ids0}"
    # track follows the motion
    id_a = min(ids0)
    np.testing.assert_allclose(outs[9][id_a][:2], _moving_box(9)[:2], atol=3.0)


def test_low_conf_byte_recovery():
    """A detection dropping below the high threshold must still associate
    (second BYTE stage) and keep its ID."""
    frames = []
    for t in range(8):
        conf = 0.9 if t not in (3, 4) else 0.3  # dips but above low thresh
        frames.append(([_moving_box(t)], [conf]))
    _, outs = _run(frames)
    ids = set(outs[0])
    for t in range(1, 8):
        assert set(outs[t]) == ids, f"frame {t}"


def test_lost_and_reacquired_keeps_id():
    frames = []
    for t in range(12):
        if 4 <= t <= 6:  # fully missed for 3 frames
            frames.append(([], []))
        else:
            frames.append(([_moving_box(t)], [0.9]))
    _, outs = _run(frames)
    ids = set(outs[0])
    assert outs[4] == {} and outs[6] == {}
    assert set(outs[7]) == ids  # reacquired with the same id
    assert set(outs[11]) == ids


def test_new_object_gets_new_id_and_needs_confirmation():
    frames = [([_moving_box(t)], [0.9]) for t in range(3)]
    # object B appears at frame 3
    for t in range(3, 7):
        frames.append(([_moving_box(t), _moving_box(t, x0=500, y0=50, vx=0)], [0.9, 0.9]))
    _, outs = _run(frames)
    ids0 = set(outs[0])
    assert len(ids0) == 1
    # B is tentative on its first frame (not frame 1) -> not emitted yet
    assert set(outs[3]) == ids0
    # activated from its second match on
    assert len(outs[4]) == 2
    new_id = (set(outs[4]) - ids0).pop()
    assert new_id > max(ids0)
    for t in range(5, 7):
        assert new_id in outs[t]


def test_track_buffer_expiry():
    cfg = TrackerConfig(max_tracks=16, track_buffer=3)
    state = botsort.init_state(cfg.max_tracks)
    b, c, k, v = _dets([_moving_box(0)], [0.9])
    state, out = botsort.step(state, b, c, k, v, cfg)
    tid = int(out.track_id[np.argmax(np.asarray(out.valid))])
    empty = _dets([], [])
    for _ in range(5):  # > buffer
        state, out = botsort.step(state, *empty, cfg)
    # reappearing object gets a NEW id (old track expired)
    b, c, k, v = _dets([_moving_box(6)], [0.9])
    state, out = botsort.step(state, b, c, k, v, cfg)  # tentative
    state, out = botsort.step(state, b, c, k, v, cfg)  # activated
    new_ids = [int(out.track_id[i]) for i in range(16) if bool(out.valid[i])]
    assert new_ids and new_ids[0] != tid


def test_scan_compatible():
    """The whole tracker must run under lax.scan (device-resident loop)."""
    T = 6
    boxes = np.zeros((T, D, 4), np.float32)
    confs = np.zeros((T, D), np.float32)
    valid = np.zeros((T, D), bool)
    for t in range(T):
        boxes[t, 0] = _moving_box(t)
        confs[t, 0] = 0.9
        valid[t, 0] = True

    def f(state, xs):
        b, c, v = xs
        state, out = botsort.step(state, b, c, jnp.zeros((D,), jnp.int32), v, CFG)
        return state, (out.track_id, out.valid)

    state = botsort.init_state(CFG.max_tracks)
    _, (ids, valids) = jax.jit(
        lambda s, xs: jax.lax.scan(f, s, xs)
    )(state, (jnp.asarray(boxes), jnp.asarray(confs), jnp.asarray(valid)))
    ids, valids = np.asarray(ids), np.asarray(valids)
    assert valids.sum() == T  # one emitted track per frame
    emitted = ids[valids]
    assert (emitted == emitted[0]).all()
