"""Frame-by-frame parity of the fixed-shape BoT-SORT tracker against the
numpy transcription of boxmot 15.0.2 (tests/boxmot_oracle.py) on recorded
synthetic detection streams: IDs, boxes, matched detection indices, and
lifecycle events (spawns, losses, re-finds, duplicate suppression) must
agree.  The reference's tracker contract is boxmot's update loop
(/root/reference/eagle/models/coordinate_model.py:68-72, :577)."""

import jax.numpy as jnp
import numpy as np
import pytest

from eagle_tpu.config import TrackerConfig
from eagle_tpu.ops.assignment import masked_assignment
from eagle_tpu.track import botsort

from .boxmot_oracle import BotSortOracle

T_SLOTS = 24
D_SLOTS = 16


def _to_slots(dets, embs=None, embed_dim=1):
    b = np.zeros((D_SLOTS, 4), np.float32)
    c = np.zeros((D_SLOTS,), np.float32)
    k = np.zeros((D_SLOTS,), np.int32)
    v = np.zeros((D_SLOTS,), bool)
    e = np.zeros((D_SLOTS, embed_dim), np.float32)
    for i, row in enumerate(dets):
        b[i] = row[:4]
        c[i] = row[4]
        k[i] = row[5]
        v[i] = True
        if embs is not None:
            e[i] = embs[i]
    return (
        jnp.asarray(b),
        jnp.asarray(c),
        jnp.asarray(k),
        jnp.asarray(v),
        jnp.asarray(e),
    )


def _run_ours(stream, cfg, warps=None, embs=None):
    state = botsort.init_state(T_SLOTS, cfg.embed_dim if cfg.use_appearance else 1)
    frames = []
    for t, dets in enumerate(stream):
        eb = embs[t] if embs is not None else None
        b, c, k, v, e = _to_slots(dets, eb, cfg.embed_dim if cfg.use_appearance else 1)
        warp = jnp.asarray(warps[t]) if warps is not None else None
        state, out = botsort.step(
            state, b, c, k, v, cfg, gmc_warp=warp,
            det_embed=e if cfg.use_appearance else None,
        )
        rows = {}
        for i in np.flatnonzero(np.asarray(out.valid)):
            rows[int(out.track_id[i])] = (
                np.asarray(out.boxes[i]),
                int(out.det_idx[i]),
                float(out.conf[i]),
                int(out.cls[i]),
            )
        frames.append(rows)
    return frames


def _run_oracle(stream, warps=None, embs=None, **kw):
    oracle = BotSortOracle(**kw)
    frames = []
    for t, dets in enumerate(stream):
        out = oracle.update(
            np.asarray(dets, float).reshape(-1, 6),
            embs=embs[t] if embs is not None else None,
            warp=np.asarray(warps[t]) if warps is not None else None,
        )
        rows = {}
        for row in out:
            rows[int(row[4])] = (row[:4], int(row[7]), float(row[5]), int(row[6]))
        frames.append(rows)
    return frames


def _assert_streams_equal(ours, oracle, box_atol=0.75):
    assert len(ours) == len(oracle)
    for t, (a, b) in enumerate(zip(ours, oracle)):
        assert set(a) == set(b), f"frame {t}: ids {sorted(a)} != {sorted(b)}"
        for tid in b:
            box_a, det_a, conf_a, cls_a = a[tid]
            box_b, det_b, conf_b, cls_b = b[tid]
            assert det_a == det_b, f"frame {t} id {tid}: det {det_a} != {det_b}"
            assert cls_a == cls_b
            np.testing.assert_allclose(conf_a, conf_b, atol=1e-5)
            # float32 device KF vs float64 oracle KF
            np.testing.assert_allclose(box_a, box_b, atol=box_atol, err_msg=f"frame {t} id {tid}")


def _make_stream(
    n_frames=40,
    n_targets=8,
    seed=0,
    dropout=0.12,
    low_conf_rate=0.15,
    late_spawn=True,
    leave=True,
):
    """Scripted broadcast-like detection stream: constant-velocity boxes
    with noise, confidence dips into the BYTE low band, dropouts, a target
    appearing mid-sequence and one leaving."""
    rng = np.random.default_rng(seed)
    pos = rng.uniform([60, 60], [1200, 600], (n_targets, 2))
    vel = rng.uniform(-4, 4, (n_targets, 2))
    wh = rng.uniform([24, 50], [40, 80], (n_targets, 2))
    stream = []
    for t in range(n_frames):
        dets = []
        for i in range(n_targets):
            if late_spawn and i == n_targets - 1 and t < 12:
                continue
            if leave and i == n_targets - 2 and t >= 25:
                continue
            if rng.uniform() < dropout and t not in (0, 1):
                continue
            p = pos[i] + t * vel[i] + rng.normal(0, 0.8, 2)
            w, h = wh[i]
            conf = rng.uniform(0.75, 0.95)
            if rng.uniform() < low_conf_rate and t > 2:
                conf = rng.uniform(0.2, 0.45)  # second-stage band
            x1, y1 = p[0] - w / 2, p[1] - h
            dets.append([x1, y1, x1 + w, y1 + h, conf, 0.0])
        rng.shuffle(dets)
        stream.append(np.asarray(dets, np.float32).reshape(-1, 6))
    return stream


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_parity_exact_solver(seed):
    stream = _make_stream(seed=seed)
    cfg = TrackerConfig(max_tracks=T_SLOTS, assignment="exact", gmc="off")
    _assert_streams_equal(_run_ours(stream, cfg), _run_oracle(stream))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_parity_auction_solver(seed):
    """The production auction solver implements the same lapjv cost-limit
    objective; on these streams it must agree with boxmot exactly."""
    stream = _make_stream(seed=seed + 10)
    cfg = TrackerConfig(max_tracks=T_SLOTS, assignment="auction", gmc="off")
    _assert_streams_equal(_run_ours(stream, cfg), _run_oracle(stream))


def test_parity_under_gmc_warp():
    """Both trackers receive the same camera-motion warps (rotation +
    zoom + pan) and must stay in lockstep."""
    rng = np.random.default_rng(5)
    stream = _make_stream(seed=5, dropout=0.08)
    warps = []
    for _ in stream:
        ang = rng.normal(0, 0.004)
        s = 1.0 + rng.normal(0, 0.002)
        tx, ty = rng.normal(0, 3.0, 2)
        warps.append(
            np.asarray(
                [[s * np.cos(ang), -s * np.sin(ang), tx], [s * np.sin(ang), s * np.cos(ang), ty]],
                np.float32,
            )
        )
    cfg = TrackerConfig(max_tracks=T_SLOTS, assignment="exact", gmc="affine")
    _assert_streams_equal(
        _run_ours(stream, cfg, warps=warps), _run_oracle(stream, warps=warps), box_atol=1.0
    )


def test_parity_with_reid_embeddings():
    """Appearance path: both sides get identical per-detection embeddings;
    association and EMA feature smoothing must agree."""
    rng = np.random.default_rng(9)
    n_targets = 6
    ident = rng.normal(0, 1, (n_targets, 16)).astype(np.float32)
    ident /= np.linalg.norm(ident, axis=1, keepdims=True)

    # rebuild the stream remembering which target produced each detection
    stream, embs = [], []
    pos = rng.uniform([100, 100], [1100, 500], (n_targets, 2))
    vel = rng.uniform(-3, 3, (n_targets, 2))
    for t in range(30):
        dets, es = [], []
        for i in range(n_targets):
            if rng.uniform() < 0.1 and t > 1:
                continue
            p = pos[i] + t * vel[i] + rng.normal(0, 0.5, 2)
            conf = rng.uniform(0.75, 0.95)
            dets.append([p[0] - 15, p[1] - 60, p[0] + 15, p[1], conf, 0.0])
            e = ident[i] + rng.normal(0, 0.05, 16).astype(np.float32)
            es.append(e / np.linalg.norm(e))
        stream.append(np.asarray(dets, np.float32).reshape(-1, 6))
        embs.append(np.asarray(es, np.float32).reshape(-1, 16))

    cfg = TrackerConfig(
        max_tracks=T_SLOTS, assignment="exact", gmc="off", use_appearance=True, embed_dim=16
    )
    _assert_streams_equal(
        _run_ours(stream, cfg, embs=embs),
        _run_oracle(stream, embs=embs, with_reid=True),
    )


def test_lapjv_cost_limit_tradeoff():
    """lap.lapjv(cost_limit=g) prefers leaving a track unmatched when the
    total with the limit penalty is cheaper -- NOT maximum cardinality."""
    cost = jnp.asarray([[0.79, 0.10], [2.0, 0.15]])
    rows = jnp.ones(2, bool)
    cols = jnp.ones(2, bool)
    # matching both: 0.79 + 0.15 = 0.94; row0->col1 alone: 0.10 + 0.8 = 0.90
    match, used = masked_assignment(cost, rows, cols, gate=0.8)
    assert match.tolist() == [1, -1]
    assert used.tolist() == [False, True]
