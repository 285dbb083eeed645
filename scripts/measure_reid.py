"""Measure what appearance (ReID) association is worth on occlusion-heavy
synthetic streams (VERDICT r3 #1: the justification for deviation #10).

The reference's boxmot BotSort associates with OSNet embeddings fused
into the IoU cost; eagle-tpu ships the same mechanism
(`TrackerConfig(use_appearance=True, embedder="osnet")`) but defaults it
off.  This script quantifies the cost of that default: ID switches
with/without appearance on streams engineered to be appearance's best
case -- pairs of targets crossing paths while detection drops out
mid-crossing, with *idealized* per-target identity embeddings (an upper
bound on what any real ReID net could contribute).

A switch is counted whenever a ground-truth target re-appears under a
different track id than it last held.

Run: python scripts/measure_reid.py   (prints one JSON line)
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp

from eagle_tpu.config import TrackerConfig
from eagle_tpu.track import botsort

T_SLOTS = 32
D_SLOTS = 16
EMB = 16


def crossing_stream(rng, n_frames=60, n_pairs=4, occl_len=4):
    """n_pairs pairs of targets swap positions mid-stream; detections drop
    for ``occl_len`` frames around each crossing (the tracker must re-find
    both on the far side).  Returns per-frame (dets (N,6), target_ids,
    embeddings)."""
    n = n_pairs * 2
    ident = rng.normal(0, 1, (n, EMB)).astype(np.float32)
    ident /= np.linalg.norm(ident, axis=1, keepdims=True)
    # pair k: targets 2k and 2k+1 start apart and swap x positions
    y0 = rng.uniform(80, 560, n_pairs)
    x0 = rng.uniform(100, 500, n_pairs)
    gap = rng.uniform(160, 260, n_pairs)
    cross_t = rng.integers(20, 40, n_pairs)
    wh = rng.uniform([26, 55], [38, 80], (n, 2)).astype(np.float32)
    frames = []
    for t in range(n_frames):
        dets, tids, embs = [], [], []
        for k in range(n_pairs):
            # linear swap trajectories crossing at cross_t[k]
            a = np.clip((t - (cross_t[k] - 10)) / 20.0, 0.0, 1.0)
            xa = x0[k] + a * gap[k]
            xb = x0[k] + gap[k] - a * gap[k]
            occluded = abs(t - cross_t[k]) <= occl_len // 2
            for i, x in ((2 * k, xa), (2 * k + 1, xb)):
                if occluded:
                    continue
                if rng.uniform() < 0.05 and t > 1:
                    continue
                w, h = wh[i]
                px = x + rng.normal(0, 0.8)
                py = y0[k] + rng.normal(0, 0.8)
                dets.append([px - w / 2, py - h, px + w / 2, py, rng.uniform(0.8, 0.95), 0.0])
                tids.append(i)
                e = ident[i] + rng.normal(0, 0.05, EMB).astype(np.float32)
                embs.append(e / np.linalg.norm(e))
        order = rng.permutation(len(dets))
        frames.append(
            (
                np.asarray(dets, np.float32).reshape(-1, 6)[order],
                [tids[j] for j in order],
                np.asarray(embs, np.float32).reshape(-1, EMB)[order],
            )
        )
    return frames


_jit_cache = {}


def _jitted_scan(cfg):
    """One jitted lax.scan over the whole stream (a per-frame eager step
    pays seconds of dispatch per stream on CPU)."""
    if cfg not in _jit_cache:
        import jax

        def step(state, x):
            b, c, k, v, e = x
            state, out = botsort.step(
                state, b, c, k, v, cfg,
                det_embed=e if cfg.use_appearance else None,
            )
            return state, (out.valid, out.track_id, out.det_idx)

        _jit_cache[cfg] = jax.jit(
            lambda s, xs: jax.lax.scan(step, s, xs)
        )
    return _jit_cache[cfg]


def ambiguous_stream(rng, n_frames=60, n_pairs=4, linger=6):
    """Appearance's BEST case: pairs converge to near-coincidence, linger
    overlapping for ``linger`` frames with BOTH detections present, then
    separate.  IoU association is ambiguous throughout the linger window
    (both detections match both tracks nearly equally, inside boxmot's
    proximity gate), so appearance is the only disambiguator."""
    n = n_pairs * 2
    ident = rng.normal(0, 1, (n, EMB)).astype(np.float32)
    ident /= np.linalg.norm(ident, axis=1, keepdims=True)
    y0 = rng.uniform(80, 560, n_pairs)
    x0 = rng.uniform(120, 500, n_pairs)
    gap = rng.uniform(140, 220, n_pairs)
    meet_t = rng.integers(20, 35, n_pairs)
    wh = rng.uniform([28, 60], [34, 72], (n_pairs, 2)).astype(np.float32)
    frames = []
    for t in range(n_frames):
        dets, tids, embs = [], [], []
        for k in range(n_pairs):
            # approach until meet_t, linger nearly coincident, swap sides
            mid = x0[k] + gap[k] / 2
            if t < meet_t[k]:
                a = t / max(1, meet_t[k])
                xa = x0[k] + a * (mid - 1.5 - x0[k])
                xb = x0[k] + gap[k] - a * (x0[k] + gap[k] - (mid + 1.5))
            elif t < meet_t[k] + linger:
                xa, xb = mid - 1.5, mid + 1.5
            else:
                # targets continue THROUGH each other (positions swap)
                a = (t - meet_t[k] - linger) / 10.0
                xa = mid + a * (gap[k] / 2)
                xb = mid - a * (gap[k] / 2)
            w, h = wh[k]
            for i, x in ((2 * k, xa), (2 * k + 1, xb)):
                px = x + rng.normal(0, 0.5)
                py = y0[k] + rng.normal(0, 0.5)
                dets.append([px - w / 2, py - h, px + w / 2, py, rng.uniform(0.82, 0.95), 0.0])
                tids.append(i)
                e = ident[i] + rng.normal(0, 0.05, EMB).astype(np.float32)
                embs.append(e / np.linalg.norm(e))
        order = rng.permutation(len(dets))
        frames.append(
            (
                np.asarray(dets, np.float32).reshape(-1, 6)[order],
                [tids[j] for j in order],
                np.asarray(embs, np.float32).reshape(-1, EMB)[order],
            )
        )
    return frames


def run_stream(frames, cfg):
    """Returns per-target list of track-id observations."""
    n = len(frames)
    edim = cfg.embed_dim if cfg.use_appearance else 1
    B = np.zeros((n, D_SLOTS, 4), np.float32)
    C = np.zeros((n, D_SLOTS), np.float32)
    K = np.zeros((n, D_SLOTS), np.int32)
    V = np.zeros((n, D_SLOTS), bool)
    E = np.zeros((n, D_SLOTS, edim), np.float32)
    for t, (dets, tids, embs) in enumerate(frames):
        for i, row in enumerate(dets):
            B[t, i], C[t, i], V[t, i] = row[:4], row[4], True
            if cfg.use_appearance:
                E[t, i] = embs[i]
    state = botsort.init_state(T_SLOTS, edim)
    _, (valid, track_id, det_idx) = _jitted_scan(cfg)(
        state, tuple(jnp.asarray(a) for a in (B, C, K, V, E))
    )
    valid, track_id, det_idx = (np.asarray(a) for a in (valid, track_id, det_idx))
    target_tracks = {}
    for t, (dets, tids, embs) in enumerate(frames):
        det_to_track = {}
        for s in np.flatnonzero(valid[t]):
            di = int(det_idx[t, s])
            if di >= 0:
                det_to_track[di] = int(track_id[t, s])
        for di, tgt in enumerate(tids):
            if di in det_to_track:
                target_tracks.setdefault(tgt, []).append(det_to_track[di])
    return target_tracks


def count_switches(target_tracks):
    sw = 0
    for seq in target_tracks.values():
        sw += sum(1 for a, b in zip(seq, seq[1:]) if a != b)
    return sw


def main():
    results = {}
    for fam_name, make in (
        ("occlusion_gap", crossing_stream),
        ("ambiguous_overlap", ambiguous_stream),
    ):
        for label, cfg in (
            ("iou_only", TrackerConfig(max_tracks=T_SLOTS, gmc="off")),
            (
                "appearance",
                TrackerConfig(
                    max_tracks=T_SLOTS, gmc="off", use_appearance=True, embed_dim=EMB
                ),
            ),
        ):
            total_sw = 0
            total_frames = 0
            for seed in range(20):
                rng = np.random.default_rng(seed)
                frames = make(rng)
                total_sw += count_switches(run_stream(frames, cfg))
                total_frames += len(frames)
            results[f"{fam_name}/{label}"] = {
                "id_switches": total_sw,
                "frames": total_frames,
                "switches_per_1000_frames": round(1000.0 * total_sw / total_frames, 2),
            }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
