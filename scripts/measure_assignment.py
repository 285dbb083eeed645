"""Measure auction-vs-exact-JV assignment disagreement (VERDICT r3 #2).

The production tracker defaults to the synchronous auction solver
(`ops/assignment.py::masked_auction`); boxmot calls lapx's exact JV solve
with a cost limit.  This script quantifies where they differ, on the
matrix families where approximate auctions are known to diverge:

1. "broadcast": IoU costs from simulated box fields at football density
   (22 targets, noisy redetections) -- the typical frame.
2. "occlusion": the same plus clusters of near-coincident boxes (2-4 way
   occlusions), producing blocks of nearly-tied costs -- the hard frame.
3. "ties": costs quantized to a coarse grid, so exact ties abound -- the
   adversarial case.

For each family it reports, over N matrices:
- pct_any_diff: % of matrices where the matchings differ at all
- pct_rows_diff: % of (row) assignments that differ
- mean/max objective gap under the lapjv cost-limit objective
  (sum matched cost + gate/2 per unmatched row and column) -- a nonzero
  gap is a real suboptimality, a zero gap with different matchings is a
  tie swap.

Run: python scripts/measure_assignment.py  (prints one JSON line)
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp

from eagle_tpu.ops.assignment import masked_assignment, masked_auction


def iou_matrix(a, b):
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def make_boxes(rng, n, cluster_rate=0.0):
    """n track boxes; with cluster_rate, some are near-duplicates of
    earlier boxes (occlusion stacks)."""
    boxes = []
    for i in range(n):
        if boxes and rng.uniform() < cluster_rate:
            base = boxes[rng.integers(len(boxes))].copy()
            base[:2] += rng.normal(0, 3, 2)
            base[2:] = base[:2] + (base[2:] - base[:2]) * rng.uniform(0.9, 1.1)
            boxes.append(base)
        else:
            x, y = rng.uniform([0, 0], [1200, 600])
            w, h = rng.uniform([20, 45], [40, 85])
            boxes.append(np.array([x, y, x + w, y + h]))
    return np.asarray(boxes, np.float32)


def family_matrix(rng, family, n=22):
    if family == "ties":
        cost = rng.integers(0, 16, (n, n)).astype(np.float32) / 16.0
        return cost
    cluster = 0.35 if family == "occlusion" else 0.0
    tracks = make_boxes(rng, n, cluster)
    # detections = tracks re-observed with noise, shuffled, some clusters
    dets = tracks + rng.normal(0, 2.5, tracks.shape).astype(np.float32)
    if family == "occlusion":
        # occluders collapse onto each other: pick pairs and average them
        for _ in range(n // 4):
            i, j = rng.integers(0, n, 2)
            mid = (dets[i] + dets[j]) / 2
            dets[i] = mid + rng.normal(0, 1.0, 4)
            dets[j] = mid + rng.normal(0, 1.0, 4)
    rng.shuffle(dets)
    return (1.0 - iou_matrix(tracks, dets)).astype(np.float32)


def objective(cost, match, gate, n_cols):
    """lapjv cost-limit objective value of a matching."""
    total = 0.0
    used_cols = set()
    for r, c in enumerate(match):
        if c >= 0:
            total += float(cost[r, c])
            used_cols.add(int(c))
        else:
            total += gate / 2.0
    total += (n_cols - len(used_cols)) * gate / 2.0
    return total


def run_family(family, n_mats=400, n=22, gate=0.8, seed=0, iterations=512):
    rng = np.random.default_rng(seed)
    rows = jnp.ones(n, bool)
    cols = jnp.ones(n, bool)
    any_diff = 0
    rows_diff = 0
    rows_total = 0
    gaps = []
    for _ in range(n_mats):
        cost = family_matrix(rng, family, n)
        cj = jnp.asarray(cost)
        m_exact, _ = masked_assignment(cj, rows, cols, gate)
        m_auct, _ = masked_auction(cj, rows, cols, gate, iterations=iterations)
        me, ma = np.asarray(m_exact), np.asarray(m_auct)
        d = int((me != ma).sum())
        any_diff += d > 0
        rows_diff += d
        rows_total += n
        gaps.append(
            objective(cost, ma, gate, n) - objective(cost, me, gate, n)
        )
    gaps = np.asarray(gaps)
    return {
        "family": family,
        "iterations": iterations,
        "matrices": n_mats,
        "pct_any_diff": round(100.0 * any_diff / n_mats, 2),
        "pct_rows_diff": round(100.0 * rows_diff / rows_total, 3),
        "mean_obj_gap": round(float(gaps.mean()), 6),
        "max_obj_gap": round(float(gaps.max()), 6),
        "pct_obj_gap_nonzero": round(100.0 * float((gaps > 1e-5).mean()), 2),
    }


def main():
    out = [
        run_family(f, iterations=it)
        for f in ("broadcast", "occlusion", "ties")
        for it in (48, 512)
    ]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
