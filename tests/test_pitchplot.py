"""Geometric pins for the native mplsoccer replacement
(eagle_tpu/utils/pitchplot.py): the Voronoi regions must tile the pitch
(reference contract: examples/voronoi.py:51-55 uses mplsoccer's
``pitch.voronoi`` whose regions partition the playable area), and
draw_pitch must emit the standard line set."""

import numpy as np
import pytest

from eagle_tpu import pitch as P
from eagle_tpu.utils.pitchplot import draw_pitch, voronoi_polygons

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")


def _shoelace(poly):
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))


@pytest.mark.parametrize("seed", [0, 7])
def test_voronoi_regions_tile_the_pitch(seed):
    rng = np.random.default_rng(seed)
    n = 22
    xs = rng.uniform(2, P.PITCH_LENGTH - 2, n)
    ys = rng.uniform(2, P.PITCH_WIDTH - 2, n)
    teams = (np.arange(n) % 2).astype(int)

    t0, t1 = voronoi_polygons(xs, ys, teams)
    # every point must own a (finite, mirrored-bounded) region
    assert len(t0) + len(t1) == n

    pitch_area = P.PITCH_LENGTH * P.PITCH_WIDTH
    total = 0.0
    for poly in t0 + t1:
        assert poly.ndim == 2 and poly.shape[1] == 2 and len(poly) >= 3
        # clipped to the pitch rectangle
        assert poly[:, 0].min() >= -1e-9 and poly[:, 0].max() <= P.PITCH_LENGTH + 1e-9
        assert poly[:, 1].min() >= -1e-9 and poly[:, 1].max() <= P.PITCH_WIDTH + 1e-9
        a = _shoelace(poly)
        assert a > 0.0
        total += a
    # the reflection trick guarantees the regions partition the pitch
    np.testing.assert_allclose(total, pitch_area, rtol=1e-9)


def test_voronoi_region_contains_its_seed_point():
    rng = np.random.default_rng(3)
    xs = rng.uniform(5, 100, 8)
    ys = rng.uniform(5, 63, 8)
    teams = np.zeros(8, int)
    polys, _ = voronoi_polygons(xs, ys, teams)
    # Voronoi regions are convex: the seed is inside its polygon iff it is
    # on the inner side of every edge (sign-consistent cross products)
    for (x, y), poly in zip(zip(xs, ys), polys):
        v = poly - [x, y]
        nv = np.roll(v, -1, axis=0)
        cross = v[:, 0] * nv[:, 1] - v[:, 1] * nv[:, 0]
        assert (cross >= -1e-9).all() or (cross <= 1e-9).all()


def test_draw_pitch_emits_standard_lines():
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    draw_pitch(ax)
    xs_all, ys_all = [], []
    for ln in ax.lines:
        xs_all.append(np.asarray(ln.get_xdata(), float))
        ys_all.append(np.asarray(ln.get_ydata(), float))
    # outline + halfway + 2x(penalty area 3 + goal area 3 + goal box 3)
    # + center circle + 2 penalty arcs = 24 line artists
    assert len(ax.lines) >= 24
    allx = np.concatenate(xs_all)
    ally = np.concatenate(ys_all)
    # everything within the pitch bounds (goals extend 2m behind the line)
    assert allx.min() >= -2 - 1e-9 and allx.max() <= P.PITCH_LENGTH + 2 + 1e-9
    assert ally.min() >= -1e-9 and ally.max() <= P.PITCH_WIDTH + 1e-9

    # the four touchline/goal-line segments exist exactly
    segs = {tuple(np.round(np.concatenate([x, y]), 6)) for x, y in zip(xs_all, ys_all)}
    L, W = P.PITCH_LENGTH, P.PITCH_WIDTH
    for seg in ([0, L, 0, 0], [0, L, W, W], [0, 0, 0, W], [L, L, 0, W]):
        assert tuple(np.round(np.asarray(seg, float), 6)) in segs
    # center circle radius pinned
    circ = [
        (x, y)
        for x, y in zip(xs_all, ys_all)
        if len(x) == 120
    ]
    assert circ, "center circle missing"
    cx, cy = circ[0]
    r = np.hypot(cx - L / 2, cy - W / 2)
    np.testing.assert_allclose(r, P.CIRCLE_RADIUS, rtol=1e-6)
    plt.close(fig)
