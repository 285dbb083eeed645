"""Exact LAP solver vs scipy.optimize.linear_sum_assignment."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from eagle_tpu.ops.assignment import BIG, masked_assignment, solve_lap


@pytest.mark.parametrize("n,seed", [(4, 0), (8, 1), (16, 2), (32, 3), (64, 4)])
def test_solve_lap_optimal_cost(n, seed):
    rng = np.random.default_rng(seed)
    cost = rng.uniform(0, 1, (n, n)).astype(np.float32)
    ours = np.asarray(solve_lap(jnp.asarray(cost)))
    assert sorted(ours.tolist()) == list(range(n))  # a permutation
    ri, ci = linear_sum_assignment(cost)
    np.testing.assert_allclose(
        cost[np.arange(n), ours].sum(), cost[ri, ci].sum(), rtol=1e-6
    )


def test_solve_lap_with_infeasible_entries():
    cost = np.array(
        [[BIG, 1.0, BIG], [2.0, BIG, BIG], [BIG, BIG, 0.5]], dtype=np.float32
    )
    ours = np.asarray(solve_lap(jnp.asarray(cost)))
    np.testing.assert_array_equal(ours, [1, 0, 2])


def test_masked_assignment_gating():
    # 3 tracks x 4 detections; one track invalid; one det too far
    cost = np.array(
        [
            [0.1, 0.9, 0.9, 0.9],
            [0.9, 0.2, 0.9, 0.9],
            [0.9, 0.9, 0.3, 0.9],
        ],
        dtype=np.float32,
    )
    row_valid = jnp.asarray([True, True, False])
    col_valid = jnp.asarray([True, True, True, True])
    match, matched_col = masked_assignment(jnp.asarray(cost), row_valid, col_valid, gate=0.5)
    match = np.asarray(match)
    assert match[0] == 0 and match[1] == 1 and match[2] == -1
    np.testing.assert_array_equal(np.asarray(matched_col), [True, True, False, False])


@pytest.mark.parametrize("seed", range(5))
def test_masked_assignment_matches_scipy_on_feasible(seed):
    rng = np.random.default_rng(seed + 10)
    r, c = 12, 9
    cost = rng.uniform(0, 1, (r, c)).astype(np.float32)
    match, matched_col = masked_assignment(
        jnp.asarray(cost), jnp.ones(r, bool), jnp.ones(c, bool), gate=2.0
    )
    match = np.asarray(match)
    # all columns get matched (c < r), optimal total cost equals scipy's
    total = cost[match >= 0, match[match >= 0]].sum()
    ri, ci = linear_sum_assignment(cost)
    np.testing.assert_allclose(total, cost[ri, ci].sum(), rtol=1e-5)
    assert (match >= 0).sum() == c
    assert np.asarray(matched_col).all()


# ---------------------------------------------------------------------------
# Auction solver
# ---------------------------------------------------------------------------

from eagle_tpu.ops.assignment import auction_assignment, masked_auction


@pytest.mark.parametrize("seed", range(4))
def test_auction_near_optimal_random(seed):
    rng = np.random.default_rng(seed + 50)
    n = 24
    cost = rng.uniform(0, 1, (n, n)).astype(np.float32)
    match = np.asarray(auction_assignment(jnp.asarray(cost), jnp.ones((n, n), bool)))
    assert (match >= 0).all()
    assert len(set(match.tolist())) == n
    ri, ci = linear_sum_assignment(cost)
    total = cost[np.arange(n), match].sum()
    assert total <= cost[ri, ci].sum() + n * 2e-3  # within R*eps of optimal


def test_auction_exact_on_tracking_like_matrix():
    """Well-separated IoU costs (near-diagonal): auction must be optimal."""
    rng = np.random.default_rng(99)
    n = 12
    cost = rng.uniform(0.7, 1.0, (n, n)).astype(np.float32)
    perm = rng.permutation(n)
    cost[np.arange(n), perm] = rng.uniform(0.0, 0.2, n)
    match = np.asarray(auction_assignment(jnp.asarray(cost), jnp.ones((n, n), bool)))
    np.testing.assert_array_equal(match, perm)


def test_masked_auction_gating_matches_exact():
    rng = np.random.default_rng(7)
    cost = rng.uniform(0, 1, (10, 6)).astype(np.float32)
    rv = jnp.asarray(np.r_[np.ones(8, bool), np.zeros(2, bool)])
    cv = jnp.ones(6, bool)
    m_a, mc_a = masked_auction(jnp.asarray(cost), rv, cv, gate=0.6)
    m_e, mc_e = masked_assignment(jnp.asarray(cost), rv, cv, gate=0.6)
    # same total cost on matched pairs (pairings may differ only on ties)
    m_a, m_e = np.asarray(m_a), np.asarray(m_e)
    t_a = cost[m_a >= 0, m_a[m_a >= 0]].sum()
    t_e = cost[m_e >= 0, m_e[m_e >= 0]].sum()
    assert (m_a >= 0).sum() == (m_e >= 0).sum()
    assert abs(t_a - t_e) < 0.05


# ---------------------------------------------------------------------------
# Native C++ LAPJV
# ---------------------------------------------------------------------------


def test_native_lapjv_matches_scipy():
    from eagle_tpu import native

    if not native.lapjv_available():
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(123)
    for n in (4, 16, 64):
        cost = rng.uniform(0, 1, (n, n))
        match, total = native.lapjv(cost)
        assert sorted(match.tolist()) == list(range(n))
        ri, ci = linear_sum_assignment(cost)
        np.testing.assert_allclose(total, cost[ri, ci].sum(), rtol=1e-12)


def test_native_lapjv_batch():
    from eagle_tpu import native

    if not native.lapjv_available():
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(5)
    costs = rng.uniform(0, 1, (6, 12, 12))
    matches, totals = native.lapjv_batch(costs)
    for k in range(6):
        ri, ci = linear_sum_assignment(costs[k])
        np.testing.assert_allclose(totals[k], costs[k][ri, ci].sum(), rtol=1e-12)


# ---------------------------------------------------------------------------
# Auction-vs-exact stress (VERDICT r3 #2: dense, tie-heavy cost matrices)
# ---------------------------------------------------------------------------


def test_auction_agrees_with_exact_at_broadcast_density():
    """Typical-density tracking matrices (22 noisy re-detections of 22
    boxes): the production auction must agree with the exact JV solve on
    EVERY matrix (measured 0% disagreement over 400 in
    scripts/measure_assignment.py; this pins a sample of that family)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from measure_assignment import family_matrix

    rng = np.random.default_rng(42)
    n, gate = 22, 0.8
    rv, cv = jnp.ones(n, bool), jnp.ones(n, bool)
    for _ in range(40):
        cost = jnp.asarray(family_matrix(rng, "broadcast", n))
        m_a, _ = masked_auction(cost, rv, cv, gate)
        m_e, _ = masked_assignment(cost, rv, cv, gate)
        np.testing.assert_array_equal(np.asarray(m_a), np.asarray(m_e))


def test_auction_near_exact_on_occlusion_heavy():
    """Occlusion-stacked matrices (near-coincident boxes -> tied cost
    blocks), the family where synchronous auctions diverge: at the
    512-iteration production cap the residual must stay within the
    measured envelope (<=1% of row assignments, objective gap bounded)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from measure_assignment import family_matrix, objective

    rng = np.random.default_rng(7)
    n, gate = 22, 0.8
    rv, cv = jnp.ones(n, bool), jnp.ones(n, bool)
    rows_diff = 0
    worst_gap = 0.0
    trials = 60
    for _ in range(trials):
        cost_np = family_matrix(rng, "occlusion", n)
        cost = jnp.asarray(cost_np)
        m_a, _ = masked_auction(cost, rv, cv, gate)
        m_e, _ = masked_assignment(cost, rv, cv, gate)
        m_a, m_e = np.asarray(m_a), np.asarray(m_e)
        rows_diff += int((m_a != m_e).sum())
        worst_gap = max(
            worst_gap,
            objective(cost_np, m_a, gate, n) - objective(cost_np, m_e, gate, n),
        )
    assert rows_diff <= 0.01 * trials * n, f"{rows_diff} rows differ"
    assert worst_gap <= 0.2, f"objective gap {worst_gap}"
