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
