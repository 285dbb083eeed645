"""Exact linear assignment (Hungarian / Jonker-Volgenant) on device.

The reference's tracker depends on lapx's C++ LAPJV solver (SURVEY.md
section 2.2).  This is the TPU-native equivalent: the shortest-augmenting-
path LAP algorithm expressed with ``lax.fori_loop`` / ``lax.while_loop``
and dense vector updates -- O(n^3) with n <= max_tracks, static shapes,
exact optimum (same algorithm scipy's linear_sum_assignment uses).

Infeasible pairs are encoded as a large finite cost and filtered by the
caller's gate afterwards, which matches tracker semantics (a match above
the gate distance is treated as unmatched).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Infeasible-pair cost for direct solve_lap use.  Must stay small enough
# that f32 dual updates cannot absorb real cost differences (1e4 preserves
# ~1e-3 granularity); masked_assignment computes a tighter data-dependent
# pad value instead.
BIG = 1e4
INF = jnp.inf


@functools.partial(jax.jit, static_argnames=())
def solve_lap(cost: jax.Array) -> jax.Array:
    """Minimum-cost perfect matching on a square cost matrix.

    Parameters
    ----------
    cost : (n, n) float32.  Use ``BIG`` for infeasible pairs (the matrix
        must still admit a perfect matching, which padding guarantees).

    Returns
    -------
    row_to_col : (n,) int32 -- column assigned to each row.
    """
    n = cost.shape[0]
    # 1-indexed working arrays with a 0 sentinel column, classic JV layout
    a = jnp.pad(cost, ((1, 0), (1, 0)))  # (n+1, n+1), row/col 0 unused

    def assign_row(i, carry):
        u, v, p, way = carry
        p = p.at[0].set(i)

        minv = jnp.full((n + 1,), INF).at[0].set(-INF)
        used = jnp.zeros((n + 1,), bool)

        def aug_cond(state):
            _, _, _, _, j0, _, done = state
            return ~done

        def aug_body(state):
            u, v, way, minv, j0, used, _ = state
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = a[i0] - u[i0] - v  # (n+1,) reduced costs from row i0
            better = (cur < minv) & ~used
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(used, INF, minv)
            j1 = jnp.argmin(masked)
            delta = masked[j1]
            # dual updates: used columns move delta from v to u of their row
            u = u.at[p].add(jnp.where(used, delta, 0.0))
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(used, minv, minv - delta)
            return u, v, way, minv, j1, used, p[j1] == 0

        state = (u, v, way, minv, jnp.int32(0), used, jnp.bool_(False))
        u, v, way, minv, j0, used, _ = jax.lax.while_loop(aug_cond, aug_body, state)

        # backtrack the augmenting path
        def back_cond(state):
            _, j0 = state
            return j0 != 0

        def back_body(state):
            p_, j0 = state
            j1 = way[j0]
            p_ = p_.at[j0].set(p_[j1])
            return p_, j1

        p, _ = jax.lax.while_loop(back_cond, back_body, (p, j0))
        return u, v, p, way

    u = jnp.zeros((n + 1,))
    v = jnp.zeros((n + 1,))
    p = jnp.zeros((n + 1,), jnp.int32)  # column -> row
    way = jnp.zeros((n + 1,), jnp.int32)
    u, v, p, way = jax.lax.fori_loop(1, n + 1, assign_row, (u, v, p, way))

    # invert: row -> col (drop the sentinel)
    row_to_col = jnp.zeros((n + 1,), jnp.int32)
    row_to_col = row_to_col.at[p].set(jnp.arange(n + 1, dtype=jnp.int32))
    return row_to_col[1:] - 1


@functools.partial(jax.jit, static_argnames=("iterations", "max_cardinality"))
def auction_assignment(
    cost: jax.Array,
    feasible: jax.Array,
    iterations: int = 512,
    eps: float = 1e-3,
    unmatched_cost: jax.Array | float | None = None,
    max_cardinality: bool = True,
) -> jax.Array:
    """Fast near-optimal assignment via a synchronous (Jacobi) auction.

    Every iteration is one dense vectorized pass over the full (R, C)
    matrix -- no nested scalar loops -- so this is the solver used *inside*
    the per-frame tracking scan, where the exact JV solver's O(n^2)
    sequential control flow would dominate latency.  On well-separated
    tracking cost matrices it returns the optimum; on adversarial ties it
    is within ``R * eps`` of optimal (see tests).

    Parameters
    ----------
    cost : (R, C) costs, lower = better
    feasible : (R, C) bool
    unmatched_cost : price of leaving a row unmatched.  With
        ``max_cardinality=False`` this reproduces lapjv's cost-limit
        objective (minimize sum(cost) + limit * #unmatched): a row prefers
        staying unmatched over any pair costing more than this.
    iterations : worst-case cap; the early-exit while_loop means typical
        tracking frames still stop in <10 rounds.  Convergence on
        tied-block price wars needs ~(cost range)/eps rounds, so the cap
        sets the residual disagreement vs the exact JV optimum: measured
        on occlusion-heavy 22x22 IoU matrices (scripts/measure_assignment.py),
        48 iters differ from exact on 2.7% of row assignments, 512 on
        0.27% (0% on typical-density matrices either way).

    Returns
    -------
    match : (R,) int32 column per row, -1 if unassigned
    """
    r, c = cost.shape
    real_benefit = jnp.where(feasible, -cost, -INF)  # maximize
    row_ok = feasible.any(axis=1)
    # asymmetric auction: give every row a private "stay unassigned" dummy
    # column, so displaced rows drop out and the auction terminates even
    # with more rows than columns.  Priced below all feasible benefits for
    # a maximum-cardinality matching, or at -unmatched_cost for the
    # lapjv-with-cost-limit objective.
    if max_cardinality or unmatched_cost is None:
        dummy_b = jnp.min(jnp.where(feasible, -cost, jnp.inf)) - 1.0
        dummy_b = jnp.where(jnp.isfinite(dummy_b), dummy_b, -2.0)
    else:
        dummy_b = -jnp.asarray(unmatched_cost, cost.dtype)
    dummy = jnp.where(
        jnp.eye(r, dtype=bool), jnp.where(row_ok, dummy_b, -INF)[:, None], -INF
    )
    benefit = jnp.concatenate([real_benefit, dummy], axis=1)  # (R, C+R)
    ctot = c + r

    row_ids = jnp.arange(r, dtype=jnp.int32)
    col_ids = jnp.arange(ctot, dtype=jnp.int32)

    # NOTE: every update below is arithmetic (broadcast compares + where):
    # XLA scatters cost ~0.6 ms each on TPU, which would dominate the
    # 48-iteration loop.
    def body(_, state):
        prices, owner = state  # owner: (C+R,) row owning each column, -1
        assigned = (owner[None, :] == row_ids[:, None]).any(axis=1)  # (R,)
        bidding = row_ok & ~assigned

        value = benefit - prices[None, :]  # (R, C+R)
        top2, idx2 = jax.lax.top_k(value, 2)
        best_j = idx2[:, 0]
        best_onehot = best_j[:, None] == col_ids[None, :]  # (R, C+R)
        gap = jnp.where(jnp.isfinite(top2[:, 1]), top2[:, 0] - top2[:, 1], 1.0)
        price_best = jnp.where(best_onehot, prices[None, :], 0.0).sum(1)
        bid_amount = price_best + gap + eps
        bid_amount = jnp.where(jnp.isfinite(top2[:, 0]) & bidding, bid_amount, -INF)

        # each column accepts the highest bid among bidding rows
        bids = jnp.where(best_onehot, bid_amount[:, None], -INF)
        col_best = bids.max(axis=0)
        col_winner = bids.argmax(axis=0).astype(jnp.int32)
        took = col_best > -INF
        owner = jnp.where(took, col_winner, owner)
        prices = jnp.where(took, col_best, prices)
        return prices, owner

    prices = jnp.zeros((ctot,))
    owner = jnp.full((ctot,), -1, jnp.int32)

    # early exit: once no row is bidding the body is an exact no-op (all
    # bids are -INF -> nothing is taken), so stopping at convergence is
    # bit-identical to running all ``iterations``.  Typical tracking
    # frames converge in <10 rounds -- the while_loop saves most of the
    # fixed 48 on the scan's critical path.
    def w_cond(state):
        _, owner_, i = state
        assigned = (owner_[None, :] == row_ids[:, None]).any(axis=1)
        return (i < iterations) & (row_ok & ~assigned).any()

    def w_body(state):
        prices_, owner_, i = state
        prices_, owner_ = body(i, (prices_, owner_))
        return prices_, owner_, i + 1

    prices, owner, _ = jax.lax.while_loop(
        w_cond, w_body, (prices, owner, jnp.int32(0))
    )

    owned = owner[None, :] == row_ids[:, None]  # (R, C+R)
    match = jnp.where(owned.any(1), jnp.argmax(owned, 1).astype(jnp.int32), -1)
    return jnp.where(match >= c, -1, match)  # dummy = unassigned


def masked_auction(
    cost: jax.Array,
    row_valid: jax.Array,
    col_valid: jax.Array,
    gate: float | jax.Array,
    iterations: int = 512,
) -> tuple[jax.Array, jax.Array]:
    """Gated wrapper around :func:`auction_assignment` with the same
    contract as :func:`masked_assignment` (lapjv cost-limit objective: a
    row prefers staying unmatched over matches costing more than the
    gate)."""
    c = cost.shape[1]
    feas = row_valid[:, None] & col_valid[None, :] & (cost <= gate)
    match = auction_assignment(
        cost, feas, iterations=iterations, unmatched_cost=gate, max_cardinality=False
    )
    matched_col = (match[:, None] == jnp.arange(c, dtype=jnp.int32)[None, :]).any(0)
    return match, matched_col


def masked_assignment(
    cost: jax.Array,
    row_valid: jax.Array,
    col_valid: jax.Array,
    gate: float | jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Gated rectangular assignment on fixed-shape masked inputs with
    lapjv cost-limit semantics (``lap.lapjv(cost, extend_cost=True,
    cost_limit=gate)``, the call boxmot makes): minimizes total matched
    cost plus ``gate/2`` per unmatched row and column, so a feasible pair
    is left unmatched when that is globally cheaper.

    Invalid rows/columns and pairs with ``cost > gate`` never match.

    Returns
    -------
    match : (R,) int32 -- matched column per row, -1 if unmatched
    matched_col : (C,) bool
    """
    r, c = cost.shape
    n = r + c
    feas = row_valid[:, None] & col_valid[None, :] & (cost <= gate)
    gate = jnp.asarray(gate, cost.dtype)
    # the lap library's extended square matrix: real block, two opposite
    # blocks of gate/2 (the price of unmatching), zero corner
    sq = jnp.full((n, n), 1.0, cost.dtype) * (gate / 2.0)
    sq = sq.at[r:, c:].set(0.0)
    sq = sq.at[:r, :c].set(jnp.where(feas, cost, gate + 1.0))
    row_to_col = solve_lap(sq)[:r]
    col_idx = jnp.clip(row_to_col, 0, c - 1)
    ok = (row_to_col < c) & jnp.take_along_axis(feas, col_idx[:, None], axis=1)[:, 0]
    match = jnp.where(ok, row_to_col, -1)
    matched_col = (
        jnp.zeros((c + 1,), bool).at[jnp.where(ok, row_to_col, c)].set(ok, mode="drop")[:c]
    )
    return match, matched_col
