"""Exact linear assignment on device (TPU) with static shapes.

The reference ships every (sample x task x decoder-layer) cost matrix to the
CPU and calls `scipy.optimize.linear_sum_assignment`
(core/bbox/assigners/hungarian_assigner_3d.py:138-147) — a device->host
round-trip per matrix that would serialize a TPU training step. Here we run
the same algorithm family (shortest augmenting path with dual potentials, as
in scipy's Crouse-style LSAP) fully on device inside `jit`, vectorized over
the batch with `vmap`.

Shapes are static: `cost` is (R, C) with R = number of GT slots (padded) and
C = number of queries, R <= C. Invalid GT rows are signalled by `row_valid`;
they are internally given a flat cost so they cannot perturb the optimum of
the valid rows (a constant row is indifferent to its column choice).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG = 1e9


def _augment_one_row(carry, cur_row, cost):
    """Find an augmenting path for `cur_row` and apply it.

    Port of the shortest-augmenting-path step used by scipy's
    linear_sum_assignment (Crouse 2016), vectorized over columns.
    """
    u, v, row4col, col4row = carry
    R, C = cost.shape

    def dijkstra_cond(state):
        _, _, _, _, _, _, sink, _ = state
        return sink < 0

    def dijkstra_body(state):
        sr, sc, spc, path, i, minval, _, _ = state
        sr = sr.at[i].set(True)
        # relax all unscanned columns through row i
        reduced = minval + cost[i, :] - u[i] - v
        upd = (~sc) & (reduced < spc)
        path = jnp.where(upd, i, path)
        spc = jnp.where(upd, reduced, spc)
        # scan the cheapest unscanned column
        masked = jnp.where(sc, jnp.inf, spc)
        j = jnp.argmin(masked)
        minval_new = masked[j]
        sc = sc.at[j].set(True)
        hit_free = row4col[j] < 0
        sink = jnp.where(hit_free, j, -1)
        i_next = jnp.where(hit_free, i, row4col[j])
        return sr, sc, spc, path, i_next, minval_new, sink, j

    init = (
        jnp.zeros((R,), bool),
        jnp.zeros((C,), bool),
        jnp.full((C,), jnp.inf, cost.dtype),
        jnp.full((C,), -1, jnp.int32),
        cur_row,
        jnp.asarray(0.0, cost.dtype),
        jnp.asarray(-1, jnp.int32),
        jnp.asarray(-1, jnp.int32),
    )
    sr, sc, spc, path, _, minval, sink, _ = jax.lax.while_loop(
        dijkstra_cond, dijkstra_body, init)

    # dual updates (scipy _lsap_module semantics)
    u = u.at[cur_row].add(minval)
    other_sr = sr & (jnp.arange(R) != cur_row)
    u = jnp.where(other_sr, u + minval - spc[col4row], u)
    v = jnp.where(sc, v - (minval - spc), v)

    # augment along the alternating path ending at `sink`
    def aug_cond(state):
        _, _, _, done = state
        return ~done

    def aug_body(state):
        j, r4c, c4r, _ = state
        i = path[j]
        r4c = r4c.at[j].set(i)
        j_next = c4r[i]
        c4r = c4r.at[i].set(j)
        return j_next, r4c, c4r, i == cur_row

    _, row4col, col4row, _ = jax.lax.while_loop(
        aug_cond, aug_body, (sink, row4col, col4row, False))
    return (u, v, row4col, col4row), None


@partial(jax.jit, static_argnames=())
def solve_lap(cost: jnp.ndarray, row_valid: jnp.ndarray):
    """Minimum-cost assignment of rows to columns, rows <= columns.

    Args:
        cost: (R, C) float cost matrix, R <= C. Entries of invalid rows are
            ignored.
        row_valid: (R,) bool mask of real rows.
    Returns:
        col4row: (R,) int32 — assigned column per row (valid for all rows, but
            only meaningful where ``row_valid``).
    """
    R, C = cost.shape
    if R > C:
        raise ValueError(f"need R <= C, got {cost.shape}")
    cost = jnp.asarray(cost, jnp.float32)
    # neutralize padded rows with a flat large cost row
    cost = jnp.where(row_valid[:, None], cost, _BIG)
    # guard against inf/nan upsetting the duals
    cost = jnp.nan_to_num(cost, nan=_BIG, posinf=_BIG, neginf=-_BIG)

    u = jnp.zeros((R,), cost.dtype)
    v = jnp.zeros((C,), cost.dtype)
    row4col = jnp.full((C,), -1, jnp.int32)
    col4row = jnp.full((R,), -1, jnp.int32)

    (u, v, row4col, col4row), _ = jax.lax.scan(
        lambda carry, r: _augment_one_row(carry, r, cost),
        (u, v, row4col, col4row),
        jnp.arange(R, dtype=jnp.int32),
    )
    return col4row


def solve_lap_batch(costs: jnp.ndarray, row_valids: jnp.ndarray):
    """vmap'd :func:`solve_lap` over a leading batch dimension."""
    return jax.vmap(solve_lap)(costs, row_valids)
