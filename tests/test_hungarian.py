"""On-device LAP solver vs scipy.optimize.linear_sum_assignment."""
import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from cmtcoop_tpu.core.hungarian import solve_lap, solve_lap_batch


def _check_against_scipy(cost, valid):
    col4row = np.asarray(solve_lap(jnp.asarray(cost), jnp.asarray(valid)))
    nv = int(valid.sum())
    sub = cost[:nv] if valid[:nv].all() else cost[valid]
    r, c = linear_sum_assignment(sub)
    scipy_total = sub[r, c].sum()
    ours_cols = col4row[valid]
    # assignment must be a matching...
    assert len(set(ours_cols.tolist())) == nv
    ours_total = sub[np.arange(nv), ours_cols].sum()
    np.testing.assert_allclose(ours_total, scipy_total, rtol=1e-5, atol=1e-4)


def test_lap_square_and_rect(rng):
    for (R, C) in [(5, 5), (8, 32), (32, 900), (1, 16)]:
        cost = rng.normal(size=(R, C)).astype(np.float32) * 10
        valid = np.ones(R, bool)
        _check_against_scipy(cost, valid)


def test_lap_with_padded_rows(rng):
    R, C = 16, 64
    cost = rng.normal(size=(R, C)).astype(np.float32)
    valid = np.zeros(R, bool)
    valid[:7] = True
    _check_against_scipy(cost, valid)


def test_lap_zero_valid(rng):
    cost = rng.normal(size=(8, 32)).astype(np.float32)
    valid = np.zeros(8, bool)
    col4row = np.asarray(solve_lap(jnp.asarray(cost), jnp.asarray(valid)))
    assert col4row.shape == (8,)  # just must not crash / hang


def test_lap_batch(rng):
    B, R, C = 4, 12, 48
    costs = rng.normal(size=(B, R, C)).astype(np.float32)
    valids = np.ones((B, R), bool)
    valids[2, 6:] = False
    out = np.asarray(solve_lap_batch(jnp.asarray(costs), jnp.asarray(valids)))
    assert out.shape == (B, R)
    for b in range(B):
        _check_against_scipy(costs[b], valids[b])


def test_lap_duplicate_costs(rng):
    # degenerate ties must still produce a valid matching
    cost = np.zeros((6, 10), np.float32)
    valid = np.ones(6, bool)
    col4row = np.asarray(solve_lap(jnp.asarray(cost), jnp.asarray(valid)))
    assert len(set(col4row.tolist())) == 6
