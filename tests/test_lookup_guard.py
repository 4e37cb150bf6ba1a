"""Exactness guard for the windowed sorted-merge lookup (VERDICT r1 #4).

The windowed path (`sorted_lookup(exact=False)`) is only exact when no
128-query block spans more than `window` keys. These tests build extreme
density transitions that BREAK that invariant (the round-1 kernel silently
missed neighbors there) and assert the guarded entry points now detect the
overflow and fall back to exact search.
"""
import numpy as np
import jax.numpy as jnp

from cmtcoop_tpu.ops import pillars as pu
from cmtcoop_tpu.ops import sparse_utils as su


def _adversarial_keys_queries():
    # keys: one ultra-dense cluster of 5000 consecutive ints in the middle
    # of a sparse field; queries: sparse strides crossing the cluster, so a
    # single 128-query block spans ~5000 keys >> window 512
    keys = np.concatenate([
        np.arange(0, 1000, 97),
        np.arange(10000, 15000),          # dense cluster
        np.arange(20000, 30000, 131),
    ]).astype(np.int32)
    queries = np.arange(0, 30000, 237).astype(np.int32)
    return jnp.asarray(np.sort(keys)), jnp.asarray(np.sort(queries))


def test_windowed_lookup_detects_overflow():
    keys, queries = _adversarial_keys_queries()
    pos_w, hit_w, ovf = su.sorted_lookup(
        keys, queries, exact=False, return_overflow=True)
    assert bool(ovf), "overflow must be flagged on extreme density jumps"
    # and the un-guarded windowed result really IS wrong here (this is the
    # round-1 silent failure this guard exists for)
    pos_e, hit_e = su.sorted_lookup(keys, queries, exact=True)
    assert not (np.array_equal(np.asarray(pos_w), np.asarray(pos_e))
                and np.array_equal(np.asarray(hit_w), np.asarray(hit_e)))


def test_guarded_lookup_falls_back_to_exact():
    keys, queries = _adversarial_keys_queries()
    pos, hit = su.guarded_lookup(keys, queries[None, :], exact=False)
    pos_e, hit_e = su.sorted_lookup(keys, queries, exact=True)
    np.testing.assert_array_equal(np.asarray(pos[0]), np.asarray(pos_e))
    np.testing.assert_array_equal(np.asarray(hit[0]), np.asarray(hit_e))


def test_guarded_lookup_keeps_fast_result_when_safe():
    keys = jnp.asarray(np.arange(0, 4096, 2, dtype=np.int32))
    queries = jnp.asarray(np.arange(0, 4096, 2, dtype=np.int32))
    pos, hit = su.guarded_lookup(keys, queries[None, :], exact=False)
    pos_e, hit_e = su.sorted_lookup(keys, queries, exact=True)
    np.testing.assert_array_equal(np.asarray(pos[0]), np.asarray(pos_e))
    np.testing.assert_array_equal(np.asarray(hit[0]), np.asarray(hit_e))


def test_pillar_neighbor_map_exact_across_density_wall():
    """A sparse row next to a fully-dense BEV row: the +1-row offset queries
    of the sparse row span the entire dense row (>512 keys). The guarded
    map must equal the exact oracle."""
    h = w = 1440
    sparse_y = np.stack([np.zeros(128, np.int64),
                         np.arange(0, 1280, 10)], -1)      # row 0, sparse
    dense_y = np.stack([np.ones(1440, np.int64),
                        np.arange(1440)], -1)              # row 1, dense
    coords = np.concatenate([sparse_y, dense_y]).astype(np.int32)
    order = np.argsort(coords[:, 0].astype(np.int64) * w + coords[:, 1])
    coords = coords[order]
    p_cap = 2048
    pad = np.full((p_cap - len(coords), 2), -1, np.int32)
    mask = np.zeros((p_cap,), bool)
    mask[: len(coords)] = True
    grid = pu.PillarGrid(
        jnp.asarray(np.concatenate([coords, pad])), jnp.asarray(mask),
        (h, w), 8)
    got = np.asarray(pu.pillar_neighbor_map(grid, exact=False))
    ref = np.asarray(pu.pillar_neighbor_map(grid, exact=True))
    np.testing.assert_array_equal(got, ref)


def _brute_force_subm(coords, mask, hw):
    """Dict-based 3x3 neighbor map oracle."""
    h, w = hw
    p = len(mask)
    where = {}
    for i in range(p):
        if mask[i]:
            where[(int(coords[i, 0]), int(coords[i, 1]))] = i
    out = np.full((p, 9), p, np.int64)
    for i in range(p):
        if not mask[i]:
            continue
        y, x = int(coords[i, 0]), int(coords[i, 1])
        for j, (dy, dx) in enumerate(
                [(a, b) for a in (-1, 0, 1) for b in (-1, 0, 1)]):
            ny, nx = y + dy, x + dx
            if 0 <= ny < h and 0 <= nx < w and (ny, nx) in where:
                out[i, j] = where[(ny, nx)]
    return out


def _rand_grid(rng, h, w, n, p_cap):
    cells = rng.choice(h * w, size=n, replace=False)
    cells.sort()
    coords = np.stack([cells // w, cells % w], -1).astype(np.int32)
    pad = np.full((p_cap - n, 2), -1, np.int32)
    mask = np.zeros((p_cap,), bool)
    mask[:n] = True
    return pu.PillarGrid(
        jnp.asarray(np.concatenate([coords, pad])), jnp.asarray(mask),
        (h, w), 8)


def test_pillar_neighbor_map_vs_brute_force(rng):
    """Fast path (adjacency + run-3 lookups) against a dict oracle, both
    windowed and exact, over mixed densities incl. borders."""
    for h, w, n in [(32, 48, 300), (16, 16, 256), (64, 64, 1)]:
        cap = max(512, n)
        grid = _rand_grid(rng, h, w, n, cap)
        ref = _brute_force_subm(
            np.asarray(grid.coords), np.asarray(grid.mask), (h, w))
        ref = np.where(ref == len(grid.mask), grid.coords.shape[0], ref)
        for exact in (True, False):
            got = np.asarray(pu.pillar_neighbor_map(grid, exact=exact))
            np.testing.assert_array_equal(got, ref, err_msg=f"exact={exact}")


def test_pillar_conv_neighbor_map_vs_brute_force(rng):
    h, w, n = 32, 48, 400
    grid = _rand_grid(rng, h, w, n, 512)
    out = pu.pillar_downsample_grid(grid, 512)
    oc, om = np.asarray(out.coords), np.asarray(out.mask)
    ic, im = np.asarray(grid.coords), np.asarray(grid.mask)
    where = {(int(ic[i, 0]), int(ic[i, 1])): i
             for i in range(len(im)) if im[i]}
    p_in = len(im)
    ref = np.full((len(om), 9), p_in, np.int64)
    for i in range(len(om)):
        if not om[i]:
            continue
        for j, (dy, dx) in enumerate(
                [(a, b) for a in (0, 1, 2) for b in (0, 1, 2)]):
            sy, sx = int(oc[i, 0]) * 2 + dy - 1, int(oc[i, 1]) * 2 + dx - 1
            if 0 <= sy < h and 0 <= sx < w and (sy, sx) in where:
                ref[i, j] = where[(sy, sx)]
    for exact in (True, False):
        got = np.asarray(pu.pillar_conv_neighbor_map(grid, out,
                                                     exact=exact))
        np.testing.assert_array_equal(got, ref, err_msg=f"exact={exact}")


def test_sorted_lookup_run_matches_independent(rng):
    keys = np.sort(rng.choice(100000, size=3000, replace=False)
                   ).astype(np.int32)
    queries = np.sort(rng.choice(100000, size=1000, replace=False)
                      ).astype(np.int32)
    kj, qj = jnp.asarray(keys), jnp.asarray(queries)
    for exact in (True, False):
        pos, hit = su.sorted_lookup(kj, qj, run=3, exact=exact)
        for d in range(3):
            pd, hd = su.sorted_lookup(kj, jnp.asarray(queries + d),
                                      exact=True)
            real = np.asarray(hit[:, d])
            np.testing.assert_array_equal(real, np.asarray(hd),
                                          err_msg=f"exact={exact} d={d}")
            np.testing.assert_array_equal(
                np.asarray(pos[:, d])[real], np.asarray(pd)[real],
                err_msg=f"exact={exact} d={d}")


def test_sorted_lookup_kernel_matches_xla(rng):
    """The Pallas compare-count path (kernel=True, interpret on CPU) must
    be bit-identical to the XLA windowed path across runs and paddings."""
    for n_keys, n_q, run in [(3000, 1000, 3), (500, 128, 1),
                             (4096, 4096, 2)]:
        keys = np.sort(rng.choice(100000, size=n_keys, replace=False)
                       ).astype(np.int32)
        queries = np.sort(rng.choice(100000, size=n_q, replace=False)
                          ).astype(np.int32)
        # sentinel tail like real callers
        queries[-n_q // 8:] = np.iinfo(np.int32).max
        kj, qj = jnp.asarray(keys), jnp.asarray(np.sort(queries))
        pos_k, hit_k, ovf_k = su.sorted_lookup(
            kj, qj, run=run, exact=False, return_overflow=True,
            kernel=True)
        pos_x, hit_x, ovf_x = su.sorted_lookup(
            kj, qj, run=run, exact=False, return_overflow=True,
            kernel=False)
        np.testing.assert_array_equal(np.asarray(pos_k), np.asarray(pos_x))
        np.testing.assert_array_equal(np.asarray(hit_k), np.asarray(hit_x))
        assert bool(ovf_k) == bool(ovf_x)
