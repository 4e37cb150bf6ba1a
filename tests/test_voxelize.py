"""Voxelizer parity against a numpy hash-table oracle."""
import numpy as np
import jax.numpy as jnp

from cmtcoop_tpu.ops.voxelize import voxelize, hard_simple_vfe

VS = (0.4, 0.4, 0.5)
PCR = (-4.0, -4.0, -1.0, 4.0, 4.0, 1.0)
GRID = (20, 20, 4)  # X, Y, Z


def _oracle(points, mask, max_points, max_voxels):
    """Hash-table hard voxelizer in the spirit of spconv PointToVoxel."""
    table = {}
    order_of_voxel = []
    for i in range(len(points)):
        if not mask[i]:
            continue
        g = np.floor((points[i, :3] - np.array(PCR[:3])) /
                     np.array(VS)).astype(int)
        if (g < 0).any() or (g >= np.array(GRID)).any():
            continue
        key = (g[2], g[1], g[0])
        if key not in table:
            if len(table) >= max_voxels:
                continue
            table[key] = []
            order_of_voxel.append(key)
        if len(table[key]) < max_points:
            table[key].append(points[i])
    return table


def test_voxelize_matches_oracle(rng):
    n, f = 2000, 5
    pts = rng.uniform(-5, 5, (n, f)).astype(np.float32)
    mask = rng.uniform(size=n) > 0.1
    out = voxelize(
        jnp.asarray(pts), jnp.asarray(mask), voxel_size=VS, pc_range=PCR,
        grid_size=GRID, max_points=5, max_voxels=512)
    table = _oracle(pts, mask, max_points=5, max_voxels=512)

    vmask = np.asarray(out.mask)
    coords = np.asarray(out.coords)
    voxels = np.asarray(out.voxels)
    npts = np.asarray(out.num_points)

    got_keys = {tuple(c) for c in coords[vmask]}
    assert got_keys == set(table.keys())
    for i in np.where(vmask)[0]:
        key = tuple(coords[i])
        oracle_pts = np.stack(table[key])
        assert npts[i] == len(oracle_pts)
        # same point multiset (order within voxel may differ)
        ours = voxels[i, :npts[i]]
        ours_sorted = ours[np.lexsort(ours.T)]
        oracle_sorted = oracle_pts[np.lexsort(oracle_pts.T)]
        np.testing.assert_allclose(ours_sorted, oracle_sorted, rtol=1e-6)
    # empty slots zeroed
    assert np.all(voxels[~vmask] == 0)
    assert np.all(coords[~vmask] == -1)


def test_vfe_mean(rng):
    n = 500
    pts = rng.uniform(-4, 4, (n, 5)).astype(np.float32)
    mask = np.ones(n, bool)
    out = voxelize(
        jnp.asarray(pts), jnp.asarray(mask), voxel_size=VS, pc_range=PCR,
        grid_size=GRID, max_points=8, max_voxels=256)
    feats = np.asarray(hard_simple_vfe(out))
    vmask = np.asarray(out.mask)
    voxels = np.asarray(out.voxels)
    npts = np.asarray(out.num_points)
    for i in np.where(vmask)[0]:
        np.testing.assert_allclose(
            feats[i], voxels[i, :npts[i]].mean(0), rtol=1e-5, atol=1e-6)
    assert np.all(feats[~vmask] == 0)


def test_voxelize_cap_points(rng):
    # 100 identical points -> one voxel with num_points == cap
    pts = np.tile(np.array([[0.1, 0.1, 0.1, 1.0, 2.0]], np.float32),
                  (100, 1))
    out = voxelize(
        jnp.asarray(pts), jnp.ones(100, bool), voxel_size=VS, pc_range=PCR,
        grid_size=GRID, max_points=10, max_voxels=64)
    assert int(np.asarray(out.mask).sum()) == 1
    assert int(np.asarray(out.num_points).max()) == 10


def test_pillarize_matches_three_step_path():
    """pillarize == voxelize -> HardSimpleVFE -> build_pillars, bit-for-bit
    on the same cloud (same caps, same stable-sort tie order)."""
    from cmtcoop_tpu.ops.pillars import build_pillars, pillarize
    rng = np.random.default_rng(3)
    n = 4000
    pts = np.zeros((n, 5), np.float32)
    pts[:, 0] = rng.uniform(-30, 30, n)
    pts[:, 1] = rng.uniform(-30, 30, n)
    pts[:, 2] = rng.uniform(-7.9, -0.1, n)
    pts[:, 3] = rng.uniform(0, 1, n)
    # dense cluster to exercise the max_points cap
    pts[:200, :3] = pts[0, :3] + rng.normal(0, 0.01, (200, 3))
    mask = np.ones((n,), bool)
    mask[-100:] = False
    kw = dict(voxel_size=(0.2, 0.2, 0.25),
              pc_range=(-32.0, -32.0, -8.0, 32.0, 32.0, 0.0),
              grid_size=(320, 320, 32), max_points=10, max_voxels=4096)
    vox = voxelize(jnp.asarray(pts), jnp.asarray(mask), **kw)
    feats = hard_simple_vfe(vox)
    pc0, pm0, occ0, f0 = build_pillars(
        vox.coords, vox.mask, feats, (320, 320), 33, 2048)
    pc1, pm1, occ1, f1 = pillarize(
        jnp.asarray(pts), jnp.asarray(mask), max_pillars=2048, **kw)
    np.testing.assert_array_equal(np.asarray(pm0), np.asarray(pm1))
    np.testing.assert_array_equal(np.asarray(pc0), np.asarray(pc1))
    np.testing.assert_array_equal(np.asarray(occ0), np.asarray(occ1))
    np.testing.assert_allclose(
        np.asarray(f0), np.asarray(f1), atol=1e-5, rtol=1e-5)


def test_pillarize_overflow_fallback():
    """>win points in one pillar must route to the exact segment-sum path
    and still match the three-step reference."""
    from cmtcoop_tpu.ops.pillars import build_pillars, pillarize
    rng = np.random.default_rng(4)
    n = 1000
    pts = np.zeros((n, 5), np.float32)
    # 600 points in ONE pillar spread over z (forces > 128-point window)
    pts[:600, 0] = 1.05
    pts[:600, 1] = 1.05
    pts[:600, 2] = rng.uniform(-7.9, -0.1, 600)
    pts[600:, 0] = rng.uniform(-30, 30, 400)
    pts[600:, 1] = rng.uniform(-30, 30, 400)
    pts[600:, 2] = rng.uniform(-7.9, -0.1, 400)
    mask = np.ones((n,), bool)
    kw = dict(voxel_size=(0.2, 0.2, 0.25),
              pc_range=(-32.0, -32.0, -8.0, 32.0, 32.0, 0.0),
              grid_size=(320, 320, 32), max_points=10, max_voxels=4096)
    vox = voxelize(jnp.asarray(pts), jnp.asarray(mask), **kw)
    feats = hard_simple_vfe(vox)
    pc0, pm0, occ0, f0 = build_pillars(
        vox.coords, vox.mask, feats, (320, 320), 33, 1024)
    pc1, pm1, occ1, f1 = pillarize(
        jnp.asarray(pts), jnp.asarray(mask), max_pillars=1024, win=128,
        **kw)
    np.testing.assert_array_equal(np.asarray(occ0), np.asarray(occ1))
    np.testing.assert_allclose(
        np.asarray(f0), np.asarray(f1), atol=1e-4, rtol=1e-4)


def test_pillarize_drop_telemetry():
    """return_stats counts raw occupancy and cap-dropped pillars/voxels."""
    import jax.numpy as jnp
    from cmtcoop_tpu.ops.pillars import pillarize

    # 200 distinct pillars on a 20x10 grid patch, one point each, plus a
    # second z-cell in pillar 0 (so voxels = 201) and a duplicate point
    # in pillar 0 (in-range points = 202)
    ys, xs = np.meshgrid(np.arange(10), np.arange(20), indexing="ij")
    pts = np.zeros((202, 5), np.float32)
    pts[:200, 0] = xs.ravel() + 0.5
    pts[:200, 1] = ys.ravel() + 0.5
    pts[:200, 2] = 0.1
    pts[200] = (0.5, 0.5, 1.1, 0, 0)   # pillar 0, second z cell
    pts[201] = (0.5, 0.5, 0.2, 0, 0)   # pillar 0, same voxel as pt 0
    kw = dict(voxel_size=(1.0, 1.0, 1.0), pc_range=(0, 0, 0, 32, 32, 4),
              grid_size=(32, 32, 4), max_points=5)
    *_, stats = pillarize(
        jnp.asarray(pts), jnp.ones(202, bool), max_voxels=512,
        max_pillars=128, return_stats=True, **kw)
    assert int(stats["n_pillars_raw"]) == 200
    assert int(stats["n_pillars_dropped"]) == 72
    assert int(stats["n_voxels_raw"]) == 201
    assert int(stats["n_voxels_dropped"]) == 0
    assert int(stats["n_points_in_range"]) == 202
    # 72 dropped pillars carry one point each (pillar 0, with the extra
    # points, sorts first and is always kept)
    assert int(stats["n_points_dropped"]) == 72
    # uncapped: nothing dropped
    *_, s2 = pillarize(
        jnp.asarray(pts), jnp.ones(202, bool), max_voxels=512,
        max_pillars=256, return_stats=True, **kw)
    assert int(s2["n_pillars_dropped"]) == 0
    assert int(s2["n_points_dropped"]) == 0
