"""Parity tests for the fused Pallas pillar conv (ops/pillar_fused.py).

Run in Pallas interpret mode on the CPU backend; the compiled TPU path is
exercised by bench.py / tools/tpu_pillar_probe.py on hardware. The oracle is
the unfused XLA path (ops.pillars.pillar_conv + explicit epilogue), itself
parity-tested against the gather encoder.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmtcoop_tpu.ops import pillars as pu
from cmtcoop_tpu.ops.pillar_fused import _xla_reference, fused_pillar_conv


def _grid(rng, hw=(32, 32), z=8, p_cap=256, density=0.35):
    h, w = hw
    occ_bev = rng.uniform(size=(h, w)) < density
    ys, xs = np.nonzero(occ_bev)
    n = min(len(ys), p_cap)
    coords = np.full((p_cap, 2), -1, np.int32)
    coords[:n, 0], coords[:n, 1] = ys[:n], xs[:n]
    mask = np.zeros((p_cap,), bool)
    mask[:n] = True
    return pu.PillarGrid(jnp.asarray(coords), jnp.asarray(mask), hw, z), n


@pytest.fixture
def setup(rng):
    grid, n = _grid(rng)
    z, c, co = grid.z, 4, 6
    p = grid.coords.shape[0]
    nbr = pu.pillar_neighbor_map(grid)
    occ = rng.uniform(size=(p, z)) < 0.5
    occ &= np.asarray(grid.mask)[:, None]
    feats = (rng.normal(size=(p, z, c)) * occ[..., None]).astype(np.float32)
    w = rng.normal(size=(27, c, co)).astype(np.float32) * 0.3
    return grid, jnp.asarray(feats), nbr, jnp.asarray(w), jnp.asarray(occ)


def _check(a, b, tol=1e-5):
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32),
        atol=tol, rtol=tol)


def test_plain_conv_matches_reference(setup):
    _, feats, nbr, w, _ = setup
    got = fused_pillar_conv(feats, nbr, w, interpret=True)
    ref = _xla_reference(feats, nbr, w, 3, 1, 1,
                         None, None, None, None, False)
    _check(got, ref)


def test_full_epilogue(setup, rng):
    """scale+bias+residual+relu+occupancy in one kernel == unfused chain."""
    _, feats, nbr, w, occ = setup
    p, z, _ = feats.shape
    co = w.shape[2]
    scale = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
    resid = jnp.asarray(rng.normal(size=(p, z, co)).astype(np.float32))
    got = fused_pillar_conv(
        feats, nbr, w, scale=scale, bias=bias, occ_out=occ,
        residual=resid, relu=True, interpret=True)
    ref = _xla_reference(feats, nbr, w, 3, 1, 1,
                         scale, bias, occ, resid, True)
    _check(got, ref)


def test_down_conv_stride2(setup, rng):
    """Strided conv (kz=3, s=2) through a downsample gather map."""
    grid, feats, _, w, _ = setup
    out_grid = pu.pillar_downsample_grid(grid, 128)
    nbr_dn = pu.pillar_conv_neighbor_map(grid, out_grid)
    for zp in (1, 0):
        got = fused_pillar_conv(
            feats, nbr_dn, w, z_stride=2, z_pad=zp, relu=True,
            interpret=True)
        ref = _xla_reference(feats, nbr_dn, w, 3, 2, zp,
                             None, None, None, None, True)
        _check(got, ref)


def test_window_overflow_falls_back_exactly(setup):
    """A window too small for the spans must trigger the exact fallback
    (lax.cond), not silently drop neighbor contributions."""
    _, feats, nbr, w, _ = setup
    got = fused_pillar_conv(feats, nbr, w, win=8, interpret=True)
    ref = _xla_reference(feats, nbr, w, 3, 1, 1,
                         None, None, None, None, False)
    _check(got, ref)


def test_unsupported_shape_uses_xla_path(setup):
    """P_out not a multiple of bp routes to the XLA path (still correct)."""
    _, feats, nbr, w, _ = setup
    got = fused_pillar_conv(feats, nbr[:100], w, interpret=True)
    ref = _xla_reference(feats, nbr[:100], w, 3, 1, 1,
                         None, None, None, None, False)
    _check(got, ref)


def test_z_tiled_band_stage0_shape(rng):
    """Stage-0-like shape (z=41, C=16) triggers the z-tiled band path
    (_tile_plan != None); parity vs the unfused reference, subm + stride-2
    + full epilogue."""
    from cmtcoop_tpu.ops.pillar_fused import _tile_plan

    grid, _ = _grid(rng, hw=(32, 32), z=41, p_cap=256, density=0.35)
    z, c, co = 41, 16, 16
    p = grid.coords.shape[0]
    nbr = pu.pillar_neighbor_map(grid)
    occ = rng.uniform(size=(p, z)) < 0.3
    occ &= np.asarray(grid.mask)[:, None]
    feats = (rng.normal(size=(p, z, c)) * occ[..., None]).astype(np.float32)
    w = rng.normal(size=(27, c, co)).astype(np.float32) * 0.2
    assert _tile_plan(z, z, c, co, 3, 1, 1) is not None

    scale = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
    got = fused_pillar_conv(
        jnp.asarray(feats), nbr, jnp.asarray(w), scale=scale, bias=bias,
        occ_out=jnp.asarray(occ), relu=True, interpret=True)
    ref = _xla_reference(jnp.asarray(feats), nbr, jnp.asarray(w), 3, 1, 1,
                         scale, bias, jnp.asarray(occ), None, True)
    _check(got, ref, tol=2e-4)

    # stride-2 down conv (z 41 -> 21, C 16 -> 32) also tiles
    cod = 32
    wd = rng.normal(size=(27, c, cod)).astype(np.float32) * 0.2
    out_grid = pu.pillar_downsample_grid(grid, 128)
    nbr_dn = pu.pillar_conv_neighbor_map(grid, out_grid)
    assert _tile_plan(41, 21, c, cod, 3, 2, 1) is not None
    got = fused_pillar_conv(
        jnp.asarray(feats), nbr_dn, jnp.asarray(wd), z_stride=2, z_pad=1,
        relu=True, interpret=True, win=1024)
    ref = _xla_reference(jnp.asarray(feats), nbr_dn, jnp.asarray(wd),
                         3, 2, 1, None, None, None, None, True)
    _check(got, ref, tol=2e-4)


def test_subm_shift_path_parity(rng):
    """subm=True replaces the middle-row one-hots with adjacency shifts;
    parity vs the unfused reference on a real subm map with borders."""
    grid, _ = _grid(rng, hw=(32, 32), z=11, p_cap=256, density=0.4)
    z, c = 11, 64
    p = grid.coords.shape[0]
    nbr = pu.pillar_neighbor_map(grid)
    occ = rng.uniform(size=(p, z)) < 0.4
    occ &= np.asarray(grid.mask)[:, None]
    feats = (rng.normal(size=(p, z, c)) * occ[..., None]).astype(np.float32)
    w = rng.normal(size=(27, c, c)).astype(np.float32) * 0.1
    scale = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    resid = jnp.asarray(rng.normal(size=(p, z, c)).astype(np.float32))
    got = fused_pillar_conv(
        jnp.asarray(feats), nbr, jnp.asarray(w), scale=scale, bias=bias,
        occ_out=jnp.asarray(occ), residual=resid, relu=True, subm=True,
        interpret=True)
    ref = _xla_reference(jnp.asarray(feats), nbr, jnp.asarray(w), 3, 1, 1,
                         scale, bias, jnp.asarray(occ), resid, True)
    _check(got, ref, tol=2e-4)


def test_subm_flag_on_non_subm_map_falls_back(rng):
    """A strided conv map passed with subm=True violates the adjacency
    structure; the runtime check must route to the exact XLA path."""
    grid, _ = _grid(rng, hw=(32, 32), z=11, p_cap=256, density=0.4)
    z, c = 11, 32
    out_grid = pu.pillar_downsample_grid(grid, 256)
    nbr_dn = pu.pillar_conv_neighbor_map(grid, out_grid)
    feats = rng.normal(size=(grid.coords.shape[0], z, c)).astype(np.float32)
    w = rng.normal(size=(27, c, c)).astype(np.float32) * 0.1
    got = fused_pillar_conv(
        jnp.asarray(feats), nbr_dn, jnp.asarray(w), z_stride=2, z_pad=1,
        relu=True, subm=True, interpret=True)
    ref = _xla_reference(jnp.asarray(feats), nbr_dn, jnp.asarray(w),
                         3, 2, 1, None, None, None, None, True)
    _check(got, ref)


@pytest.mark.parametrize("win", [8, 32, 64])
def test_retry_ladder_parity(rng, win):
    """Windows too small for the spans route through the 2x retry or the
    XLA fallback; every rung must stay parity-exact."""
    grid, _ = _grid(rng, hw=(32, 32), z=11, p_cap=256, density=0.5)
    z, c = 11, 16
    p = grid.coords.shape[0]
    nbr = pu.pillar_neighbor_map(grid)
    occ = rng.uniform(size=(p, z)) < 0.5
    occ &= np.asarray(grid.mask)[:, None]
    feats = (rng.normal(size=(p, z, c)) * occ[..., None]).astype(np.float32)
    w = rng.normal(size=(27, c, c)).astype(np.float32) * 0.2
    got = fused_pillar_conv(
        jnp.asarray(feats), nbr, jnp.asarray(w),
        occ_out=jnp.asarray(occ), relu=True, subm=True, win=win,
        interpret=True)
    ref = _xla_reference(jnp.asarray(feats), nbr, jnp.asarray(w), 3, 1, 1,
                         None, None, jnp.asarray(occ), None, True)
    _check(got, ref, tol=2e-4)


def test_fold_occ_matches_separate(rng):
    """fold_occ computes the down conv's output occupancy in-kernel; both
    the conv output and the occupancy must match the two-step reference
    (occ_downsample + occ-masked conv)."""
    grid, _ = _grid(rng, hw=(32, 32), z=21, p_cap=256, density=0.45)
    z, c, co = 21, 32, 64
    p = grid.coords.shape[0]
    out_grid = pu.pillar_downsample_grid(grid, 256)
    nbr_dn = pu.pillar_conv_neighbor_map(grid, out_grid)
    occ = rng.uniform(size=(p, z)) < 0.4
    occ &= np.asarray(grid.mask)[:, None]
    occ = jnp.asarray(occ)
    feats = jnp.asarray(
        (rng.normal(size=(p, z, c)) * np.asarray(occ)[..., None])
        .astype(np.float32))
    w = rng.normal(size=(27, c, co)).astype(np.float32) * 0.1
    scale = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))

    got, occ_got = fused_pillar_conv(
        feats, nbr_dn, jnp.asarray(w), z_stride=2, z_pad=1, scale=scale,
        bias=bias, relu=True, occ_in=occ, fold_occ=True, interpret=True)
    occ_ref = pu.occ_downsample(occ, nbr_dn, 3, 2, 1)
    ref = _xla_reference(feats, nbr_dn, jnp.asarray(w), 3, 2, 1,
                         scale, bias, occ_ref, None, True)
    np.testing.assert_array_equal(np.asarray(occ_got), np.asarray(occ_ref))
    _check(got, ref, tol=2e-4)


def test_zwindow_subm_parity(rng):
    """Per-block z-windowed subm conv (z 41, banded occupancy like a real
    cloud: all data in a narrow z range) vs the exact reference."""
    grid, _ = _grid(rng, hw=(32, 32), z=41, p_cap=256, density=0.4)
    z, c = 41, 16
    p = grid.coords.shape[0]
    nbr = pu.pillar_neighbor_map(grid)
    # occupancy banded per pillar around a slowly varying ground level
    base = (8 + 6 * rng.uniform(size=p)).astype(np.int32)
    zidx = np.arange(z)[None, :]
    occ = (zidx >= base[:, None]) & (zidx < base[:, None] + 5)
    occ &= rng.uniform(size=(p, z)) < 0.7
    occ &= np.asarray(grid.mask)[:, None]
    feats = (rng.normal(size=(p, z, c)) * occ[..., None]).astype(np.float32)
    w = rng.normal(size=(27, c, c)).astype(np.float32) * 0.1
    scale = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    got = fused_pillar_conv(
        jnp.asarray(feats), nbr, jnp.asarray(w), scale=scale, bias=bias,
        occ_out=jnp.asarray(occ), relu=True, subm=True, interpret=True)
    ref = _xla_reference(jnp.asarray(feats), nbr, jnp.asarray(w), 3, 1, 1,
                         scale, bias, jnp.asarray(occ), None, True)
    _check(got, ref, tol=2e-4)


def test_zwindow_span_overflow_falls_back(rng):
    """Occupancy spread over the full z range overflows the z window;
    the runtime guard must route to the exact path."""
    grid, _ = _grid(rng, hw=(32, 32), z=41, p_cap=256, density=0.4)
    z, c = 41, 16
    p = grid.coords.shape[0]
    nbr = pu.pillar_neighbor_map(grid)
    occ = rng.uniform(size=(p, z)) < 0.3   # full-z spread: span ~41 > 24
    occ &= np.asarray(grid.mask)[:, None]
    feats = (rng.normal(size=(p, z, c)) * occ[..., None]).astype(np.float32)
    w = rng.normal(size=(27, c, c)).astype(np.float32) * 0.1
    got = fused_pillar_conv(
        jnp.asarray(feats), nbr, jnp.asarray(w),
        occ_out=jnp.asarray(occ), relu=True, subm=True, interpret=True)
    ref = _xla_reference(jnp.asarray(feats), nbr, jnp.asarray(w), 3, 1, 1,
                         None, None, jnp.asarray(occ), None, True)
    _check(got, ref, tol=2e-4)


def test_dead_block_skip_parity(rng):
    """Blocks whose output sites are all unoccupied (the cap margin /
    invalid tail) are skipped in-kernel and must come out exactly zero;
    live blocks must be untouched by the gate."""
    grid, n = _grid(rng, hw=(24, 24), z=8, p_cap=512, density=0.35)
    assert n < 256, n  # at bp=128: blocks 2/3 fully dead
    z, c, co = grid.z, 4, 4
    p = grid.coords.shape[0]
    nbr = pu.pillar_neighbor_map(grid)
    occ = rng.uniform(size=(p, z)) < 0.6
    occ &= np.asarray(grid.mask)[:, None]
    feats = (rng.normal(size=(p, z, c)) * occ[..., None]).astype(np.float32)
    w = rng.normal(size=(27, c, co)).astype(np.float32) * 0.3
    bias = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
    got = fused_pillar_conv(
        jnp.asarray(feats), nbr, jnp.asarray(w), bias=bias,
        occ_out=jnp.asarray(occ), relu=True, subm=True, interpret=True)
    ref = _xla_reference(jnp.asarray(feats), nbr, jnp.asarray(w), 3, 1, 1,
                         None, bias, jnp.asarray(occ), None, True)
    _check(got, ref, tol=2e-4)
    # dead tail rows must be EXACT zeros (skipped blocks write zeros)
    np.testing.assert_array_equal(
        np.asarray(got)[256:], np.zeros_like(np.asarray(got)[256:]))


def test_dead_block_skip_fold_occ(rng):
    """fold_occ path: blocks with no valid tap skip and emit zero occ."""
    grid, n = _grid(rng, hw=(24, 24), z=8, p_cap=512, density=0.35)
    z, c, co = grid.z, 4, 4
    p = grid.coords.shape[0]
    occ = rng.uniform(size=(p, z)) < 0.6
    occ &= np.asarray(grid.mask)[:, None]
    feats = (rng.normal(size=(p, z, c)) * occ[..., None]).astype(np.float32)
    og = pu.pillar_downsample_grid(grid, p)
    nbr = pu.pillar_conv_neighbor_map(grid, og)
    w = rng.normal(size=(27, c, co)).astype(np.float32) * 0.3
    got, occ_got = fused_pillar_conv(
        jnp.asarray(feats), nbr, jnp.asarray(w), z_stride=2, relu=True,
        occ_in=jnp.asarray(occ), fold_occ=True, interpret=True)
    occ_ref = pu.occ_downsample(jnp.asarray(occ), nbr, 3, 2, 1)
    ref = _xla_reference(jnp.asarray(feats), nbr, jnp.asarray(w), 3, 2, 1,
                         None, None, occ_ref, None, True)
    np.testing.assert_array_equal(np.asarray(occ_got), np.asarray(occ_ref))
    _check(got, ref, tol=2e-4)


def test_packed_chain_matches_3d(rng):
    """Packed 2D rows interface: a subm conv (emitting occupancy into the
    pad lanes) chained into a fold_occ down conv must match the 3D
    interface bit-for-bit, including the emitted occ lanes the down conv
    consumes."""
    grid, _ = _grid(rng, hw=(32, 32), z=21, p_cap=256, density=0.45)
    z, c, co = 21, 32, 64
    p = grid.coords.shape[0]
    nbr = pu.pillar_neighbor_map(grid)
    out_grid = pu.pillar_downsample_grid(grid, 256)
    nbr_dn = pu.pillar_conv_neighbor_map(grid, out_grid)
    occ = rng.uniform(size=(p, z)) < 0.4
    occ &= np.asarray(grid.mask)[:, None]
    occ = jnp.asarray(occ)
    feats = jnp.asarray(
        (rng.normal(size=(p, z, c)) * np.asarray(occ)[..., None])
        .astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(27, c, c)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(27, c, co)).astype(np.float32) * 0.1)
    sc = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    bi = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))

    # 3D reference chain
    mid3 = fused_pillar_conv(
        feats, nbr, w1, scale=sc, bias=bi, occ_out=occ, relu=True,
        subm=True, win=64, interpret=True)
    out3, occ3 = fused_pillar_conv(
        mid3, nbr_dn, w2, z_stride=2, z_pad=1, relu=True,
        occ_in=occ, fold_occ=True, win=64, interpret=True)

    # packed chain: pad entry rows, emit occ lanes, consume via fold_occ
    zc = z * c
    zcp = -(-zc // 128) * 128
    rows = jnp.pad(feats.reshape(p, zc), ((0, 0), (0, zcp - zc)))
    midp = fused_pillar_conv(
        rows, nbr, w1, scale=sc, bias=bi, occ_out=occ, relu=True,
        subm=True, win=64, packed_shape=(z, c), emit_occ_lanes=True,
        interpret=True)
    assert midp.shape == (p, zcp)
    _check(midp[:, :zc].reshape(p, z, c), mid3, tol=2e-4)
    np.testing.assert_array_equal(
        np.asarray(midp[:, zc:zc + z] > 0.5), np.asarray(occ))
    outp, occp = fused_pillar_conv(
        midp, nbr_dn, w2, z_stride=2, z_pad=1, relu=True,
        occ_in=occ, fold_occ=True, win=64, packed_shape=(z, c),
        interpret=True)
    z_out = (z + 2 - 3) // 2 + 1
    _check(outp[:, :z_out * co].reshape(p, z_out, co), out3, tol=2e-4)
    np.testing.assert_array_equal(np.asarray(occp), np.asarray(occ3))


def test_bp256_subm_parity(rng):
    """bp=256 kernel blocks (the encoder's subm default at 256-divisible
    caps) match the XLA reference, including the zwin path (z=41, C=16)
    and the adjacency shift slices across the wider mid window."""
    grid, _ = _grid(rng, hw=(48, 48), z=41, p_cap=512, density=0.35)
    z, c = 41, 16
    p = grid.coords.shape[0]
    nbr = pu.pillar_neighbor_map(grid)
    occ = rng.uniform(size=(p, z)) < 0.3
    occ &= np.asarray(grid.mask)[:, None]
    feats = (rng.normal(size=(p, z, c)) * occ[..., None]).astype(np.float32)
    w = rng.normal(size=(27, c, c)).astype(np.float32) * 0.2
    scale = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    got = fused_pillar_conv(
        jnp.asarray(feats), nbr, jnp.asarray(w), scale=scale, bias=bias,
        occ_out=jnp.asarray(occ), relu=True, subm=True, bp=256, win=384,
        interpret=True)
    ref = _xla_reference(jnp.asarray(feats), nbr, jnp.asarray(w), 3, 1, 1,
                         scale, bias, jnp.asarray(occ), None, True)
    _check(got, ref, tol=2e-4)


# ---- agent batching (agents=A stacked operands, one flat-grid launch) ----

def _agent_case(seed, z=8, c=4, co=4):
    r2 = np.random.default_rng(seed + 10)
    grid, _ = _grid(r2, z=z)
    nbr = pu.pillar_neighbor_map(grid)
    p = grid.coords.shape[0]
    occ = r2.uniform(size=(p, z)) < 0.5
    occ &= np.asarray(grid.mask)[:, None]
    feats = (r2.normal(size=(p, z, c)) * occ[..., None]).astype(np.float32)
    w = r2.normal(size=(27, c, co)).astype(np.float32) * 0.3
    scale = r2.normal(size=(co,)).astype(np.float32)
    bias = r2.normal(size=(co,)).astype(np.float32)
    return grid, feats, nbr, w, occ, scale, bias


def _occ_rows(feats, occ, zcp):
    """Packed rows with occupancy riding the pad lanes [zc, zc+z)."""
    p, z, c = feats.shape
    zc = z * c
    return np.concatenate(
        [feats.reshape(p, zc), occ.astype(np.float32),
         np.zeros((p, zcp - zc - z), np.float32)], axis=1)


def test_agent_batched_subm_matches_per_agent(rng):
    """agents=2 stacked subm conv == two per-agent calls (different
    clouds, different weights/BN per agent)."""
    z, c, zcp = 8, 4, 128
    cases = [_agent_case(s) for s in (0, 1)]
    kw = dict(kz=3, z_stride=1, z_pad=1, subm=True, relu=True,
              packed_shape=(z, c), emit_occ_lanes=True, interpret=True)
    refs, ops = [], []
    for grid, feats, nbr, w, occ, scale, bias in cases:
        rows = jnp.asarray(_occ_rows(feats, occ, zcp))
        p = feats.shape[0]
        resid = jnp.asarray(
            np.random.default_rng(3).normal(size=(p, zcp)).astype(
                np.float32))
        refs.append(fused_pillar_conv(
            rows, nbr, jnp.asarray(w), scale=jnp.asarray(scale),
            bias=jnp.asarray(bias), occ_out=jnp.asarray(occ),
            residual=resid, **kw))
        ops.append((rows, nbr, w, scale, bias, occ, resid))
    st = lambda i: jnp.stack([jnp.asarray(o[i]) for o in ops])
    got = fused_pillar_conv(
        st(0), st(1), st(2), scale=st(3), bias=st(4), occ_out=st(5),
        residual=st(6), agents=2, **kw)
    _check(got[0], refs[0])
    _check(got[1], refs[1])


@pytest.mark.slow
def test_agent_batched_down_fold_occ(rng):
    """agents=2 strided down conv with in-kernel occupancy fold."""
    z, c, zcp = 8, 4, 128
    cases = [_agent_case(s, co=6) for s in (2, 3)]
    kw = dict(kz=3, z_stride=2, z_pad=1, fold_occ=True,
              packed_shape=(z, c), relu=True, interpret=True)
    refs, ops = [], []
    for grid, feats, nbr, w, occ, scale, bias in cases:
        out_grid = pu.pillar_downsample_grid(grid, 128)
        nbr_dn = pu.pillar_conv_neighbor_map(grid, out_grid)
        rows = jnp.asarray(_occ_rows(feats, occ, zcp))
        refs.append(fused_pillar_conv(
            rows, nbr_dn, jnp.asarray(w), scale=jnp.asarray(scale),
            bias=jnp.asarray(bias), **kw))
        ops.append((rows, nbr_dn, w, scale, bias))
    st = lambda i: jnp.stack([jnp.asarray(o[i]) for o in ops])
    got_out, got_occ = fused_pillar_conv(
        st(0), st(1), st(2), scale=st(3), bias=st(4), agents=2, **kw)
    for i in (0, 1):
        _check(got_out[i], refs[i][0])
        np.testing.assert_array_equal(np.asarray(got_occ[i]),
                                      np.asarray(refs[i][1]))


@pytest.mark.slow
def test_agent_batched_kb1_conv_out(rng):
    """agents=2 conv_out-style kernel (kb=1, z-stride 2, BEV identity)."""
    z, c, co, zcp = 8, 16, 8, 128
    cases = [_agent_case(s, z=z, c=c, co=co) for s in (4, 5)]
    kw = dict(kz=3, z_stride=2, z_pad=0, packed_shape=(z, c),
              relu=True, interpret=True)
    refs, ops = [], []
    for grid, feats, nbr, w, occ, scale, bias in cases:
        p = feats.shape[0]
        ident = jnp.where(grid.mask, jnp.arange(p, dtype=jnp.int32),
                          p)[:, None]
        occ_ds = pu.occ_downsample(jnp.asarray(occ), ident, 3, 2, 0)
        w1 = w[:3]
        rows = jnp.asarray(feats.reshape(p, z * c))
        refs.append(fused_pillar_conv(
            rows, ident, jnp.asarray(w1), scale=jnp.asarray(scale),
            bias=jnp.asarray(bias), occ_out=occ_ds, **kw))
        ops.append((rows, ident, w1, scale, bias, occ_ds))
    st = lambda i: jnp.stack([jnp.asarray(o[i]) for o in ops])
    got = fused_pillar_conv(
        st(0), st(1), st(2), scale=st(3), bias=st(4), occ_out=st(5),
        agents=2, **kw)
    _check(got[0], refs[0])
    _check(got[1], refs[1])


@pytest.mark.slow
def test_agent_batched_zwin_subm(rng):
    """agents=2 subm conv at z-window-eligible dims (z=16, c=16)."""
    z, c, zcp = 16, 16, 256
    cases = [_agent_case(s, z=z, c=c, co=c) for s in (6, 7)]
    kw = dict(kz=3, z_stride=1, z_pad=1, subm=True, relu=True,
              packed_shape=(z, c), interpret=True)
    refs, ops = [], []
    for grid, feats, nbr, w, occ, scale, bias in cases:
        p = feats.shape[0]
        rows = jnp.asarray(feats.reshape(p, z * c))
        refs.append(fused_pillar_conv(
            rows, nbr, jnp.asarray(w), scale=jnp.asarray(scale),
            bias=jnp.asarray(bias), occ_out=jnp.asarray(occ), **kw))
        ops.append((rows, nbr, w, scale, bias, occ))
    st = lambda i: jnp.stack([jnp.asarray(o[i]) for o in ops])
    got = fused_pillar_conv(
        st(0), st(1), st(2), scale=st(3), bias=st(4), occ_out=st(5),
        agents=2, **kw)
    _check(got[0], refs[0])
    _check(got[1], refs[1])
