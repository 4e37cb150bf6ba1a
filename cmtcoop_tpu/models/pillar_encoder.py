"""Pillar-dense sparse voxel encoder — the fast path.

Computes the SAME function as `models.sparse_encoder.SparseEncoder` (the
mmdet3d SparseEncoder graph, coop config:243-251) with the TPU-native
pillar-dense layout from `ops.pillars`: sparse BEV pillars carrying dense
z-tiles. Parameter trees are IDENTICAL (same module names, same (K, Cin,
Cout) z-major kernel layout), so weights are interchangeable and parity is
testable tile-for-tile.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cmtcoop_tpu.models.layers import MaskedBatchNorm
from cmtcoop_tpu.ops import pillars as pu
from cmtcoop_tpu.ops.pillar_fused import (band_plan, build_band,
                                          fused_pillar_conv)

_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class PillarConv(nn.Module):
    features: int
    kernel_volume: int  # kz * ky * kx
    kz: int = 3
    z_stride: int = 1
    z_pad: int = 1
    dtype: Any = jnp.float32
    # per-dy-row window for the v2 fused kernel (ops/pillar_fused.py);
    # measured p99 spans: subm ~160 at every level, down (~180, ~370, ~490)
    win: int = 256
    subm: bool = False
    bp: int = 128  # output pillars per kernel block (M dim of the matmuls)

    @nn.compact
    def __call__(self, feats, nbr, scale=None, bias=None, occ_out=None,
                 residual=None, relu: bool = False, fused: bool = False,
                 occ_in=None, fold_occ: bool = False,
                 packed_shape=None, emit_occ_lanes: bool = False):
        cin = packed_shape[1] if packed_shape else feats.shape[-1]
        w = self.param(
            "kernel", _conv_init,
            (self.kernel_volume, cin, self.features),
            jnp.float32)
        if fused:
            # load-time-prepared band matrix (prepare_variables below):
            # frame-invariant, so hoisting it out of the jitted forward
            # saves its einsum/tile-slice cost every frame
            band = (self.get_variable("prepared", "band")
                    if self.has_variable("prepared", "band") else None)
            has_occ = occ_out is not None
            has_res = residual is not None
            args = [feats.astype(self.dtype), nbr]
            if has_occ:
                args.append(occ_out)
            if has_res:
                args.append(residual.astype(self.dtype))
            if fold_occ:
                args.append(occ_in)

            def one(a):
                kw = {}
                i = 2
                if has_occ:
                    kw["occ_out"] = a[i]
                    i += 1
                if has_res:
                    kw["residual"] = a[i]
                    i += 1
                if fold_occ:
                    kw["occ_in"] = a[i]
                    kw["fold_occ"] = True
                return fused_pillar_conv(
                    a[0], a[1], w, kz=self.kz, z_stride=self.z_stride,
                    z_pad=self.z_pad, scale=scale, bias=bias, relu=relu,
                    band=band, win=self.win, subm=self.subm, bp=self.bp,
                    packed_shape=packed_shape,
                    emit_occ_lanes=emit_occ_lanes, **kw)
            # sequential over batch: the kernel saturates the chip per
            # sample, and lax.map keeps pallas_call out from under vmap
            # (cond guards must stay real branches); at batch 1 call
            # directly — each length-1 scan costs real dispatch time
            if args[0].shape[0] == 1:
                out = one(tuple(a[0] for a in args))
                return jax.tree.map(lambda o: o[None], out)
            return jax.lax.map(one, tuple(args))
        # remat: pillar_conv's gathered im2col tiles (P, KB, Z, C) are
        # ~10x the input rows; saving them as autodiff residuals for all
        # 17 convs OOMed the flagship bf16 train step (26.3 GB vs 15.75,
        # runs/tpu_probe.log r5). Recompute them in the backward instead
        # — only (P, Z, C) inputs are saved. No-op when not taped.
        def conv(f, w_):
            return jax.vmap(
                lambda ff, nb: pu.pillar_conv(
                    ff, nb, w_.astype(self.dtype), self.kz,
                    self.z_stride, self.z_pad)
            )(f, nbr)

        return jax.checkpoint(conv)(feats.astype(self.dtype), w)


class PillarConvBlock(nn.Module):
    """conv + masked BN + ReLU + occupancy mask.

    Eval runs the fused Pallas kernel (conv+BN+ReLU+mask in VMEM,
    ops/pillar_fused.py); train keeps the unfused path because masked BN
    needs batch statistics.
    """
    features: int
    kernel_volume: int
    kz: int = 3
    z_stride: int = 1
    z_pad: int = 1
    dtype: Any = jnp.float32
    win: int = 256
    subm: bool = False
    bp: int = 128

    @nn.compact
    def __call__(self, feats, nbr, occ_out, train: bool = False,
                 occ_in=None, fold_occ: bool = False,
                 packed_shape=None, emit_occ_lanes: bool = False):
        conv = PillarConv(self.features, self.kernel_volume, self.kz,
                          self.z_stride, self.z_pad, self.dtype,
                          win=self.win, subm=self.subm, bp=self.bp,
                          name="conv")
        bn = MaskedBatchNorm(dtype=self.dtype, name="bn")
        if not train:
            s, b = bn(jnp.zeros((1, self.features)), fold=True)
            if fold_occ:
                # (x, occ_out) with occupancy computed in-kernel
                return conv(feats, nbr, scale=s, bias=b, relu=True,
                            fused=True, occ_in=occ_in, fold_occ=True,
                            packed_shape=packed_shape,
                            emit_occ_lanes=emit_occ_lanes)
            return conv(feats, nbr, scale=s, bias=b, occ_out=occ_out,
                        relu=True, fused=True, packed_shape=packed_shape,
                        emit_occ_lanes=emit_occ_lanes)
        x = conv(feats, nbr)
        x = bn(x, occ_out, train)
        return nn.relu(x) * occ_out[..., None]


class PillarBasicBlock(nn.Module):
    """SparseBasicBlock on pillar tiles (submanifold: same sites)."""
    features: int
    dtype: Any = jnp.float32
    win: int = 256
    bp: int = 128

    @nn.compact
    def __call__(self, feats, nbr, occ, train: bool = False,
                 packed_shape=None, emit_occ_lanes: bool = False):
        identity = feats
        conv1 = PillarConv(self.features, 27, 3, 1, 1, self.dtype,
                           win=self.win, subm=True, bp=self.bp,
                           name="conv1")
        bn1 = MaskedBatchNorm(dtype=self.dtype, name="bn1")
        conv2 = PillarConv(self.features, 27, 3, 1, 1, self.dtype,
                           win=self.win, subm=True, bp=self.bp,
                           name="conv2")
        bn2 = MaskedBatchNorm(dtype=self.dtype, name="bn2")
        if not train:
            s1, b1 = bn1(jnp.zeros((1, self.features)), fold=True)
            s2, b2 = bn2(jnp.zeros((1, self.features)), fold=True)
            x = conv1(feats, nbr, scale=s1, bias=b1, occ_out=occ,
                      relu=True, fused=True, packed_shape=packed_shape)
            return conv2(x, nbr, scale=s2, bias=b2, occ_out=occ,
                         residual=identity, relu=True, fused=True,
                         packed_shape=packed_shape,
                         emit_occ_lanes=emit_occ_lanes)
        x = conv1(feats, nbr)
        x = bn1(x, occ, train)
        x = nn.relu(x)
        x = x * occ[..., None]
        x = conv2(x, nbr)
        x = bn2(x, occ, train)
        return nn.relu(x + identity) * occ[..., None]


class PillarSparseEncoder(nn.Module):
    """(B, V, Cin) voxels -> dense BEV (B, H/8, W/8, 256); pillar-dense."""
    sparse_shape: Tuple[int, int, int] = (41, 1440, 1440)  # (D, H, W)
    base_channels: int = 16
    encoder_channels: Sequence[Sequence[int]] = (
        (16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128))
    output_channels: int = 128
    # mid-level caps sit ABOVE the L0 cap: a k3/s2 conv DILATES BEV
    # occupancy (~1.2x at lidar densities) before merging wins at
    # deeper levels (measured 31k -> 36.8k -> 21.4k -> 9.9k on
    # ray-cast OS1-64 clouds); descending caps silently truncate.
    # 256-divisible so the subm convs can run 256-pillar kernel blocks
    # (bigger M amortizes MXU fill/drain — measured ~9% per conv)
    pillar_caps: Sequence[int] = (38400, 40960, 24064, 11264)
    # PER-DY-ROW window sizes for the v2 fused kernel (one window per
    # kernel row instead of one union window — ops/pillar_fused.py).
    # Measured per-dy p100 spans on two realistic clouds: subm <=178 at
    # every level, down (~225, ~400, ~490). Margined; a denser cloud pays
    # one 2x-window retry (kernel's runtime ladder), not the exact
    # fallback. 192-wide subm windows measured net-neutral vs 256 (the
    # gather FLOP saving cancels against retry-plan overhead).
    subm_wins: Sequence[int] = (256, 256, 256, 256)
    # down-conv windows: sized to measured per-dy p100 spans on bench
    # clouds (205/378/472) + thin margins; a denser cloud pays one
    # 2x-window retry (runtime ladder), never a wrong answer. A/B
    # (probe_down_conv): 288 == 384 in time (the gather's win-invariant
    # costs dominate) but 512 is +15%, so thin windows guard the VMEM
    # budget and the wide tail, not steady-state FLOPs.
    down_wins: Sequence[int] = (288, 448, 544)
    # kernel block size (output pillars per block) for the subm convs.
    # bp=256 measures 7-11% faster standalone (probe_pillar_kernel) but
    # LOSES in-encoder at every stage (probe_encoder 23:03 vs 22:31:
    # s1 16.03 vs 16.66 ms, full 26.0 vs 27.2): real clouds carry ~15%
    # dead blocks (cap margin + empty regions) that the in-kernel
    # dead-block gate skips at bp granularity, and halving granularity
    # forfeits more than the MXU fill saving. Spans are NOT the issue
    # (probe_spans: p100 302 @ bp256 < win 384). Keep 128.
    subm_bp: int = 128
    # per-level lookup windows for the strided-conv neighbor maps
    # (measured p100 spans ~225/~400/~490; overflow -> exact fallback)
    down_map_wins: Sequence[int] = (256, 448, 512)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, voxel_feats, coords, mask, train: bool = False,
                 prebuilt=None, debug_stop: str = ""):
        """`debug_stop` (probing only): return raw pillar features early —
        "maps" (after stage-0 neighbor maps), "input" (after conv_input),
        "s{i}" (after stage i incl. its downsample), "conv_out" (before
        the dense scatter). Empty = full forward."""
        d, h, w = self.sparse_shape

        if prebuilt is not None:
            # (pcoords, pmask, occ, feats) from ops.pillars.pillarize —
            # one fused sort on the raw points, no voxel tensors
            pcoords, pmask, occ, x = prebuilt
            x = x.astype(self.dtype)
        else:
            def build(vf, c, m):
                return pu.build_pillars(c, m, vf, (h, w), d,
                                        self.pillar_caps[0])
            pcoords, pmask, occ, x = jax.vmap(build)(
                voxel_feats.astype(self.dtype), coords, mask)
        grid = pu.PillarGrid(pcoords, pmask, (h, w), d)

        def vnbr(g):
            # lax.map, not vmap: the exactness guard inside the lookup is a
            # lax.cond that must stay a real branch (vmap -> select would
            # always execute the expensive exact fallback)
            if g.coords.shape[0] == 1:
                return pu.pillar_neighbor_map(
                    pu.PillarGrid(g.coords[0], g.mask[0], g.hw, g.z))[None]
            return jax.lax.map(lambda cm: pu.pillar_neighbor_map(
                pu.PillarGrid(cm[0], cm[1], g.hw, g.z)),
                (g.coords, g.mask))

        nbr = vnbr(grid)
        if debug_stop == "maps":
            return x + nbr.sum().astype(x.dtype) * 0

        # eval: packed chaining — features travel as 2D lane-padded rows
        # (B, P, ZCP) between the fused kernels (no per-conv pad/layout
        # copies; occupancy rides the pad lanes into each down conv)
        zdim = d
        c_in0 = x.shape[3]
        if not train:
            bsz, p0 = x.shape[0], x.shape[1]
            zc0 = x.shape[2] * x.shape[3]
            zcp0 = -(-zc0 // 128) * 128
            x = x.reshape(bsz, p0, zc0)
            if zcp0 != zc0:
                x = jnp.pad(x, ((0, 0), (0, 0), (0, zcp0 - zc0)))

        def pshape(ch):
            return None if train else (zdim, ch)

        def subm_plan(level):
            """(bp, win) for this level's subm convs: bp=256 when the cap
            allows, widening the per-dy window by the extra block rows."""
            if self.subm_bp > 128 and self.pillar_caps[level] % \
                    self.subm_bp == 0:
                return self.subm_bp, self.subm_wins[level] + (
                    self.subm_bp - 128)
            return 128, self.subm_wins[level]

        bp0, win0 = subm_plan(0)
        x = PillarConvBlock(self.base_channels, 27, 3, 1, 1, self.dtype,
                            win=win0, subm=True, bp=bp0,
                            name="conv_input")(
                                x, nbr, occ, train,
                                packed_shape=pshape(c_in0))
        if debug_stop == "input":
            return x

        down_zpads = [1, 1, 0]
        n_stages = len(self.encoder_channels)
        for i, blocks in enumerate(self.encoder_channels):
            ch = blocks[0]
            n_sbb = len(blocks) - (0 if i == n_stages - 1 else 1)
            bp_i, win_i = subm_plan(i)
            for j in range(n_sbb):
                last_sbb = j == n_sbb - 1 and i != n_stages - 1
                x = PillarBasicBlock(
                    ch, self.dtype, win=win_i, bp=bp_i,
                    name=f"stage{i}_block{j}")(
                        x, nbr, occ, train, packed_shape=pshape(ch),
                        emit_occ_lanes=last_sbb and not train)
            if i != n_stages - 1:
                out_ch = blocks[-1]
                cap = self.pillar_caps[min(i + 1,
                                           len(self.pillar_caps) - 1)]
                def vdown(g, cap=cap, mwin=self.down_map_wins[i]):
                    def one(cm):
                        c, m = cm
                        og = pu.pillar_downsample_grid(
                            pu.PillarGrid(c, m, g.hw, g.z), cap)
                        nb = pu.pillar_conv_neighbor_map(
                            pu.PillarGrid(c, m, g.hw, g.z), og,
                            window=mwin)
                        return og.coords, og.mask, nb
                    if g.coords.shape[0] == 1:
                        oc, om, nb = jax.tree.map(
                            lambda o: o[None],
                            one((g.coords[0], g.mask[0])))
                    else:
                        oc, om, nb = jax.lax.map(one, (g.coords, g.mask))
                    oh = (g.hw[0] + 2 - 3) // 2 + 1
                    ow = (g.hw[1] + 2 - 3) // 2 + 1
                    return pu.PillarGrid(oc, om, (oh, ow), g.z), nb
                out_grid, nbr_dn = vdown(grid)
                zp = down_zpads[i]
                blk = PillarConvBlock(
                    out_ch, 27, 3, 2, zp, self.dtype,
                    win=self.down_wins[i], name=f"stage{i}_down")
                if not train:
                    # output occupancy computed in-kernel (rides the lane
                    # padding of the gathered rows, written there by the
                    # stage's last basic block — free)
                    x, occ_new = blk(x, nbr_dn, None, train,
                                     occ_in=occ, fold_occ=True,
                                     packed_shape=pshape(ch))
                else:
                    occ_new = jax.vmap(
                        lambda o, n, zp=zp: pu.occ_downsample(
                            o, n, 3, 2, zp))(occ, nbr_dn)
                    x = blk(x, nbr_dn, occ_new, train)
                grid, occ = out_grid, occ_new
                zdim = (zdim + 2 * zp - 3) // 2 + 1
                nbr = vnbr(grid)
            if debug_stop == f"s{i}":
                return x

        # conv_out: kernel (3,1,1), stride (2,1,1), pad 0 — BEV identity map
        p = grid.coords.shape[1]
        ident = jnp.broadcast_to(
            jnp.where(grid.mask, jnp.arange(p, dtype=jnp.int32)[None], p),
            grid.mask.shape)[..., None]
        occ_out = jax.vmap(
            lambda o, n: pu.occ_downsample(o, n, 3, 2, 0))(occ, ident)
        last_ch = self.encoder_channels[-1][-1]
        x = PillarConvBlock(self.output_channels, 3, 3, 2, 0, self.dtype,
                            name="conv_out")(
                                x, ident, occ_out, train,
                                packed_shape=pshape(last_ch))
        if debug_stop == "conv_out":
            return x
        if not train:
            # unpack (B, P, OW) rows back to (B, P, Z_out, C_out)
            zf_out = (zdim - 3) // 2 + 1
            x = x[:, :, :zf_out * self.output_channels].reshape(
                x.shape[0], x.shape[1], zf_out, self.output_channels)

        dense = jax.vmap(
            lambda c, m, f: pu.pillars_to_dense(
                pu.PillarGrid(c, m, grid.hw, x.shape[2]), f)
        )(grid.coords, grid.mask, x)
        # (B, H, W, Z*C) with row layout z-major per cell; convert to the
        # torch view(N, C*D, H, W) channel-major-over-D layout for parity
        b, hh, ww, zc = dense.shape
        zf = x.shape[2]
        c = zc // zf
        dense = dense.reshape(b, hh, ww, zf, c).transpose(0, 1, 2, 4, 3)
        return dense.reshape(b, hh, ww, zc)


_BN_OF = {"conv": "bn", "conv1": "bn1", "conv2": "bn2"}


def _fold_bn(bn_params, bn_stats):
    """MaskedBatchNorm eval-mode affine fold (scale, bias)."""
    s = bn_params["scale"] * jax.lax.rsqrt(
        bn_stats["var"] + MaskedBatchNorm.epsilon)
    return s, bn_params["bias"] - bn_stats["mean"] * s


def _band_sites(enc: PillarSparseEncoder, cin0: int):
    """(path, static band kwargs) for every fused conv site, mirroring
    `PillarSparseEncoder.__call__`'s eval flow. Any structural drift
    between this walker and the forward is caught by the prepared-vs-
    unprepared parity test (tests/test_pillar_encoder.py)."""
    sites = []

    def add(path, cin, cout, kv, kz, zs, zp, subm, occ, fold, z_in):
        sites.append((path, dict(
            z_in=z_in, cin=cin, cout=cout, kz=kz, z_stride=zs, z_pad=zp,
            kb=kv // kz, subm=subm, has_occ_out=occ, fold_occ=fold,
            zcp=-(-z_in * cin // 128) * 128)))

    zdim = enc.sparse_shape[0]
    add(("conv_input", "conv"), cin0, enc.base_channels, 27, 3, 1, 1,
        True, True, False, zdim)
    down_zpads = [1, 1, 0]
    n_stages = len(enc.encoder_channels)
    for i, blocks in enumerate(enc.encoder_channels):
        ch = blocks[0]
        n_sbb = len(blocks) - (0 if i == n_stages - 1 else 1)
        for j in range(n_sbb):
            for conv in ("conv1", "conv2"):
                add((f"stage{i}_block{j}", conv), ch, ch, 27, 3, 1, 1,
                    True, True, False, zdim)
        if i != n_stages - 1:
            zp = down_zpads[i]
            add((f"stage{i}_down", "conv"), ch, blocks[-1], 27, 3, 2, zp,
                False, False, True, zdim)
            zdim = (zdim + 2 * zp - 3) // 2 + 1
    add(("conv_out", "conv"), enc.encoder_channels[-1][-1],
        enc.output_channels, 3, 3, 2, 0, False, True, False, zdim)
    return sites


def _encoder_bands(enc: PillarSparseEncoder, enc_params, enc_stats, cin0):
    prepared: dict = {}
    for (blk, conv), kw in _band_sites(enc, cin0):
        w = enc_params[blk][conv]["kernel"]
        bnn = _BN_OF[conv]
        s, _ = _fold_bn(enc_params[blk][bnn], enc_stats[blk][bnn])
        zcp = kw.pop("zcp")
        zwin, tiles = band_plan(**kw)
        band = build_band(
            w, s, z_in=kw["z_in"], cin=kw["cin"], cout=kw["cout"],
            kz=kw["kz"], z_stride=kw["z_stride"], z_pad=kw["z_pad"],
            zwin=zwin, tiles=tiles, zcp=zcp, dtype=enc.dtype)
        prepared.setdefault(blk, {})[conv] = {"band": band}
    return prepared


def prepare_variables(model, variables):
    """Hoist frame-invariant constants out of the per-frame jitted
    forward: returns `variables` plus a 'prepared' collection holding
    every pillar conv's band matrix (conv weights x BN eval scale in the
    kernel's final tiled layout — `ops.pillar_fused.build_band`), which
    `PillarConv` then reads instead of rebuilding per frame (~2-3 ms of
    einsum/slice work per agent at flagship shapes).

    Call after weights are final — prepared values are derived from
    params/batch_stats and go stale if those change. Works on CmtDetector,
    CmtCoopDetector, or any model exposing the extractor attribute names;
    a no-op (returns `variables` unchanged) when no pillar encoder is
    found. Eval only: the train path never reads 'prepared'.
    """
    bound = model.bind(variables)
    prepared = {}
    for name in ("extractor", "vehicle_model", "infrastructure_model"):
        try:
            agent = getattr(bound, name)
        except AttributeError:
            continue
        enc = getattr(agent, "pts_middle_encoder", None)
        if not isinstance(enc, PillarSparseEncoder):
            continue
        ev = enc.variables
        cin0 = ev["params"]["conv_input"]["conv"]["kernel"].shape[1]
        sub = jax.jit(
            lambda p, s, enc=enc, cin0=cin0: _encoder_bands(
                enc.clone(parent=None), p, s, cin0)
        )(ev["params"], ev["batch_stats"])
        prepared[name] = {"pts_middle_encoder": sub}
    if not prepared:
        return variables
    return dict(variables, prepared=prepared)
