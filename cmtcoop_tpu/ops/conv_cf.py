"""Channels-first fused 3x3 conv Pallas kernel for the image backbones.

Why: XLA's NHWC conv on TPU pads BOTH contraction and output channels to
128-lane multiples — at VoVNet-99's stage channels (160/192/224) that is
a (C/ceil128(C))^2 ceiling, measured at exactly 39% of bf16 peak for the
stage-3 160x160 convs (runs/tpu_probe.log). This kernel uses a
channels-first layout instead:

    (V, C, NL) bfloat16, NL = (Hp + rt) * Wp: image rows flattened into
    LANES (Wp = W padded to a 32-lane multiple, pad columns zeroed),
    Hp = H padded to the row tile rt, rt zero tail rows.

Streaming: the grid walks rt-row output tiles; each rt-row INPUT block
is DMA'd exactly ONCE (aligned, 1x traffic) into a 4-slot rotating
buffer, and each tile reads its dy = -1/+1 halo rows from the previous /
next slots (prefetch depth 2, so the next block always has a full tile
of DMA time). The 3 dy rows assemble into C = [dy0; dy1; dy2] with
layout-normalizing stores, then one Z_dx = W_dx(Cout, 3Cin) @ C matmul
per dx tap runs on the MXU and the outputs combine with lane rolls:
Y[i] = sum_dx Z_dx[i+dx]. K packs as 3*Cin (480 -> 512 lanes = 6.7% pad
instead of 2.56x at 160 ch); rolling the f32 outputs (2 rolls) is ~2.5x
cheaper than shifting the bf16 inputs; roll wraparound is exact because
Z at zeroed pad columns is identically zero (bias is added after the
combine). BN (eval, folded) + residual + ReLU + the pad mask fuse into
the epilogue, and the kernel writes its own zero tail blocks, so convs
chain with NO pad/slice copies between them.

Replaces cuDNN convs for VoVNet eval (reference models/backbones/
vovnet.py OSA 3x3 convs); the flax/XLA path remains for training/init.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NSLOT = 4  # DMA ring slots: prev, cur, next, prefetch-in-flight


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def plan_wp(w: int) -> int:
    """Padded row width: >=1 zero pad column, 32-lane aligned so row
    tiles down to rt=4 keep 128-aligned lane spans."""
    return _round_up(w + 2, 32)


def plan_nl(h: int, w: int, rt: int = 8) -> int:
    """Flat lane count: Hp data rows + rt zero tail rows."""
    wp = plan_wp(w)
    return (_round_up(h, rt) + rt) * wp


def to_cf(x_nhwc: jnp.ndarray, rt: int = 8) -> jnp.ndarray:
    """(V, H, W, C) -> (V, C, NL) channels-first layout."""
    v, h, w, c = x_nhwc.shape
    wp = plan_wp(w)
    rows = plan_nl(h, w, rt) // wp
    x = jnp.transpose(x_nhwc, (0, 3, 1, 2))        # (V, C, H, W)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, rows - h), (0, wp - w)))
    return x.reshape(v, c, rows * wp)


def from_cf(x_cf: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(V, C, NL) -> (V, H, W, C)."""
    v, c, n = x_cf.shape
    wp = plan_wp(w)
    x = x_cf.reshape(v, c, n // wp, wp)[:, :, :h, :w]
    return jnp.transpose(x, (0, 2, 3, 1))


def lane_mask(h: int, w: int, rt: int = 8, dtype=jnp.float32):
    """(1, 1, NL) 1.0 where (row, col) is a real pixel — multiply after
    any lane-wise op that breaks the zero-padding invariant (e.g. the
    OSA aggregate's bias+ReLU)."""
    wp = plan_wp(w)
    nl = plan_nl(h, w, rt)
    lanes = jnp.arange(nl)
    ok = (lanes // wp < h) & (lanes % wp < w)
    return ok.astype(dtype)[None, None, :]


def _conv_kernel(w_ref, sb_ref, x_hbm, o_ref, win, k3buf, sem, *, rt, wp,
                 cin, cout, h, w, relu, nb, mstack, resid_ref=None):
    bb = pl.program_id(1)
    v = pl.program_id(0)
    nl = rt * wp
    is_data = bb < nb

    def dma(idx):
        return pltpu.make_async_copy(
            x_hbm.at[v, :, pl.ds(idx * nl, nl)],
            win.at[idx % NSLOT], sem.at[idx % NSLOT])

    @pl.when(bb == 0)
    def _():
        dma(0).start()
        if nb > 1:
            dma(1).start()

    @pl.when(is_data & (bb + 2 <= nb))
    def _():
        dma(bb + 2).start()

    @pl.when(~is_data)
    def _():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    @pl.when(is_data)
    def _():
        # each DMA is waited exactly ONCE, at its first use: tile 0
        # waits its own block, every tile waits its "next" block (which
        # becomes "cur" on the following tile, already waited)
        @pl.when(bb == 0)
        def _():
            dma(0).wait()
        if nb > 1:
            dma(bb + 1).wait()
        cur = win[bb % NSLOT]
        nxt = win[(bb + 1) % NSLOT] if nb > 1 else None
        prv = win[(bb - 1) % NSLOT]

        # C = [rows dy-1; dy0; dy+1] spans the prev/cur/next slots; the
        # stores also normalize the (wp-offset) lane layouts for the MXU
        @pl.when(bb == 0)
        def _():
            k3buf[0:cin, 0:wp] = jnp.zeros((cin, wp), k3buf.dtype)

        @pl.when(bb > 0)
        def _():
            k3buf[0:cin, 0:wp] = prv[:, nl - wp:]
        k3buf[0:cin, wp:nl] = cur[:, :nl - wp]
        k3buf[cin:2 * cin] = cur[...]
        k3buf[2 * cin:3 * cin, :nl - wp] = cur[:, wp:]
        if nxt is not None:
            k3buf[2 * cin:3 * cin, nl - wp:] = nxt[:, :wp]
        else:
            k3buf[2 * cin:3 * cin, nl - wp:] = jnp.zeros(
                (cin, wp), k3buf.dtype)

        c3 = k3buf[...]
        if mstack:
            # ONE (3*Cout, 3*Cin) @ C matmul: stacking the dx taps along
            # M cuts the MXU's 128-row M-pass padding (cout 160: 3x2
            # passes -> 4; 192: 6 -> 5); the chunks then combine with the
            # same lane rolls
            z = jax.lax.dot_general(
                w_ref[...].reshape(3 * cout, 3 * cin), c3,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = pltpu.roll(z[0:cout], 1, 1)
            acc += z[cout:2 * cout]
            acc += pltpu.roll(z[2 * cout:3 * cout], nl - 1, 1)
        else:
            z0 = jax.lax.dot_general(
                w_ref[0], c3, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = pltpu.roll(z0, 1, 1)
            acc += jax.lax.dot_general(
                w_ref[1], c3, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            z2 = jax.lax.dot_general(
                w_ref[2], c3, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc += pltpu.roll(z2, nl - 1, 1)

        y = acc * sb_ref[0][:, None] + sb_ref[1][:, None]
        if resid_ref is not None:
            y = y + resid_ref[0].astype(jnp.float32)
        if relu:
            y = jnp.maximum(y, 0.0)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, nl), 1)
        ok = ((col % wp < w) &
              (col // wp + bb * rt < h)).astype(jnp.float32)
        o_ref[0] = (y * ok).astype(o_ref.dtype)


def _conv_kernel_resid(w_ref, sb_ref, x_hbm, resid_ref, o_ref, win, k3buf,
                       sem, **kw):
    _conv_kernel(w_ref, sb_ref, x_hbm, o_ref, win, k3buf, sem,
                 resid_ref=resid_ref, **kw)


def conv3x3_cf(
    x: jnp.ndarray,                  # (V, Cin, NL) cf layout
    weights: jnp.ndarray,            # (3, 3, Cin, Cout) HWIO
    h: int, w: int,
    scale: Optional[jnp.ndarray] = None,   # (Cout,) BN eval scale
    bias: Optional[jnp.ndarray] = None,    # (Cout,) BN eval bias
    relu: bool = True,
    rt: int = 8,
    residual: Optional[jnp.ndarray] = None,  # (V, Cout, NL) cf layout
    mstack: bool = False,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused 3x3 stride-1 conv (+BN eval affine) (+residual) (+ReLU),
    (V, Cin, NL) -> (V, Cout, NL) in the same layout (tail zero blocks
    written by the kernel — chain freely)."""
    v, cin, nlanes = x.shape
    wp = plan_wp(w)
    cout = weights.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    esize = jnp.dtype(x.dtype).itemsize
    while rt > 4:  # shrink row tile if scratch would blow VMEM
        ztmp = 5 if mstack else 4
        vmem = ((NSLOT * cin * rt * wp + 3 * cin * rt * wp
                 + cout * rt * wp + 9 * cout * cin) * esize
                + ztmp * cout * rt * wp * 4)  # acc + z + roll temps (f32)
        if vmem <= 11 * 2 ** 20:
            break
        rt //= 2
    hp = _round_up(h, rt)
    assert nlanes >= plan_nl(h, w, rt) and nlanes % (rt * wp) == 0, (
        nlanes, wp, hp, rt)

    # (3, 3, Cin, Cout) -> per-dx K-packed tap matrices (K stacks dy):
    # weights[dy, dx, ci, co] -> wk[dx, co, dy*cin + ci]
    wk = jnp.transpose(weights, (1, 3, 0, 2))      # (3, Cout, 3, Cin)
    wk = wk.reshape(3, cout, 3 * cin).astype(x.dtype)

    if scale is None:
        scale = jnp.ones((cout,), jnp.float32)
    if bias is None:
        bias = jnp.zeros((cout,), jnp.float32)
    sb = jnp.stack([scale.astype(jnp.float32),
                    bias.astype(jnp.float32)])     # (2, Cout)

    nb = hp // rt
    nblocks = nlanes // (rt * wp)           # data + tail zero blocks
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),     # wk
        pl.BlockSpec(memory_space=pltpu.VMEM),     # scale/bias
        pl.BlockSpec(memory_space=pl.ANY),         # x rows in HBM
    ]
    operands = [wk, sb, x]
    kw = dict(rt=rt, wp=wp, cin=cin, cout=cout, h=h, w=w, relu=relu,
              nb=nb, mstack=mstack)
    if residual is not None:
        body = functools.partial(_conv_kernel_resid, **kw)
        in_specs.append(pl.BlockSpec(
            (1, cout, rt * wp), lambda vv, bb: (vv, 0, bb),
            memory_space=pltpu.VMEM))
        operands.append(residual)
    else:
        body = functools.partial(_conv_kernel, **kw)

    return pl.pallas_call(
        body,
        grid=(v, nblocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, cout, rt * wp),
                               lambda vv, bb: (vv, 0, bb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v, cout, nlanes), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((NSLOT, cin, rt * wp), x.dtype),
            pltpu.VMEM((3 * cin, rt * wp), x.dtype),
            pltpu.SemaphoreType.DMA((NSLOT,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*operands)


def _agg_kernel(*refs, nparts, cout, rt, wp, h, w, tl, nb, nb_data):
    """refs = [w0..w{n-1}, sb, part0..part{n-1}, out, gap, gap_acc].
    Blocks past `nb_data` cover only zero-pad rows: write zeros, skip the
    matmuls (at stage-4 shapes 2 of 12 blocks are pure pad)."""
    wrefs = refs[:nparts]
    sb_ref = refs[nparts]
    parts = refs[nparts + 1:nparts + 1 + nparts]
    o_ref = refs[nparts + 1 + nparts]
    gap_ref = refs[nparts + 2 + nparts]
    gap_acc = refs[nparts + 3 + nparts]
    b = pl.program_id(1)
    rows_per = tl // wp

    @pl.when(b >= nb_data)
    def _():
        o_ref[0] = jnp.zeros((cout, tl), o_ref.dtype)

    @pl.when(b < nb_data)
    def _():
        acc = jnp.zeros((cout, tl), jnp.float32)
        for wr, pr in zip(wrefs, parts):
            acc += jax.lax.dot_general(
                wr[...], pr[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        y = jnp.maximum(acc + sb_ref[0][:, None], 0.0)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, tl), 1)
        ok = ((col % wp < w) &
              (col // wp + b * rows_per < h)).astype(jnp.float32)
        y = y * ok
        o_ref[0] = y.astype(o_ref.dtype)
        part_sum = jnp.sum(y, axis=1)[None, :]

        @pl.when(b == 0)
        def _():
            gap_acc[...] = part_sum

        @pl.when(b > 0)
        def _():
            gap_acc[...] = gap_acc[...] + part_sum

        @pl.when(b == nb_data - 1)
        def _():
            gap_ref[0] = gap_acc[...]


def osa_agg_cf(parts, weights, scale, bias, h, w, rt: int = 8,
               interpret: Optional[bool] = None):
    """Fused OSA aggregate: 1x1 conv over the (virtual) channel concat of
    `parts` + BN eval + ReLU + pad mask, single pass over the inputs —
    the sum-of-XLA-einsums formulation materializes an f32 intermediate
    per part (~GBs of HBM traffic per block at stage 2/3). Also emits the
    eSE global-average-pool sums as a by-product (second output), so the
    following eSE costs one tiny fc + one broadcast multiply.

    parts: list of (V, C_i, NL) cf tensors; weights: (sumC, Cout);
    returns (agg (V, Cout, NL) cf, gap (V, Cout) f32 pixel sums).
    """
    v, _, nl = parts[0].shape
    wp = plan_wp(w)
    cout = weights.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dt = parts[0].dtype
    esize = jnp.dtype(dt).itemsize
    csum = sum(p.shape[1] for p in parts)
    # lane tile: largest rt-aligned tile that fits double-buffered parts
    tl = rt * wp
    while tl > 4 * wp and (2 * csum * tl * esize + 2 * cout * tl * 4
                           + csum * cout * esize) > 11 * 2 ** 20:
        tl //= 2  # floor 4*wp keeps tl a 128-lane multiple (wp % 32 == 0)
    assert nl % tl == 0 and tl % 128 == 0, (nl, tl, wp)
    nb = nl // tl
    nb_data = -(-h * wp // tl)  # blocks containing any real row

    wks = []
    off = 0
    for p in parts:
        c_i = p.shape[1]
        wks.append((weights[off:off + c_i]
                    * scale.astype(weights.dtype)[None, :]).T.astype(dt))
        off += c_i

    in_specs = ([pl.BlockSpec(memory_space=pltpu.VMEM)] * len(parts)
                + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                + [pl.BlockSpec((1, p.shape[1], tl),
                                lambda vv, bb: (vv, 0, bb),
                                memory_space=pltpu.VMEM) for p in parts])
    sb = jnp.stack([bias.astype(jnp.float32)] * 2)

    out, gap = pl.pallas_call(
        functools.partial(_agg_kernel, nparts=len(parts), cout=cout,
                          rt=rt, wp=wp, h=h, w=w, tl=tl, nb=nb,
                          nb_data=nb_data),
        grid=(v, nb),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, cout, tl), lambda vv, bb: (vv, 0, bb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cout), lambda vv, bb: (vv, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((v, cout, nl), dt),
            jax.ShapeDtypeStruct((v, 1, cout), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, cout), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*wks, sb, *parts)
    return out, gap[:, 0]
