"""Pallas window-MSDA backward kernels.

The forward (msda_window_pallas_v2) streams pre-shifted value planes through
VMEM and accumulates 11x11 window taps. Training previously back-propagated
through the exact-gather equivalent (ops/msda_dispatch._bwd), whose XLA
transpose lowers to scatter-adds — ~2 s/encoder layer on v5e. These kernels
give the backward the same window/plane structure as the forward:

  * Kernel A (query-aligned, this file): d_offsets and d_attention. Per tap,
    the head-wise inner product s_h = <g, view>_D comes from one MXU
    contraction with expand2^T (C -> P*H, the transpose of the forward's
    expand), then the hat/att chain rules are cheap 32-lane VPU ops
    accumulated in small VMEM scratch.
  * Kernel B (also query-aligned): d_value. Per tap, w (x) g accumulates into
    a per-tile pre-shifted d_plane slab (same aligned plane/a8 scheme as the
    forward's reads, so every VMEM write is 8-aligned); the slab is
    read-modified-written against an HBM d_planes buffer (grid is sequential,
    overlapping halos are safe), which XLA then folds back with shifted
    slices — the exact transpose of _prep_planes.

Gradient semantics match jax.vjp of the exact path (ops/msda_dispatch.
_exact_equiv): clip pass-through for |offset| <= radius, bilinear hat
subgradients, zero padding. Parity: tests/test_msda_bwd.py.
Reference backward: ms_deform_im2col_cuda.cuh:301-922 (6-variant CUDA).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ape_tpu.ops.msda import level_start_index
from ape_tpu.ops.msda_window_pallas_v2 import (
    VMEM_BUDGET,
    _build_vp,
    _plane_fold_map,
    VMEM_LIMIT,
    _PairGeom,
    _choose_tiles,
    _hat,
    _prep_planes,
    _tap_bounds,
)


import os

# Merged backward kernel (one pass for d_off/d_att/d_value, in-kernel plane
# fold) vs the round-2 split kernels. 0 selects the split path for A/B.
BWD_MERGED = os.environ.get("APE_MSDA_BWD_MERGED", "1") != "0"
# vp-space VALUE input for the merged kernel: mirror of the forward's
# APE_MSDA_VP — one unshifted bf16 vp slab DMA per tile + in-VMEM shifted
# plane builds, replacing the n_planes pre-shifted copies (XLA prep pass) and
# per-plane slab DMAs. The d_value side already lives in vp space.
# Round-4 chip A/B: vp backward neutral on the encoder race (85.9 -> 85.2
# ms/layer) and +13% on the full train step with the forward flip; default ON.
BWD_VP = os.environ.get("APE_MSDA_BWD_VP", "1") != "0"
# The merged kernel holds bf16 value slabs + f32 d-slabs + the f32 fold
# accumulator at once, so it gets its own (larger) budget and tile caps.
VMEM_BUDGET_BWD = int(os.environ.get("APE_MSDA_BWD_VMEM_MB", "48")) * 1024 * 1024
TQ_CAP_BWD = int(os.environ.get("APE_MSDA_BWD_TQ_CAP", "32"))
TW_CAP_BWD = int(os.environ.get("APE_MSDA_BWD_TW_CAP", "64"))
# Round-5 tap-body restructure (the PERF.md floor analysis): cut the per-tap
# full-C VPU passes —
#   * gv for the s-dot is one bf16 mul (gt_bf * view): no f32 upconvert of
#     the view, no f32 product, no downcast (3 passes -> 1);
#   * the inv_y>1 view row-repeat rides inside that mul as a broadcast
#     instead of a materialized broadcast_to pass.
# The bf16 gv product adds one rounding to d_off/d_att (within the existing
# 2e-2 parity tolerance).
# Round-5 chip A/B (encoder race, OFF_SCALE=2): LOSES — 86.2 vs 84.0
# ms/layer. The per-tap elementwise passes are not the bottleneck (see the
# bf16-d-slab result below); default OFF, kept for re-measure.
BWD_TAPV2 = os.environ.get("APE_MSDA_BWD_TAPV2", "0") != "0"
# bf16 d-value slabs: halves the per-tap d-slab RMW VMEM traffic (the other
# per-tap floor term). Precision class matches the reference's own fp16 AMP
# backward (ms_deform_attn_cuda.cu AT_DISPATCH_..._HALF accumulates d_value
# in half atomics); the cross-tile vp fold stays f32.
# Round-5 chip A/B: LOSES too (87.2 ms/layer with TAPV2) — together with the
# TAPV2 result this says the merged backward is NOT VPU-pass- or VMEM-
# bandwidth-bound; the residual cost is per-tap issue/serialization (see
# PERF.md round 5). Default OFF.
BWD_DSLAB_BF16 = os.environ.get("APE_MSDA_BWD_DSLAB_BF16", "0") != "0"
# Unconditional u-taps in the merged kernel: drop the @pl.when guard (a
# branch = Mosaic scheduling barrier per tap) and rely on hats being
# identically zero outside the active window. At realistic offsets the
# per-tile bounds are near-full anyway, so predication saves little work.
# (Numerically a superset-exact variant: it also includes the measure-zero
# z=+1 one-sided offset subgradient the bounds may clip.)
# Round-5 chip A/B (encoder race, OFF_SCALE=2): WINS, 78.0 vs 84.0 ms/layer
# -> default ON. Tiny-offset regimes lose the u-skip (the guard saved ~3x
# there); set 0 if training offsets are known-small.
BWD_NOPRED = os.environ.get("APE_MSDA_BWD_NOPRED", "1") != "0"
# With NOPRED: also unroll the v loop statically over the full window
# (dynamic fori_loop -> straight-line code, win^2 unconditional taps). Trades
# wasted work at tiny offsets for a branch- and loop-free schedule.
# Chip A/B: 77.0 ms/layer (~1 ms over NOPRED alone) — not worth losing the
# v-skip; default OFF.
BWD_STATICV = os.environ.get("APE_MSDA_BWD_STATICV", "0") != "0"
# Split the dox/doy/datt accumulators ACC_WAYS-ways by u parity (summed once
# at the end): consecutive taps then RMW different buffers, halving/quartering
# the read-after-write chain the per-tap accumulates serialize on.
# Chip A/B: 2-way 78.6, 4-way 84.8 (vs 78.0) — the acc RMW chain is not the
# binding dependency; default 1.
BWD_ACC_WAYS = int(os.environ.get("APE_MSDA_BWD_ACC_WAYS", "1"))


def _dpos(z):
    """d/d(position) of hat(tap - position), exact-path convention.

    The gather formulation decomposes position = floor + frac on [0, 1) and
    differentiates the frac weights, so at integer-aligned positions the
    subgradient is one-sided: z in (-1, 0] -> -1, z in (0, 1] -> +1, else 0
    (z = tap - position). The symmetric sign(z) choice differs on the
    measure-zero integer set — a real model never lands there, but the parity
    tests do catch single-element drift without this."""
    return jnp.where(
        (z > -1.0) & (z <= 0.0),
        -1.0,
        jnp.where((z > 0.0) & (z <= 1.0), 1.0, 0.0),
    )


def _grad_kernel_offatt(
    bounds_ref,  # (B, nty, ntx, 4) int32 SMEM
    offx_ref,  # (1, tq, tw, PH)
    offy_ref,
    att_ref,
    g_ref,  # (1, tq, tw, C) cotangent
    planes_hbm,  # forward value planes (P, B, sy, R, Wp, C)
    dox_ref,  # out (1, tq, tw, PH)
    doy_ref,
    datt_ref,
    slabs,
    dox_acc,  # VMEM (tq, tw, PH) f32
    doy_acc,
    datt_acc,
    sems,
    *,
    g: _PairGeom,
    heads,
    num_points,
    tq,
    tw,
    slab_w,
    single_x,
    single_y,
):
    b = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    n_planes = len(g.planes)
    rows_q = tq if g.sy > 1 else tq // g.inv_y
    tile_rows = rows_q + g.halo_y

    row_start = 0 if single_y else ty * rows_q
    col_start = 0 if single_x else pl.multiple_of(tx * tw, 8)
    copies = [
        pltpu.make_async_copy(
            planes_hbm.at[
                p, b, :, pl.ds(row_start, tile_rows), pl.ds(col_start, slab_w), :
            ],
            slabs.at[p],
            sems.at[p],
        )
        for p in range(n_planes)
    ]
    for cp in copies:
        cp.start()

    h, npt = heads, num_points
    radius = g.radius
    ox_raw = offx_ref[0]
    oy_raw = offy_ref[0]
    ox = jnp.clip(ox_raw, -radius, radius)
    oy = jnp.clip(oy_raw, -radius, radius)
    att = att_ref[0]
    gt = g_ref[0].astype(jnp.float32)  # (tq, tw, C)

    pad = g.pad
    if g.rem_x is None:
        qx = jax.lax.broadcasted_iota(jnp.int32, (tq, tw, 1), 1).astype(jnp.float32)
        rem_x = ((qx % g.inv_x) + 0.5) / g.inv_x - 0.5
    else:
        rem_x = g.rem_x
    if g.rem_y is None:
        qy = jax.lax.broadcasted_iota(jnp.int32, (tq, tw, 1), 0).astype(jnp.float32)
        rem_y = ((qy % g.inv_y) + 0.5) / g.inv_y - 0.5
    else:
        rem_y = g.rem_y
    px = ox + (pad + rem_x)
    py = oy + (pad + rem_y)
    # clip pass-through (jnp.clip VJP: gradient 1 where the input equals its
    # clipped value, i.e. |off| <= radius)
    mx = (jnp.abs(ox_raw) <= radius).astype(jnp.float32)
    my = (jnp.abs(oy_raw) <= radius).astype(jnp.float32)

    c = g_ref.shape[-1]
    # expand2^T: (C, PH), column p*H+hh collects channels with c%H == hh
    etr = jax.lax.broadcasted_iota(jnp.int32, (c, h * npt), 0)
    etc = jax.lax.broadcasted_iota(jnp.int32, (c, h * npt), 1)
    expand2T = (etr % h == etc % h).astype(jnp.bfloat16)

    for cp in copies:
        cp.wait()

    dox_acc[...] = jnp.zeros_like(dox_acc)
    doy_acc[...] = jnp.zeros_like(doy_acc)
    datt_acc[...] = jnp.zeros_like(datt_acc)

    v_lo = bounds_ref[b, ty, tx, 2]
    v_hi = bounds_ref[b, ty, tx, 3]
    u_lo = bounds_ref[b, ty, tx, 0]
    u_hi = bounds_ref[b, ty, tx, 1]

    def geom_y(v):
        if g.sy > 1:
            return (g.int_y + v) % g.sy, (g.int_y + v) // g.sy
        return 0, v

    def tap_s(plane_idx, a8, phi_y, dy):
        """Head-wise inner product s = <g, view>_D for one tap, (tq, tw, PH)."""
        view = slabs[plane_idx, phi_y, pl.ds(dy, rows_q), pl.ds(a8, tw), :]
        if g.inv_y > 1:
            view = jnp.broadcast_to(
                view[:, None], (rows_q, g.inv_y, tw, view.shape[-1])
            ).reshape(rows_q * g.inv_y, tw, view.shape[-1])
        gv = gt * view.astype(jnp.float32)  # (tq, tw, C)
        return jax.lax.dot_general(
            gv.astype(jnp.bfloat16), expand2T,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # s_h replicated across points

    def v_body_dyn(v, _):
        vf = v.astype(jnp.float32)
        hy = _hat(vf - py)
        dhy = _dpos(vf - py)  # d/d oy of hat(v - py)
        phi_y, dy = geom_y(v)

        # dynamic u-tap skip with dynamic plane select — same scheme as the
        # forward kernel (ops/msda_window_pallas_v2.py)
        def u_body(u, _):
            uf = u.astype(jnp.float32)
            if g.sx > 1:
                plane_idx, a8 = u, 0
            else:
                ushift = u * g.inv_x
                rem = jax.lax.rem(ushift, 8)
                plane_idx = rem // g.inv_x
                a8 = pl.multiple_of(ushift - rem, 8)
            s = tap_s(plane_idx, a8, phi_y, dy)
            hx = _hat(uf - px)
            dhx = _dpos(uf - px)
            sa = s * att
            datt_acc[...] = datt_acc[...] + s * (hy * hx)
            dox_acc[...] = dox_acc[...] + sa * (hy * dhx)
            doy_acc[...] = doy_acc[...] + sa * (dhy * hx)
            return 0

        jax.lax.fori_loop(u_lo, u_hi + 1, u_body, 0)
        return 0

    # NOTE: unlike the forward, this kernel keeps the dynamic u loop in ALL
    # regimes. A static value-chained branch (forward-style hybrid) was built
    # and measured: its per-u (tq, tw, C) gv temporaries do not share Mosaic
    # stack slots, and the dual-branch cond blew scoped VMEM (opaque HTTP-500
    # compile crash) on every inv_x==1 pair. The dynamic loop's per-tap cost
    # here is dominated by the gv product + K=256 dot anyway — the three
    # (tq, tw, PH) acc RMWs it adds are small.
    jax.lax.fori_loop(v_lo, v_hi + 1, v_body_dyn, 0)
    dox_ref[0] = dox_acc[...] * mx
    doy_ref[0] = doy_acc[...] * my
    datt_ref[0] = datt_acc[...]


def _run_pair_grad_offatt(
    v_l, off_pair, att_pair, g_out, hq, wq, hv, wv, radius, heads, head_dim,
    num_points, plane_dtype=jnp.bfloat16, interpret=False,
):
    """d_off (B, Q, H, P, 2) and d_att (B, Q, H, P) for one (lq, lv) pair."""
    b = v_l.shape[0]
    c = heads * head_dim
    g = _PairGeom(hq, wq, hv, wv, radius)

    planes = _prep_planes(v_l.reshape(b, hv, wv, c), g, plane_dtype)
    tq, tw = _choose_tiles(g, c, np.dtype(plane_dtype).itemsize)
    rows_q = tq if g.sy > 1 else tq // g.inv_y
    tile_rows = rows_q + g.halo_y
    slab_w = -(-(tw + g.max_a8) // 8) * 8

    need_rows = (hq // tq - 1) * rows_q + tile_rows
    need_cols = (wq // tw - 1) * tw + slab_w
    pr = max(0, need_rows - planes.shape[3])
    pc = max(0, need_cols - planes.shape[4])
    if pr or pc:
        planes = jnp.pad(planes, ((0, 0),) * 3 + ((0, pr), (0, pc), (0, 0)))

    ph = heads * num_points
    offx_g = off_pair[..., 0].transpose(0, 1, 3, 2).reshape(b, hq, wq, ph)
    offy_g = off_pair[..., 1].transpose(0, 1, 3, 2).reshape(b, hq, wq, ph)
    att_g = att_pair.transpose(0, 1, 3, 2).reshape(b, hq, wq, ph)
    g_g = g_out.reshape(b, hq, wq, c)
    bounds = _tap_bounds(offx_g, offy_g, g, tq, tw)

    kernel = functools.partial(
        _grad_kernel_offatt,
        g=g,
        heads=heads,
        num_points=num_points,
        tq=tq,
        tw=tw,
        slab_w=slab_w,
        single_x=(wq // tw) == 1,
        single_y=(hq // tq) == 1,
    )
    qspec = lambda shp: pl.BlockSpec(
        shp, lambda bb, ty, tx: (bb, ty, tx, 0), memory_space=pltpu.VMEM
    )
    dox, doy, datt = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((b, hq, wq, ph), jnp.float32)] * 3,
        grid=(b, hq // tq, wq // tw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            qspec((1, tq, tw, ph)),
            qspec((1, tq, tw, ph)),
            qspec((1, tq, tw, ph)),
            qspec((1, tq, tw, c)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[qspec((1, tq, tw, ph))] * 3,
        scratch_shapes=[
            pltpu.VMEM((len(g.planes), g.sy, tile_rows, slab_w, c), plane_dtype),
            pltpu.VMEM((tq, tw, ph), jnp.float32),
            pltpu.VMEM((tq, tw, ph), jnp.float32),
            pltpu.VMEM((tq, tw, ph), jnp.float32),
            pltpu.SemaphoreType.DMA((len(g.planes),)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(bounds, offx_g, offy_g, att_g, g_g, planes)

    # (B, hq, wq, PH) p-major lanes -> (B, Q, H, P)
    def back(x):
        return (
            x.reshape(b, hq * wq, num_points, heads).transpose(0, 1, 3, 2)
        )

    d_off = jnp.stack([back(dox), back(doy)], axis=-1)  # (B, Q, H, P, 2)
    return d_off, back(datt)


def _grad_kernel_value(
    bounds_ref,  # (B, nty, ntx, 4) int32 SMEM
    offx_ref,  # (1, tq, tw, PH)
    offy_ref,
    att_ref,
    g_ref,  # (1, tq, tw, C)
    dplanes_in,  # ANY: (P, B, sy, R, Wp, C) f32, aliased to the output
    dplanes_out,  # ANY alias of dplanes_in
    dslab,  # VMEM (P, sy, tile_rows, slab_w, C) f32
    sems,  # DMA sems (P,)
    *,
    g: _PairGeom,
    heads,
    num_points,
    tq,
    tw,
    slab_w,
    single_x,
    single_y,
):
    b = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    n_planes = len(g.planes)
    rows_q = tq if g.sy > 1 else tq // g.inv_y
    tile_rows = rows_q + g.halo_y

    row_start = 0 if single_y else ty * rows_q
    col_start = 0 if single_x else pl.multiple_of(tx * tw, 8)

    def region(ref, p):
        return ref.at[
            p, b, :, pl.ds(row_start, tile_rows), pl.ds(col_start, slab_w), :
        ]

    # read-modify-write against the running HBM buffer: the TPU grid executes
    # sequentially, so overlapping halo regions of adjacent tiles are safe
    copies_in = [
        pltpu.make_async_copy(region(dplanes_in, p), dslab.at[p], sems.at[p])
        for p in range(n_planes)
    ]
    for cp in copies_in:
        cp.start()

    h, npt = heads, num_points
    radius = g.radius
    ox = jnp.clip(offx_ref[0], -radius, radius)
    oy = jnp.clip(offy_ref[0], -radius, radius)
    att = att_ref[0]
    gt = g_ref[0].astype(jnp.float32)

    pad = g.pad
    if g.rem_x is None:
        qx = jax.lax.broadcasted_iota(jnp.int32, (tq, tw, 1), 1).astype(jnp.float32)
        rem_x = ((qx % g.inv_x) + 0.5) / g.inv_x - 0.5
    else:
        rem_x = g.rem_x
    if g.rem_y is None:
        qy = jax.lax.broadcasted_iota(jnp.int32, (tq, tw, 1), 0).astype(jnp.float32)
        rem_y = ((qy % g.inv_y) + 0.5) / g.inv_y - 0.5
    else:
        rem_y = g.rem_y
    px = ox + (pad + rem_x)
    py = oy + (pad + rem_y)

    c = g_ref.shape[-1]
    e2r = jax.lax.broadcasted_iota(jnp.int32, (h * npt, c), 0)
    e2c = jax.lax.broadcasted_iota(jnp.int32, (h * npt, c), 1)
    expand2 = (e2c % h == e2r % h).astype(jnp.bfloat16)

    for cp in copies_in:
        cp.wait()

    v_lo = bounds_ref[b, ty, tx, 2]
    v_hi = bounds_ref[b, ty, tx, 3]
    u_lo = bounds_ref[b, ty, tx, 0]
    u_hi = bounds_ref[b, ty, tx, 1]

    # NOTE: the u loop here stays STATICALLY UNROLLED. Unlike the forward and
    # the d_off/d_att kernel (dynamic loads only), this kernel WRITES at the
    # u-dependent slab offset; a dynamic-offset sublane store lowers through a
    # masked read-modify-write path that measured ~10x slower in the full
    # train step (0.316 -> 3.69 s/step at 512²) despite skipping taps.
    # Inactive taps are instead skipped by PREDICATION (@pl.when with static
    # store offsets): hats outside [u_lo, u_hi] are identically zero, so the
    # guarded tap bodies are exact skips.
    def v_body(v, _):
        hy = _hat(v.astype(jnp.float32) - py)
        ahy = att * hy
        if g.sy > 1:
            phi_y = (g.int_y + v) % g.sy
            dy = (g.int_y + v) // g.sy
        else:
            phi_y = 0
            dy = v
        for u in range(g.win):

            @pl.when((u >= u_lo) & (u <= u_hi))
            def _():
                whp = ahy * _hat(u - px)
                w = jax.lax.dot_general(
                    whp.astype(jnp.bfloat16), expand2,
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (tq, tw, C)
                contrib = w * gt
                if g.inv_y > 1:
                    # transpose of the forward's row repeat: sum query-row groups
                    contrib = contrib.reshape(rows_q, g.inv_y, tw, c).sum(axis=1)
                plane_idx, a8 = g.u_to_plane[u]
                dslab[plane_idx, phi_y, pl.ds(dy, rows_q), a8 : a8 + tw, :] = (
                    dslab[plane_idx, phi_y, pl.ds(dy, rows_q), a8 : a8 + tw, :] + contrib
                )
        return 0

    jax.lax.fori_loop(v_lo, v_hi + 1, v_body, 0)

    copies_out = [
        pltpu.make_async_copy(dslab.at[p], region(dplanes_out, p), sems.at[p])
        for p in range(n_planes)
    ]
    for cp in copies_out:
        cp.start()
    for cp in copies_out:
        cp.wait()


def _run_pair_grad_value(
    off_pair, att_pair, g_out, hq, wq, hv, wv, radius, heads, head_dim,
    num_points, interpret=False,
):
    """d_value contribution (B, Hv*Wv, C) of one (lq, lv) pair."""
    b = off_pair.shape[0]
    c = heads * head_dim
    g = _PairGeom(hq, wq, hv, wv, radius)

    # f32 d_slabs double the forward's bf16 footprint: choose tiles with
    # plane_bytes=4 so the budget holds
    tq, tw = _choose_tiles(g, c, 4)
    rows_q = tq if g.sy > 1 else tq // g.inv_y
    tile_rows = rows_q + g.halo_y
    slab_w = -(-(tw + g.max_a8) // 8) * 8

    # d_planes buffer with the same geometry the forward planes would have,
    # padded to cover every tile's slab region
    v_zero = jnp.zeros((b, hv, wv, c), jnp.float32)
    _, fold = jax.vjp(lambda v: _prep_planes(v, g, jnp.float32), v_zero)
    planes_shape = jax.eval_shape(lambda v: _prep_planes(v, g, jnp.float32), v_zero)
    need_rows = (hq // tq - 1) * rows_q + tile_rows
    need_cols = (wq // tw - 1) * tw + slab_w
    pr = max(0, need_rows - planes_shape.shape[3])
    pc = max(0, need_cols - planes_shape.shape[4])
    dplanes0 = jnp.zeros(
        (
            planes_shape.shape[0],
            b,
            planes_shape.shape[2],
            planes_shape.shape[3] + pr,
            planes_shape.shape[4] + pc,
            c,
        ),
        jnp.float32,
    )

    ph = heads * num_points
    offx_g = off_pair[..., 0].transpose(0, 1, 3, 2).reshape(b, hq, wq, ph)
    offy_g = off_pair[..., 1].transpose(0, 1, 3, 2).reshape(b, hq, wq, ph)
    att_g = att_pair.transpose(0, 1, 3, 2).reshape(b, hq, wq, ph)
    g_g = g_out.reshape(b, hq, wq, c)
    bounds = _tap_bounds(offx_g, offy_g, g, tq, tw)

    kernel = functools.partial(
        _grad_kernel_value,
        g=g,
        heads=heads,
        num_points=num_points,
        tq=tq,
        tw=tw,
        slab_w=slab_w,
        single_x=(wq // tw) == 1,
        single_y=(hq // tq) == 1,
    )
    qspec = lambda shp: pl.BlockSpec(
        shp, lambda bb, ty, tx: (bb, ty, tx, 0), memory_space=pltpu.VMEM
    )
    dplanes = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(dplanes0.shape, jnp.float32),
        grid=(b, hq // tq, wq // tw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            qspec((1, tq, tw, ph)),
            qspec((1, tq, tw, ph)),
            qspec((1, tq, tw, ph)),
            qspec((1, tq, tw, c)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((len(g.planes), g.sy, tile_rows, slab_w, c), jnp.float32),
            pltpu.SemaphoreType.DMA((len(g.planes),)),
        ],
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(bounds, offx_g, offy_g, att_g, g_g, dplanes0)

    # undo the coverage padding, then fold shifted planes back to the value
    # grid via the transpose of _prep_planes (pure slice/pad/repeat adjoints)
    dplanes = dplanes[:, :, :, : planes_shape.shape[3], : planes_shape.shape[4], :]
    (d_value,) = fold(dplanes)
    return d_value.reshape(b, hv * wv, c)


def _grad_kernel_merged(
    bounds_ref,  # (B, nty, ntx, 4) int32 SMEM
    offx_ref,  # (1, tq, tw, PH)
    offy_ref,
    att_ref,
    g_ref,  # (1, tq, tw, C) cotangent
    planes_hbm,  # forward value planes (P, B, sy, R, Wp, C) bf16, ANY
    dvp_in,  # ANY: (B, sphase, sy, Rvp, Wvp, C) f32, aliased to dvp_out
    dox_ref,
    doy_ref,
    datt_ref,
    dvp_out,  # ANY alias of dvp_in
    # scratches (in scratch_shapes order):
    #   slabs (P, sy, tile_rows, slab_w, C) plane_dtype
    #   dslab (P, sy, tile_rows, slab_w, C) f32
    #   dacc (sphase, sy, tile_rows, slab_wd, C) f32
    #   dox_acc / doy_acc / datt_acc (tq, tw, PH) f32
    #   [vslab (sphase, sy, tile_rows, slab_wd, C) plane_dtype — vp mode only]
    #   sems — DMA (P,) (planes) or scalar (vp)
    #   rw_sem — DMA scalar for the dvp read/write
    *scratches,
    g: _PairGeom,
    heads,
    num_points,
    tq,
    tw,
    slab_w,
    slab_wd,
    single_x,
    single_y,
    vp=False,
):
    """One pass producing d_off, d_att AND the d_value fold input.

    Shares the value-plane stream and the per-tap hat/attention math that the
    split kernels (_grad_kernel_offatt / _grad_kernel_value) each redo, and
    replaces the 8-plane f32 dplanes HBM choreography (zero-init + RMW + XLA
    fold, ~5x the value bytes in traffic) with: per-plane VMEM d-slabs ->
    one static shifted fold per plane per tile into vp-space -> a single RMW
    against the (1-plane-sized) dvp buffer. The u loop is statically unrolled
    with pl.when predication (d-slab stores need static offsets; the off/att
    side rides along, so inactive taps still skip).
    """
    if vp:
        slabs, dslab, dacc, dox_acc, doy_acc, datt_acc, vslab, sems, rw_sem = scratches
    else:
        slabs, dslab, dacc, dox_acc, doy_acc, datt_acc, sems, rw_sem = scratches
        vslab = None
    b = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    n_planes = len(g.planes)
    rows_q = tq if g.sy > 1 else tq // g.inv_y
    tile_rows = rows_q + g.halo_y
    sphase = g.sx if g.sx > 1 else 1

    row_start = 0 if single_y else ty * rows_q
    col_start = 0 if single_x else pl.multiple_of(tx * tw, 8)
    if vp:
        # one unshifted bf16 vp slab; shifted planes built in VMEM post-wait
        copies = [
            pltpu.make_async_copy(
                planes_hbm.at[
                    b, :, :, pl.ds(row_start, tile_rows), pl.ds(col_start, slab_wd), :
                ],
                vslab,
                sems,
            )
        ]
    else:
        copies = [
            pltpu.make_async_copy(
                planes_hbm.at[
                    p, b, :, pl.ds(row_start, tile_rows), pl.ds(col_start, slab_w), :
                ],
                slabs.at[p],
                sems.at[p],
            )
            for p in range(n_planes)
        ]
    for cp in copies:
        cp.start()
    # prefetch the dvp region this tile folds into; the sequential grid plus
    # the end-of-tile write wait below make the overlapping-halo RMW safe.
    # read through the input alias, write through the output alias (same
    # memory on TPU; interpret mode keeps them distinct buffers)
    region = lambda ref: ref.at[
        b, :, :, pl.ds(row_start, tile_rows), pl.ds(col_start, slab_wd), :
    ]
    rd = pltpu.make_async_copy(region(dvp_out), dacc, rw_sem)
    rd.start()

    h, npt = heads, num_points
    radius = g.radius
    ox_raw = offx_ref[0]
    oy_raw = offy_ref[0]
    ox = jnp.clip(ox_raw, -radius, radius)
    oy = jnp.clip(oy_raw, -radius, radius)
    att = att_ref[0]
    gt = g_ref[0].astype(jnp.float32)

    pad = g.pad
    if g.rem_x is None:
        qx = jax.lax.broadcasted_iota(jnp.int32, (tq, tw, 1), 1).astype(jnp.float32)
        rem_x = ((qx % g.inv_x) + 0.5) / g.inv_x - 0.5
    else:
        rem_x = g.rem_x
    if g.rem_y is None:
        qy = jax.lax.broadcasted_iota(jnp.int32, (tq, tw, 1), 0).astype(jnp.float32)
        rem_y = ((qy % g.inv_y) + 0.5) / g.inv_y - 0.5
    else:
        rem_y = g.rem_y
    px = ox + (pad + rem_x)
    py = oy + (pad + rem_y)
    mx = (jnp.abs(ox_raw) <= radius).astype(jnp.float32)
    my = (jnp.abs(oy_raw) <= radius).astype(jnp.float32)

    c = g_ref.shape[-1]
    e2r = jax.lax.broadcasted_iota(jnp.int32, (h * npt, c), 0)
    e2c = jax.lax.broadcasted_iota(jnp.int32, (h * npt, c), 1)
    expand2 = (e2c % h == e2r % h).astype(jnp.bfloat16)
    etr = jax.lax.broadcasted_iota(jnp.int32, (c, h * npt), 0)
    etc = jax.lax.broadcasted_iota(jnp.int32, (c, h * npt), 1)
    expand2T = (etr % h == etc % h).astype(jnp.bfloat16)

    for cp in copies:
        cp.wait()

    if vp:
        # one static (sub-8) shifted copy per plane per tile (mirror of the
        # fold below; same amortized-relayout reasoning)
        for p, (phase, shift) in enumerate(_plane_fold_map(g)):
            slabs[p] = vslab[phase, :, :, shift : shift + slab_w, :]

    dox_acc[...] = jnp.zeros_like(dox_acc)
    doy_acc[...] = jnp.zeros_like(doy_acc)
    datt_acc[...] = jnp.zeros_like(datt_acc)
    dslab[...] = jnp.zeros_like(dslab)

    v_lo = bounds_ref[b, ty, tx, 2]
    v_hi = bounds_ref[b, ty, tx, 3]
    u_lo = bounds_ref[b, ty, tx, 0]
    u_hi = bounds_ref[b, ty, tx, 1]

    gt_bf = gt.astype(jnp.bfloat16)
    ways = BWD_ACC_WAYS

    def v_body(v, _):
        vf = jnp.float32(v) if isinstance(v, int) else v.astype(jnp.float32)
        hy = _hat(vf - py)
        dhy = _dpos(vf - py)
        ahy = att * hy
        if g.sy > 1:
            phi_y = (g.int_y + v) % g.sy
            dy = (g.int_y + v) // g.sy
        else:
            phi_y = 0
            dy = v
        for u in range(g.win):

            def _tap(u=u):
                plane_idx, a8 = g.u_to_plane[u]
                hx = _hat(u - px)
                # ---- d_off / d_att: s_h = <g, view>_D via one K=C dot ----
                view = slabs[plane_idx, phi_y, pl.ds(dy, rows_q), pl.ds(a8, tw), :]
                if BWD_TAPV2:
                    if g.inv_y > 1:
                        gv = (
                            gt_bf.reshape(rows_q, g.inv_y, tw, c) * view[:, None]
                        ).reshape(rows_q * g.inv_y, tw, c)
                    else:
                        gv = gt_bf * view
                else:
                    viewq = view
                    if g.inv_y > 1:
                        viewq = jnp.broadcast_to(
                            view[:, None], (rows_q, g.inv_y, tw, view.shape[-1])
                        ).reshape(rows_q * g.inv_y, tw, view.shape[-1])
                    gv = (gt * viewq.astype(jnp.float32)).astype(jnp.bfloat16)
                s = jax.lax.dot_general(
                    gv, expand2T,
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                sa = s * att
                wy = u % ways
                datt_acc[wy] = datt_acc[wy] + s * (hy * hx)
                dox_acc[wy] = dox_acc[wy] + sa * (hy * _dpos(u - px))
                doy_acc[wy] = doy_acc[wy] + sa * (dhy * hx)
                # ---- d_value: w (x) g into the plane d-slab ----
                whp = ahy * hx
                w = jax.lax.dot_general(
                    whp.astype(jnp.bfloat16), expand2,
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                contrib = w * gt
                if g.inv_y > 1:
                    contrib = contrib.reshape(rows_q, g.inv_y, tw, c).sum(axis=1)
                dslab[plane_idx, phi_y, pl.ds(dy, rows_q), a8 : a8 + tw, :] = (
                    dslab[plane_idx, phi_y, pl.ds(dy, rows_q), a8 : a8 + tw, :]
                    + contrib.astype(dslab.dtype)
                )

            if BWD_NOPRED:
                # unconditional tap: hats (and _dpos at the open boundary) are
                # identically zero outside the active window, so skipping the
                # @pl.when guard changes nothing numerically — it removes a
                # branch (a Mosaic scheduling barrier) per tap. Pays only when
                # the per-tile bounds are near-full anyway (realistic offsets).
                # Chip A/B (r5, OFF_SCALE=2 race): 78.0 vs 84.0 ms/layer.
                _tap()
            else:
                pl.when((u >= u_lo) & (u <= u_hi))(_tap)

        return 0

    if BWD_NOPRED and BWD_STATICV:
        for v in range(g.win):
            v_body(v, 0)
    else:
        jax.lax.fori_loop(v_lo, v_hi + 1, v_body, 0)
    dox_ref[0] = dox_acc[...].sum(axis=0) * mx
    doy_ref[0] = doy_acc[...].sum(axis=0) * my
    datt_ref[0] = datt_acc[...].sum(axis=0)

    # fold the plane d-slabs into vp coordinates: one static (sub-8) shifted
    # add per plane per tile — the unaligned-slice relayout the per-tap path
    # must avoid is amortized over the whole tap loop here
    rd.wait()
    for p, (phase, shift) in enumerate(_plane_fold_map(g)):
        dacc[phase, :, :, shift : shift + slab_w, :] = (
            dacc[phase, :, :, shift : shift + slab_w, :]
            + dslab[p].astype(jnp.float32)
        )
    wr = pltpu.make_async_copy(dacc, region(dvp_out), rw_sem)
    wr.start()
    wr.wait()


def _run_pair_grad_merged(
    v_l, off_pair, att_pair, g_out, hq, wq, hv, wv, radius, heads, head_dim,
    num_points, plane_dtype=jnp.bfloat16, interpret=False,
):
    """d_off, d_att, d_value for one (lq, lv) pair in a single kernel pass."""
    b = v_l.shape[0]
    c = heads * head_dim
    g = _PairGeom(hq, wq, hv, wv, radius)
    sphase = g.sx if g.sx > 1 else 1

    fold_map = _plane_fold_map(g)
    max_shift = max(s for _, s in fold_map)
    dslab_dtype = jnp.bfloat16 if BWD_DSLAB_BF16 else jnp.float32
    dslab_bytes = np.dtype(dslab_dtype).itemsize

    # budget: bf16 slabs + dslab + f32 dacc + stack temporaries
    def fits(tq, tw):
        rows_q = tq if g.sy > 1 else tq // g.inv_y
        t_rows = rows_q + g.halo_y
        sl_w = -(-(tw + g.max_a8) // 8) * 8
        sl_wd = -(-(sl_w + max_shift) // 8) * 8
        n = len(g.planes)
        pb = np.dtype(plane_dtype).itemsize
        slab_b = n * g.sy * t_rows * sl_w * c * pb
        if BWD_VP:
            slab_b += sphase * g.sy * t_rows * sl_wd * c * pb  # vslab
        dslab_b = n * g.sy * t_rows * sl_w * c * dslab_bytes
        dacc_b = sphase * g.sy * t_rows * sl_wd * c * 4
        accs = 3 * BWD_ACC_WAYS * tq * tw * heads * num_points * 4
        blocks = tq * tw * (4 * 32 * 2 + 3 * 32 * 2 + 2 * c) * 4
        stack = 3 * tq * tw * c * 4
        return slab_b + dslab_b + dacc_b + accs + blocks + stack + 512 * 1024

    tq = min(TQ_CAP_BWD, g.hq)
    while g.hq % tq:
        tq //= 2
    tw = min(TW_CAP_BWD, g.wq)
    while g.wq % tw:
        tw //= 2
    min_tq = max(1, g.inv_y)
    while fits(tq, tw) > VMEM_BUDGET_BWD:
        tw_ok = (tw // 2) % 8 == 0 or (tw // 2) == g.wq
        if tw > 8 and tw >= tq and tw_ok and g.wq % (tw // 2) == 0:
            tw //= 2
        elif tq > min_tq and (tq // 2) % min_tq == 0 and g.hq % (tq // 2) == 0:
            tq //= 2
        else:
            break
    rows_q = tq if g.sy > 1 else tq // g.inv_y
    tile_rows = rows_q + g.halo_y
    slab_w = -(-(tw + g.max_a8) // 8) * 8
    slab_wd = -(-(slab_w + max_shift) // 8) * 8

    need_rows = (hq // tq - 1) * rows_q + tile_rows
    need_cols_planes = (wq // tw - 1) * tw + slab_w
    need_cols_vp = (wq // tw - 1) * tw + slab_wd
    if BWD_VP:
        planes = _build_vp(
            v_l.reshape(b, hv, wv, c).astype(plane_dtype), g, need_rows, need_cols_vp
        )
    else:
        planes = _prep_planes(v_l.reshape(b, hv, wv, c), g, plane_dtype)
        pr = max(0, need_rows - planes.shape[3])
        pc = max(0, need_cols_planes - planes.shape[4])
        if pr or pc:
            planes = jnp.pad(planes, ((0, 0),) * 3 + ((0, pr), (0, pc), (0, 0)))

    v_zero = jnp.zeros((b, hv, wv, c), jnp.float32)
    _, fold = jax.vjp(
        lambda v: _build_vp(v, g, need_rows, need_cols_vp), v_zero
    )
    vp_shape = jax.eval_shape(
        lambda v: _build_vp(v, g, need_rows, need_cols_vp), v_zero
    ).shape
    dvp0 = jnp.zeros(vp_shape, jnp.float32)

    ph = heads * num_points
    offx_g = off_pair[..., 0].transpose(0, 1, 3, 2).reshape(b, hq, wq, ph)
    offy_g = off_pair[..., 1].transpose(0, 1, 3, 2).reshape(b, hq, wq, ph)
    att_g = att_pair.transpose(0, 1, 3, 2).reshape(b, hq, wq, ph)
    g_g = g_out.reshape(b, hq, wq, c)
    bounds = _tap_bounds(offx_g, offy_g, g, tq, tw)

    kernel = functools.partial(
        _grad_kernel_merged,
        g=g,
        heads=heads,
        num_points=num_points,
        tq=tq,
        tw=tw,
        slab_w=slab_w,
        slab_wd=slab_wd,
        single_x=(wq // tw) == 1,
        single_y=(hq // tq) == 1,
        vp=BWD_VP,
    )
    qspec = lambda shp: pl.BlockSpec(
        shp, lambda bb, ty, tx: (bb, ty, tx, 0), memory_space=pltpu.VMEM
    )
    dox, doy, datt, dvp = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((b, hq, wq, ph), jnp.float32)] * 3
        + [jax.ShapeDtypeStruct(vp_shape, jnp.float32)],
        grid=(b, hq // tq, wq // tw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            qspec((1, tq, tw, ph)),
            qspec((1, tq, tw, ph)),
            qspec((1, tq, tw, ph)),
            qspec((1, tq, tw, c)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[qspec((1, tq, tw, ph))] * 3
        + [pl.BlockSpec(memory_space=pltpu.ANY)],
        scratch_shapes=[
            pltpu.VMEM((len(g.planes), g.sy, tile_rows, slab_w, c), plane_dtype),
            pltpu.VMEM((len(g.planes), g.sy, tile_rows, slab_w, c), dslab_dtype),
            pltpu.VMEM((sphase, g.sy, tile_rows, slab_wd, c), jnp.float32),
            pltpu.VMEM((BWD_ACC_WAYS, tq, tw, ph), jnp.float32),
            pltpu.VMEM((BWD_ACC_WAYS, tq, tw, ph), jnp.float32),
            pltpu.VMEM((BWD_ACC_WAYS, tq, tw, ph), jnp.float32),
        ]
        + (
            [
                pltpu.VMEM((sphase, g.sy, tile_rows, slab_wd, c), plane_dtype),
                pltpu.SemaphoreType.DMA,
            ]
            if BWD_VP
            else [pltpu.SemaphoreType.DMA((len(g.planes),))]
        )
        + [
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={6: 3},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(bounds, offx_g, offy_g, att_g, g_g, planes, dvp0)

    def back(x):
        return x.reshape(b, hq * wq, num_points, heads).transpose(0, 1, 3, 2)

    d_off = jnp.stack([back(dox), back(doy)], axis=-1)
    (d_value,) = fold(dvp)
    return d_off, back(datt), d_value.reshape(b, hv * wv, c)


def ms_deform_attn_window_pallas_bwd(
    value: jnp.ndarray,  # (B, S, H, D)
    spatial_shapes: Sequence[Tuple[int, int]],
    pixel_offsets: jnp.ndarray,  # (B, S, H, L, P, 2)
    attention_weights: jnp.ndarray,  # (B, S, H, L, P)
    g_out: jnp.ndarray,  # (B, S, H*D) cotangent of the forward output
    radius: int = 4,
    interpret: bool = False,
):
    """Full window-MSDA backward: (d_value, d_pixel_offsets, d_attention)."""
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    b, s, h, d = value.shape
    _, q, _, l, p, _ = pixel_offsets.shape
    assert q == s and l == len(spatial_shapes)
    starts, total = level_start_index(spatial_shapes)
    assert total == s

    off32 = pixel_offsets.astype(jnp.float32)
    att32 = attention_weights.astype(jnp.float32)
    # d-major channel layout matches the forward kernel
    value_f = value.astype(jnp.float32).transpose(0, 1, 3, 2).reshape(b, s, h * d)
    g_f = (
        g_out.astype(jnp.float32)
        .reshape(b, s, h, d)
        .transpose(0, 1, 3, 2)
        .reshape(b, s, h * d)
    )

    d_off = jnp.zeros_like(off32)
    d_att = jnp.zeros_like(att32)
    d_value_levels = [
        jnp.zeros((b, hv * wv, h * d), jnp.float32) for hv, wv in spatial_shapes
    ]

    for lv, (hv, wv) in enumerate(spatial_shapes):
        v_l = jax.lax.dynamic_slice_in_dim(value_f, starts[lv], hv * wv, axis=1)
        for lq, (hq, wq) in enumerate(spatial_shapes):
            off_pair = jax.lax.dynamic_slice_in_dim(off32, starts[lq], hq * wq, axis=1)[
                :, :, :, lv
            ]
            att_pair = jax.lax.dynamic_slice_in_dim(att32, starts[lq], hq * wq, axis=1)[
                :, :, :, lv
            ]
            g_pair = jax.lax.dynamic_slice_in_dim(g_f, starts[lq], hq * wq, axis=1)
            inv_y = max(hq // max(hv, 1), 1)
            inv_x = max(wq // max(wv, 1), 1)
            if inv_y * inv_x > 16 * 16:
                # pathological expansion: exact-path VJP for this slot only
                from ape_tpu.ops.msda import ms_deform_attn
                from ape_tpu.ops.msda_window import pixel_offsets_to_locations

                def one_pair(v_flat, o_pair, a_pair):
                    o6 = o_pair[:, :, :, None]
                    # queries of level lq sampling level lv only
                    cx = (jnp.arange(hq * wq) % wq + 0.5) / wq
                    cy = (jnp.arange(hq * wq) // wq + 0.5) / hq
                    ctr = jnp.stack([cx, cy], -1)[None, :, None, None, None, :]
                    norm = jnp.asarray([[wv, hv]], jnp.float32)
                    loc = ctr + jnp.clip(o6, -radius, radius) / norm[None, None, None, :, None, :]
                    vv4 = v_flat.reshape(b, hv * wv, d, h).transpose(0, 1, 3, 2)
                    out = ms_deform_attn(vv4, ((hv, wv),), loc, a_pair[:, :, :, None])
                    return out.reshape(b, hq * wq, h, d).transpose(0, 1, 3, 2).reshape(
                        b, hq * wq, h * d
                    )

                _, vjp = jax.vjp(one_pair, v_l, off_pair, att_pair)
                dv, do, da = vjp(g_pair)
                d_value_levels[lv] = d_value_levels[lv] + dv
                d_off = d_off.at[:, starts[lq] : starts[lq] + hq * wq, :, lv].add(do)
                d_att = d_att.at[:, starts[lq] : starts[lq] + hq * wq, :, lv].add(da)
                continue

            if BWD_MERGED:
                do_pair, da_pair, dv_pair = _run_pair_grad_merged(
                    v_l, off_pair, att_pair, g_pair, hq, wq, hv, wv, radius,
                    h, d, p, interpret=interpret,
                )
            else:
                do_pair, da_pair = _run_pair_grad_offatt(
                    v_l, off_pair, att_pair, g_pair, hq, wq, hv, wv, radius,
                    h, d, p, interpret=interpret,
                )
                dv_pair = _run_pair_grad_value(
                    off_pair, att_pair, g_pair, hq, wq, hv, wv, radius, h, d, p,
                    interpret=interpret,
                )
            d_value_levels[lv] = d_value_levels[lv] + dv_pair
            d_off = d_off.at[:, starts[lq] : starts[lq] + hq * wq, :, lv].add(do_pair)
            d_att = d_att.at[:, starts[lq] : starts[lq] + hq * wq, :, lv].add(da_pair)

    d_value = jnp.concatenate(d_value_levels, axis=1)
    d_value = (
        d_value.reshape(b, s, d, h).transpose(0, 1, 3, 2).astype(value.dtype)
    )
    return (
        d_value,
        d_off.astype(pixel_offsets.dtype),
        d_att.astype(attention_weights.dtype),
    )
