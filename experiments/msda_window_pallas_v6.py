"""Pallas window-MSDA v6: channels-on-sublanes kills the K=32 MXU floor.

Round-3 analysis (PERF.md "Why the weight path stays on the MXU") pinned the
v2 kernel's compute floor on the per-tap weight expansion: the point-summed
weight lives at P*H = 32 lanes and must scale a C = 256-lane value view, so v2
feeds a (tq, tw, 32) x (32, 256) expansion matrix to the MXU every tap — a
~25% K-utilization contraction that costs ~2.6 ms on the 256^2 pair alone and
is irreducible *in that layout* (every zero-padded reformulation buys
utilization proportional to its zeros).

v6 dissolves the problem by transposing the register layout instead of the
math. Value tiles are held as (rows, C, W): **channels on sublanes, window-x
on lanes**. With the d-major channel order c = d*H + h and H = 8, every
8-sublane vector register of the view covers c = 8d..8d+7, i.e. exactly
h = 0..7 — so ONE (8, lanes) weight register w8[h] multiplies ALL C/8 view
registers elementwise. The whole weight path becomes:

  * hats (tq, P*H, tw): P*H on sublanes -> the four 8-sublane slices
    whp[:, p*8:(p+1)*8] are register-aligned -> the point sum is THREE vector
    adds (v2's reason for the MXU — 8-lane slices relayout — does not exist on
    sublanes);
  * broadcast w8 across C: pure sublane-tiling register replication, no
    expansion matrix;
  * accumulate: plain VPU FMA on (tq, C, tw) tiles.

Zero MXU work, zero relayouts in the tap loop. The FMA work itself (~4 GFLOP
on the 256^2 pair) is the irreducible cost of the window formulation.

The layout also absorbs the vp-space lesson (round 3): the kernel DMAs ONE
unshifted phase-decomposed transposed slab per tile (window-x shifts are lane
offsets now), and the per-u shifted planes are built in VMEM with one static
lane-slice copy per active u, amortized over the whole v loop. No 8x
pre-shifted-plane HBM prep pass. Finer-in-x value levels use the x-phase
decomposition (col = k*sx + phase), so plane u of shift s = int_x + u is the
contiguous-k view (phase s % sx, lane shift s // sx) — sx slabs, not win.

Loop structure: u statically unrolled with @pl.when bounds predication (skips
inactive window columns at tiny learned offsets), v in a dynamic fori over
GROUPs of statically chained taps (register-chained FMAs inside a group, one
acc RMW per group) — a single code path fast in both the tiny-offset
(synthetic bench) and realistic-offset (OFF_SCALE~2) regimes, replacing v2's
hybrid cond.

Scope: query levels with wq a multiple of 128 lanes take this kernel; narrower
query levels stay on the v2 chain (~15% of encoder MSDA time). Semantics are
identical to ops/msda_window.py (the XLA oracle): window-clamped MSDA,
|offset| <= radius, bilinear, zero padding.

Reference being replaced: ape/layers/csrc/MsDeformAttn/ms_deform_im2col_cuda.cuh
(bilinear gather kernel; gathers are not a TPU primitive, see msda_window.py).
"""

from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ape_tpu.ops.msda import level_start_index
from ape_tpu.ops.msda_window_pallas_v2 import (
    _PairGeom,
    _run_pair_v2,
    _tap_bounds,
    VMEM_LIMIT,
)


def _hat(x):
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


# taps statically chained per acc read-modify-write in the dynamic v loop
GROUP = int(os.environ.get("APE_MSDA_V6_GROUP", "4"))
# weight-broadcast lowering: 4-D dim-1 broadcast (w8[:, None] * view4) vs the
# materialized broadcast_to+reshape — A/B'd on chip, see PERF.md round 4
BC4D = os.environ.get("APE_MSDA_V6_BC4D", "1") != "0"
# query-row tile cap; lanes are fixed at TW=128 (full lane width)
TQ_CAP_V6 = int(os.environ.get("APE_MSDA_V6_TQ_CAP", "64"))
TW_V6 = 128
DBUF_V6 = os.environ.get("APE_MSDA_V6_DBUF", "1") != "0"


def _u_schedule(g: _PairGeom):
    """Per window column u: (x-phase, lane shift) into the phase-decomposed slab."""
    out = []
    for u in range(g.win):
        if g.sx > 1:
            s = g.int_x + u
            out.append((s % g.sx, s // g.sx))
        else:
            out.append((0, u * g.inv_x))
    return out


def _kernel_v6(
    bounds_ref,  # (B, nty, ntx, 4) int32 SMEM: [u_lo, u_hi, v_lo, v_hi]
    offx_ref,  # (1, tq, PH, tw) f32, sublanes p-major (sublane = p*H + h)
    offy_ref,
    att_ref,
    vt_hbm,  # (B, sxp, sy, R, C, K) phase-decomposed transposed value
    *rest_refs,
    g: _PairGeom,
    heads,
    num_points,
    tq,
    tw,
    slab_w,
    rows_span,
    tile_rows,
    chained,
    dbuf,
):
    if chained:
        acc_in_ref, out_ref, slab_ref, plane_ref, acc_ref, sems = rest_refs
    else:
        acc_in_ref = None
        out_ref, slab_ref, plane_ref, acc_ref, sems = rest_refs
    b = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    sched = _u_schedule(g)

    def src_slice(b_i, ty_i, tx_i):
        # k-space column j maps query column j (+ per-u shift), for every sx
        row_s = ty_i * rows_span
        # lane-dim HBM slices must START 128-aligned too (tw == TW_V6 == 128)
        col_s = pl.multiple_of(tx_i * tw, 128)
        return vt_hbm.at[b_i, :, :, pl.ds(row_s, tile_rows), :, pl.ds(col_s, slab_w)]

    if dbuf:
        nty, ntx = pl.num_programs(1), pl.num_programs(2)
        nb = pl.num_programs(0)
        idx = (b * nty + ty) * ntx + tx
        total = nb * nty * ntx
        slot = jax.lax.rem(idx, 2)

        def make_copy(i, slot_i):
            b_i = i // (nty * ntx)
            r = i % (nty * ntx)
            return pltpu.make_async_copy(
                src_slice(b_i, r // ntx, r % ntx), slab_ref.at[slot_i], sems.at[slot_i]
            )

        @pl.when(idx == 0)
        def _():
            make_copy(idx, slot).start()

        @pl.when(idx + 1 < total)
        def _():
            make_copy(idx + 1, 1 - slot).start()

        copy = make_copy(idx, slot)
        cur_slab = slab_ref.at[slot]
    else:
        copy = pltpu.make_async_copy(src_slice(b, ty, tx), slab_ref, sems)
        copy.start()
        cur_slab = slab_ref

    h, npt = heads, num_points
    radius = g.radius
    pad = g.pad
    ox = jnp.clip(offx_ref[0], -radius, radius)  # (tq, PH, tw)
    oy = jnp.clip(offy_ref[0], -radius, radius)
    att = att_ref[0]

    # query-position remainders: x varies along LANES, y along rows (dim 0)
    if g.rem_x is None:
        qx = jax.lax.broadcasted_iota(jnp.int32, (tq, 1, tw), 2).astype(jnp.float32)
        rem_x = ((qx % g.inv_x) + 0.5) / g.inv_x - 0.5
    else:
        rem_x = g.rem_x
    if g.rem_y is None:
        qy = jax.lax.broadcasted_iota(jnp.int32, (tq, 1, tw), 0).astype(jnp.float32)
        rem_y = ((qy % g.inv_y) + 0.5) / g.inv_y - 0.5
    else:
        rem_y = g.rem_y
    px = ox + (pad + rem_x)
    py = oy + (pad + rem_y)

    copy.wait()

    if acc_in_ref is not None:
        acc_ref[...] = acc_in_ref[0].astype(jnp.float32)
    else:
        acc_ref[...] = jnp.zeros_like(acc_ref)

    u_lo = bounds_ref[b, ty, tx, 0]
    u_hi = bounds_ref[b, ty, tx, 1]
    v_lo = bounds_ref[b, ty, tx, 2]
    v_hi = bounds_ref[b, ty, tx, 3]
    c = acc_ref.shape[1]
    n_groups = (v_hi - v_lo + GROUP) // GROUP

    for u in range(g.win):

        @pl.when((u_lo <= u) & (u <= u_hi))
        def _(u=u):
            # one shifted-plane build per active u (static lane-slice copy —
            # the relayout the tap loop must not pay), amortized over v
            xq, sh = sched[u]
            plane_ref[...] = cur_slab[xq, :, :, :, sh : sh + tw]
            hx = _hat(float(u) - px)  # (tq, PH, tw)

            def g_body(gi, _):
                v0 = v_lo + gi * GROUP
                acc = acc_ref[...]
                for dv in range(GROUP):
                    v = v0 + dv
                    # overshoot beyond v_hi gets zero weight; clamp the row
                    # index so the slice stays inside the buffer
                    v_eff = jnp.minimum(v, g.win - 1)
                    hy = _hat(v.astype(jnp.float32) - py)
                    whp = (att * hy) * hx  # (tq, PH, tw)
                    live = (v <= v_hi).astype(jnp.float32)
                    # point sum: P register-aligned 8-sublane slices
                    w8 = whp[:, 0:h, :]
                    for p_i in range(1, npt):
                        w8 = w8 + whp[:, p_i * h : (p_i + 1) * h, :]
                    w8 = w8 * live
                    if g.sy > 1:
                        phi = (g.int_y + v_eff) % g.sy
                        dy = (g.int_y + v_eff) // g.sy
                    else:
                        phi = 0
                        dy = v_eff
                    view = plane_ref[phi, pl.ds(dy, rows_span)]
                    if g.inv_y > 1:
                        view = jnp.broadcast_to(
                            view[:, None], (rows_span, g.inv_y, c, tw)
                        ).reshape(tq, c, tw)
                    if BC4D:
                        # channel broadcast as a dim-1 (non-minor) broadcast:
                        # every 8-sublane block of the view is h = 0..7, so
                        # w8 (tq, h, tw) scales all c//h blocks
                        view4 = view.reshape(tq, c // h, h, tw)
                        acc = (
                            acc.reshape(tq, c // h, h, tw)
                            + w8[:, None] * view4.astype(jnp.float32)
                        ).reshape(tq, c, tw)
                    else:
                        wb = jnp.broadcast_to(
                            w8[:, None], (tq, c // h, h, tw)
                        ).reshape(tq, c, tw)
                        acc = acc + wb * view.astype(jnp.float32)
                acc_ref[...] = acc
                return 0

            jax.lax.fori_loop(0, n_groups, g_body, 0)

    out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def _prep_vt(v_l, g: _PairGeom, c, plane_dtype, rows_needed):
    """(B, Hv*Wv, C) -> (B, sxp, sy, R, C, K): padded, transposed (channels on
    sublanes), x-repeated for coarser-x, phase-decomposed in y and x."""
    b = v_l.shape[0]
    pad = g.pad
    vt = v_l.reshape(b, g.hv, g.wv, c).astype(plane_dtype).transpose(0, 1, 3, 2)
    # rows: pad so the y-phase reshape divides and every tile row slice fits
    hp = -(-(g.hv + 2 * pad) // g.sy) * g.sy
    hp = max(hp, rows_needed * g.sy)
    # cols: pad so every u shift + lane slice fits
    if g.sx > 1:
        max_sh = (g.int_x + g.win - 1) // g.sx + 1
        wp = (g.wq + max_sh + 1) * g.sx
        wp = max(wp, g.wv + 2 * pad)
    else:
        # (wv + 2*pad) * inv_x == wq + (win-1)*inv_x covers every shifted tile
        wp = g.wv + 2 * pad
    vt = jnp.pad(vt, ((0, 0), (pad, hp - g.hv - pad), (0, 0), (pad, wp - g.wv - pad)))
    if g.sx == 1 and g.inv_x > 1:
        vt = jnp.repeat(vt, g.inv_x, axis=3)
        wp = wp * g.inv_x
    # y phase decomposition: (B, sy, R, C, Wp)
    vt = vt.reshape(b, hp // g.sy, g.sy, c, wp).transpose(0, 2, 1, 3, 4)
    # x phase decomposition: (B, sxp, sy, R, C, K)
    if g.sx > 1:
        k = wp // g.sx
        vt = vt.reshape(b, g.sy, hp // g.sy, c, k, g.sx).transpose(0, 5, 1, 2, 3, 4)
    else:
        vt = vt[:, None]
    return vt


def _run_pair_v6(
    v_l, off_pair, att_pair, hq, wq, hv, wv, radius, heads, head_dim, num_points,
    plane_dtype=jnp.bfloat16, interpret=False, acc_in=None, out_dtype=jnp.float32,
):
    """One (lq, lv) pair -> (B, hq, C, wq) partial output (TRANSPOSED layout).

    acc_in: optional (B, hq, C, wq) running partial from previous value levels
    of the same query level, aliased into the output (in-kernel accumulation).
    """
    b = v_l.shape[0]
    c = heads * head_dim
    g = _PairGeom(hq, wq, hv, wv, radius)
    assert heads == 8, "v6 register layout requires H == 8 (one sublane per head)"
    assert wq % TW_V6 == 0
    if g.sx > 1:
        assert g.sy == g.sx, (g.sy, g.sx)

    tw = TW_V6
    tq = min(TQ_CAP_V6, hq)
    while hq % tq or tq % max(1, g.inv_y):
        tq //= 2
    rows_span = tq if g.sy > 1 else tq // g.inv_y
    halo = g.halo_y if g.sy > 1 else g.win - 1
    tile_rows = rows_span + halo

    sched = _u_schedule(g)
    max_sh = max(s for _, s in sched)
    # Mosaic HBM DMA rule (real hardware only — interpret mode does not
    # enforce it): lane-dim slices must be 128-aligned in size and start.
    # Round the halo'd slab width up to the next lane tile; the dead lanes
    # cost ~µs of extra DMA and are never read by the per-u plane builds.
    slab_w = -(-(tw + max_sh + (1 if g.sx > 1 else 0)) // 128) * 128
    need_rows = (hq // tq - 1) * rows_span + tile_rows
    vt_in = _prep_vt(v_l, g, c, plane_dtype, need_rows)
    # column coverage for the farthest tile (in slab/k coordinate space)
    need_cols = (wq // tw - 1) * tw + slab_w
    pc = max(0, need_cols - vt_in.shape[5])
    if pc:
        vt_in = jnp.pad(vt_in, ((0, 0),) * 5 + ((0, pc),))

    ph = heads * num_points
    # offsets/attention with P*H on sublanes (p-major) and query-x on lanes
    offx_g = off_pair[..., 0].transpose(0, 1, 3, 2).reshape(b, hq, wq, ph)
    offy_g = off_pair[..., 1].transpose(0, 1, 3, 2).reshape(b, hq, wq, ph)
    att_g = att_pair.transpose(0, 1, 3, 2).reshape(b, hq, wq, ph)
    bounds = _tap_bounds(offx_g, offy_g, g, tq, tw)
    offx_t = offx_g.transpose(0, 1, 3, 2)  # (B, hq, PH, wq)
    offy_t = offy_g.transpose(0, 1, 3, 2)
    att_t = att_g.transpose(0, 1, 3, 2)

    kernel = functools.partial(
        _kernel_v6,
        g=g,
        heads=heads,
        num_points=num_points,
        tq=tq,
        tw=tw,
        slab_w=slab_w,
        rows_span=rows_span,
        tile_rows=tile_rows,
        chained=acc_in is not None,
        dbuf=DBUF_V6,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, tq, ph, tw), lambda bb, ty, tx: (bb, ty, 0, tx), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tq, ph, tw), lambda bb, ty, tx: (bb, ty, 0, tx), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tq, ph, tw), lambda bb, ty, tx: (bb, ty, 0, tx), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    inputs = [bounds, offx_t, offy_t, att_t, vt_in]
    kwargs = {}
    if acc_in is not None:
        in_specs.append(
            pl.BlockSpec((1, tq, c, tw), lambda bb, ty, tx: (bb, ty, 0, tx), memory_space=pltpu.VMEM)
        )
        inputs.append(acc_in)
        kwargs["input_output_aliases"] = {5: 0}
    sxp = g.sx if g.sx > 1 else 1
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hq, c, wq), out_dtype),
        grid=(b, hq // tq, wq // tw),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tq, c, tw), lambda bb, ty, tx: (bb, ty, 0, tx), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM(
                ((2,) if DBUF_V6 else ()) + (sxp, g.sy, tile_rows, c, slab_w),
                plane_dtype,
            ),
            pltpu.VMEM((g.sy, tile_rows, c, tw), plane_dtype),
            pltpu.VMEM((tq, c, tw), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)) if DBUF_V6 else pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
        **kwargs,
    )(*inputs)
    return out


def ms_deform_attn_window_pallas_v6(
    value: jnp.ndarray,  # (B, S, H, D)
    spatial_shapes: Sequence[Tuple[int, int]],
    pixel_offsets: jnp.ndarray,  # (B, S, H, L, P, 2)
    attention_weights: jnp.ndarray,  # (B, S, H, L, P)
    radius: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for ops.msda_window.ms_deform_attn_window (forward).

    Wide query levels (wq % 128 == 0) run the transposed v6 kernel; narrow
    levels fall back to the v2 chain (same numerics, different layout).
    """
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    b, s, h, d = value.shape
    _, q, _, l, p, _ = pixel_offsets.shape
    assert q == s and l == len(spatial_shapes)
    starts, total = level_start_index(spatial_shapes)
    assert total == s

    off32 = pixel_offsets.astype(jnp.float32)
    att32 = attention_weights.astype(jnp.float32)
    value_f = value.astype(jnp.float32).transpose(0, 1, 3, 2).reshape(b, s, h * d)
    part_dtype = jnp.bfloat16 if value.dtype == jnp.bfloat16 else jnp.float32

    out_per_qlevel = [None] * l
    for lv, (hv, wv) in enumerate(spatial_shapes):
        v_l = jax.lax.dynamic_slice_in_dim(value_f, starts[lv], hv * wv, axis=1)
        for lq, (hq, wq) in enumerate(spatial_shapes):
            off_pair = jax.lax.dynamic_slice_in_dim(off32, starts[lq], hq * wq, axis=1)[
                :, :, :, lv
            ]
            att_pair = jax.lax.dynamic_slice_in_dim(att32, starts[lq], hq * wq, axis=1)[
                :, :, :, lv
            ]
            finer = wv > wq
            use_v6 = (
                h == 8
                and wq % TW_V6 == 0
                and (wv > wq) == (hv > hq)
                # finer value: ratios must match (shared x/y phase decomp)
                and (not finer or (wv // wq == hv // hq and wv // wq <= 4))
                and max(wq // max(wv, 1), 1) <= 16
            )
            if use_v6:
                out_per_qlevel[lq] = _run_pair_v6(
                    v_l, off_pair, att_pair, hq, wq, hv, wv, radius, h, d, p,
                    interpret=interpret, acc_in=out_per_qlevel[lq],
                    out_dtype=part_dtype,
                )
            else:
                prev = out_per_qlevel[lq]
                if prev is not None and prev.ndim == 4:
                    # mixed chain: fold the transposed partial back first
                    prev = prev.transpose(0, 1, 3, 2).reshape(b, hq * wq, h * d)
                out_per_qlevel[lq] = _run_pair_v2(
                    v_l, off_pair, att_pair, hq, wq, hv, wv, radius, h, d, p,
                    interpret=interpret, acc_in=prev, out_dtype=part_dtype,
                )

    outs = []
    for lq, (hq, wq) in enumerate(spatial_shapes):
        o = out_per_qlevel[lq]
        if o.ndim == 4:  # transposed (B, hq, C, wq)
            o = o.transpose(0, 1, 3, 2).reshape(b, hq * wq, h * d)
        outs.append(o)
    out = jnp.concatenate(outs, axis=1)
    out = out.reshape(b, s, d, h).transpose(0, 1, 3, 2).reshape(b, s, h * d)
    return out.astype(value.dtype)
