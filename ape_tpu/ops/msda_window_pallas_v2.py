"""Pallas window-MSDA v2: pre-shifted planes kill the relayout floor.

Round-1's kernel (ops/msda_window_pallas.py) hit a ~15x perf floor: every
window column-shift read a sublane-UNALIGNED VMEM view, and Mosaic lowers those
through a slow relayout path. Probing Mosaic on v5e shows DMA second-minor
offsets must be *provably 8-aligned* (static-3 offsets fail to compile), so the
shifts cannot move into the DMA either. v2 therefore hoists the column shifts
to the XLA side:

  * For each (query-level, value-level) pair, XLA prebuilds a small stack of
    column-shifted planes of the value level, already mapped onto the query
    grid in x (strided slice when the value level is finer, slice+repeat when
    coarser). Pure HBM copies at full bandwidth.
  * value finer in x (stride sx>1): one plane per window column u (11 planes,
    phase-decomposition folded into the strided slice) — the kernel does NO
    x-slicing at all.
  * value same/coarser in x: plane b holds the columns shifted by b, where
    b = (u*inv_x) mod 8 — only 8/gcd(inv_x, 8) planes (8, 4, 2, ...) — and the
    kernel adds the remaining multiple-of-8 offset as a STATIC aligned slice
    (u is unrolled, so Mosaic sees literal constants).
  * Row (y) shifts index a leading phase axis and slice dim -3 — both free.

The accumulator stays resident in VMEM per output tile; planes stream in as
bf16 (f32 accumulate), one DMA per plane per tile, all started before the
compute loop. Weight math (bilinear hats x attention, point-summed, expanded
to channels on the MXU) is unchanged from v1.

Semantics: identical to ops/msda_window.py (the XLA oracle) — window-clamped
MSDA with |offset| <= radius, bilinear, zero padding.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ape_tpu.ops.msda import level_start_index


def _hat(x):
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


# Historical knob: shifts accumulated between accumulator RMWs. Measured
# neutral both before and after the K=32 expand rewrite (Mosaic materializes
# the chunk temporaries in VMEM stack slots, so chunking just moves the RMW
# traffic). The production kernel no longer chunks; kept for probe scripts.
U_CHUNK = int(os.environ.get("APE_MSDA_U_CHUNK", "1"))

# VMEM budget for slabs+accumulator, bytes. 9 MiB was the round-1 safe point
# under Mosaic's default 16 MiB scoped-vmem limit; round 3 raises the limit
# explicitly (CompilerParams.vmem_limit_bytes below), so bigger budgets buy
# bigger tiles = smaller halo fraction per DMA and fewer grid steps.
VMEM_BUDGET = int(os.environ.get("APE_MSDA_VMEM_MB", "48")) * 1024 * 1024

# Mosaic scoped-vmem limit for the pair kernels. The physical VMEM is 128 MiB
# on v5e; the compiler default (16 MiB) exists to keep multi-kernel pipelines
# co-resident, but these kernels run alone and want the space for slabs.
VMEM_LIMIT = int(os.environ.get("APE_MSDA_VMEM_LIMIT_MB", "110")) * 1024 * 1024

# Tile-size caps (pre-budget). (32, 64) was the round-1/2 ceiling under the
# 16 MiB scoped limit; with the raised limit, 48 MiB + (64, 64) measured best
# on the big pairs (A/B at OFF_SCALE=2: 9.05 -> 8.45 ms over the top-3 pairs;
# TW 128/256 regress or crash Mosaic on inv pairs).
TQ_CAP = int(os.environ.get("APE_MSDA_TQ_CAP", "64"))
TW_CAP = int(os.environ.get("APE_MSDA_TW_CAP", "64"))

# Double-buffer the slab DMAs: prefetch tile i+1's planes while computing tile
# i. dma_only probe: 1.6 ms of the 4.56 ms same-res pair is serialized DMA
# start->wait; double-buffering hides it behind the compute loop at the cost of
# halving the slab VMEM (smaller tiles). 0 disables (A/B knob).
DBUF = os.environ.get("APE_MSDA_DBUF", "1") != "0"

# u-loop mode. The dynamic fori u loop (mode 2) wins when learned offsets are
# local (active u range ~3-5 of 11, e.g. synthetic bench weights) but pays an
# acc RMW per tap, which LOSES ~35% to the statically unrolled register-chained
# taps when the window is mostly active (realistic several-pixel offsets:
# probe same-res pair 6.30 ms dynamic vs 4.66 static at OFF_SCALE=2).
# Mode 1 (default) branches PER TILE on the active-u count from the SMEM
# bounds: narrow tiles take the dynamic skip loop, wide tiles the static
# unroll — fast in both offset regimes. 0 forces static-only.
USKIP = int(os.environ.get("APE_MSDA_USKIP", "1"))
# active-u count at or below which the hybrid takes the dynamic path
HYBRID_THRESH = int(os.environ.get("APE_MSDA_HYBRID_THRESH", "6"))

# Pre-expand coarser-value rows ONCE per tile into a VMEM scratch instead of
# broadcasting inside every (v, u) tap. The per-tap broadcast materialized a
# (tq, tw, C) temporary per unrolled u (no stack-slot sharing) — the reason
# inv>=4 pairs were clamped to tq*tw <= 1024 tiles and ran at ~6 ms each.
# With the expansion hoisted, the tap body is a plain slice (identical to the
# same-res path) and expanded pairs take full-size tiles. 0 disables (A/B).
YEXP = os.environ.get("APE_MSDA_YEXP", "0") != "0"

# vp-space input: instead of XLA pre-building n_planes shifted copies of the
# value level (8x the value bytes written+read per pair on same-res pairs, and
# n_planes slab DMAs per tile), DMA ONE unshifted phase-decomposed slab
# (_build_vp — a pad, plus repeat/phase-reshape for inv/strided pairs) and
# build the shifted planes in VMEM with one static sub-8 shifted copy per
# plane per tile — the same amortized-relayout idiom the merged backward uses
# for its d-slab fold (msda_window_pallas_bwd._grad_kernel_merged). Trades
# n_planes x slab DMA + the XLA prep pass for n_planes VPU copies per tile.
# Round-4 chip A/B (experiments/chip_ab_r3.sh, PERF.md round-4): vp ON wins
# bench 8.20 -> 9.52 img/s, OFF_SCALE=2 suite 25.6 -> 22.3 ms/layer, train
# 1.675 -> 1.887 img/s; backward neutral. Default flipped to 1.
VPIN = os.environ.get("APE_MSDA_VP", "1") != "0"


class _PairGeom:
    """Static geometry of one (query grid, value grid) pair."""

    def __init__(self, hq, wq, hv, wv, radius):
        self.hq, self.wq, self.hv, self.wv = hq, wq, hv, wv
        self.radius = radius
        self.pad = radius + 1
        self.win = 2 * radius + 3
        # x axis
        if wv >= wq:
            self.sx = wv // wq
            self.inv_x = 1
            self.int_x = self.sx // 2 - 1 if self.sx > 1 else 0
            self.rem_x = 0.5 if self.sx > 1 else 0.0
        else:
            self.sx = 1
            self.inv_x = wq // wv
            self.int_x = 0
            self.rem_x = None  # varies per query column
        # y axis
        if hv >= hq:
            self.sy = hv // hq
            self.inv_y = 1
            self.int_y = self.sy // 2 - 1 if self.sy > 1 else 0
            self.rem_y = 0.5 if self.sy > 1 else 0.0
        else:
            self.sy = 1
            self.inv_y = hq // hv
            self.int_y = 0
            self.rem_y = None
        # plane schedule for x shifts
        if self.sx > 1:
            # one plane per u; kernel x-slice is the identity
            self.planes = list(range(self.win))
            self.u_to_plane = {u: (u, 0) for u in range(self.win)}
        else:
            bs = sorted({(u * self.inv_x) % 8 for u in range(self.win)})
            self.planes = bs
            self.u_to_plane = {
                u: (bs.index((u * self.inv_x) % 8), (u * self.inv_x) - ((u * self.inv_x) % 8))
                for u in range(self.win)
            }
        self.max_a8 = max(a for _, a in self.u_to_plane.values())
        # y: rows held unexpanded (value rows); per-v row offset
        #   sy > 1: phase (int_y+v) % sy, row off (int_y+v)//sy
        #   sy == 1: row off v (expansion via in-kernel repeat for inv_y > 1)
        self.halo_y = (self.int_y + self.win - 1) // self.sy


def _prep_planes(v_l, g: _PairGeom, plane_dtype):
    """(B, Hv, Wv, C) -> (P, B, sy, R, Wp, C) pre-shifted planes (XLA side)."""
    b, hv, wv, c = v_l.shape
    pad = g.pad
    # pad rows so phase decomposition divides and every kernel row slice fits
    rows_needed = (g.hq // g.inv_y if g.inv_y > 1 else g.hq) + g.halo_y
    hp = -(-(hv + 2 * pad) // g.sy) * g.sy
    hp = max(hp, rows_needed * g.sy)
    # pad cols generously: strided slices reach sx*(Wp-1)+int_x+win
    if g.sx > 1:
        wp_cols = g.wq  # plane width = query width exactly
        wpad = g.int_x + g.win + g.sx * wp_cols
    else:
        wp_cols = g.wq + g.max_a8 + 8  # room for static aligned slices
        wpad = max(wv + 2 * pad, (wp_cols // g.inv_x + 1) + g.win)
    vpad = jnp.pad(
        v_l.astype(plane_dtype),
        ((0, 0), (pad, hp - hv - pad), (pad, max(wpad - wv - pad, pad)), (0, 0)),
    )
    # y phase decomposition: (B, sy, R, Wp, C)
    bdim, hpp, wpp, _ = vpad.shape
    vp = vpad.reshape(b, hpp // g.sy, g.sy, wpp, c).transpose(0, 2, 1, 3, 4)

    planes = []
    if g.sx > 1:
        for u in g.planes:
            start = g.int_x + u
            sl = jax.lax.slice_in_dim(
                vp, start, start + (wp_cols - 1) * g.sx + 1, stride=g.sx, axis=3
            )
            planes.append(sl)
    else:
        if g.inv_x > 1:
            vp = jnp.repeat(vp, g.inv_x, axis=3)
        for bshift in g.planes:
            planes.append(
                jax.lax.slice_in_dim(vp, bshift, bshift + wp_cols, axis=3)
            )
    out = jnp.stack(planes, 0)  # (P, B, sy, R, Wp, C)
    return out


def _build_vp(v_l, g: _PairGeom, coverage_rows=0, coverage_cols=0):
    """(B, Hv, Wv, C) -> the phase-decomposed padded array every plane is a
    shifted/strided view of: (B, sphase, sy, R, K, C).

    Mirrors _prep_planes up to (but not including) the per-plane slicing, plus
    an x-phase decomposition for sx > 1 (x = k*sx + phase) so strided plane
    views become contiguous-k views. plane p of _prep_planes satisfies
        plane_p[..., j, :] == vp[:, phase_p, :, :, shift_p + j, :]
    with (phase_p, shift_p) from _plane_fold_map. The vp-input forward builds
    planes from THESE coordinates in VMEM; the merged backward accumulates
    d_value in them, and jax.vjp of this function is the exact fold back to
    the value grid (pad/reshape/repeat adjoints only).
    """
    b, hv, wv, c = v_l.shape
    pad = g.pad
    rows_needed = (g.hq // g.inv_y if g.inv_y > 1 else g.hq) + g.halo_y
    hp = -(-(hv + 2 * pad) // g.sy) * g.sy
    hp = max(hp, rows_needed * g.sy)
    if g.sx > 1:
        wp_cols = g.wq
        wpad = g.int_x + g.win + g.sx * wp_cols
    else:
        wp_cols = g.wq + g.max_a8 + 8
        wpad = max(wv + 2 * pad, (wp_cols // g.inv_x + 1) + g.win)
    vpad = jnp.pad(
        v_l,
        ((0, 0), (pad, hp - hv - pad), (pad, max(wpad - wv - pad, pad)), (0, 0)),
    )
    bdim, hpp, wpp, _ = vpad.shape
    vp = vpad.reshape(b, hpp // g.sy, g.sy, wpp, c).transpose(0, 2, 1, 3, 4)
    if g.sx > 1:
        wk = -(-wpp // g.sx)
        vp = jnp.pad(vp, ((0, 0),) * 3 + ((0, wk * g.sx - wpp), (0, 0)))
        vp = vp.reshape(b, g.sy, vp.shape[2], wk, g.sx, c).transpose(0, 4, 1, 2, 3, 5)
    else:
        if g.inv_x > 1:
            vp = jnp.repeat(vp, g.inv_x, axis=3)
        vp = vp[:, None]  # sphase = 1
    pr = max(0, coverage_rows - vp.shape[3])
    pc = max(0, coverage_cols - vp.shape[4])
    if pr or pc:
        vp = jnp.pad(vp, ((0, 0),) * 3 + ((0, pr), (0, pc), (0, 0)))
    return vp


def _plane_fold_map(g: _PairGeom):
    """Per plane index: (phase, shift) into _build_vp coordinates."""
    out = []
    for p, key in enumerate(g.planes):
        if g.sx > 1:
            u = key
            out.append((((g.int_x + u) % g.sx), (g.int_x + u) // g.sx))
        else:
            out.append((0, key))  # key = the sub-8 column shift b
    return out


def _pair_kernel_v2(
    bounds_ref,  # (B, nty, ntx, 4) int32 SMEM (whole array): [u_lo, u_hi, v_lo, v_hi]
    offx_ref,  # (1, tq, tw, PH) f32, lane order p-major (lane = p*H + h)
    offy_ref,
    att_ref,
    planes_hbm,  # (P, B, sy, R, Wp, C) in ANY
    *rest_refs,  # [acc_in_ref] if chained, then out_ref, slabs, acc_ref, sems
    g: _PairGeom,
    heads,
    num_points,
    tq,
    tw,
    slab_w,
    single_x,
    single_y,
    chained=False,
    dbuf=False,
    uskip=False,
    yexp=False,
    vp=False,
    fold_map=None,
    slab_wd=None,
    sphase=1,
):
    # Cross-pair accumulation: when `chained`, the previous pairs' partial sum
    # for this query level streams in as an input block ALIASED to the output
    # buffer, and the kernel adds onto it — the XLA-side partial adds (read
    # prev + read part + write, ~3x the output bytes per pair) disappear.
    if chained:
        acc_in_ref, out_ref, *scratches = rest_refs
    else:
        acc_in_ref = None
        out_ref, *scratches = rest_refs
    if vp:
        slabs, acc_ref, vpslab, sems = scratches
        exp_ref = None
    elif yexp:
        slabs, acc_ref, exp_ref, sems = scratches
        vpslab = None
    else:
        slabs, acc_ref, sems = scratches
        exp_ref = None
        vpslab = None
    b = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    n_planes = len(g.planes)
    rows_q = tq if g.sy > 1 else tq // g.inv_y
    tile_rows = rows_q + g.halo_y

    if vp:
        # ONE unshifted vp slab per tile; shifted planes are built in VMEM
        # after the wait (static sub-8 shifted copies, amortized per tile)
        if dbuf:
            nb, nty, ntx = pl.num_programs(0), pl.num_programs(1), pl.num_programs(2)
            idx = (b * nty + ty) * ntx + tx
            total = nb * nty * ntx
            slot = jax.lax.rem(idx, 2)

            def make_vp_copy(i, slot_i):
                b_i = i // (nty * ntx)
                r = i % (nty * ntx)
                ty_i = r // ntx
                tx_i = r % ntx
                row_s = 0 if single_y else ty_i * rows_q
                col_s = 0 if single_x else pl.multiple_of(tx_i * tw, 8)
                return pltpu.make_async_copy(
                    planes_hbm.at[
                        b_i, :, :, pl.ds(row_s, tile_rows), pl.ds(col_s, slab_wd), :
                    ],
                    vpslab.at[slot_i],
                    sems.at[slot_i],
                )

            @pl.when(idx == 0)
            def _():
                make_vp_copy(idx, slot).start()

            @pl.when(idx + 1 < total)
            def _():
                make_vp_copy(idx + 1, 1 - slot).start()

            copies = [make_vp_copy(idx, slot)]
            cur_vp = vpslab.at[slot]
        else:
            row_start = 0 if single_y else ty * rows_q
            col_start = 0 if single_x else pl.multiple_of(tx * tw, 8)
            copies = [
                pltpu.make_async_copy(
                    planes_hbm.at[
                        b, :, :, pl.ds(row_start, tile_rows), pl.ds(col_start, slab_wd), :
                    ],
                    vpslab,
                    sems,
                )
            ]
            copies[0].start()
            cur_vp = vpslab
        cur_slab = slabs
    elif dbuf:
        # Manual double-buffer over the sequential grid: tile idx's planes were
        # prefetched by tile idx-1 (tile 0 fetches its own); this tile starts
        # the prefetch for idx+1 into the other slot before computing.
        nb, nty, ntx = pl.num_programs(0), pl.num_programs(1), pl.num_programs(2)
        idx = (b * nty + ty) * ntx + tx
        total = nb * nty * ntx
        slot = jax.lax.rem(idx, 2)

        def make_copies(i, slot_i):
            b_i = i // (nty * ntx)
            r = i % (nty * ntx)
            ty_i = r // ntx
            tx_i = r % ntx
            row_s = 0 if single_y else ty_i * rows_q
            col_s = 0 if single_x else pl.multiple_of(tx_i * tw, 8)
            return [
                pltpu.make_async_copy(
                    planes_hbm.at[
                        p, b_i, :, pl.ds(row_s, tile_rows), pl.ds(col_s, slab_w), :
                    ],
                    slabs.at[slot_i, p],
                    sems.at[slot_i, p],
                )
                for p in range(n_planes)
            ]

        @pl.when(idx == 0)
        def _():
            for cp in make_copies(idx, slot):
                cp.start()

        @pl.when(idx + 1 < total)
        def _():
            for cp in make_copies(idx + 1, 1 - slot):
                cp.start()

        copies = make_copies(idx, slot)
        cur_slab = slabs.at[slot]
    else:
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
        cur_slab = slabs

    h, npt = heads, num_points
    radius = g.radius
    ox = jnp.clip(offx_ref[0], -radius, radius)  # (tq, tw, P*H)
    oy = jnp.clip(offy_ref[0], -radius, radius)
    att = att_ref[0]

    pad = g.pad
    if g.rem_x is None:  # coarser in x: rem varies with query column
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

    c = out_ref.shape[-1]
    # weight expansion matrix (P*H -> C, value lanes d-major: lane = d*H + h):
    # expand2[p*H + hh, d*H + h] = (h == hh) folds the point-sum INTO the MXU
    # contraction. Feeding the full (tq, tw, P*H) hat product to the MXU keeps
    # every intermediate at >=32 lanes; the previous per-point 8-lane slices
    # (whp[..., p*H:(p+1)*H]) forced Mosaic relayouts that dominated the kernel
    # (probe: 7.5 ms -> 1.7 ms on the 256^2 same-res pair).
    # bf16 operands: the expand contraction is ~130 GFLOP on the 256^2 pair and
    # f32 MXU runs at 1/8 rate — bf16 weights add quantization no worse than
    # the bf16 value planes already in the FMA path.
    e2r = jax.lax.broadcasted_iota(jnp.int32, (h * npt, c), 0)
    e2c = jax.lax.broadcasted_iota(jnp.int32, (h * npt, c), 1)
    expand2 = (e2c % h == e2r % h).astype(jnp.bfloat16)

    for cp in copies:
        cp.wait()

    if vp:
        # one static (sub-8) shifted copy per plane per tile — the
        # unaligned-slice relayout the per-tap path must avoid, amortized
        # over the whole tap loop (mirror of the merged backward's fold)
        for p, (phase, shift) in enumerate(fold_map):
            slabs[p] = cur_vp[phase, :, :, shift : shift + slab_w, :]

    if yexp:
        # one row-expansion per plane per tile (replaces a broadcast per tap)
        n_src_rows = tile_rows
        for p_i in range(n_planes):
            src = cur_slab[p_i, 0]  # (tile_rows, slab_w, C); sy == 1 here
            exp_ref[p_i] = jnp.broadcast_to(
                src[:, None], (n_src_rows, g.inv_y, src.shape[1], src.shape[2])
            ).reshape(n_src_rows * g.inv_y, src.shape[1], src.shape[2])

    if acc_in_ref is not None:
        acc_ref[...] = acc_in_ref[0].astype(jnp.float32)
    else:
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Dynamic tap-ROW skip: learned offsets are local, so per query tile the
    # bilinear hats are provably zero outside [v_lo, v_hi] (bounds from the
    # XLA-side min/max of the clipped sample positions — _tap_bounds). The
    # skipped v rows contribute zero for every query/point/head in the tile.
    v_lo = bounds_ref[b, ty, tx, 2]
    v_hi = bounds_ref[b, ty, tx, 3]
    u_lo = bounds_ref[b, ty, tx, 0]
    u_hi = bounds_ref[b, ty, tx, 1]

    def make_ahy(v):
        hy = _hat(v.astype(jnp.float32) - py)
        if g.sy > 1:
            phi_y = (g.int_y + v) % g.sy
            dy = (g.int_y + v) // g.sy
        else:
            phi_y = 0
            dy = v
        return (att * hy).astype(jnp.bfloat16), phi_y, dy

    def tap(whp, plane_idx, a8, phi_y, dy):
        w = jax.lax.dot_general(
            whp, expand2,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (tq, tw, C)
        if yexp:
            # expanded rows: query row qy of tap v reads expanded row
            # qy + v*inv_y (exact: (ts+qy+v*inv_y)//inv_y == value row)
            view = exp_ref[plane_idx, pl.ds(dy * g.inv_y, tq), pl.ds(a8, tw), :]
        else:
            view = cur_slab[plane_idx, phi_y, pl.ds(dy, rows_q), pl.ds(a8, tw), :]
            if g.inv_y > 1:
                # row element-repeat via broadcast+merge of two free dims
                view = jnp.broadcast_to(
                    view[:, None], (rows_q, g.inv_y, tw, view.shape[-1])
                ).reshape(rows_q * g.inv_y, tw, view.shape[-1])
        return w * view.astype(jnp.float32)

    def v_body_dyn(v, _):
        # dynamic u loop: taps outside [u_lo, u_hi] are skipped entirely, at
        # the cost of an acc read-modify-write per tap (the fori body cannot
        # register-chain across iterations)
        ahy, phi_y, dy = make_ahy(v)

        def u_body(u, _):
            hx = _hat(u.astype(jnp.float32) - px).astype(jnp.bfloat16)
            if g.sx > 1:
                plane_idx, a8 = u, 0
            else:
                ushift = u * g.inv_x
                rem = jax.lax.rem(ushift, 8)
                # planes hold sorted sub-8 shifts [0, inv_x, 2*inv_x, ...]
                plane_idx = rem // g.inv_x
                a8 = pl.multiple_of(ushift - rem, 8)
            acc_ref[...] = acc_ref[...] + tap(ahy * hx, plane_idx, a8, phi_y, dy)
            return 0

        jax.lax.fori_loop(u_lo, u_hi + 1, u_body, 0)
        return 0

    def run_dyn():
        jax.lax.fori_loop(v_lo, v_hi + 1, v_body_dyn, 0)

    def run_static():
        # x-hats are v-invariant: compute the win (tq, tw, PH) blocks ONCE in
        # bf16; the static unroll lets Mosaic chain all taps of a v through
        # registers (one acc RMW per v, not per tap)
        hx_bf = [_hat(u - px).astype(jnp.bfloat16) for u in range(g.win)]

        def v_body_static(v, _):
            ahy, phi_y, dy = make_ahy(v)
            acc = acc_ref[...]
            for u in range(g.win):
                plane_idx, a8 = g.u_to_plane[u]
                acc = acc + tap(ahy * hx_bf[u], plane_idx, a8, phi_y, dy)
            acc_ref[...] = acc
            return 0

        jax.lax.fori_loop(v_lo, v_hi + 1, v_body_static, 0)

    if uskip == 1 and not yexp:
        # hybrid: pick per tile by active-u count. Narrow windows (local
        # offsets, e.g. synthetic bench weights) win with the dynamic skip;
        # wide windows (realistic several-pixel offsets) win statically.
        jax.lax.cond(u_hi - u_lo + 1 <= HYBRID_THRESH, run_dyn, run_static)
    elif uskip >= 1:
        run_dyn()
    else:
        run_static()
    out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def _choose_tiles(g: _PairGeom, c: int, plane_bytes: int, budget=None, dbuf=False,
                  yexp=False, vp=False):
    """Pick (tq, tw) so the slab stack + accumulator fit VMEM."""
    budget = budget or VMEM_BUDGET
    n_planes = len(g.planes)
    n_slots = 2 if dbuf else 1
    if vp:
        fold_map = _plane_fold_map(g)
        max_shift = max(s for _, s in fold_map)
        sphase = g.sx if g.sx > 1 else 1

    def slab_bytes(tq, tw):
        rows_q = tq if g.sy > 1 else tq // g.inv_y
        slab_w = tw + g.max_a8
        if vp:
            # built planes (one slot) + double-buffered vp slabs
            slab_wd = -(-(slab_w + max_shift) // 8) * 8
            rows = g.sy * (rows_q + g.halo_y) * c * plane_bytes
            return (n_planes * slab_w + n_slots * sphase * slab_wd) * rows
        return n_slots * n_planes * g.sy * (rows_q + g.halo_y) * slab_w * c * plane_bytes

    def exp_bytes(tq, tw):
        if not yexp:
            return 0
        rows_q = tq // g.inv_y
        slab_w = tw + g.max_a8
        return n_planes * (rows_q + g.halo_y) * g.inv_y * slab_w * c * plane_bytes

    def total(tq, tw):
        acc = tq * tw * c * 4
        # pipeline buffers: off/att/ acc_in inputs + out, each double-buffered
        blocks = tq * tw * (3 * 32 * 2 + 4 * c) * 4
        hx = g.win * tq * tw * 32 * 2  # hoisted bf16 x-hat temporaries
        stack = tq * tw * c * 4  # Mosaic stack temporaries (w per tap)
        reserve = 512 * 1024  # alignment pad + semaphores + iota/expand consts
        return slab_bytes(tq, tw) + exp_bytes(tq, tw) + acc + blocks + hx + stack + reserve

    tq = min(TQ_CAP, g.hq)
    while g.hq % tq:
        tq //= 2
    tw = min(TW_CAP, g.wq)
    while g.wq % tw:
        tw //= 2
    min_tq = max(1, g.inv_y)
    # Without the hoisted expansion, Mosaic's per-u unrolled broadcast
    # temporaries blow scoped VMEM on strongly expanded tiles (measured:
    # inv>=4 compiles at tq*tw<=1024, fails at 2048). yexp removes them.
    if max(g.inv_y, g.inv_x) >= 4 and not yexp:
        while tq * tw > 1024 and tw > 8 and g.wq % (tw // 2) == 0 and (tw // 2) % 8 == 0:
            tw //= 2
        while tq * tw > 1024 and tq > min_tq and (tq // 2) % min_tq == 0 and g.hq % (tq // 2) == 0:
            tq //= 2
    while total(tq, tw) > budget:
        tw_ok = (tw // 2) % 8 == 0 or (tw // 2) == g.wq
        if tw > 8 and tw >= tq and tw_ok and g.wq % (tw // 2) == 0:
            tw //= 2
        elif tq > min_tq and (tq // 2) % min_tq == 0 and g.hq % (tq // 2) == 0:
            tq //= 2
        else:
            break
    assert tq % max(1, g.inv_y) == 0 and tw % max(1, g.inv_x) == 0, (tq, tw, g.inv_y, g.inv_x)
    return tq, tw


def _tap_bounds(offx_g, offy_g, g: _PairGeom, tq, tw):
    """Per-tile active tap ranges (B, nty, ntx, 4) int32: [u_lo, u_hi, v_lo, v_hi].

    The bilinear hat of tap u is nonzero only for |u - px| < 1, so taps outside
    [ceil(min px - 1), floor(max px + 1)] are identically zero for every query
    (and point/head) in the tile. Mirrors the kernel's px/py formula exactly:
    px = clip(off, -R, R) + pad + rem(q).
    """
    b, hq, wq, ph = offx_g.shape
    r = float(g.radius)
    pad = float(g.pad)
    qx = jnp.arange(wq, dtype=jnp.float32)
    rem_x = ((qx % g.inv_x) + 0.5) / g.inv_x - 0.5 if g.rem_x is None else jnp.full((wq,), g.rem_x)
    qy = jnp.arange(hq, dtype=jnp.float32)
    rem_y = ((qy % g.inv_y) + 0.5) / g.inv_y - 0.5 if g.rem_y is None else jnp.full((hq,), g.rem_y)

    px = jnp.clip(offx_g, -r, r) + pad + rem_x[None, None, :, None]
    py = jnp.clip(offy_g, -r, r) + pad + rem_y[None, :, None, None]
    nty, ntx = hq // tq, wq // tw

    def tile_minmax(x):
        x = x.reshape(b, nty, tq, ntx, tw, ph)
        return x.min(axis=(2, 4, 5)), x.max(axis=(2, 4, 5))

    px_lo, px_hi = tile_minmax(px)
    py_lo, py_hi = tile_minmax(py)
    u_lo = jnp.clip(jnp.ceil(px_lo - 1), 0, g.win - 1).astype(jnp.int32)
    u_hi = jnp.clip(jnp.floor(px_hi + 1), 0, g.win - 1).astype(jnp.int32)
    v_lo = jnp.clip(jnp.ceil(py_lo - 1), 0, g.win - 1).astype(jnp.int32)
    v_hi = jnp.clip(jnp.floor(py_hi + 1), 0, g.win - 1).astype(jnp.int32)
    return jnp.stack([u_lo, u_hi, v_lo, v_hi], axis=-1)


def _run_pair_v2(
    v_l, off_pair, att_pair, hq, wq, hv, wv, radius, heads, head_dim, num_points,
    plane_dtype=jnp.bfloat16, interpret=False, tile_override=None, acc_in=None,
    out_dtype=jnp.float32,
):
    """One (lq, lv) pair -> (B, hq*wq, H*D) partial output (d-major channels).

    acc_in: optional (B, hq*wq, H*D) running partial (dtype out_dtype) from
    previous value levels of the same query level; aliased into the output so
    the kernel accumulates in place. bf16 out_dtype halves the partials'
    stream traffic (5 levels read+write the full query-level output each);
    in-kernel accumulation stays f32.
    """
    b = v_l.shape[0]
    c = heads * head_dim
    g = _PairGeom(hq, wq, hv, wv, radius)

    yexp = YEXP and g.inv_y > 1 and g.sy == 1
    vp_mode = VPIN and not yexp
    tq, tw = tile_override or _choose_tiles(
        g, c, np.dtype(plane_dtype).itemsize, dbuf=DBUF, yexp=yexp, vp=vp_mode
    )
    rows_q = tq if g.sy > 1 else tq // g.inv_y
    tile_rows = rows_q + g.halo_y
    slab_w = -(-(tw + g.max_a8) // 8) * 8  # DMA width stays 8-aligned

    need_rows = (hq // tq - 1) * rows_q + tile_rows
    if vp_mode:
        fold_map = _plane_fold_map(g)
        max_shift = max(s for _, s in fold_map)
        sphase = g.sx if g.sx > 1 else 1
        slab_wd = -(-(slab_w + max_shift) // 8) * 8
        need_cols_vp = (wq // tw - 1) * tw + slab_wd
        planes = _build_vp(
            v_l.reshape(b, hv, wv, c).astype(plane_dtype), g, need_rows, need_cols_vp
        )
    else:
        fold_map, max_shift, sphase, slab_wd = None, 0, 1, None
        planes = _prep_planes(v_l.reshape(b, hv, wv, c), g, plane_dtype)
        # plane padding must cover the farthest tile slab
        need_cols = (wq // tw - 1) * tw + slab_w
        pr = max(0, need_rows - planes.shape[3])
        pc = max(0, need_cols - planes.shape[4])
        if pr or pc:
            planes = jnp.pad(planes, ((0, 0),) * 3 + ((0, pr), (0, pc), (0, 0)))

    ph = heads * num_points
    offx_g = off_pair[..., 0].transpose(0, 1, 3, 2).reshape(b, hq, wq, ph)
    offy_g = off_pair[..., 1].transpose(0, 1, 3, 2).reshape(b, hq, wq, ph)
    att_g = att_pair.transpose(0, 1, 3, 2).reshape(b, hq, wq, ph)
    bounds = _tap_bounds(offx_g, offy_g, g, tq, tw)

    kernel = functools.partial(
        _pair_kernel_v2,
        g=g,
        heads=heads,
        num_points=num_points,
        tq=tq,
        tw=tw,
        slab_w=slab_w,
        single_x=(wq // tw) == 1,
        single_y=(hq // tq) == 1,
        chained=acc_in is not None,
        dbuf=DBUF,
        uskip=USKIP,
        yexp=yexp,
        vp=vp_mode,
        fold_map=fold_map,
        slab_wd=slab_wd,
        sphase=sphase,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, tq, tw, ph), lambda bb, ty, tx: (bb, ty, tx, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tq, tw, ph), lambda bb, ty, tx: (bb, ty, tx, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tq, tw, ph), lambda bb, ty, tx: (bb, ty, tx, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    inputs = [bounds, offx_g, offy_g, att_g, planes]
    kwargs = {}
    if acc_in is not None:
        in_specs.append(
            pl.BlockSpec((1, tq, tw, c), lambda bb, ty, tx: (bb, ty, tx, 0), memory_space=pltpu.VMEM)
        )
        inputs.append(acc_in.reshape(b, hq, wq, c))
        kwargs["input_output_aliases"] = {5: 0}
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hq, wq, c), out_dtype),
        grid=(b, hq // tq, wq // tw),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tq, tw, c), lambda bb, ty, tx: (bb, ty, tx, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=(
            [
                # built planes (single copy) + acc + dbuf'd vp slabs + sem
                pltpu.VMEM((len(g.planes), g.sy, tile_rows, slab_w, c), plane_dtype),
                pltpu.VMEM((tq, tw, c), jnp.float32),
                pltpu.VMEM(
                    ((2,) if DBUF else ()) + (sphase, g.sy, tile_rows, slab_wd, c),
                    plane_dtype,
                ),
                pltpu.SemaphoreType.DMA((2,)) if DBUF else pltpu.SemaphoreType.DMA,
            ]
            if vp_mode
            else [
                pltpu.VMEM(
                    ((2,) if DBUF else ()) + (len(g.planes), g.sy, tile_rows, slab_w, c),
                    plane_dtype,
                ),
                pltpu.VMEM((tq, tw, c), jnp.float32),
            ]
            + (
                [pltpu.VMEM((len(g.planes), tile_rows * g.inv_y, slab_w, c), plane_dtype)]
                if yexp
                else []
            )
            + [
                pltpu.SemaphoreType.DMA(((2,) if DBUF else ()) + (len(g.planes),)),
            ]
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
        **kwargs,
    )(*inputs)
    return out.reshape(b, hq * wq, c)


def ms_deform_attn_window_pallas_v2(
    value: jnp.ndarray,  # (B, S, H, D)
    spatial_shapes: Sequence[Tuple[int, int]],
    pixel_offsets: jnp.ndarray,  # (B, S, H, L, P, 2)
    attention_weights: jnp.ndarray,  # (B, S, H, L, P)
    radius: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for ops.msda_window.ms_deform_attn_window (forward)."""
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    b, s, h, d = value.shape
    _, q, _, l, p, _ = pixel_offsets.shape
    assert q == s and l == len(spatial_shapes)
    starts, total = level_start_index(spatial_shapes)
    assert total == s

    off32 = pixel_offsets.astype(jnp.float32)
    att32 = attention_weights.astype(jnp.float32)
    # d-major channel layout (channel = d*H + h) matches the weight expansion
    value_f = value.astype(jnp.float32).transpose(0, 1, 3, 2).reshape(b, s, h * d)
    # bf16 models carry the cross-pair partials in bf16 (the final output is
    # cast to value.dtype anyway); f32 models keep exact f32 partials
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
            inv_y = max(hq // max(hv, 1), 1)
            inv_x = max(wq // max(wv, 1), 1)
            # v2 handles every pyramid geometry (inv up to 16 measured 3.5x
            # faster than the XLA shift-FMA); the fallback only guards
            # pathological >4-octave gaps
            if inv_y * inv_x > 16 * 16:
                from ape_tpu.ops.msda_window import xla_pair

                o = jnp.clip(off_pair, -radius, radius).reshape(b, hq, wq, h, p, 2)
                a = att_pair.reshape(b, hq, wq, h, p)
                vl5 = v_l.reshape(b, hv, wv, d, h).transpose(0, 1, 2, 4, 3)
                part = xla_pair(vl5, o, a, hq, wq, hv, wv, radius)
                part = part.transpose(0, 1, 2, 4, 3).reshape(b, hq * wq, h * d)
                part = part.astype(part_dtype)
                out_per_qlevel[lq] = (
                    part if out_per_qlevel[lq] is None else out_per_qlevel[lq] + part
                )
            else:
                # running partial accumulates INSIDE the kernel (aliased buffer)
                out_per_qlevel[lq] = _run_pair_v2(
                    v_l, off_pair, att_pair, hq, wq, hv, wv, radius, h, d, p,
                    interpret=interpret, acc_in=out_per_qlevel[lq],
                    out_dtype=part_dtype,
                )

    out = jnp.concatenate(out_per_qlevel, axis=1)
    out = out.reshape(b, s, d, h).transpose(0, 1, 3, 2).reshape(b, s, h * d)
    return out.astype(value.dtype)
