"""Pallas window-MSDA v5: value levels FUSED into one kernel per query level.

v2 runs 25 independent pair kernels (5 query levels x 5 value levels) chained
through aliased partial buffers. At bench-scale offsets the pairs cost only
0.3-1.9 ms each, so per-pair fixed costs — partial read+write streams, pallas
dispatch, off/att block re-reads, un-overlapped first DMAs — dominate the
encoder layer. v5 keeps v2's entire geometry machinery (_PairGeom pre-shifted
planes, per-level tap bounds, dynamic u/v skip) but runs ALL value levels of a
query level inside ONE kernel:

  * the f32 accumulator lives in VMEM across levels — no partial streams;
  * every level's slab DMA is started at tile entry — levels 1..L-1 stream
    while level 0 computes (cross-LEVEL overlap replaces v2's cross-tile
    double buffering);
  * off/att/bounds arrive as per-level inputs with shared index maps, read
    once per tile.

Levels are greedily packed into groups whose slabs fit the VMEM budget; a
query level that cannot fit all 5 levels gets 2 kernels instead of 5+.

Semantics identical to ops/msda_window.py (window-clamped MSDA).

MEASURED RESULT (v5e, full_op_race.py): v5 LOSES to v2 — 18.7 vs 14.1
ms/layer at bench-scale offsets, 56.9 vs ~28 at wide offsets. The summed
slab VMEM forces smaller tiles (4x the tile count on the big level) and the
level-0 DMA wait is exposed every tile, which together outweigh the saved
partial streams/dispatches. Kept as a documented experiment behind
APE_MSDA_FUSED=1 (default off, dispatch stays on v2), like the v3 fused-row
attempt before it.
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
    _hat,
    _prep_planes,
    _tap_bounds,
    VMEM_BUDGET,
)


def _slab_geom(g: _PairGeom, tq, tw):
    rows_q = tq if g.sy > 1 else tq // g.inv_y
    tile_rows = rows_q + g.halo_y
    slab_w = -(-(tw + g.max_a8) // 8) * 8
    return rows_q, tile_rows, slab_w


def _slab_bytes(g: _PairGeom, tq, tw, c, itemsize=2):
    _, tile_rows, slab_w = _slab_geom(g, tq, tw)
    return len(g.planes) * g.sy * tile_rows * slab_w * c * itemsize


def _fused_kernel(
    bounds_ref,  # (B, nty, ntx, L*4) int32 SMEM
    *refs,
    geoms,
    heads,
    num_points,
    tq,
    tw,
    c,
    single_x,
    single_y,
    out_dtype,
):
    nl = len(geoms)
    # refs: offx_0..L-1, offy_0.., att_0.., planes_0.. then out, slabs_0.., acc, sems_0..
    offx = refs[0:nl]
    offy = refs[nl : 2 * nl]
    att = refs[2 * nl : 3 * nl]
    planes = refs[3 * nl : 4 * nl]
    out_ref = refs[4 * nl]
    slabs = refs[4 * nl + 1 : 5 * nl + 1]
    acc_ref = refs[5 * nl + 1]
    sems = refs[5 * nl + 2 : 6 * nl + 2]

    b = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)

    # start EVERY level's slab copy up front; waits interleave with compute
    all_copies = []
    for l, g in enumerate(geoms):
        rows_q, tile_rows, slab_w = _slab_geom(g, tq, tw)
        row_start = 0 if single_y else ty * rows_q
        col_start = 0 if single_x else pl.multiple_of(tx * tw, 8)
        copies = [
            pltpu.make_async_copy(
                planes[l].at[
                    p, b, :, pl.ds(row_start, tile_rows), pl.ds(col_start, slab_w), :
                ],
                slabs[l].at[p],
                sems[l].at[p],
            )
            for p in range(len(g.planes))
        ]
        for cp in copies:
            cp.start()
        all_copies.append(copies)

    h, npt = heads, num_points
    e2r = jax.lax.broadcasted_iota(jnp.int32, (h * npt, c), 0)
    e2c = jax.lax.broadcasted_iota(jnp.int32, (h * npt, c), 1)
    expand2 = (e2c % h == e2r % h).astype(jnp.bfloat16)

    acc_ref[...] = jnp.zeros_like(acc_ref)

    for l, g in enumerate(geoms):
        rows_q, tile_rows, slab_w = _slab_geom(g, tq, tw)
        radius = g.radius
        ox = jnp.clip(offx[l][0], -radius, radius)  # (tq, tw, PH)
        oy = jnp.clip(offy[l][0], -radius, radius)
        at = att[l][0]

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

        for cp in all_copies[l]:
            cp.wait()

        v_lo = bounds_ref[b, ty, tx, l * 4 + 2]
        v_hi = bounds_ref[b, ty, tx, l * 4 + 3]
        u_lo = bounds_ref[b, ty, tx, l * 4 + 0]
        u_hi = bounds_ref[b, ty, tx, l * 4 + 1]
        slab = slabs[l]

        def v_body(v, _, g=g, px=px, py=py, at=at, slab=slab, rows_q=rows_q,
                   u_lo=u_lo, u_hi=u_hi):
            hy = _hat(v.astype(jnp.float32) - py)
            ahy = (at * hy).astype(jnp.bfloat16)
            if g.sy > 1:
                phi_y = (g.int_y + v) % g.sy
                dy = (g.int_y + v) // g.sy
            else:
                phi_y = 0
                dy = v

            def u_body(u, _):
                hx = _hat(u.astype(jnp.float32) - px).astype(jnp.bfloat16)
                if g.sx > 1:
                    plane_idx, a8 = u, 0
                else:
                    ushift = u * g.inv_x
                    rem = jax.lax.rem(ushift, 8)
                    plane_idx = rem // g.inv_x
                    a8 = pl.multiple_of(ushift - rem, 8)
                w = jax.lax.dot_general(
                    ahy * hx, expand2,
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                view = slab[plane_idx, phi_y, pl.ds(dy, rows_q), pl.ds(a8, tw), :]
                if g.inv_y > 1:
                    view = jnp.broadcast_to(
                        view[:, None], (rows_q, g.inv_y, tw, view.shape[-1])
                    ).reshape(rows_q * g.inv_y, tw, view.shape[-1])
                acc_ref[...] = acc_ref[...] + w * view.astype(jnp.float32)
                return 0

            jax.lax.fori_loop(u_lo, u_hi + 1, u_body, 0)
            return 0

        jax.lax.fori_loop(v_lo, v_hi + 1, v_body, 0)

    out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def _choose_tiles_fused(geoms, c, budget=None):
    """Largest (tq, tw) whose summed slabs + acc + blocks fit the budget."""
    budget = budget or VMEM_BUDGET
    g0 = geoms[0]
    min_tq = max(max(g.inv_y for g in geoms), 1)
    min_tw = max(max(g.inv_x for g in geoms), 1)

    def total(tq, tw):
        slabs = sum(_slab_bytes(g, tq, tw, c) for g in geoms)
        acc = tq * tw * c * 4
        blocks = tq * tw * (3 * 32 * 2 * len(geoms) + 2 * c) * 4
        stack = tq * tw * c * 4
        return slabs + acc + blocks + stack + 512 * 1024

    def tw_ok(tw):
        # 8-alignment only matters when the width is split into several tiles
        return (
            g0.wq % tw == 0
            and tw % min_tw == 0
            and (tw % 8 == 0 or tw == g0.wq)
        )

    tq = min(32, g0.hq)
    while g0.hq % tq:
        tq //= 2
    tw = min(32, g0.wq)
    while g0.wq % tw:
        tw //= 2
    while tq % min_tq and tq < g0.hq:
        tq *= 2
    while not tw_ok(tw) and tw < g0.wq:
        tw *= 2
    while total(tq, tw) > budget:
        if tw > 8 and tw >= tq and tw_ok(tw // 2):
            tw //= 2
        elif tq > min_tq and (tq // 2) % min_tq == 0 and g0.hq % (tq // 2) == 0:
            tq //= 2
        else:
            return None  # cannot fit this group
    if tq % min_tq or not tw_ok(tw) or total(tq, tw) > budget:
        return None
    return tq, tw


def _run_qlevel_fused(
    v_levels,  # list of (B, Hv*Wv, C) f32 per value level
    offs,  # list of (B, hq, wq, PH) f32 per level (x)
    offys,
    atts,
    hq,
    wq,
    geoms,
    heads,
    head_dim,
    num_points,
    out_dtype,
    interpret=False,
):
    b = v_levels[0].shape[0]
    c = heads * head_dim
    nl = len(geoms)

    tiles = _choose_tiles_fused(geoms, c)
    assert tiles is not None
    tq, tw = tiles

    planes_all = []
    for g, v_l in zip(geoms, v_levels):
        planes = _prep_planes(v_l.reshape(b, g.hv, g.wv, c), g, jnp.bfloat16)
        rows_q, tile_rows, slab_w = _slab_geom(g, tq, tw)
        need_rows = (hq // tq - 1) * rows_q + tile_rows
        need_cols = (wq // tw - 1) * tw + slab_w
        pr = max(0, need_rows - planes.shape[3])
        pc = max(0, need_cols - planes.shape[4])
        if pr or pc:
            planes = jnp.pad(planes, ((0, 0),) * 3 + ((0, pr), (0, pc), (0, 0)))
        planes_all.append(planes)

    # (B, nty, ntx, L*4): L folded into the last dim — SMEM arrays are tiled
    # on the last two dims, so a trailing (L, 4) pads to (8, 128) and blows
    # the 1 MB SMEM budget
    bounds = jnp.concatenate(
        [
            _tap_bounds(ox, oy, g, tq, tw)
            for ox, oy, g in zip(offs, offys, geoms)
        ],
        axis=3,
    )

    ph = heads * num_points
    kernel = functools.partial(
        _fused_kernel,
        geoms=geoms,
        heads=heads,
        num_points=num_points,
        tq=tq,
        tw=tw,
        c=c,
        single_x=(wq // tw) == 1,
        single_y=(hq // tq) == 1,
        out_dtype=out_dtype,
    )
    blk = lambda last: pl.BlockSpec(
        (1, tq, tw, last), lambda bb, ty, tx: (bb, ty, tx, 0), memory_space=pltpu.VMEM
    )
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [blk(ph)] * (3 * nl)
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * nl
    )
    scratch = []
    for g in geoms:
        _, tile_rows, slab_w = _slab_geom(g, tq, tw)
        scratch.append(
            pltpu.VMEM((len(g.planes), g.sy, tile_rows, slab_w, c), jnp.bfloat16)
        )
    scratch.append(pltpu.VMEM((tq, tw, c), jnp.float32))
    for g in geoms:
        scratch.append(pltpu.SemaphoreType.DMA((len(g.planes),)))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hq, wq, c), out_dtype),
        grid=(b, hq // tq, wq // tw),
        in_specs=in_specs,
        out_specs=blk(c),
        scratch_shapes=scratch,
        interpret=interpret,
    )(bounds, *offs, *offys, *atts, *planes_all)
    return out.reshape(b, hq * wq, c)


def ms_deform_attn_window_pallas_v5(
    value: jnp.ndarray,  # (B, S, H, D)
    spatial_shapes: Sequence[Tuple[int, int]],
    pixel_offsets: jnp.ndarray,  # (B, S, H, L, P, 2)
    attention_weights: jnp.ndarray,  # (B, S, H, L, P)
    radius: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for ms_deform_attn_window_pallas_v2 (forward)."""
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    b, s, h, d = value.shape
    _, q, _, l, p, _ = pixel_offsets.shape
    assert q == s and l == len(spatial_shapes)
    starts, total = level_start_index(spatial_shapes)
    assert total == s
    c = h * d
    ph = h * p

    off32 = pixel_offsets.astype(jnp.float32)
    att32 = attention_weights.astype(jnp.float32)
    value_f = value.astype(jnp.float32).transpose(0, 1, 3, 2).reshape(b, s, c)
    part_dtype = jnp.bfloat16 if value.dtype == jnp.bfloat16 else jnp.float32

    v_levels = [
        jax.lax.dynamic_slice_in_dim(value_f, starts[lv], hv * wv, axis=1)
        for lv, (hv, wv) in enumerate(spatial_shapes)
    ]

    out_per_qlevel = []
    for lq, (hq, wq) in enumerate(spatial_shapes):
        off_q = jax.lax.dynamic_slice_in_dim(off32, starts[lq], hq * wq, axis=1)
        att_q = jax.lax.dynamic_slice_in_dim(att32, starts[lq], hq * wq, axis=1)
        geoms = [_PairGeom(hq, wq, hv, wv, radius) for hv, wv in spatial_shapes]
        offs, offys, atts = [], [], []
        for lv in range(l):
            op = off_q[:, :, :, lv]
            ap = att_q[:, :, :, lv]
            offs.append(op[..., 0].transpose(0, 1, 3, 2).reshape(b, hq, wq, ph))
            offys.append(op[..., 1].transpose(0, 1, 3, 2).reshape(b, hq, wq, ph))
            atts.append(ap.transpose(0, 1, 3, 2).reshape(b, hq, wq, ph))

        # greedy level grouping under the VMEM budget
        groups = []
        cur = []
        for lv in range(l):
            trial = cur + [lv]
            if _choose_tiles_fused([geoms[i] for i in trial], c) is not None:
                cur = trial
            else:
                if cur:
                    groups.append(cur)
                cur = [lv]
        if cur:
            groups.append(cur)

        out_q = None
        for grp in groups:
            part = _run_qlevel_fused(
                [v_levels[i] for i in grp],
                [offs[i] for i in grp],
                [offys[i] for i in grp],
                [atts[i] for i in grp],
                hq, wq,
                [geoms[i] for i in grp],
                h, d, p,
                part_dtype,
                interpret=interpret,
            )
            out_q = part if out_q is None else (out_q + part).astype(part_dtype)
        out_per_qlevel.append(out_q)

    out = jnp.concatenate(out_per_qlevel, axis=1)
    out = out.reshape(b, s, d, h).transpose(0, 1, 3, 2).reshape(b, s, c)
    return out.astype(value.dtype)
