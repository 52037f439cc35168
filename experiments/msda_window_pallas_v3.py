"""Pallas window-MSDA v3: fused-row kernel.

v2 launches one kernel per (query-level, value-level) pair — 25 dispatches per
encoder layer, 5 partial (B, S, C) f32 outputs per query level that XLA then
sums (4 extra full-tensor read+write passes over the finest level), and the
same off/att query blocks re-read by every pair.

v3 fuses, per query level, every SAME-OR-COARSER value level (sx == sy == 1;
the window geometry then shares the query-grid tiling) into ONE kernel with the
value level as the innermost grid dimension:

  grid = (B, n_ty, n_tx, Lf)   # Lf fused levels, innermost => sequential

The (tq, tw, C) f32 accumulator is scratch and TPU grids execute sequentially,
so it persists across the Lf steps: zeroed at lv==0, accumulated by each
level's tap loop (selected with pl.when on the grid index — all branches are
compiled, one executes), written to the output block once at lv==Lf-1. The
output BlockSpec ignores lv so the block is flushed only when (b, ty, tx)
changes. off/att arrive stacked (Lf, B, Hq, Wq, P*H) and the BlockSpec's
index_map picks level lv's block, so each is read once per (tile, level).

Finer-in-x/y value levels (sx > 1) keep the v2 single-pair path: their slabs
live on a different grid relation and dominate VMEM if co-resident.

Semantics: identical to ops/msda_window.py (the XLA oracle) — window-clamped
MSDA, |offset| <= radius, bilinear, zero padding. Parity:
tests/test_msda_pallas.py. Reference semantics (unclamped):
/root/reference/ape/layers/csrc/MsDeformAttn/ms_deform_im2col_cuda.cuh:237-300.
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
    _PairGeom,
    _hat,
    _prep_planes,
    _run_pair_v2,
)


def _accumulate_level(
    acc_ref, slab, offx, offy, att, g: _PairGeom, heads, num_points, tq, tw, expand2
):
    """Add one value level's window-MSDA contribution into acc_ref.

    offx/offy/att: (tq, tw, P*H) f32 blocks for this query tile and level.
    slab: VMEM ref (P, sy, tile_rows, slab_w, C), already DMA'd.
    """
    radius = g.radius
    ox = jnp.clip(offx, -radius, radius)
    oy = jnp.clip(offy, -radius, radius)

    pad = g.pad
    if g.rem_x is None:  # value coarser in x: rem varies with query column
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
    rows_q = tq if g.sy > 1 else tq // g.inv_y

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
            whp = ahy * _hat(u - px)
            w = jax.lax.dot_general(
                whp.astype(jnp.bfloat16), expand2,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (tq, tw, C)
            plane_idx, a8 = g.u_to_plane[u]
            view = slab[plane_idx, phi_y, pl.ds(dy, rows_q), a8 : a8 + tw, :]
            if g.inv_y > 1:
                view = jnp.broadcast_to(
                    view[:, None], (rows_q, g.inv_y, tw, view.shape[-1])
                ).reshape(rows_q * g.inv_y, tw, view.shape[-1])
            acc_ref[...] = acc_ref[...] + w * view.astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, g.win, v_body, 0)


def _row_kernel_v3(*refs, gs, heads, num_points, tq, tw, slab_ws, single_x, single_y):
    lf = len(gs)
    offx_ref, offy_ref, att_ref = refs[0], refs[1], refs[2]
    planes_refs = refs[3 : 3 + lf]
    out_ref = refs[3 + lf]
    slabs = refs[4 + lf : 4 + 2 * lf]
    acc_ref = refs[4 + 2 * lf]
    sems = refs[5 + 2 * lf : 5 + 3 * lf]

    b = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    lv = pl.program_id(3)

    h, npt = heads, num_points
    c = out_ref.shape[-1]
    e2r = jax.lax.broadcasted_iota(jnp.int32, (h * npt, c), 0)
    e2c = jax.lax.broadcasted_iota(jnp.int32, (h * npt, c), 1)
    expand2 = (e2c % h == e2r % h).astype(jnp.bfloat16)

    @pl.when(lv == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for k, gk in enumerate(gs):

        @pl.when(lv == k)
        def _(k=k, gk=gk):
            rows_q = tq // gk.inv_y
            tile_rows = rows_q + gk.halo_y
            row_start = 0 if single_y else ty * rows_q
            col_start = 0 if single_x else pl.multiple_of(tx * tw, 8)
            copies = [
                pltpu.make_async_copy(
                    planes_refs[k].at[
                        p, b, :, pl.ds(row_start, tile_rows), pl.ds(col_start, slab_ws[k]), :
                    ],
                    slabs[k].at[p],
                    sems[k].at[p],
                )
                for p in range(len(gk.planes))
            ]
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()
            _accumulate_level(
                acc_ref,
                slabs[k],
                offx_ref[0, 0],
                offy_ref[0, 0],
                att_ref[0, 0],
                gk,
                heads,
                num_points,
                tq,
                tw,
                expand2,
            )

    @pl.when(lv == lf - 1)
    def _():
        out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def _choose_row_tiles(gs, c, plane_bytes, budget=None):
    """Shared (tq, tw) for a fused row: slab SUM + accumulator fit VMEM."""
    budget = budget or VMEM_BUDGET
    hq, wq = gs[0].hq, gs[0].wq
    max_inv_y = max(g.inv_y for g in gs)
    max_inv = max(max(g.inv_y, g.inv_x) for g in gs)

    def slab_bytes(g, tq, tw):
        rows_q = tq // g.inv_y
        slab_w = -(-(tw + g.max_a8) // 8) * 8
        return len(g.planes) * (rows_q + g.halo_y) * slab_w * c * plane_bytes

    def total(tq, tw):
        acc = tq * tw * c * 4
        blocks = tq * tw * (2 * 3 * 32 + 2 * c) * 4
        return sum(slab_bytes(g, tq, tw) for g in gs) + acc + blocks

    tq = min(32, hq)
    while hq % tq:
        tq //= 2
    tq = max(tq, max_inv_y)
    tw = min(64, wq)
    while wq % tw:
        tw //= 2
    # Mosaic scoped-VMEM ceiling on strongly expanded tiles (see v2)
    if max_inv >= 4:
        while tq * tw > 1024 and tw > 8 and wq % (tw // 2) == 0 and (tw // 2) % 8 == 0:
            tw //= 2
        while tq * tw > 1024 and tq > max_inv_y and hq % (tq // 2) == 0 and (tq // 2) % max_inv_y == 0:
            tq //= 2
    while total(tq, tw) > budget:
        tw_ok = (tw // 2) % 8 == 0 or (tw // 2) == wq
        if tw > 8 and tw >= tq and tw_ok and wq % (tw // 2) == 0:
            tw //= 2
        elif tq > max_inv_y and (tq // 2) % max_inv_y == 0 and hq % (tq // 2) == 0:
            tq //= 2
        else:
            break
    assert tq % max_inv_y == 0 and hq % tq == 0 and wq % tw == 0, (tq, tw, max_inv_y)
    return tq, tw


def _run_row_v3(
    v_levels,  # list of (B, Hv*Wv, C) f32, one per fused value level
    off_row,  # (Lf, B, Hq*Wq, H, P, 2) f32 pixel offsets per fused level
    att_row,  # (Lf, B, Hq*Wq, H, P) f32
    hq,
    wq,
    shapes_v,  # [(hv, wv)] per fused level
    radius,
    heads,
    head_dim,
    num_points,
    plane_dtype=jnp.bfloat16,
    interpret=False,
):
    lf = len(v_levels)
    b = v_levels[0].shape[0]
    c = heads * head_dim
    ph = heads * num_points
    gs = [_PairGeom(hq, wq, hv, wv, radius) for hv, wv in shapes_v]
    assert all(g.sx == 1 and g.sy == 1 for g in gs), "v3 row requires same-or-coarser"

    tq, tw = _choose_row_tiles(gs, c, np.dtype(plane_dtype).itemsize)
    slab_ws = [-(-(tw + g.max_a8) // 8) * 8 for g in gs]

    planes_list = []
    for k, g in enumerate(gs):
        hv, wv = shapes_v[k]
        planes = _prep_planes(v_levels[k].reshape(b, hv, wv, c), g, plane_dtype)
        rows_q = tq // g.inv_y
        tile_rows = rows_q + g.halo_y
        need_rows = (hq // tq - 1) * rows_q + tile_rows
        need_cols = (wq // tw - 1) * tw + slab_ws[k]
        pr = max(0, need_rows - planes.shape[3])
        pc = max(0, need_cols - planes.shape[4])
        if pr or pc:
            planes = jnp.pad(planes, ((0, 0),) * 3 + ((0, pr), (0, pc), (0, 0)))
        planes_list.append(planes)

    offx_g = off_row[..., 0].transpose(0, 1, 2, 4, 3).reshape(lf, b, hq, wq, ph)
    offy_g = off_row[..., 1].transpose(0, 1, 2, 4, 3).reshape(lf, b, hq, wq, ph)
    att_g = att_row.transpose(0, 1, 2, 4, 3).reshape(lf, b, hq, wq, ph)

    kernel = functools.partial(
        _row_kernel_v3,
        gs=gs,
        heads=heads,
        num_points=num_points,
        tq=tq,
        tw=tw,
        slab_ws=slab_ws,
        single_x=(wq // tw) == 1,
        single_y=(hq // tq) == 1,
    )
    qblock = lambda bb, ty, tx, lv: (lv, bb, ty, tx, 0)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hq, wq, c), jnp.float32),
        grid=(b, hq // tq, wq // tw, lf),
        in_specs=[
            pl.BlockSpec((1, 1, tq, tw, ph), qblock, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tq, tw, ph), qblock, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tq, tw, ph), qblock, memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * lf,
        out_specs=pl.BlockSpec(
            (1, tq, tw, c), lambda bb, ty, tx, lv: (bb, ty, tx, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((len(g.planes), g.sy, tq // g.inv_y + g.halo_y, slab_ws[k], c), plane_dtype)
            for k, g in enumerate(gs)
        ]
        + [pltpu.VMEM((tq, tw, c), jnp.float32)]
        + [pltpu.SemaphoreType.DMA((len(g.planes),)) for g in gs],
        interpret=interpret,
    )(offx_g, offy_g, att_g, *planes_list)
    return out.reshape(b, hq * wq, c)


def ms_deform_attn_window_pallas_v3(
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

    off32 = pixel_offsets.astype(jnp.float32)
    att32 = attention_weights.astype(jnp.float32)
    value_f = value.astype(jnp.float32).transpose(0, 1, 3, 2).reshape(b, s, h * d)
    v_levels = [
        jax.lax.dynamic_slice_in_dim(value_f, starts[lv], hv * wv, axis=1)
        for lv, (hv, wv) in enumerate(spatial_shapes)
    ]

    out_per_qlevel = []
    for lq, (hq, wq) in enumerate(spatial_shapes):
        off_q = jax.lax.dynamic_slice_in_dim(off32, starts[lq], hq * wq, axis=1)
        att_q = jax.lax.dynamic_slice_in_dim(att32, starts[lq], hq * wq, axis=1)
        fused, separate = [], []
        for lv, (hv, wv) in enumerate(spatial_shapes):
            g_sx = wv >= wq and wv // wq or 1
            g_sy = hv >= hq and hv // hq or 1
            inv_y = max(hq // max(hv, 1), 1)
            inv_x = max(wq // max(wv, 1), 1)
            if g_sx == 1 and g_sy == 1 and inv_y * inv_x <= 16 * 16:
                fused.append(lv)
            else:
                separate.append(lv)
        part = None
        if fused:
            part = _run_row_v3(
                [v_levels[k] for k in fused],
                jnp.stack([off_q[:, :, :, k] for k in fused], 0),
                jnp.stack([att_q[:, :, :, k] for k in fused], 0),
                hq,
                wq,
                [spatial_shapes[k] for k in fused],
                radius,
                h,
                d,
                p,
                interpret=interpret,
            )
        for lv in separate:
            hv, wv = spatial_shapes[lv]
            inv_y = max(hq // max(hv, 1), 1)
            inv_x = max(wq // max(wv, 1), 1)
            if inv_y * inv_x > 16 * 16:
                from ape_tpu.ops.msda_window import xla_pair

                o = jnp.clip(off_q[:, :, :, lv], -radius, radius).reshape(
                    b, hq, wq, h, p, 2
                )
                a = att_q[:, :, :, lv].reshape(b, hq, wq, h, p)
                vl5 = (
                    v_levels[lv].reshape(b, hv, wv, d, h).transpose(0, 1, 2, 4, 3)
                )
                piece = xla_pair(vl5, o, a, hq, wq, hv, wv, radius)
                piece = piece.transpose(0, 1, 2, 4, 3).reshape(b, hq * wq, h * d)
            else:
                piece = _run_pair_v2(
                    v_levels[lv],
                    off_q[:, :, :, lv],
                    att_q[:, :, :, lv],
                    hq,
                    wq,
                    hv,
                    wv,
                    radius,
                    h,
                    d,
                    p,
                    interpret=interpret,
                )
            part = piece if part is None else part + piece
        out_per_qlevel.append(part)

    out = jnp.concatenate(out_per_qlevel, axis=1)
    out = out.reshape(b, s, d, h).transpose(0, 1, 3, 2).reshape(b, s, h * d)
    return out.astype(value.dtype)
