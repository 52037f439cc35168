"""Pallas TPU kernel for window-clamped multi-scale deformable attention.

Same math as ops/msda_window.py (the XLA reference), but the shift-and-FMA loop
runs inside one kernel per (query-level, value-level) pair with the accumulator
resident in VMEM — the XLA version materializes every one of the (2R+3)^2
shifted FMAs to HBM (~measured 127 ms/layer at 512^2), this kernel writes each
output tile once.

Key layout trick: query grids and value grids are powers of two apart, so a
query's sampling center in the value level advances by a constant stride
s = 2^k. Phase-decomposing the padded value level into s*s planes
(``vp[b, phase_y, phase_x, row, col, H*D]``) turns every strided window access
into a CONTIGUOUS slice: shift (u, v) reads phase ((int_off+v) % s) at in-phase
row offset (int_off+v)//s. Coarser value levels need no phases — rows repeat
inv times across the query grid (pltpu-friendly jnp.repeat).

Grid: (B, query_row_tiles, query_col_tiles) per pair. The value halo tile is
DMA'd from HBM per grid step; offsets/weights/outputs use regular BlockSpecs.
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


def _hat(x):
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


def _pair_geometry(hq, wq, hv, wv, radius):
    """Static geometry for one (query grid, value grid) pair."""
    pad = radius + 1
    win = 2 * radius + 3
    g = {}
    for axis, (nq, nv) in (("y", (hq, hv)), ("x", (wq, wv))):
        if nv >= nq:
            s = nv // nq
            inv = 1
            int_off = s // 2 - 1 if s > 1 else 0
            rem = 0.5 if s > 1 else 0.0
            halo = (int_off + win - 1) // s
        else:
            s = 1
            inv = nq // nv
            int_off = 0
            rem = None  # varies per query; computed in kernel via iota
            halo = win - 1
        g[axis] = dict(s=s, inv=inv, int_off=int_off, rem=rem, halo=halo)
    g["pad"] = pad
    g["win"] = win
    return g


def _phase_decompose(vpad, sy, sx):
    """(B, Hp, Wp, C) -> (B, sy, sx, Hp//sy, Wp//sx, C)."""
    b, hp, wp, c = vpad.shape
    x = vpad.reshape(b, hp // sy, sy, wp // sx, sx, c)
    return x.transpose(0, 2, 4, 1, 3, 5)


def _pair_kernel(
    offx_ref,  # (1, tq, tw, PH) f32, lane order p-major: lane = p*H + h
    offy_ref,  # (1, tq, tw, PH) f32
    att_ref,  # (1, tq, tw, PH) f32
    vp_hbm,  # full (B, sy, sx, Hpp, Wpp, C) in ANY; C lane order h-major (h*D + d)
    out_ref,  # (1, tq, tw, C)
    vtile,  # VMEM scratch
    acc_ref,  # VMEM scratch (tq, tw, C) f32 accumulator
    sem,
    *,
    geom,
    heads,
    head_dim,
    num_points,
    tq,
    tw,
    radius,
    single_x,
    single_y,
):
    gy, gx = geom["y"], geom["x"]
    win = geom["win"]
    sy, sx = gy["s"], gx["s"]
    inv_y, inv_x = gy["inv"], gx["inv"]
    b = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)

    rows_q = tq // inv_y  # value rows covered by the query tile
    cols_q = tw // inv_x
    tile_rows = rows_q + gy["halo"]
    tile_cols = -(-(cols_q + gx["halo"]) // 8) * 8  # sublane-dim slices: 8-aligned

    # static 0 when the axis has a single tile: Mosaic must PROVE the column
    # start is 8-aligned and cannot infer that program_id is always 0
    col_start = 0 if single_x else pl.multiple_of(tx * cols_q, 8)
    row_start = 0 if single_y else ty * rows_q
    copy = pltpu.make_async_copy(
        vp_hbm.at[
            b,
            :,
            :,
            pl.ds(row_start, tile_rows),
            pl.ds(col_start, tile_cols),
            :,
        ],
        vtile,
        sem,
    )
    copy.start()

    h, p = heads, num_points
    ox = jnp.clip(offx_ref[0], -radius, radius)  # (tq, tw, P*H)
    oy = jnp.clip(offy_ref[0], -radius, radius)
    att = att_ref[0]  # (tq, tw, P*H)

    pad = geom["pad"]
    if gx["rem"] is None:  # coarser in x: rem varies with query column
        qx = jax.lax.broadcasted_iota(jnp.int32, (tq, tw, 1), 1).astype(jnp.float32)
        rem_x = ((qx % inv_x) + 0.5) / inv_x - 0.5
    else:
        rem_x = gx["rem"]
    if gy["rem"] is None:
        qy = jax.lax.broadcasted_iota(jnp.int32, (tq, tw, 1), 0).astype(jnp.float32)
        rem_y = ((qy % inv_y) + 0.5) / inv_y - 0.5
    else:
        rem_y = gy["rem"]
    px = ox + (pad + rem_x)  # position relative to window corner 0
    py = oy + (pad + rem_y)

    copy.wait()

    c = out_ref.shape[-1]

    # Rolled loop over v (row shifts) with static unroll over u (col shifts).
    # The accumulator lives in a scratch ref and every (u) step stores into it:
    # carrying it as an SSA value made Mosaic allocate the 11 unrolled bodies'
    # temporaries side by side (~88MB of scoped VMEM).
    acc_ref[:] = jnp.zeros_like(acc_ref)

    # weight expansion matrix for the MXU: (tq,tw,H) -> (tq,tw,C) where value
    # lanes are d-major (lane = d*H + h): E[i, j] = 1 iff j % H == i
    ecols = jax.lax.broadcasted_iota(jnp.int32, (h, c), 1)
    erows = jax.lax.broadcasted_iota(jnp.int32, (h, c), 0)
    expand = (ecols % h == erows).astype(jnp.float32)

    def v_body(v, _):
        hy = _hat(v.astype(jnp.float32) - py)  # (tq, tw, P*H)
        ahy = att * hy
        phi_y = (gy["int_off"] + v) % sy
        dy = (gy["int_off"] + v) // sy
        rows_v = vtile[phi_y, :, pl.ds(dy, rows_q), :, :]  # (sx, rows_q, TC, C)
        if inv_y > 1 or inv_x > 1:
            # expand ONCE per v (per-u repeats left 11 2MB temporaries live at
            # once); u-shifts become inv_x-aligned slices of the expanded tile
            rows_v = jnp.repeat(rows_v, inv_y, axis=1) if inv_y > 1 else rows_v
            rows_v = jnp.repeat(rows_v, inv_x, axis=2) if inv_x > 1 else rows_v
        for u in range(win):
            hx = _hat(u - px)
            whp = ahy * hx
            # sum over points: p-major lane layout -> contiguous slices of H
            w = whp[..., 0:h]
            for pp in range(1, p):
                w = w + whp[..., pp * h : (pp + 1) * h]
            w = jax.lax.dot_general(
                w, expand,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (tq, tw, C), no reshape relayouts
            phi_x = (gx["int_off"] + u) % sx
            dx = (gx["int_off"] + u) // sx
            view = rows_v[phi_x, :, dx * inv_x : dx * inv_x + tw, :]
            # per-u ref store: Mosaic does NOT reuse stack slots across the
            # unrolled u bodies, so SSA accumulation allocates all 11 (w, view)
            # temporaries side by side and OOMs scoped VMEM on coarse pairs
            acc_ref[:] = acc_ref[:] + w * view
        return 0

    jax.lax.fori_loop(0, win, v_body, 0)
    acc = acc_ref[:]
    out_ref[0] = acc.astype(out_ref.dtype)


def _run_pair(value_level, off_pair, att_pair, hq, wq, hv, wv, radius, heads, head_dim, num_points, interpret=False):
    """One (lq, lv) pair: returns (B, hq*wq, H*D) partial output."""
    b = value_level.shape[0]
    c = heads * head_dim
    geom = _pair_geometry(hq, wq, hv, wv, radius)
    gy, gx = geom["y"], geom["x"]
    pad = geom["pad"]
    sy, sx = gy["s"], gx["s"]

    # pad the value level; align high side so padded dims divide by phases
    hp = hv + 2 * pad
    wp = wv + 2 * pad
    hp_al = -(-hp // sy) * sy
    wp_al = -(-wp // sx) * sx
    vpad = jnp.pad(
        value_level.reshape(b, hv, wv, c),
        ((0, 0), (pad, pad + hp_al - hp), (pad, pad + wp_al - wp), (0, 0)),
    )
    vp = _phase_decompose(vpad, sy, sx)  # (B, sy, sx, Hpp, Wpp, C)
    hpp, wpp = vp.shape[3], vp.shape[4]

    # query tile sizes: keep the halo'd value tile ~O(2MB); the DMA slice's
    # column start/shape must be 8-aligned, so tw is a multiple of 8 when the
    # value is finer/same in x, and coarser-x pairs use ONE full-width x tile
    tq = max(1, min(32, 256 // max(sy, 1), hq))
    tq = min(tq, hq)
    while hq % tq:
        tq //= 2
    if gx["inv"] > 1:
        tw = wq  # single x tile: col start 0, full value width
    else:
        tw = max(8, min(128, 1024 // max(sx, 1), wq))
        tw = min(tw, wq)
        while wq % tw:
            tw //= 2
        assert tw % 8 == 0 or tw == wq, (tw, wq)
    rows_q = tq // gy["inv"] if gy["inv"] > 1 else tq
    cols_q = tw // gx["inv"] if gx["inv"] > 1 else tw
    assert tq % gy["inv"] == 0 and tw % gx["inv"] == 0, (tq, tw, gy["inv"], gx["inv"])

    # shrink tiles until the VMEM working set (halo'd scratch + double-buffered
    # in/out blocks) fits comfortably under the ~16MB/core budget
    def _vmem_bytes(tq_, tw_):
        rq = tq_ // gy["inv"] if gy["inv"] > 1 else tq_
        cq = tw_ // gx["inv"] if gx["inv"] > 1 else tw_
        tc = -(-(cq + gx["halo"]) // 8) * 8
        scratch = sy * sx * (rq + gy["halo"]) * tc * c * 4
        blocks = tq_ * tw_ * (3 * heads * num_points + c) * 4 * 2  # double-buffered
        return scratch + blocks

    min_tq = max(1, gy["inv"])  # rows_q must stay >= 1 and tq a multiple of inv_y
    while _vmem_bytes(tq, tw) > 2 * 1024 * 1024 + 512 * 1024:
        tw_ok = gx["inv"] == 1 or (
            (tw // 2) % gx["inv"] == 0 and ((tw // 2) // gx["inv"]) % 8 == 0
        )  # coarse-x tiles keep 8-aligned column starts
        if tw > 8 and (tw >= tq or tq <= min_tq) and tw_ok:
            tw //= 2
        elif tq > min_tq and (tq // 2) % min_tq == 0:
            tq //= 2
        else:
            break
    rows_q = tq // gy["inv"] if gy["inv"] > 1 else tq
    cols_q = tw // gx["inv"] if gx["inv"] > 1 else tw

    assert (wq // tw) == 1 or cols_q % 8 == 0, (wq, tw, cols_q)
    tile_cols = -(-(cols_q + gx["halo"]) // 8) * 8
    # pad the phase planes so every tile's DMA stays in bounds
    need_w = (wq // max(gx["inv"], 1) // cols_q - 1) * cols_q + tile_cols if cols_q else tile_cols
    if wpp < need_w:
        vp = jnp.pad(vp, ((0, 0),) * 4 + ((0, need_w - wpp),) + ((0, 0),))
        wpp = need_w
    assert hpp >= hq // gy["inv"] + gy["halo"], (hpp, hq, gy)
    assert wpp >= wq // gx["inv"] + gx["halo"], (wpp, wq, gx)

    ph = heads * num_points
    # (B, Q, H, P, 2) -> p-major lanes: (B, hq, wq, P*H)
    offx_g = off_pair[..., 0].transpose(0, 1, 3, 2).reshape(b, hq, wq, ph)
    offy_g = off_pair[..., 1].transpose(0, 1, 3, 2).reshape(b, hq, wq, ph)
    att_g = att_pair.transpose(0, 1, 3, 2).reshape(b, hq, wq, ph)

    grid = (b, hq // tq, wq // tw)
    kernel = functools.partial(
        _pair_kernel,
        geom=geom,
        heads=heads,
        head_dim=head_dim,
        num_points=num_points,
        tq=tq,
        tw=tw,
        radius=radius,
        single_x=(wq // tw) == 1,
        single_y=(hq // tq) == 1,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hq, wq, c), value_level.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tq, tw, ph), lambda bb, ty, tx: (bb, ty, tx, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tq, tw, ph), lambda bb, ty, tx: (bb, ty, tx, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tq, tw, ph), lambda bb, ty, tx: (bb, ty, tx, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, tq, tw, c), lambda bb, ty, tx: (bb, ty, tx, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (sy, sx, rows_q + gy["halo"], -(-(cols_q + gx["halo"]) // 8) * 8, c),
                jnp.float32,
            ),
            pltpu.VMEM((tq, tw, c), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(offx_g, offy_g, att_g, vp)
    return out.reshape(b, hq * wq, c)


def ms_deform_attn_window_pallas(
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
    # d-major channel layout (channel = d*H + h): pltpu.repeat tiles its input,
    # so the tiled (h0..hH)*D weight pattern lines up with d-major value lanes
    value_f = value.astype(jnp.float32).transpose(0, 1, 3, 2).reshape(b, s, h * d)

    out_per_qlevel = [None] * l
    for lv, (hv, wv) in enumerate(spatial_shapes):
        v_l = jax.lax.dynamic_slice_in_dim(value_f, starts[lv], hv * wv, axis=1)
        for lq, (hq, wq) in enumerate(spatial_shapes):
            off_pair = jax.lax.dynamic_slice_in_dim(off32, starts[lq], hq * wq, axis=1)[
                :, :, :, lv
            ]  # (B, Qlq, H, P, 2)
            att_pair = jax.lax.dynamic_slice_in_dim(att32, starts[lq], hq * wq, axis=1)[
                :, :, :, lv
            ]
            inv_y = max(hq // max(hv, 1), 1)
            inv_x = max(wq // max(wv, 1), 1)
            if inv_y * inv_x >= 64:
                # extreme coarse expansion: the kernel's expanded value tile
                # cannot fit VMEM at the alignment-mandated minimum tile sizes;
                # the value grid is tiny, so the XLA shift-FMA is cheap here
                from ape_tpu.ops.msda_window import xla_pair

                o = jnp.clip(off_pair, -radius, radius).reshape(b, hq, wq, h, p, 2)
                a = att_pair.reshape(b, hq, wq, h, p)
                # v_l is in the kernel's d-major layout -> back to (..., H, D)
                vl5 = v_l.reshape(b, hv, wv, d, h).transpose(0, 1, 2, 4, 3)
                part = xla_pair(vl5, o, a, hq, wq, hv, wv, radius)
                # back to d-major flat for summation with kernel partials
                part = part.transpose(0, 1, 2, 4, 3).reshape(b, hq * wq, h * d)
            else:
                part = _run_pair(
                    v_l, off_pair, att_pair, hq, wq, hv, wv, radius, h, d, p,
                    interpret=interpret,
                )
            out_per_qlevel[lq] = part if out_per_qlevel[lq] is None else out_per_qlevel[lq] + part

    out = jnp.concatenate(out_per_qlevel, axis=1)
    out = out.reshape(b, s, d, h).transpose(0, 1, 3, 2).reshape(b, s, h * d)
    return out.astype(value.dtype)
