"""Probe: decompose the same-res window-MSDA pair kernel's time.

Variants of the v2 pair kernel, each ablating one stage, timed with the
chained-jit slope method (PERF.md).  Run on the real TPU:

    python experiments/pair_probe.py [pair]

pair in {same, inv2, inv4, sx2}; default same (256^2 <- 256^2).
"""

from __future__ import annotations

import functools
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ape_tpu.ops.msda_window_pallas_v2 import (
    _PairGeom,
    _choose_tiles,
    _hat,
    _prep_planes,
)

H, P, D = 8, 4, 32
C = H * D
PH = P * H
RADIUS = 4


def make_kernel(variant, g, tq, tw, slab_w, single_x, single_y):
    """Variant pair kernels sharing the v2 skeleton."""

    def kernel(offx_ref, offy_ref, att_ref, planes_hbm, out_ref, slabs, acc_ref, sems):
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

        radius = g.radius
        if variant.startswith("k32_t"):
            ox = jnp.clip(offx_ref[0, 0, 0], -radius, radius)  # (PH, tq*tw)
            oy = jnp.clip(offy_ref[0, 0, 0], -radius, radius)
            att = att_ref[0, 0, 0]
        else:
            ox = jnp.clip(offx_ref[0], -radius, radius)
            oy = jnp.clip(offy_ref[0], -radius, radius)
            att = att_ref[0]

        pad = g.pad
        transposed = variant.startswith("k32_t")
        if transposed:
            # "qlane" layout: blocks are (1, 1, 1, PH, tq*tw) — PH on SUBLANES,
            # queries on LANES. The hat/attention VPU math runs at 100% lane
            # efficiency (vs PH=32/128 in the production layout) and the
            # dot_general contracts the sublane dim, emitting (tq*tw, C) which
            # reshapes for free into the FMA layout. (A (1, tq, PH, tw) block
            # is illegal: the minor dim tw is neither 128-divisible nor the
            # full array extent.)
            nq = tq * tw
            if g.rem_x is None:
                qx = (jax.lax.broadcasted_iota(jnp.int32, (1, nq), 1) % tw).astype(jnp.float32)
                rem_x = ((qx % g.inv_x) + 0.5) / g.inv_x - 0.5
            else:
                rem_x = g.rem_x
            if g.rem_y is None:
                qy = (jax.lax.broadcasted_iota(jnp.int32, (1, nq), 1) // tw).astype(jnp.float32)
                rem_y = ((qy % g.inv_y) + 0.5) / g.inv_y - 0.5
            else:
                rem_y = g.rem_y
        else:
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

        c = out_ref.shape[-1]
        ecols = jax.lax.broadcasted_iota(jnp.int32, (H, c), 1)
        erows = jax.lax.broadcasted_iota(jnp.int32, (H, c), 0)
        expand = (ecols % H == erows).astype(jnp.float32)
        # K=32 expand: (PH, C), row p*H+h -> channels d*H+h (fold point-sum in)
        e2r = jax.lax.broadcasted_iota(jnp.int32, (PH, c), 0)
        e2c = jax.lax.broadcasted_iota(jnp.int32, (PH, c), 1)
        expand2 = (e2c % H == e2r % H).astype(jnp.float32)

        for cp in copies:
            cp.wait()

        acc_ref[...] = jnp.zeros_like(acc_ref)

        if variant == "dma_only":
            # copies started+waited, no compute loop: isolates slab DMA +
            # dispatch + in/out block traffic (the per-tile fixed cost)
            out_ref[0] = acc_ref[...].astype(out_ref.dtype)
            return

        if variant in ("u8", "u4", "uskip"):
            # In-kernel per-tile tap bounds (production reads them from SMEM;
            # the scalar reductions here are one-off per tile).
            rows_q_ = tq if g.sy > 1 else tq // g.inv_y
            u_lo = jnp.clip(jnp.ceil(jnp.min(px) - 1), 0, g.win - 1).astype(jnp.int32)
            u_hi = jnp.clip(jnp.floor(jnp.max(px) + 1), 0, g.win - 1).astype(jnp.int32)
            v_lo = jnp.clip(jnp.ceil(jnp.min(py) - 1), 0, g.win - 1).astype(jnp.int32)
            v_hi = jnp.clip(jnp.floor(jnp.max(py) + 1), 0, g.win - 1).astype(jnp.int32)
            e2bf = expand2.astype(jnp.bfloat16)

            def tap_term(u, ahy, phi_y, dy):
                """One tap's contribution (exact zero when hat(u-px) == 0)."""
                hx = _hat(u.astype(jnp.float32) - px).astype(jnp.bfloat16)
                whp = ahy * hx
                w = jax.lax.dot_general(
                    whp, e2bf,
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if g.sx > 1:
                    # overhang taps (hat==0) clamp to a legal plane index
                    plane_idx, a8 = jnp.minimum(u, g.win - 1), 0
                else:
                    ushift = u * g.inv_x
                    rem = jax.lax.rem(ushift, 8)
                    plane_idx = rem // g.inv_x
                    # block overhang taps (hat==0) may point past the slab:
                    # clamp the 8-aligned slice start so the read stays legal
                    a8 = pl.multiple_of(
                        jnp.minimum(ushift - rem, slab_w - tw), 8
                    )
                view = slabs[plane_idx, phi_y, pl.ds(dy, rows_q_), pl.ds(a8, tw), :]
                if g.inv_y > 1:
                    view = jnp.broadcast_to(
                        view[:, None], (rows_q_, g.inv_y, tw, view.shape[-1])
                    ).reshape(rows_q_ * g.inv_y, tw, view.shape[-1])
                return w * view.astype(jnp.float32)

            if variant == "uskip":
                # production-style: dynamic fori per tap, acc RMW every tap
                def v_body_s(v, _):
                    hy = _hat(v.astype(jnp.float32) - py)
                    ahy = (att * hy).astype(jnp.bfloat16)
                    phi_y = (g.int_y + v) % g.sy if g.sy > 1 else 0
                    dy = (g.int_y + v) // g.sy if g.sy > 1 else v

                    def u_body(u, _):
                        acc_ref[...] = acc_ref[...] + tap_term(u, ahy, phi_y, dy)
                        return 0

                    jax.lax.fori_loop(u_lo, u_hi + 1, u_body, 0)
                    return 0

                jax.lax.fori_loop(v_lo, v_hi + 1, v_body_s, 0)
            else:
                # static U_BLK-unrolled taps at a DYNAMIC base: the taps chain
                # through a VALUE (one acc RMW per block); overhang taps are
                # exact zeros via the hat, so no predication is needed
                u_blk = 8 if variant == "u8" else 4
                n_blk = (u_hi - u_lo) // u_blk + 1

                def v_body8(v, _):
                    hy = _hat(v.astype(jnp.float32) - py)
                    ahy = (att * hy).astype(jnp.bfloat16)
                    phi_y = (g.int_y + v) % g.sy if g.sy > 1 else 0
                    dy = (g.int_y + v) // g.sy if g.sy > 1 else v

                    def blk_body(bi, _):
                        u0 = u_lo + bi * u_blk
                        acc = acc_ref[...]
                        for k in range(u_blk):
                            acc = acc + tap_term(u0 + k, ahy, phi_y, dy)
                        acc_ref[...] = acc
                        return 0

                    jax.lax.fori_loop(0, n_blk, blk_body, 0)
                    return 0

                jax.lax.fori_loop(v_lo, v_hi + 1, v_body8, 0)
            out_ref[0] = acc_ref[...].astype(out_ref.dtype)
            return

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
                if variant == "bf16fma":
                    # per-u FMA in bf16, folded into the f32 acc once per u:
                    # probes whether VPU bf16 multiply-add runs ahead of f32
                    whp = ahy * _hat(u - px)
                    w = jax.lax.dot_general(
                        whp.astype(jnp.bfloat16), expand2.astype(jnp.bfloat16),
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.bfloat16,
                    )
                    plane_idx, a8 = g.u_to_plane[u]
                    view = slabs[plane_idx, phi_y, pl.ds(dy, tq), a8 : a8 + tw, :]
                    acc_ref[...] = acc_ref[...] + (w * view).astype(jnp.float32)
                    continue
                if variant == "viewonly":
                    # no weight math at all: isolates DMA + view add + RMW
                    plane_idx, a8 = g.u_to_plane[u]
                    view = slabs[plane_idx, phi_y, pl.ds(dy, tq), a8 : a8 + tw, :]
                    acc_ref[...] = acc_ref[...] + view.astype(jnp.float32)
                    continue
                if variant == "const_w":
                    # skip hat+expand entirely: isolates DMA+FMA+RMW
                    w = jnp.full((tq, tw, c), 0.01, jnp.float32)
                else:
                    whp = ahy * _hat(u - px)
                    if transposed:
                        # whp: (PH, tq*tw). MXU contracts the SUBLANE dim with
                        # expand2 -> (tq*tw, C), reshaped for free into the
                        # (tq, tw, C) FMA layout.
                        w = jax.lax.dot_general(
                            whp.astype(jnp.bfloat16), expand2.astype(jnp.bfloat16),
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ).reshape(tq, tw, c)
                        if variant == "k32_t_nofma":
                            acc_ref[...] = acc_ref[...] + w
                            continue
                    elif variant in ("k32", "k32_nofma", "k32_bf16"):
                        lhs = whp.astype(jnp.bfloat16) if variant == "k32_bf16" else whp
                        rhs = expand2.astype(lhs.dtype)
                        w = jax.lax.dot_general(
                            lhs, rhs,
                            dimension_numbers=(((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        if variant == "k32_nofma":
                            acc_ref[...] = acc_ref[...] + w
                            continue
                    elif variant == "tile":
                        w8 = whp[..., 0:H]
                        for pp in range(1, P):
                            w8 = w8 + whp[..., pp * H : (pp + 1) * H]
                        # lane-expand via sublane-broadcast + merge (c = d*H + h)
                        w = jnp.broadcast_to(
                            w8[:, :, None, :], (tq, tw, D, H)
                        ).reshape(tq, tw, c)
                    else:
                        w8 = whp[..., 0:H]
                        for pp in range(1, P):
                            w8 = w8 + whp[..., pp * H : (pp + 1) * H]
                        w = jax.lax.dot_general(
                            w8, expand,
                            dimension_numbers=(((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                plane_idx, a8 = g.u_to_plane[u]
                if variant == "no_fma":
                    acc_ref[...] = acc_ref[...] + w
                    continue
                view = slabs[plane_idx, phi_y, pl.ds(dy, rows_q), a8 : a8 + tw, :]
                if g.inv_y > 1:
                    view = jnp.broadcast_to(
                        view[:, None], (rows_q, g.inv_y, tw, view.shape[-1])
                    ).reshape(rows_q * g.inv_y, tw, view.shape[-1])
                acc_ref[...] = acc_ref[...] + w * view.astype(jnp.float32)
            return 0

        jax.lax.fori_loop(0, g.win, v_body, 0)
        out_ref[0] = acc_ref[...].astype(out_ref.dtype)

    return kernel


def run_pair_variant(variant, v_l, off_pair, att_pair, hq, wq, hv, wv):
    b = v_l.shape[0]
    g = _PairGeom(hq, wq, hv, wv, RADIUS)
    planes = _prep_planes(v_l.reshape(b, hv, wv, C), g, jnp.bfloat16)
    tq, tw = _choose_tiles(g, C, 2)
    rows_q = tq if g.sy > 1 else tq // g.inv_y
    tile_rows = rows_q + g.halo_y
    slab_w = -(-(tw + g.max_a8) // 8) * 8

    need_rows = (hq // tq - 1) * rows_q + tile_rows
    need_cols = (wq // tw - 1) * tw + slab_w
    pr = max(0, need_rows - planes.shape[3])
    pc = max(0, need_cols - planes.shape[4])
    if pr or pc:
        planes = jnp.pad(planes, ((0, 0),) * 3 + ((0, pr), (0, pc), (0, 0)))

    offx_g = off_pair[..., 0].transpose(0, 1, 3, 2).reshape(b, hq, wq, PH)
    offy_g = off_pair[..., 1].transpose(0, 1, 3, 2).reshape(b, hq, wq, PH)
    att_g = att_pair.transpose(0, 1, 3, 2).reshape(b, hq, wq, PH)

    if variant.startswith("k32_t"):
        # qlane: (B, nty, ntx, PH, tq*tw) — per-tile weight slabs with queries
        # on lanes (XLA-side reshuffle; ~8 MB per input on the big pair)
        nty, ntx = hq // tq, wq // tw

        def qlane(x):
            return (
                x.reshape(b, nty, tq, ntx, tw, PH)
                .transpose(0, 1, 3, 5, 2, 4)
                .reshape(b, nty, ntx, PH, tq * tw)
            )

        offx_g, offy_g, att_g = qlane(offx_g), qlane(offy_g), qlane(att_g)
        wspec = pl.BlockSpec(
            (1, 1, 1, PH, tq * tw),
            lambda bb, ty, tx: (bb, ty, tx, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        wspec = pl.BlockSpec(
            (1, tq, tw, PH), lambda bb, ty, tx: (bb, ty, tx, 0), memory_space=pltpu.VMEM
        )

    kernel = make_kernel(variant, g, tq, tw, slab_w, (wq // tw) == 1, (hq // tq) == 1)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hq, wq, C), jnp.float32),
        grid=(b, hq // tq, wq // tw),
        in_specs=[
            wspec,
            wspec,
            wspec,
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, tq, tw, C), lambda bb, ty, tx: (bb, ty, tx, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((len(g.planes), g.sy, tile_rows, slab_w, C), jnp.bfloat16),
            pltpu.VMEM((tq, tw, C), jnp.float32),
            pltpu.SemaphoreType.DMA((len(g.planes),)),
        ],
    )(offx_g, offy_g, att_g, planes)
    return out.reshape(b, hq * wq, C)


def time_variant(variant, hq, wq, hv, wv, chains=(4, 20), reps=3):
    rng = np.random.RandomState(0)
    b = 1
    v_l = jnp.asarray(rng.randn(b, hv * wv, C), jnp.float32)
    off = jnp.asarray(rng.randn(b, hq * wq, H, P, 2) * 2, jnp.float32)
    att = jnp.asarray(rng.rand(b, hq * wq, H, P), jnp.float32)
    alts = [v_l + k * 1e-3 for k in range(1, reps + 1)]
    for a in alts:
        np.asarray(a[..., :1])

    times = {}
    for n in chains:
        @jax.jit
        def chained(v_l, off, att):
            acc = jnp.float32(0)
            for k in range(n):
                out = run_pair_variant(variant, v_l + acc * 1e-6, off, att, hq, wq, hv, wv)
                acc = acc + jnp.sum(out[:, :1, :1])
            return acc

        r = chained(v_l, off, att)
        float(r)  # warm
        best = float("inf")
        for a in alts:
            t0 = time.perf_counter()
            r = chained(a, off, att)
            float(r)
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    n0, n1 = chains
    slope = (times[n1] - times[n0]) / (n1 - n0)
    return slope


PAIRS = {
    "same": (256, 256, 256, 256),
    "inv2": (256, 256, 128, 128),
    "inv4": (256, 256, 64, 64),
    "sx2": (128, 128, 256, 256),
}

if __name__ == "__main__":
    pair = sys.argv[1] if len(sys.argv) > 1 else "same"
    hq, wq, hv, wv = PAIRS[pair]
    variants = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "base", "const_w", "no_fma", "k32", "tile"
    ]
    print(f"pair {pair}: q {hq}x{wq} <- v {hv}x{wv}")
    if os.environ.get("PROBE_CHECK", "0") == "1":
        rng = np.random.RandomState(0)
        v_l = jnp.asarray(rng.randn(1, hv * wv, C), jnp.float32)
        off = jnp.asarray(rng.randn(1, hq * wq, H, P, 2) * 2, jnp.float32)
        att = jnp.asarray(rng.rand(1, hq * wq, H, P), jnp.float32)
        ref = np.asarray(run_pair_variant("k32_bf16", v_l, off, att, hq, wq, hv, wv))
        for v2 in variants:
            if v2 in ("k32_bf16",):
                continue
            got = np.asarray(run_pair_variant(v2, v_l, off, att, hq, wq, hv, wv))
            print(f"  {v2}: max|diff| vs k32_bf16 = {np.abs(got - ref).max():.3e}")
    for variant in variants:
        try:
            dt = time_variant(variant, hq, wq, hv, wv)
            print(f"  {variant:10s}: {dt*1e3:8.2f} ms")
        except Exception as e:
            print(f"  {variant:10s}: FAILED {type(e).__name__}: {str(e)[:200]}")
