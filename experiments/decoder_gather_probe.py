"""Probe decoder-MSDA gather formulations at production scale (900 queries).

The exact-gather forward (ops/msda.py) costs ~5 ms/layer on v5e while its
roofline is ~0.1 ms: XLA TPU gather is per-index-bound and the current
formulation issues 4 (taps) x Q x P x H indices each fetching a 32-lane row.
Variants:

  cur      : production ms_deform_attn (4 take_along_axis taps, D=32 rows)
  mergex   : per (tap-row): ONE lax.gather fetching 2 adjacent columns
             (slice_sizes=(2, D) on a (HW, D) operand, vmapped over B*H) --
             halves the index count, doubles payload contiguity
  gatheronly: the 4-tap gathers alone (no bilinear math) -- isolates gather cost

    python experiments/decoder_gather_probe.py
"""

from __future__ import annotations

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = ((256, 256), (128, 128), (64, 64), (32, 32), (16, 16))
B, Q, H, D, P = 1, 900, 8, 32, 4


def timed(fn, args, chains=(2, 10), reps=3):
    x = args[0]
    alts = [x + k * 1e-3 for k in range(1, reps + 1)]
    for a in alts:
        np.asarray(a[..., :1]).ravel()

    times = {}
    for n in chains:
        @jax.jit
        def chained(x, *rest):
            acc = jnp.float32(0)
            for _ in range(n):
                out = fn(x + acc.astype(x.dtype) * 1e-9, *rest)
                acc = acc + jnp.sum(out[(0,) * (out.ndim - 1)][:1]).astype(jnp.float32)
            return acc

        float(chained(x, *args[1:]))
        best = float("inf")
        for a in alts:
            t0 = time.perf_counter()
            float(chained(a, *args[1:]))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    n0, n1 = chains
    return (times[n1] - times[n0]) / (n1 - n0)


def mergex_sample_level(value_l, loc_l, w_l, height, width):
    """Bilinear sample via 2 sliced gathers (adjacent-x pairs fetched together)."""
    x = loc_l[..., 0] * width - 0.5  # (B, Q, H, P)
    y = loc_l[..., 1] * height - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(value_l.dtype)
    fy = (y - y0).astype(value_l.dtype)
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)

    # operand per (b, h): (HW, D); indices per (b, h): (Q*P,)
    vop = value_l.transpose(0, 2, 1, 3)  # (B, H, HW, D)

    out = None
    for dy in (0, 1):
        iy = iy0 + dy
        ry = (iy >= 0) & (iy < height)
        vx0 = (ix0 >= 0) & (ix0 < width) & ry
        vx1 = (ix0 + 1 >= 0) & (ix0 + 1 < width) & ry
        wy = fy if dy else 1.0 - fy
        w0 = jnp.where(vx0, (1.0 - fx) * wy * w_l, 0.0)  # (B, Q, H, P)
        w1 = jnp.where(vx1, fx * wy * w_l, 0.0)
        # base index: clamp so [base, base+1] stays inside the row. When the
        # clamp shifts the base (ix0 = -1 or ix0 = width-1) the taps land on
        # different slice positions -- route weights by the shift.
        base = jnp.clip(ix0, 0, width - 2)
        s = ix0 - base  # -1, 0, or >=1
        ws0 = jnp.where(s == 0, w0, jnp.where(s == -1, w1, 0.0))
        ws1 = jnp.where(s == 0, w1, jnp.where(s == 1, w0, 0.0))
        w0, w1 = ws0, ws1
        lin = jnp.clip(iy, 0, height - 1) * width + base
        idx = lin.transpose(0, 2, 1, 3).reshape(B, H, Q * P)  # (B, H, QP)

        def g1(op, ind):  # op (HW, D), ind (QP,)
            return jax.lax.gather(
                op,
                ind[:, None],
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1, 2),
                    collapsed_slice_dims=(),
                    start_index_map=(0,),
                ),
                slice_sizes=(2, D),
                mode="clip",
            )  # (QP, 2, D)

        g = jax.vmap(jax.vmap(g1))(vop, idx)  # (B, H, QP, 2, D)
        g = g.reshape(B, H, Q, P, 2, D)
        w0t = w0.transpose(0, 2, 1, 3)  # (B, H, Q, P)
        w1t = w1.transpose(0, 2, 1, 3)
        contrib = jnp.einsum("bhqpd,bhqp->bhqd", g[:, :, :, :, 0], w0t) + jnp.einsum(
            "bhqpd,bhqp->bhqd", g[:, :, :, :, 1], w1t
        )
        out = contrib if out is None else out + contrib
    return out.transpose(0, 2, 1, 3)  # (B, Q, H, D)


def mergex_msda(value, spatial_shapes, loc, att):
    from ape_tpu.ops.msda import level_start_index

    starts, total = level_start_index(spatial_shapes)
    out = None
    for l, (hgt, wdt) in enumerate(spatial_shapes):
        v_l = jax.lax.dynamic_slice_in_dim(value, starts[l], hgt * wdt, axis=1)
        o = mergex_sample_level(v_l, loc[:, :, :, l], att[:, :, :, l], hgt, wdt)
        out = o if out is None else out + o
    b, q = out.shape[:2]
    return out.reshape(b, q, -1)


def patch_sample_level(value_l, loc_l, w_l, height, width):
    """Bilinear sample via ONE 2x2x D sliced gather per (q, p, h) tap."""
    b, q, h, p = w_l.shape
    d = value_l.shape[-1]
    x = loc_l[..., 0] * width - 0.5
    y = loc_l[..., 1] * height - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)

    vop = value_l.transpose(0, 2, 1, 3).reshape(b, h, height, width, d)

    bx = jnp.clip(ix0, 0, width - 2)
    by = jnp.clip(iy0, 0, height - 2)
    sx = ix0 - bx  # -1, 0, or >=1: slice-position shift of the x taps
    sy = iy0 - by
    vx0 = (ix0 >= 0) & (ix0 < width)
    vx1 = (ix0 + 1 >= 0) & (ix0 + 1 < width)
    vy0 = (iy0 >= 0) & (iy0 < height)
    vy1 = (iy0 + 1 >= 0) & (iy0 + 1 < height)
    wx0 = jnp.where(vx0, 1.0 - fx, 0.0)
    wx1 = jnp.where(vx1, fx, 0.0)
    wy0 = jnp.where(vy0, 1.0 - fy, 0.0)
    wy1 = jnp.where(vy1, fy, 0.0)
    # route weights by the clamp shift (displaced taps have zero weight)
    wxa = jnp.where(sx == 0, wx0, jnp.where(sx == -1, wx1, 0.0))
    wxb = jnp.where(sx == 0, wx1, jnp.where(sx == 1, wx0, 0.0))
    wya = jnp.where(sy == 0, wy0, jnp.where(sy == -1, wy1, 0.0))
    wyb = jnp.where(sy == 0, wy1, jnp.where(sy == 1, wy0, 0.0))

    idx = jnp.stack(
        [by.transpose(0, 2, 1, 3).reshape(b, h, q * p),
         bx.transpose(0, 2, 1, 3).reshape(b, h, q * p)], -1
    )  # (B, H, QP, 2)

    def g1(op, ind):  # op (Hl, Wl, D), ind (QP, 2)
        return jax.lax.gather(
            op,
            ind,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3),
                collapsed_slice_dims=(),
                start_index_map=(0, 1),
            ),
            slice_sizes=(2, 2, d),
            mode="clip",
        )  # (QP, 2, 2, D)

    g = jax.vmap(jax.vmap(g1))(vop, idx).reshape(b, h, q, p, 2, 2, d)
    wgt = jnp.stack(
        [wya * wxa, wya * wxb, wyb * wxa, wyb * wxb], -1
    ) * w_l[..., None]  # (B, Q, H, P, 4)
    wgt = wgt.transpose(0, 2, 1, 3, 4).astype(g.dtype)  # (B, H, Q, P, 4)
    out = jnp.einsum("bhqpkd,bhqpk->bhqd", g.reshape(b, h, q, p, 4, d), wgt)
    return out.transpose(0, 2, 1, 3)


def patch_msda(value, spatial_shapes, loc, att):
    from ape_tpu.ops.msda import level_start_index

    starts, total = level_start_index(spatial_shapes)
    out = None
    for l, (hgt, wdt) in enumerate(spatial_shapes):
        v_l = jax.lax.dynamic_slice_in_dim(value, starts[l], hgt * wdt, axis=1)
        o = patch_sample_level(v_l, loc[:, :, :, l], att[:, :, :, l], hgt, wdt)
        out = o if out is None else out + o
    b, q = out.shape[:2]
    return out.reshape(b, q, -1)


def main():
    from ape_tpu.ops.msda import ms_deform_attn

    S = sum(h * w for h, w in SHAPES)
    rng = np.random.RandomState(0)
    dtype = jnp.dtype(os.environ.get("PROBE_DTYPE", "float32"))
    value = jnp.asarray(rng.randn(B, S, H, D), dtype)
    loc = jnp.asarray(rng.rand(B, Q, H, len(SHAPES), P, 2), jnp.float32)
    att = jnp.asarray(rng.rand(B, Q, H, len(SHAPES), P), jnp.float32)

    # parity first (jitted: eager ops through the remote tunnel are ~1 RPC each)
    @jax.jit
    def diff(value):
        ref = ms_deform_attn(value, SHAPES, loc, att)
        got = mergex_msda(value, SHAPES, loc, att)
        return jnp.max(jnp.abs(ref - got))

    err = float(diff(value))
    print(f"mergex parity max|diff| = {err:.2e}")

    @jax.jit
    def diffp(value):
        ref = ms_deform_attn(value, SHAPES, loc, att)
        got = patch_msda(value, SHAPES, loc, att)
        return jnp.max(jnp.abs(ref - got))

    print(f"patch parity max|diff| = {float(diffp(value)):.2e}", flush=True)

    t_cur = timed(lambda v: ms_deform_attn(v, SHAPES, loc, att), (value,))
    print(f"cur (mergex): {t_cur*1e3:7.2f} ms/layer", flush=True)
    t_p = timed(lambda v: patch_msda(v, SHAPES, loc, att), (value,))
    print(f"patch 2x2   : {t_p*1e3:7.2f} ms/layer", flush=True)


if __name__ == "__main__":
    main()
