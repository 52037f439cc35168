"""Decoder multi-scale deformable attention as dense separable-bilinear matmuls.

Capability match: the decoder cross-attention use of the ``ape._C`` CUDA op
(/root/reference/ape/modeling/ape_deta/deformable_transformer_vl.py:124-255,
ape/layers/multi_scale_deform_attn.py:298-348) — 900 queries sampling P points
per head per level at box-scaled locations.

TPU-first design
----------------
Random bilinear gather is the one op TPUs lack (measured XLA gather ≈ 2.4
Gelem/s on v5e → ~25 ms/decoder layer). But the bilinear kernel is separable:

    sample(q) = Σ_r hat(y_q - r) · Σ_c hat(x_q - c) · V[r, c, :]

so sampling ALL points against ALL grid cells of a level is two chained
contractions: an MXU matmul over columns (hx^T · V) followed by a cheap
weighted row-reduction. Dense over the level (Hv·Wv work per point instead of
4), but that waste lands on the MXU at ~200 TFLOP/s instead of the gather unit
at 5 GB/s: ~161 GFLOP/layer at APE scale ≈ 1-2 ms. Out-of-range samples fall
out naturally (the hat is zero at every in-grid cell), reproducing
``grid_sample`` zero-padding exactly.

The whole thing is jnp, so autodiff gives an equally MXU-friendly backward
(transposes of matmuls are matmuls) — no custom VJP needed.

Shapes follow ops/msda.py conventions:
  value:              (B, S, H, D)
  spatial_shapes:     static ((H_l, W_l), ...)
  sampling_locations: (B, Q, H, L, P, 2) normalized [0,1], (x, y)
  attention_weights:  (B, Q, H, L, P)
  returns:            (B, Q, H * D)
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ape_tpu.ops.msda import level_start_index, ms_deform_attn


def _hat(x):
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


def ms_deform_attn_dense(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    row_block: int = 8,
    precision=jax.lax.Precision.DEFAULT,
) -> jnp.ndarray:
    """Exact MSDA via dense separable bilinear contraction (decoder-scale Q).

    ``row_block``: rows of the value grid contracted per scan step — bounds the
    (B, H, Q*P, row_block*D) stage-1 temporary (~30 MB at APE scale with 8).
    ``precision``: matmul precision for the column contraction; DEFAULT (bf16
    passes on TPU) is the production setting, HIGHEST for parity tests.
    """
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    b, s, h, d = value.shape
    _, q, _, l, p, _ = sampling_locations.shape
    starts, total = level_start_index(spatial_shapes)
    assert total == s, f"value length {s} != sum of levels {total}"
    assert l == len(spatial_shapes)

    compute = jnp.float32
    loc = sampling_locations.astype(compute)
    att = attention_weights.astype(compute)

    out = jnp.zeros((b, h, q, d), dtype=compute)
    for lvl, (hv, wv) in enumerate(spatial_shapes):
        v_l = jax.lax.dynamic_slice_in_dim(value, starts[lvl], hv * wv, axis=1)
        v_l = v_l.astype(compute).reshape(b, hv, wv, h, d)

        x = loc[:, :, :, lvl, :, 0] * wv - 0.5  # (B, Q, H, P)
        y = loc[:, :, :, lvl, :, 1] * hv - 0.5
        cols = jnp.arange(wv, dtype=compute)
        rows = jnp.arange(hv, dtype=compute)
        hx = _hat(x[..., None] - cols)  # (B, Q, H, P, Wv)
        why = att[:, :, :, lvl, :, None] * _hat(y[..., None] - rows)  # (B,Q,H,P,Hv)

        # batch over (B, H); merge (Q, P) into the matmul M dimension
        hx_m = hx.transpose(0, 2, 1, 3, 4).reshape(b, h, q * p, wv)
        why_m = why.transpose(0, 2, 1, 3, 4)  # (B, H, Q, P, Hv)
        v_m = v_l.transpose(0, 3, 1, 2, 4)  # (B, H, Hv, Wv, D)

        nb = max(1, hv // row_block)
        while hv % nb:
            nb -= 1
        rb = hv // nb
        v_b = v_m.reshape(b, h, nb, rb, wv, d).transpose(2, 0, 1, 4, 3, 5)
        v_b = v_b.reshape(nb, b, h, wv, rb * d)
        why_b = why_m.reshape(b, h, q, p, nb, rb).transpose(4, 0, 1, 2, 3, 5)

        def step(acc, operand):
            v_blk, why_blk = operand  # (B,H,Wv,rb*D), (B,H,Q,P,rb)
            u = jax.lax.dot_general(
                hx_m,
                v_blk,
                dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
                precision=precision,
                preferred_element_type=compute,
            )  # (B, H, Q*P, rb*D)
            u = u.reshape(b, h, q, p, rb, d)
            acc = acc + jnp.einsum(
                "bhqpr,bhqprd->bhqd", why_blk, u, precision=precision
            )
            return acc, None

        lvl_out, _ = jax.lax.scan(step, jnp.zeros((b, h, q, d), compute), (v_b, why_b))
        out = out + lvl_out

    return out.transpose(0, 2, 1, 3).reshape(b, q, h * d).astype(value.dtype)


def _dvalue_dense(spatial_shapes, loc, att, g, b, s, h, d, precision):
    """d_value via explicit separable contractions (no scatter anywhere).

    d_V[r,c,:] = sum_{q,p} att*hat(y_qp - r) * hat(x_qp - c) * g[q,:]

    contracted as, per level and per point p (scanned, 4 steps):
      M   = hx_p[...,c] * g[...,d]            (B,H,Q,Wv,D)   VPU outer
      d_V += A_p^T @ M                        (Hv,Q)@(Q,Wv*D) MXU
    ~160 GFLOP at APE scale vs the autodiff transpose of the dense forward,
    which XLA lowers through scatter-shaped intermediates (~790 ms measured).
    """
    compute = jnp.float32
    q = loc.shape[1]
    p = loc.shape[4]
    g4 = g.reshape(b, q, h, d).transpose(0, 2, 1, 3).astype(compute)  # (B,H,Q,D)

    starts, _ = level_start_index(spatial_shapes)
    pieces = []
    for lvl, (hv, wv) in enumerate(spatial_shapes):
        x = loc[:, :, :, lvl, :, 0].astype(compute) * wv - 0.5  # (B,Q,H,P)
        y = loc[:, :, :, lvl, :, 1].astype(compute) * hv - 0.5
        cols = jnp.arange(wv, dtype=compute)
        rows = jnp.arange(hv, dtype=compute)
        hx = _hat(x[..., None] - cols).transpose(0, 2, 1, 3, 4)  # (B,H,Q,P,Wv)
        a_hy = (
            att[:, :, :, lvl, :, None].astype(compute) * _hat(y[..., None] - rows)
        ).transpose(0, 2, 1, 3, 4)  # (B,H,Q,P,Hv)

        def step(acc, operand):
            hx_p, ahy_p = operand  # (B,H,Q,Wv), (B,H,Q,Hv)
            m = (hx_p[..., :, None] * g4[..., None, :]).reshape(b, h, q, wv * d)
            acc = acc + jax.lax.dot_general(
                ahy_p,
                m,
                dimension_numbers=(((2,), (2,)), ((0, 1), (0, 1))),
                precision=precision,
                preferred_element_type=compute,
            ).reshape(b, h, hv, wv, d)
            return acc, None

        dv_l, _ = jax.lax.scan(
            step,
            jnp.zeros((b, h, hv, wv, d), compute),
            (hx.transpose(3, 0, 1, 2, 4), a_hy.transpose(3, 0, 1, 2, 4)),
        )
        pieces.append(dv_l.transpose(0, 2, 3, 1, 4).reshape(b, hv * wv, h, d))
    return jnp.concatenate(pieces, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_decoder(value, spatial_shapes, sampling_locations, attention_weights):
    """Production decoder MSDA: exact-gather forward, hybrid backward.

    Measured on v5e (round 2 probes): the gather forward is ~5 ms/layer while
    the dense forward is ~26 ms. Backward splits by destination:
      * d_loc / d_att: jax.vjp of the GATHER path w.r.t. (loc, att) only —
        re-reads the same 4 corners per point, no scatter is involved.
      * d_value: explicit separable matmul contraction (_dvalue_dense) — the
        scatter-shaped part is what made both autodiff backwards pathological
        (gather VJP ~2.0 s, dense VJP ~0.79 s per layer).
    """
    return ms_deform_attn(value, spatial_shapes, sampling_locations, attention_weights)


def _dec_fwd(value, spatial_shapes, sampling_locations, attention_weights):
    out = ms_deform_attn(value, spatial_shapes, sampling_locations, attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _dec_bwd(spatial_shapes, res, g):
    value, loc, att = res
    b, s, h, d = value.shape
    _, vjp_la = jax.vjp(
        lambda l, a: ms_deform_attn(value, spatial_shapes, l, a), loc, att
    )
    d_loc, d_att = vjp_la(g)
    d_value = _dvalue_dense(
        spatial_shapes, loc, att, g, b, s, h, d, jax.lax.Precision.DEFAULT
    ).astype(value.dtype)
    return d_value, d_loc, d_att


ms_deform_attn_decoder.defvjp(_dec_fwd, _dec_bwd)
