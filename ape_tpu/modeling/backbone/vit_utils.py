"""ViT backbone utilities: window partition, 2D axial RoPE tables, abs-pos
interpolation, patch embedding helpers.

Capability match: /root/reference/ape/modeling/backbone/utils_eva02.py
(window_partition/unpartition :19-64, get_abs_pos :158-188, PatchEmbed :190-227,
VisionRotaryEmbeddingFast :312-346). Implemented from scratch for JAX/NHWC;
bicubic position-embedding interpolation reproduces torch's a=-0.75 Keys kernel
exactly via precomputed separable interpolation matrices (two small matmuls —
MXU-friendly, no gather).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp


def window_partition(x: jnp.ndarray, window: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """(B, H, W, C) -> (B * nWin, window, window, C), padding H/W up as needed."""
    b, h, w, c = x.shape
    pad_h = (window - h % window) % window
    pad_w = (window - w % window) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (hp, wp)


def window_unpartition(
    windows: jnp.ndarray, window: int, pad_hw: Tuple[int, int], hw: Tuple[int, int]
) -> jnp.ndarray:
    """Inverse of window_partition, cropping any padding."""
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // (hp * wp // window // window)
    x = windows.reshape(b, hp // window, wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


@functools.lru_cache(maxsize=32)
def rope_2d_table(
    half_head_dim: int, seq_len: int, pt_seq_len: int = 16, theta: float = 10000.0
) -> Tuple[np.ndarray, np.ndarray]:
    """EVA-02 "fast" 2D axial RoPE tables.

    Returns (cos, sin) of shape (seq_len*seq_len, 2*half_head_dim) = (tokens, head_dim).
    Frequencies are the standard theta schedule over half the axial dim; positions
    are rescaled by pt_seq_len/seq_len so fine-tune resolutions interpolate the
    pretraining table (``intp_freq`` in the reference).
    """
    dim = half_head_dim  # rotary dim per spatial axis
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2].astype(np.float64) / dim))
    t = np.arange(seq_len, dtype=np.float64) / seq_len * pt_seq_len
    f = np.einsum("n,f->nf", t, freqs)  # (seq, dim/2)
    f = np.repeat(f, 2, axis=-1)  # (seq, dim)
    # broadcast-concat rows (h) and cols (w): (seq, seq, 2*dim)
    fh = np.broadcast_to(f[:, None, :], (seq_len, seq_len, dim))
    fw = np.broadcast_to(f[None, :, :], (seq_len, seq_len, dim))
    full = np.concatenate([fh, fw], axis=-1).reshape(seq_len * seq_len, 2 * dim)
    return np.cos(full).astype(np.float32), np.sin(full).astype(np.float32)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    """Pairwise rotation: (x0, x1, x2, x3, ...) -> (-x1, x0, -x3, x2, ...)."""
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(*x.shape[:-2], -1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (..., tokens, head_dim); cos/sin: (tokens, head_dim)."""
    return x * cos + rotate_half(x) * sin


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel (torch's bicubic uses a=-0.75)."""
    ax = np.abs(x)
    w = np.where(
        ax <= 1,
        (a + 2) * ax**3 - (a + 3) * ax**2 + 1,
        np.where(ax < 2, a * ax**3 - 5 * a * ax**2 + 8 * a * ax - 4 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=64)
def bicubic_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) matrix M with (M @ v) == torch bicubic interpolation of v
    (align_corners=False, border-replicate index clamping, unnormalized kernel —
    matching torch's upsample_bicubic2d exactly)."""
    m = np.zeros((out_size, in_size), dtype=np.float64)
    scale = in_size / out_size
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        i0 = int(np.floor(src))
        frac = src - i0
        # 4 taps at i0-1 .. i0+2 with Keys weights
        for k in range(-1, 3):
            wgt = _cubic_kernel(np.array(k - frac))[()]
            idx = min(max(i0 + k, 0), in_size - 1)
            m[i, idx] += wgt
    return m.astype(np.float32)


def resize_abs_pos(
    abs_pos: jnp.ndarray, has_cls_token: bool, hw: Tuple[int, int]
) -> jnp.ndarray:
    """Bicubic-resize pretraining position embeddings to the token grid.

    abs_pos: (1, num_positions, C) (optionally with a leading cls token).
    Returns (1, h, w, C). Matches get_abs_pos (utils_eva02.py:158-188).
    """
    h, w = hw
    if has_cls_token:
        abs_pos = abs_pos[:, 1:]
    n = abs_pos.shape[1]
    size = int(round(float(np.sqrt(n))))
    assert size * size == n, f"non-square pos embed: {n}"
    grid = abs_pos.reshape(size, size, -1)
    if size == h and size == w:
        return grid[None]
    my = jnp.asarray(bicubic_resize_matrix(size, h))
    mx = jnp.asarray(bicubic_resize_matrix(size, w))
    out = jnp.einsum("hs,stc->htc", my, grid)
    out = jnp.einsum("wt,htc->hwc", mx, out)
    return out[None]


def get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Relative position table slice for decomposed rel-pos attention
    (reference utils_eva02.py:66-118 semantics): linearly resize the table to
    2*max(q,k)-1 entries, then index by scaled coordinate deltas."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos, (max_rel_dist, rel_pos.shape[1]), method="linear"
        )
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[jnp.asarray(rel.astype(np.int64))]


def add_decomposed_rel_pos(
    attn: jnp.ndarray,  # (B*H?, qh*qw, kh*kw)
    q: jnp.ndarray,  # (B*H?, qh*qw, head_dim)
    rel_pos_h: jnp.ndarray,
    rel_pos_w: jnp.ndarray,
    q_hw,
    k_hw,
) -> jnp.ndarray:
    """attn + decomposed relative position biases (utils_eva02.py:120-157)."""
    qh, qw = q_hw
    kh, kw = k_hw
    rh = get_rel_pos(qh, kh, rel_pos_h)  # (qh, kh, dim)
    rw = get_rel_pos(qw, kw, rel_pos_w)
    b = q.shape[0]
    r_q = q.reshape(b, qh, qw, -1)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, rh.astype(q.dtype))
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, rw.astype(q.dtype))
    attn = attn.reshape(b, qh, qw, kh, kw)
    attn = attn + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
    return attn.reshape(b, qh * qw, kh * kw)
