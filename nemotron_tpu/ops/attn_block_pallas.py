"""Fused Pallas kernel for the T=1 streaming attention BLOCK of a conformer
layer: LN -> QKV projections -> rel-pos scores -> softmax -> context -> out
projection -> residual add, in ONE kernel per layer.

Why this exists (round-3 lever, PERF.md): the attention-only Pallas core
(ops/attn_pallas.py) measured 2.3x slower than XLA's fused multiply-reduce —
it had no MXU work to hide the K/V cache streaming behind, while XLA could
overlap the cache read with neighboring projection matmuls. This kernel
brings those matmuls INSIDE, so the grid's double-buffered [bb_sub] cache
block fetches overlap the LN/QKV/out MXU work, and none of the per-layer
intermediates (y, q, scores, weights, ctx) ever reach HBM.

Grid design (two-level):
    grid = (B // bb_big, bb_big // bb_sub)
    j == 0:      LN + QKV for the whole bb_big row tile (MXU-efficient M),
                 pos scores via per-head [bb_big, Dh] @ [Dh, S+1] matmuls,
                 new-frame scores, k_new/v_new written out
    every j:     content scores + softmax + context for one bb_sub row tile
                 against its [bb_sub, H, S, Dh] cache block (the only big
                 HBM traffic; Mosaic double-buffers it across j)
    j == last:   ctx @ out_w^T + residual for the whole bb_big tile

The position term arrives pre-shifted: pp[h, d, s] is the phase's
slot -> relative-position projection (built in XLA from the pos table, the
per-phase one-hot and the layer's pos weight — tiny), so inside the kernel
the rel-shift is just another contraction over Dh. The K/V buffers are
read-only; the new-frame append stays the caller's single batched
dynamic_update_slice (aliasing them through the kernel would force a full
write-back, doubling the dominant HBM traffic).

Semantics identical to models/encoder.conformer_layer's attention sub-block
in the unrolled fast path (rel_pos_mha_fullbuf); reference: cached rel-pos
MHA, src/nemo-stream.cpp:463-573.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_kernel(x_ref, lnw_ref, lnb_ref, qw_ref, kw_ref, vw_ref, ow_ref,
                  bu_ref, bv_ref, pp_ref, mask_ref, k_ref, v_ref,
                  out_ref, kn_ref, vn_ref,
                  q_scr, pos_scr, nsc_scr, vn_scr, ctx_scr,
                  *, scale: float, n_heads: int, d_head: int, bb_sub: int,
                  eps: float):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    s_buf = k_ref.shape[2]

    @pl.when(j == 0)
    def _prolog():
        x = x_ref[:].astype(jnp.float32)            # [Bb, D]
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + eps) * lnw_ref[:] + lnb_ref[:]
        y = y.astype(x_ref.dtype)
        q = jnp.dot(y, qw_ref[:].T, preferred_element_type=jnp.float32)
        kn = jnp.dot(y, kw_ref[:].T, preferred_element_type=jnp.float32)
        vn = jnp.dot(y, vw_ref[:].T, preferred_element_type=jnp.float32)
        q_u = q + bu_ref[:]                          # [Bb, D] (+bias_u flat)
        q_v = q + bv_ref[:]
        q_scr[:] = q_u
        kn_ref[:] = kn.astype(kn_ref.dtype)
        vn_ref[:] = vn.astype(vn_ref.dtype)
        vn_scr[:] = vn
        # new-frame content score per head: sum over Dh of q_u * k_new
        bb = q.shape[0]
        qu3 = q_u.reshape(bb, n_heads, d_head)
        kn3 = kn.reshape(bb, n_heads, d_head)
        nsc_scr[:] = (qu3 * kn3).sum(-1)             # [Bb, H]
        # position scores: per head [Bb, Dh] @ [Dh, S+1]
        for h in range(n_heads):
            qh = q_v[:, h * d_head : (h + 1) * d_head]
            pos_scr[:, h, :] = jnp.dot(
                qh.astype(jnp.float32), pp_ref[h],
                preferred_element_type=jnp.float32)

    rows = pl.ds(j * bb_sub, bb_sub)
    q_u = q_scr[rows, :].reshape(bb_sub, n_heads, d_head)
    k = k_ref[:].astype(jnp.float32)                 # [bs, H, S, Dh]
    v = v_ref[:].astype(jnp.float32)
    content = (jnp.expand_dims(q_u, 2) * k).sum(-1)  # [bs, H, S]
    c_new = nsc_scr[rows, :][:, :, None]             # [bs, H, 1]
    raw = jnp.concatenate([content, c_new], axis=-1) + pos_scr[rows, :, :]
    scores = raw * scale + mask_ref[:][:, None, :]   # mask: [bs, S+1]
    w = jax.nn.softmax(scores, axis=-1)
    w_hist = jax.lax.slice_in_dim(w, 0, s_buf, axis=2)
    w_new = jax.lax.slice_in_dim(w, s_buf, s_buf + 1, axis=2)
    ctx = (jnp.expand_dims(w_hist, -1) * v).sum(2)   # [bs, H, Dh]
    vn3 = vn_scr[rows, :].reshape(bb_sub, n_heads, d_head)
    ctx = ctx + w_new * vn3
    ctx_scr[rows, :] = ctx.reshape(bb_sub, n_heads * d_head)

    @pl.when(j == n_j - 1)
    def _epilog():
        out = jnp.dot(ctx_scr[:].astype(x_ref.dtype), ow_ref[:].T,
                      preferred_element_type=jnp.float32)
        out_ref[:] = (x_ref[:].astype(jnp.float32) + out).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "n_heads", "d_head", "bb_big", "bb_sub", "interpret", "eps"))
def t1_attention_block(x, ln_w, ln_b, q_w, k_w, v_w, out_w, bias_u, bias_v,
                       pp, mask, k_buf, v_buf, *, n_heads: int, d_head: int,
                       bb_big: int = 256, bb_sub: int = 8,
                       eps: float = 1e-5, interpret: bool = False):
    """Fused attention block for one layer at T=1.

    x:           [B, D] residual input (pre-LN)
    ln_w/ln_b:   [D]
    q/k/v/out_w: [D, D] (PyTorch (out, in) orientation)
    bias_u/v:    [H, Dh]
    pp:          [H, Dh, S_buf + 1] f32 — phase-shifted position projection
                 (pp[h, d, s] = sum_p pos_proj[p, h, d] * onehot[0, p, s])
    mask:        [B, S_buf + 1] additive validity/window mask
    k_buf/v_buf: [B, H, S_buf, Dh] per-layer cache views (read-only)

    Returns (out [B, D] = x + attn, k_new [B, H, Dh], v_new [B, H, Dh]).
    """
    B, D = x.shape
    s_buf = k_buf.shape[2]
    scale = 1.0 / (d_head ** 0.5)
    bb = min(bb_big, B)
    while B % bb:
        bb -= 1
    bs = min(bb_sub, bb)
    while bb % bs:
        bs -= 1
    grid = (B // bb, bb // bs)

    kernel = functools.partial(
        _block_kernel, scale=scale, n_heads=n_heads, d_head=d_head,
        bb_sub=bs, eps=eps)

    const = lambda i, j: (0, 0)  # noqa: E731
    big_row = lambda i, j: (i, 0)  # noqa: E731
    sub_row3 = lambda i, j, _nj=bb // bs: (i * _nj + j, 0)  # noqa: E731
    sub_row4 = lambda i, j, _nj=bb // bs: (i * _nj + j, 0, 0, 0)  # noqa: E731

    out, k_new, v_new = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, D), big_row),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((D, D), const),
            pl.BlockSpec((D, D), const),
            pl.BlockSpec((D, D), const),
            pl.BlockSpec((D, D), const),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((1, D), const),
            pl.BlockSpec((n_heads, d_head, s_buf + 1), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((bs, s_buf + 1), sub_row3),
            pl.BlockSpec((bs, n_heads, s_buf, d_head), sub_row4),
            pl.BlockSpec((bs, n_heads, s_buf, d_head), sub_row4),
        ],
        out_specs=[
            pl.BlockSpec((bb, D), big_row),
            pl.BlockSpec((bb, D), big_row),
            pl.BlockSpec((bb, D), big_row),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D), x.dtype),
            jax.ShapeDtypeStruct((B, D), x.dtype),
            jax.ShapeDtypeStruct((B, D), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bb, D), jnp.float32),                 # q + bias_u
            pltpu.VMEM((bb, n_heads, s_buf + 1), jnp.float32),  # pos scores
            pltpu.VMEM((bb, n_heads), jnp.float32),           # new-frame sc
            pltpu.VMEM((bb, D), jnp.float32),                 # v_new (f32)
            pltpu.VMEM((bb, D), jnp.float32),                 # context
        ],
        interpret=interpret,
    )(x, ln_w[None, :], ln_b[None, :], q_w, k_w, v_w, out_w,
      bias_u.reshape(1, -1), bias_v.reshape(1, -1), pp, mask, k_buf, v_buf)
    return out, (k_new.reshape(B, n_heads, d_head),
                 v_new.reshape(B, n_heads, d_head))
