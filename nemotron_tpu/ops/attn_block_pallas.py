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

Grid design (two-level, head-split):
    grid = (B // bb_big, (bb_big // bb_sub) * H);  j = sub_row * H + head
    j == 0:      LN + QKV for the whole bb_big row tile (MXU-efficient M),
                 pos scores via per-head [bb_big, Dh] @ [Dh, S+1] matmuls,
                 new-frame scores, k_new/v_new written out
    every j:     content scores + softmax + context for one (bb_sub row,
                 head) pair against its [bb_sub, S, Dh] cache slab (the only
                 big HBM traffic; Mosaic double-buffers it across j). One
                 head per step keeps the slab ~0.2 MB so the pipeline fits
                 v5e's ~16 MB VMEM next to the four resident [D, D] weights.
    j == last:   per-head ctx . out_w slices + residual for the bb_big tile

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


def _dot_t(a, b):
    """a [M, K] . b [N, K] -> [M, N] (contract on dim 1 of both).

    dot_general instead of `a @ b.T`: an in-kernel transpose is a separate
    Mosaic relayout op; the MXU contracts either operand axis natively.
    """
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _block_kernel(x_ref, lnw_ref, lnb_ref, qw_ref, kw_ref, vw_ref, ow_ref,
                  bu_ref, bv_ref, pp_ref, mask_ref, k_ref, v_ref,
                  out_ref, kn_ref, vn_ref,
                  q_scr, pos_scr, vn_scr, ctx_scr,
                  *, scale: float, n_heads: int, d_head: int, bb_sub: int,
                  eps: float):
    # Mosaic-lowering constraints shape this kernel (CLAUDE.md gotchas):
    # no lane-splitting reshapes ([Bb, D] -> [Bb, H, Dh] is a relayout),
    # no unit-dim inserts on unaligned trailing dims, no transposes. So the
    # prolog works per head on 128-aligned 2D lane slices and stages into
    # HEAD-MAJOR 3D scratches; the body then matches the proven-on-TPU
    # constructs of ops/attn_pallas.py (3D reads, trailing expand_dims,
    # lane-axis concat).
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    s_buf = k_ref.shape[2]
    # j enumerates (sub-row, head) pairs, head fastest; the K/V block fetched
    # per step is one head's [bs, S, Dh] slab (~0.2 MB) — small enough that
    # the double-buffered copies plus the four resident [D, D] weights fit
    # v5e's ~16 MB VMEM (the all-heads block was 1.6 MB and OOMed the stack).
    jr = j // n_heads
    h_dyn = j % n_heads

    @pl.when(j == 0)
    def _prolog():
        x = x_ref[:].astype(jnp.float32)            # [Bb, D]
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + eps) * lnw_ref[:] + lnb_ref[:]
        y = y.astype(x_ref.dtype)
        q = _dot_t(y, qw_ref[:])                     # [Bb, D] f32
        kn = _dot_t(y, kw_ref[:])
        vn = _dot_t(y, vw_ref[:])
        q_u = q + bu_ref[:]                          # [Bb, D] (+bias_u flat)
        q_v = q + bv_ref[:]
        kn_ref[:] = kn.astype(kn_ref.dtype)
        vn_ref[:] = vn.astype(vn_ref.dtype)
        bb = q.shape[0]
        m2 = mask_ref[:].astype(jnp.float32)         # [Bb, S+1]
        # one-hot of the new-frame column (lane iota, no reshape)
        lane = jax.lax.broadcasted_iota(jnp.int32, (bb, s_buf + 1), 1)
        newcol = (lane == s_buf).astype(jnp.float32)
        for h in range(n_heads):
            hs = slice(h * d_head, (h + 1) * d_head)  # 128-aligned lanes
            qh_u = q_u[:, hs]
            q_scr[h, :, :] = qh_u
            vn_scr[h, :, :] = vn[:, hs]
            # new-frame content score: lane reduce, kept 2D [Bb, 1]
            nsc_h = (qh_u * kn[:, hs]).sum(-1, keepdims=True)
            # pos scores [Bb, S+1]; fold in scale, the new-frame score and
            # the additive mask so the body only adds this one term
            posh = jax.lax.dot_general(
                q_v[:, hs], pp_ref[h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            pos_scr[h, :, :] = (posh + nsc_h * newcol) * scale + m2

    rows = pl.ds(jr * bb_sub, bb_sub)
    q2 = q_scr[h_dyn, rows, :]                       # [bs, Dh]
    k2 = k_ref[:, 0].astype(jnp.float32)             # [bs, S, Dh]
    v2 = v_ref[:, 0].astype(jnp.float32)
    content = (q2[:, None, :] * k2).sum(-1)          # [bs, S]
    pad = jnp.zeros((content.shape[0], 1), jnp.float32)
    scores = (jnp.concatenate([content, pad], axis=-1) * scale
              + pos_scr[h_dyn, rows, :])             # [bs, S+1]
    w = jax.nn.softmax(scores, axis=-1)
    w_hist = jax.lax.slice_in_dim(w, 0, s_buf, axis=1)
    w_new = jax.lax.slice_in_dim(w, s_buf, s_buf + 1, axis=1)
    ctx = (w_hist[:, :, None] * v2).sum(1)           # [bs, Dh]
    ctx_scr[h_dyn, rows, :] = ctx + w_new * vn_scr[h_dyn, rows, :]

    @pl.when(j == n_j - 1)
    def _epilog():
        acc = x_ref[:].astype(jnp.float32)           # residual
        for h in range(n_heads):
            ctx_h = ctx_scr[h, :, :].astype(x_ref.dtype)   # [Bb, Dh]
            acc = acc + _dot_t(ctx_h, ow_ref[:, h * d_head:(h + 1) * d_head])
        out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "n_heads", "d_head", "bb_big", "bb_sub", "interpret", "eps"))
def t1_attention_block(x, ln_w, ln_b, q_w, k_w, v_w, out_w, bias_u, bias_v,
                       pp, mask, k_buf, v_buf, *, n_heads: int, d_head: int,
                       bb_big: int = 128, bb_sub: int = 8,
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
    grid = (B // bb, (bb // bs) * n_heads)  # j = sub_row * H + head

    kernel = functools.partial(
        _block_kernel, scale=scale, n_heads=n_heads, d_head=d_head,
        bb_sub=bs, eps=eps)

    const = lambda i, j: (0, 0)  # noqa: E731
    big_row = lambda i, j: (i, 0)  # noqa: E731
    # one head's [bs, S, Dh] slab per grid step
    sub_row4 = lambda i, j, _nj=bb // bs, _h=n_heads: (  # noqa: E731
        i * _nj + j // _h, j % _h, 0, 0)

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
            pl.BlockSpec((bb, s_buf + 1), big_row),
            pl.BlockSpec((bs, 1, s_buf, d_head), sub_row4),
            pl.BlockSpec((bs, 1, s_buf, d_head), sub_row4),
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
            # head-major: dynamic per-step head index lands on the untiled
            # leading dim (sublane/lane dims stay statically indexed)
            pltpu.VMEM((n_heads, bb, d_head), jnp.float32),   # q + bias_u
            pltpu.VMEM((n_heads, bb, s_buf + 1), jnp.float32),  # pos+nsc+mask
            pltpu.VMEM((n_heads, bb, d_head), jnp.float32),   # v_new (f32)
            pltpu.VMEM((n_heads, bb, d_head), jnp.float32),   # context
        ],
        interpret=interpret,
    )(x, ln_w[None, :], ln_b[None, :], q_w, k_w, v_w, out_w,
      bias_u.reshape(1, -1), bias_v.reshape(1, -1), pp, mask, k_buf, v_buf)
    return out, (k_new.reshape(B, n_heads, d_head),
                 v_new.reshape(B, n_heads, d_head))
