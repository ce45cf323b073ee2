"""Fused Pallas kernel for the T=1 streaming rel-attention core.

One kernel per conformer layer computes, for the 80 ms (chunk_len=1) mode:

    scores  = (q_u . K_buf) * scale + pos_mask          (VPU multiply-reduce)
    weights = softmax(scores)                           (f32)
    ctx     = weights . V_buf + w_new * v_new           (VPU multiply-reduce)

versus the XLA formulation it replaces (ops/rel_attention._t1_scores /
_t1_context): K/V stream HBM -> VMEM exactly once with the pallas grid
pipelining per-B-block copies (double buffered), and the scores/weights
intermediates never reach HBM. The K/V buffers are read-only here — the
new-frame append stays the caller's single batched dynamic_update_slice
(aliasing the buffers through the kernel would force a full write-back,
doubling HBM traffic).

The slot -> relative-position mapping and the validity mask arrive folded
into one additive `pos_mask` [B, S_buf + 1] term (computed in XLA — tiny),
exactly like the full-buffer formulation in models/encoder.py.

Reference semantics: cached rel-pos MHA, src/nemo-stream.cpp:463-573.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _attn_kernel(q_ref, kn_ref, vn_ref, pm_ref, k_ref, v_ref, ctx_ref,
                 *, scale: float):
    # q/kn/vn: [Bb, H, Dh]; pm: [Bb, H, S+1]; k/v: [Bb, H, S, Dh]
    q = q_ref[:].astype(jnp.float32)
    kn = kn_ref[:].astype(jnp.float32)
    vn = vn_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    pm = pm_ref[:].astype(jnp.float32)  # [Bb, H, S+1]: pos*scale + mask

    content = (jnp.expand_dims(q, 2) * k).sum(-1)     # [Bb, H, S]
    c_new = jnp.expand_dims((q * kn).sum(-1), -1)     # [Bb, H, 1]
    scores = jnp.concatenate([content, c_new], axis=-1) * scale + pm
    w = jax.nn.softmax(scores, axis=-1)               # [Bb, H, S+1]

    s_buf = k.shape[2]
    w_hist = jax.lax.slice_in_dim(w, 0, s_buf, axis=2)
    w_new = jax.lax.slice_in_dim(w, s_buf, s_buf + 1, axis=2)  # [Bb,H,1]
    ctx = (jnp.expand_dims(w_hist, -1) * v).sum(2)    # [Bb, H, Dh]
    ctx = ctx + w_new * vn                            # lane-broadcast
    ctx_ref[:] = ctx.astype(ctx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def t1_attention_core(q_u, k_new, v_new, pos_mask, k_buf, v_buf,
                      *, block_b: int = 16, interpret: bool = False):
    """Fused T=1 streaming attention against the full slack buffer.

    q_u:         [B, H, Dh]  (query + bias_u, head-major)
    k_new/v_new: [B, H, Dh]  the new frame's K/V
    pos_mask:    [B, H, S_buf + 1] additive: pos_scores*scale + validity mask
    k_buf/v_buf: [B, H, S_buf, Dh] per-layer cache views (read-only)

    Returns ctx [B, H, Dh] in k_buf.dtype.
    """
    B, H, Dh = q_u.shape
    s_buf = k_buf.shape[2]
    scale = 1.0 / (Dh ** 0.5)
    bb = min(block_b, B)
    while B % bb:
        bb -= 1
    grid = (B // bb,)

    in_specs = [
        pl.BlockSpec((bb, H, Dh), lambda i: (i, 0, 0)),
        pl.BlockSpec((bb, H, Dh), lambda i: (i, 0, 0)),
        pl.BlockSpec((bb, H, Dh), lambda i: (i, 0, 0)),
        pl.BlockSpec((bb, H, s_buf + 1), lambda i: (i, 0, 0)),
        pl.BlockSpec((bb, H, s_buf, Dh), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((bb, H, s_buf, Dh), lambda i: (i, 0, 0, 0)),
    ]
    ctx = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, H, Dh), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Dh), k_buf.dtype),
        interpret=interpret,
    )(q_u, k_new, v_new, pos_mask, k_buf, v_buf)
    return ctx
