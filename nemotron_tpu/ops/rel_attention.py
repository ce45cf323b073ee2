"""Relative-position multi-head attention (Transformer-XL style, NeMo flavor).

TPU-native formulation of the reference's rel-pos MHA builders
(batch: src/nemo-ggml.cpp:668-755; cached/streaming: src/nemo-stream.cpp:463-573):

  - The reference realizes `rel_shift` with a pad->reshape->drop->slice memory
    trick. With static shapes the same permutation is a compile-time gather:
    out[i, j] = raw[i, j + qlen - 1 - i], which XLA lowers to one take_along_axis
    with a constant index matrix — no copies, fully fusable.
  - Batch and streaming share one implementation: streaming passes K/V caches
    ([B, cache_len, D]) and an additive validity mask; batch passes neither.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import nn

from .basic import linear

# Streaming chunks have tiny query lengths (T=1..14) and modest key lengths
# (~71-84): the score/context contractions become B*H batched [T,Dh]x[Dh,S]
# matmuls — thousands of near-empty MXU passes. With this flag those two
# contractions are formulated as broadcast multiply-reduce (VPU) instead.
VPU_ATTN = os.environ.get("NEMOTRON_TPU_VPU_ATTN", "0") == "1"

# T=1 streaming attention (80 ms mode): compute scores/context as broadcast
# multiply-reduce instead of batched M=1 matmuls. Decisive on TPU for two
# reasons: (a) M=1 batched dots waste 127/128 MXU rows, and (b) XLA fuses
# elementwise consumers into the K/V cache window SLICE — the dot formulation
# materializes a copy of the ~70 MB/layer window every chunk, the VPU one
# reads it straight from the cache buffer in HBM exactly once.
# NEMOTRON_TPU_T1_MXU_ATTN=1 restores the dot formulation for comparison.
T1_VPU_ATTN = os.environ.get("NEMOTRON_TPU_T1_MXU_ATTN", "0") != "1"

# Fused Pallas variant of the T=1 attention core (scores+softmax+context in
# one kernel; see ops/attn_pallas.py). Opt-in until measured faster than the
# XLA multiply-reduce path on the target hardware.
PALLAS_T1_ATTN = os.environ.get("NEMOTRON_TPU_PALLAS_ATTN", "0") == "1"


def _t1_scores(q_uh, kc, kn_h):
    """[B,H,1,Dh] queries vs [B,H,S,Dh] cache + [B,H,1,Dh] new frame ->
    content scores [B,H,1,S+1], accumulated in f32 on the VPU (all ops fuse
    with the cache read).

    kc may be a kvquant.QuantKV (int8 cache): the per-frame scale is constant
    across Dh, so it folds onto the [B,H,S] score AFTER the reduction — the
    big tensor still gets exactly one HBM read (at half the bytes) and one
    fused convert+multiply-accumulate per element."""
    from .kvquant import is_quant

    q32 = q_uh.astype(jnp.float32)
    if is_quant(kc):
        hist = (q32 * kc.q.astype(jnp.float32)).sum(-1) * kc.s  # [B,H,S]
    else:
        hist = (q32 * kc.astype(jnp.float32)).sum(-1)  # [B,H,S]
    new = (q32 * kn_h.astype(jnp.float32)).sum(-1)  # [B,H,1]
    return jnp.concatenate([hist, new], axis=-1)[:, :, None, :]


def _t1_context(weights, vc, vn_h):
    """weights [B,H,1,S+1] (f32), V cache [B,H,S,Dh] + new [B,H,1,Dh] ->
    context [B,H,1,Dh] f32 (VPU broadcast multiply-reduce, fused).

    vc may be a kvquant.QuantKV: its per-frame scale folds into the softmax
    weights ([B,H,S], cheap) before the multiply-reduce over the int8 buffer."""
    from .kvquant import is_quant

    if is_quant(vc):
        s = vc.q.shape[2]
        w_hist = (weights[:, :, 0, :s] * vc.s)[..., None]  # [B,H,S,1]
        v_hist = vc.q
    else:
        s = vc.shape[2]
        w_hist = weights[:, :, 0, :s, None]      # [B,H,S,1]
        v_hist = vc
    w_new = weights[:, :, 0, s:, None]       # [B,H,1,1]
    ctx = (w_hist * v_hist.astype(jnp.float32)).sum(2)
    ctx = ctx + (w_new * vn_h.astype(jnp.float32)).sum(2)
    return ctx[:, :, None, :]


def rel_shift_gather(pos_raw, klen: int):
    """pos_raw: [..., qlen, pos_len] -> [..., qlen, klen].

    out[..., i, j] = pos_raw[..., i, j + qlen - 1 - i]; with pos_len = 2*klen-1
    and qlen <= klen every index is in range.

    For streaming-sized qlen the shift is computed as a matmul against a
    constant one-hot selection tensor: TPU gathers move one element per cycle,
    which made take_along_axis the single largest cost of the streaming step
    (~10M gathered elements per chunk at B=128); the MXU does the same
    permutation as a batched [pos_len, klen] matmul essentially for free.
    """
    qlen = pos_raw.shape[-2]
    pos_len = pos_raw.shape[-1]
    idx = (
        jnp.arange(klen, dtype=jnp.int32)[None, :]
        - jnp.arange(qlen, dtype=jnp.int32)[:, None]
        + (qlen - 1)
    )  # [qlen, klen], constant
    if qlen <= 32:
        onehot = jax.nn.one_hot(idx, pos_len, dtype=pos_raw.dtype,
                                axis=1)  # [qlen, pos_len, klen] constant
        return jnp.einsum("...tp,tpk->...tk", pos_raw, onehot)
    # large qlen (batch mode): the reference's pad->reshape->drop->slice trick
    # (nemo-ggml.cpp:625-662) — pure layout ops, still zero gathers
    lead = pos_raw.shape[:-2]
    padded = jnp.pad(pos_raw,
                     [(0, 0)] * len(lead) + [(0, 0), (1, 0)])
    flat = padded.reshape(*lead, qlen * (pos_len + 1))
    out = flat[..., qlen : qlen + qlen * pos_len].reshape(*lead, qlen, pos_len)
    return out[..., :klen]


def rel_pos_mha_fullbuf(
    x,
    pos_emb,
    q_w,
    k_w,
    v_w,
    pos_w,
    out_w,
    bias_u,
    bias_v,
    n_heads: int,
    d_head: int,
    k_buf,
    v_buf,
    shift_onehot,
    attn_mask,
):
    """Streaming rel-pos MHA over the FULL phased slack buffer (zero copies).

    Instead of slicing the live [left_context] window out of the per-layer
    cache buffer (a strided copy XLA must materialize for the score matmul),
    scores are computed against ALL `S_buf` buffer slots; the static per-phase
    slot -> relative-position mapping is folded into `shift_onehot`
    ([T, pos_len, S_buf + T], columns of out-of-window slots all-zero) and
    `attn_mask` ([B, S_buf + T] additive; out-of-window and not-yet-valid slots
    at -1e9, so their softmax weight is exactly 0.0). Numerics are identical to
    the windowed path: masked slots contribute exp(-inf) = 0 to the softmax.

    x: [B, T, D]; k_buf/v_buf: [B, H, S_buf, Dh] HEAD-MAJOR per-layer views of
    the stacked cache (free views — this function never re-materializes them;
    head-major storage means the score/context contractions consume the cache
    directly, with no [B,S,D] -> [B,H,S,Dh] physical transpose of ~70 MB per
    layer per chunk).
    Returns (out [B, T, D], k_new, v_new) — new frames only, [B, H, T, Dh];
    the caller appends them at the static phase offset.
    """
    B, T, D = x.shape
    q = linear(x, q_w)
    k_new = linear(x, k_w)
    v_new = linear(x, v_w)

    pos = linear(pos_emb, pos_w)  # [pos_len, D]
    qh = q.reshape(B, T, n_heads, d_head)
    ph = pos.reshape(pos.shape[0], n_heads, d_head)
    q_u = jnp.transpose(qh + bias_u[None, None], (0, 2, 1, 3))  # [B,H,T,Dh]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d_head, dtype=x.dtype))

    from .kvquant import dequantize_kv, is_quant, kv_seq_len

    s_buf = kv_seq_len(k_buf, 2)
    kn_h = jnp.transpose(k_new.reshape(B, T, n_heads, d_head), (0, 2, 1, 3))
    vn_h = jnp.transpose(v_new.reshape(B, T, n_heads, d_head), (0, 2, 1, 3))

    pos_raw = jnp.einsum("bthd,phd->bhtp", qh + bias_v[None, None], ph)
    pos_sc = jnp.einsum("bhtp,tpk->bhtk", pos_raw, shift_onehot)
    if T == 1 and PALLAS_T1_ATTN:
        from ..audio.frontend import _pallas_interpret
        from .attn_pallas import t1_attention_core

        if is_quant(k_buf):  # opt-in comparison kernel: dequantized operands
            k_buf = dequantize_kv(k_buf, x.dtype)
            v_buf = dequantize_kv(v_buf, x.dtype)
        pm = (pos_sc.astype(jnp.float32) * scale)[:, :, 0, :] \
            + attn_mask.astype(jnp.float32)[:, None, :]
        ctx = t1_attention_core(
            q_u[:, :, 0, :], kn_h[:, :, 0, :], vn_h[:, :, 0, :], pm,
            k_buf, v_buf,
            interpret=_pallas_interpret(),
        )[:, :, None, :].astype(x.dtype)
    elif T == 1 and T1_VPU_ATTN:
        content = _t1_scores(q_u, k_buf, kn_h)
        scores = (content + pos_sc) * scale + attn_mask[:, None, None, :]
        weights = nn.softmax(scores.astype(jnp.float32), axis=-1)
        ctx = _t1_context(weights, v_buf, vn_h).astype(x.dtype)
    else:
        if is_quant(k_buf):
            # int8 cache on the MXU path: the dot consumes the int8 buffer
            # (converted on read); the per-frame scale folds onto the
            # [B,H,T,S] scores / softmax weights (constant across Dh).
            c_hist = jnp.einsum(
                "bhtd,bhsd->bhts", q_u, k_buf.q.astype(x.dtype)
            ) * k_buf.s[:, :, None, :].astype(x.dtype)
        else:
            c_hist = jnp.einsum("bhtd,bhsd->bhts", q_u, k_buf)
        content = jnp.concatenate(
            [c_hist, jnp.einsum("bhtd,bhsd->bhts", q_u, kn_h)],
            axis=-1,
        )  # [B, H, T, S_buf + T]
        scores = (content + pos_sc) * scale + attn_mask[:, None, None, :]
        weights = nn.softmax(scores, axis=-1)
        if is_quant(v_buf):
            w_hist = weights[..., :s_buf] * v_buf.s[:, :, None, :].astype(
                weights.dtype)
            ctx_hist = jnp.einsum("bhts,bhsd->bhtd", w_hist,
                                  v_buf.q.astype(x.dtype))
        else:
            ctx_hist = jnp.einsum("bhts,bhsd->bhtd", weights[..., :s_buf],
                                  v_buf)
        ctx = ctx_hist + jnp.einsum(
            "bhts,bhsd->bhtd", weights[..., s_buf:], vn_h
        )  # [B, H, T, Dh]
    ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(B, T, D)
    out = linear(ctx, out_w)
    return out, kn_h, vn_h


def rel_pos_mha(
    x,
    pos_emb,
    q_w,
    k_w,
    v_w,
    pos_w,
    out_w,
    bias_u,
    bias_v,
    n_heads: int,
    d_head: int,
    k_cache=None,
    v_cache=None,
    attn_mask=None,
    left_context: int | None = None,
    split_kv: bool = False,
):
    """Relative-position MHA over a batch.

    x:        [B, T, D]
    pos_emb:  [pos_len, D] with pos_len = 2*klen - 1 (descending NeMo order)
    k_cache / v_cache: head-major [B, H, cache_len, Dh] with split_kv;
              [B, cache_len, D] on the legacy non-split path; or None
    attn_mask: [B, klen] additive (0 valid / -1e9 masked) or None
    left_context: when set, also return updated K/V caches.

    split_kv (streaming fast path): NEVER materializes the [B, cache+T, D]
    concatenated K/V — scores against the cache and against the new frames are
    computed separately and concatenated at score size ([B, H, T, klen],
    ~1000x smaller), and the context is the sum of two matmuls. Caches are
    HEAD-MAJOR [B, H, cache_len, Dh] so the contractions consume them with no
    physical transpose; the returned (k_new, v_new) are [B, H, T, Dh] and the
    caller performs the buffer shift once for all layers (see
    stream_encode_step). Numerics identical.

    Returns out [B, T, D], or (out, k_out, v_out).
    """
    B, T, D = x.shape
    q = linear(x, q_w)
    k_new = linear(x, k_w)
    v_new = linear(x, v_w)

    pos = linear(pos_emb, pos_w)  # [pos_len, D]
    pos_len = pos.shape[0]
    qh = q.reshape(B, T, n_heads, d_head)
    ph = pos.reshape(pos_len, n_heads, d_head)
    q_u = qh + bias_u[None, None]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d_head, dtype=x.dtype))

    if split_kv and k_cache is not None:
        from .kvquant import is_quant, kv_seq_len

        cache_len = kv_seq_len(k_cache, 2)
        klen = cache_len + T
        q_uh = jnp.transpose(q_u, (0, 2, 1, 3))  # [B, H, T, Dh]
        kn_h = jnp.transpose(k_new.reshape(B, T, n_heads, d_head), (0, 2, 1, 3))
        vn_h = jnp.transpose(v_new.reshape(B, T, n_heads, d_head), (0, 2, 1, 3))

        pos_raw = jnp.einsum("bthd,phd->bhtp", qh + bias_v[None, None], ph)
        pos_sc = rel_shift_gather(pos_raw, klen)
        if T == 1 and T1_VPU_ATTN:
            content = _t1_scores(q_uh, k_cache, kn_h)
            scores = (content + pos_sc) * scale
            if attn_mask is not None:
                scores = scores + attn_mask[:, None, None, :]
            weights = nn.softmax(scores.astype(jnp.float32), axis=-1)
            ctx = _t1_context(weights, v_cache, vn_h).astype(x.dtype)
        else:
            if is_quant(k_cache):
                c_hist = jnp.einsum(
                    "bhtd,bhsd->bhts", q_uh, k_cache.q.astype(x.dtype)
                ) * k_cache.s[:, :, None, :].astype(x.dtype)
            else:
                c_hist = jnp.einsum("bhtd,bhsd->bhts", q_uh, k_cache)
            content = jnp.concatenate(
                [c_hist, jnp.einsum("bhtd,bhsd->bhts", q_uh, kn_h)],
                axis=-1,
            )  # [B, H, T, klen]
            scores = (content + pos_sc) * scale
            if attn_mask is not None:
                scores = scores + attn_mask[:, None, None, :]
            weights = nn.softmax(scores, axis=-1)
            w_hist = weights[..., :cache_len]
            w_new = weights[..., cache_len:]
            if is_quant(v_cache):
                w_hist = w_hist * v_cache.s[:, :, None, :].astype(w_hist.dtype)
                ctx_hist = jnp.einsum("bhts,bhsd->bhtd", w_hist,
                                      v_cache.q.astype(x.dtype))
            else:
                ctx_hist = jnp.einsum("bhts,bhsd->bhtd", w_hist, v_cache)
            ctx = ctx_hist + jnp.einsum(
                "bhts,bhsd->bhtd", w_new, vn_h
            )  # [B, H, T, Dh]
        ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(B, T, D)
        out = linear(ctx, out_w)
        return out, kn_h, vn_h

    if k_cache is not None:
        k = jnp.concatenate([k_cache, k_new], axis=1)
        v = jnp.concatenate([v_cache, v_new], axis=1)
    else:
        k, v = k_new, v_new
    klen = k.shape[1]

    caches_out = None
    if left_context is not None:
        n_keep = min(klen, left_context)
        caches_out = (k[:, klen - n_keep :], v[:, klen - n_keep :])

    kh = k.reshape(B, klen, n_heads, d_head)
    vh = v.reshape(B, klen, n_heads, d_head)

    # content: (q + u) @ k^T ; position: (q + v) @ pos^T then rel-shift
    if VPU_ATTN and T <= 16:
        # [B,T,1,H,Dh] * [B,1,S,H,Dh] -> sum Dh -> [B,H,T,S]
        content = jnp.transpose(
            (q_u[:, :, None] * kh[:, None]).sum(-1), (0, 3, 1, 2)
        )
    else:
        content = jnp.einsum("bthd,bshd->bhts", q_u, kh)
    pos_raw = jnp.einsum("bthd,phd->bhtp", qh + bias_v[None, None], ph)
    pos_sc = rel_shift_gather(pos_raw, klen)

    scores = (content + pos_sc) * scale
    if attn_mask is not None:
        scores = scores + attn_mask[:, None, None, :]

    weights = nn.softmax(scores, axis=-1)
    if VPU_ATTN and T <= 16:
        # [B,T,S,H,1] * [B,1,S,H,Dh] -> sum S -> [B,T,H,Dh]
        w_tshd = jnp.transpose(weights, (0, 2, 3, 1))  # [B,T,S,H]
        ctx = (w_tshd[..., None] * vh[:, None]).sum(2).reshape(B, T, D)
    else:
        ctx = jnp.einsum("bhts,bshd->bthd", weights, vh).reshape(B, T, D)
    out = linear(ctx, out_w)
    if caches_out is not None:
        return out, caches_out[0], caches_out[1]
    return out
