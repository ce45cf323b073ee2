"""FastConformer encoder: batch mode and cache-aware streaming mode.

Both modes run the 24 conformer layers as a single `lax.scan` over stacked layer
parameters — one compiled layer body regardless of depth. The streaming mode is
a pure function of (params, caches, chunk): K/V caches [L, B, 70, D], conv
caches [L, B, K-1, D] and a per-stream cache-validity counter reproduce the
reference's consolidated cache tensors (src/nemo-stream.h:140-174) as carried
scan state instead of mutable graph buffers.

Reference semantics: batch encoder nemo-ggml.cpp:1038-1079; streaming encoder
nemo-stream.cpp:132-267 (drop_extra_pre_encoded, centered pos-emb slice,
additive validity mask from cache_valid_len at :1034-1045).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

# Unroll factor for the scan over conformer layers. Unrolling lets XLA
# schedule across layer boundaries (less per-iteration overhead) at the cost
# of compile time; tune via env for benchmarking.
LAYER_SCAN_UNROLL = int(os.environ.get("NEMOTRON_TPU_LAYER_UNROLL", "1"))

from ..config import CacheConfig, Hparams
from ..ops.basic import ffn, glu, layer_norm, linear
from ..ops.conv import conv_subsampling, depthwise_causal_conv1d
from ..ops.kvquant import (
    is_quant,
    kv_concat,
    kv_layer,
    kv_roll,
    kv_seq_len,
    kv_slice,
    kv_update_slice,
    kv_where,
    quantize_kv,
)
from ..ops.rel_attention import rel_pos_mha, rel_pos_mha_fullbuf

# Fast-path layer stack style. Default: UNROLLED Python loop with static
# per-layer views of the stacked weights/caches + full-slack-buffer attention
# (rel_pos_mha_fullbuf). Measured 10.0 vs 12.5 ms encoder at B=256 on v5e
# against the lax.scan formulation: scan materializes each layer's K/V xs
# slice as a real copy every iteration, the unrolled static views don't.
# (The unrolled form only wins combined with head-major caches + the T=1 VPU
# attention — with MXU dot attention the operands get materialized anyway and
# unrolled measured slower, 19.1 ms.) NEMOTRON_TPU_SCAN_LAYERS=1 restores the
# scan (smaller graphs, faster compiles).
SCAN_LAYERS = os.environ.get("NEMOTRON_TPU_SCAN_LAYERS", "0") == "1"

# Fused Pallas attention BLOCK (LN + QKV + T=1 attention + out-proj +
# residual in one kernel per layer, ops/attn_block_pallas.py) on the
# unrolled fast path. Opt-in until measured faster than XLA's fusion on the
# target hardware (the attention-only kernel measured 2.3x slower; this one
# gives Mosaic the projection matmuls to hide the cache streaming behind).
PALLAS_ATTN_BLOCK = os.environ.get(
    "NEMOTRON_TPU_PALLAS_ATTN_BLOCK", "0") == "1"
# sub-row tile: larger -> fewer grid steps (less per-step overhead) but a
# bigger double-buffered K/V slab (VMEM)
PALLAS_ATTN_BLOCK_BS = int(os.environ.get(
    "NEMOTRON_TPU_PALLAS_ATTN_BLOCK_BS", "8"))


def conformer_layer(
    x,
    pos_emb,
    lp,
    hp: Hparams,
    k_cache=None,
    v_cache=None,
    conv_cache=None,
    attn_mask=None,
    left_context: int | None = None,
    split_kv: bool = False,
    shift_onehot=None,
    attn_block=None,
):
    """One conformer layer (batch or cached). x: [B, T, D].

    Structure (nemo-ggml.cpp:845-890): x + .5*FFN1 -> +MHA -> +Conv -> +.5*FFN2
    -> final LN. Cached mode returns (y, k_out, v_out, conv_cache'); with
    split_kv the k/v outputs are the NEW frames only (caller shifts the
    buffers once for all layers — avoids rematerializing the 70-frame caches
    per layer, which was ~45% of the streaming step).

    attn_block: optional fused replacement for the whole attention sub-block
    (LN + MHA + residual): callable res -> (res', k_new, v_new). Used by the
    Pallas fused-block path (ops/attn_block_pallas.py).
    """
    cached = left_context is not None
    res = x
    cur = layer_norm(res, lp.norm_ff1_w, lp.norm_ff1_b)
    res = res + 0.5 * ffn(cur, lp.ffn1_w1, lp.ffn1_w2)

    if attn_block is not None:
        # fused Pallas sub-block: LN + MHA + residual in one kernel
        res, k_out, v_out = attn_block(res)
    elif shift_onehot is not None:
        # full-slack-buffer attention (k_cache/v_cache are per-layer buffer
        # views; the phase's window selection lives in shift_onehot/attn_mask)
        cur = layer_norm(res, lp.norm_attn_w, lp.norm_attn_b)
        cur, k_out, v_out = rel_pos_mha_fullbuf(
            cur, pos_emb,
            lp.attn_q_w, lp.attn_k_w, lp.attn_v_w, lp.attn_pos_w,
            lp.attn_out_w, lp.pos_bias_u, lp.pos_bias_v,
            hp.n_heads, hp.d_head,
            k_buf=k_cache, v_buf=v_cache,
            shift_onehot=shift_onehot, attn_mask=attn_mask,
        )
        res = res + cur
    else:
        cur = layer_norm(res, lp.norm_attn_w, lp.norm_attn_b)
        mha_out = rel_pos_mha(
            cur,
            pos_emb,
            lp.attn_q_w,
            lp.attn_k_w,
            lp.attn_v_w,
            lp.attn_pos_w,
            lp.attn_out_w,
            lp.pos_bias_u,
            lp.pos_bias_v,
            hp.n_heads,
            hp.d_head,
            k_cache=k_cache,
            v_cache=v_cache,
            attn_mask=attn_mask,
            left_context=left_context,
            split_kv=split_kv,
        )
        if cached:
            cur, k_out, v_out = mha_out
        else:
            cur, k_out, v_out = mha_out, None, None
        res = res + cur

    # Conv module: LN -> pw1 -> GLU -> causal dw conv -> LN -> SiLU -> pw2
    # (nemo-ggml.cpp:760-838; the "batch_norm" weights act as a layer norm)
    cur = layer_norm(res, lp.norm_conv_w, lp.norm_conv_b)
    cur = glu(linear(cur, lp.conv_pw1_w))
    cur, conv_out = depthwise_causal_conv1d(cur, lp.conv_dw_w, conv_cache)
    cur = layer_norm(cur, lp.conv_ln_w, lp.conv_ln_b)
    cur = jax.nn.silu(cur)
    cur = linear(cur, lp.conv_pw2_w)
    res = res + cur

    cur = layer_norm(res, lp.norm_ff2_w, lp.norm_ff2_b)
    res = res + 0.5 * ffn(cur, lp.ffn2_w1, lp.ffn2_w2)

    y = layer_norm(res, lp.norm_final_w, lp.norm_final_b)
    if cached:
        return y, k_out, v_out, conv_out
    return y


@functools.lru_cache(maxsize=None)
def _phase_attn_constants(lc: int, chunk_len: int, s_buf: int, phase: int):
    """Static full-buffer attention constants for one phase.

    Returns (j_of_s [S_buf + T] int32, onehot [T, pos_len, S_buf + T] f32):
    j_of_s maps each buffer slot (plus the T new frames) to its relative key
    index in the live window [phase*chunk_len, phase*chunk_len + lc), -1 for
    slots outside the window; onehot realizes the rel-shift
    out[t, j] = raw[t, j + T - 1 - t] directly in slot space (all-zero columns
    for dead slots). Both are compile-time constants (numpy)."""
    import numpy as np

    T = chunk_len
    lo = phase * chunk_len
    j_of_s = np.full((s_buf + T,), -1, dtype=np.int32)
    j_of_s[lo : lo + lc] = np.arange(lc, dtype=np.int32)
    j_of_s[s_buf:] = lc + np.arange(T, dtype=np.int32)
    pos_len = 2 * (lc + T) - 1
    onehot = np.zeros((T, pos_len, s_buf + T), dtype=np.float32)
    for t in range(T):
        for s in range(s_buf + T):
            j = j_of_s[s]
            if j >= 0:
                onehot[t, j + T - 1 - t, s] = 1.0
    return j_of_s, onehot


def pos_emb_slice(pos_table, pos_len: int):
    """Centered static slice of the precomputed table (nemo-ggml.cpp:1059-1068)."""
    off = (pos_table.shape[0] - pos_len) // 2
    return jax.lax.slice_in_dim(pos_table, off, off + pos_len, axis=0)


def encode_batch(params, hp: Hparams, mel, prompt_onehot=None, n_frames=None,
                 n_mel_frames=None):
    """Offline encoder. mel: [B, T, n_mels] -> [B, T', d_model].

    T' = subsampled_len(T); full bidirectional attention over the utterance as
    in the reference batch path. Capped by the pos table at hp.max_pos_len
    frames.

    n_frames: optional [B] int32 — valid *subsampled* length per sequence.
    n_mel_frames: optional [B] int32 — valid MEL frames (pre-subsampling).
    Every conv in the stack is causal, so zero-padding at the end never leaks
    backwards through convs; masking padded keys in attention AND each
    subsampling level at its exact-length width (the stride-2 right pad makes
    the boundary frame read one position past the end — see
    ops/conv._mask_valid_h) makes the valid prefix of a padded batch
    bit-equivalent to an exact-length run. This enables bucketed compilation
    and ragged batched offline transcription (which the single-sequence
    reference cannot do).
    """
    x = conv_subsampling(params.subsampling, mel, n_frames=n_mel_frames)
    t = x.shape[1]
    pe = pos_emb_slice(params.pos_emb, 2 * t - 1)

    attn_mask = None
    if n_frames is not None:
        pos_idx = jnp.arange(t, dtype=jnp.int32)[None, :]
        attn_mask = jnp.where(pos_idx >= n_frames[:, None], -1e9, 0.0).astype(x.dtype)

    def body(carry, lp):
        return conformer_layer(carry, pe, lp, hp, attn_mask=attn_mask), None

    x, _ = jax.lax.scan(body, x, params.layers, unroll=LAYER_SCAN_UNROLL)
    if params.prompt is not None and prompt_onehot is not None:
        x = prompt_fusion(params.prompt, x, prompt_onehot)
    return x


def prompt_fusion(pk, enc, prompt_onehot):
    """Language-ID fusion (nemo-ggml.cpp:1087-1105). enc [B, T, D],
    prompt_onehot [B, num_prompts] broadcast across time."""
    b, t, _ = enc.shape
    oh = jnp.broadcast_to(prompt_onehot[:, None, :], (b, t, prompt_onehot.shape[-1]))
    cat = jnp.concatenate([enc, oh], axis=-1)
    h = jax.nn.relu(linear(cat, pk.fc1_w, pk.fc1_b))
    return linear(h, pk.fc2_w, pk.fc2_b)


def stream_encode_step(
    params,
    hp: Hparams,
    cfg: CacheConfig,
    mel_chunk,
    k_cache,
    v_cache,
    conv_cache,
    cache_valid,
    prompt_onehot=None,
    phase: int = 0,
    advance_phase: bool = True,
    active_mask=None,
    phase_consts=None,
):
    """One streaming encoder chunk against a phased slack buffer.

    mel_chunk:   [B, chunk_mel_frames, n_mels]
    k_cache/v_cache: HEAD-MAJOR [L, B, H, cache_buf_len, Dh] — the 70-frame
                 history window lives at slots [phase*chunk_len,
                 phase*chunk_len + 70) of the S axis. Head-major storage
                 matches the attention contraction layout so the ~70 MB/layer
                 cache read needs no physical transpose.
    conv_cache:  [L, B, kernel-1, D]
    cache_valid: [B] int32 (frames of valid attention cache)
    phase:       STATIC phase index in [0, n_phases)
    advance_phase: True (all-active fast path) appends the new frames after
                 the window with one tiny dynamic_update_slice — the caller
                 then moves to phase+1 and runs `compact_cache` at the wrap.
                 False (legacy gated path: some streams may be inactive)
                 rewrites the window shifted-in-place at the SAME phase, so a
                 gated stream's window never moves while it is paused (exact
                 reference semantics; costs the full 70-frame rewrite like
                 the reference).
    active_mask: [B] bool, only with advance_phase=True — the MASKED fast
                 path: inactive slots' K/V append region, conv cache and
                 cache_valid keep their old values bit-for-bit (the where()
                 touches only the [L,B,H,T,Dh] new-frame tensors, never the
                 big buffers), so a mixed active/paused batch still rides the
                 phased fast path. Paused slots' windows stay at the phase
                 they were last active at; the engine realigns them on
                 resume (realign_cache).
    phase_consts: optional (j_of_s [S_buf+T] i32, onehot [T, pos_len,
                 S_buf+T], win_hi scalar i32) — TRACED phase constants
                 replacing the static `phase` on the all-active fast path.
                 Lets a lax.scan over chunks (fused_serve_tick_scan) reuse
                 ONE compiled body across iterations at different phases:
                 the window selection arrives as tensor inputs and the K/V
                 append offset as a dynamic_update_slice start — no gathers
                 (the DUS writes a tiny [L,B,H,T,Dh] block; the attention
                 still reads the full buffer with the mask/one-hot doing the
                 window selection).

    Returns (enc_out [B, chunk_len, D], k', v', conv', cache_valid').
    """
    lc = cfg.att_left_context
    chunk_len = cfg.chunk_len(hp)
    kv_len = lc + chunk_len
    win_lo = phase * chunk_len           # static window start
    win_hi = win_lo + lc

    x = conv_subsampling(params.subsampling, mel_chunk)
    x = x[:, cfg.drop_extra_pre_encoded :, :]

    pe = pos_emb_slice(params.pos_emb, 2 * kv_len - 1)

    # Mask invalid (not yet written) cache positions: [0, lc - valid) masked
    # (nemo-stream.cpp:1034-1045).
    offset = lc - cache_valid  # [B]

    if phase_consts is not None and (SCAN_LAYERS or not advance_phase
                                     or active_mask is not None):
        raise ValueError(
            "phase_consts requires the all-active unrolled fast path")

    if advance_phase and not SCAN_LAYERS:
        # Unrolled fast path: static per-layer views of the stacked weights
        # and K/V buffers (no scan-xs copies), full-buffer attention with the
        # phase's window selection as compile-time constants (or traced
        # inputs under phase_consts).
        s_buf = kv_seq_len(k_cache, 3)
        if phase_consts is not None:
            j_arr, onehot, win_hi = phase_consts
            onehot = onehot.astype(x.dtype)
            mask_full = jnp.where(
                j_arr[None, :] < offset[:, None], -1e9, 0.0
            ).astype(x.dtype)
        else:
            j_of_s, onehot_np = _phase_attn_constants(
                lc, chunk_len, s_buf, phase)
            onehot = jnp.asarray(onehot_np, dtype=x.dtype)
            mask_full = jnp.where(
                jnp.asarray(j_of_s)[None, :] < offset[:, None], -1e9, 0.0
            ).astype(x.dtype)

        use_block = PALLAS_ATTN_BLOCK and chunk_len == 1
        kn_l, vn_l, cc_l = [], [], []
        for layer in range(hp.n_layers):
            lp = jax.tree.map(lambda a, _l=layer: a[_l], params.layers)
            ab = None
            if use_block:
                from ..audio.frontend import _pallas_interpret
                from ..ops.attn_block_pallas import t1_attention_block
                from ..ops.basic import linear as _linear

                # phase-shifted position projection for this layer (tiny,
                # XLA): pp[h, d, s] = sum_p pos_proj[p, h, d] * onehot[0, p, s]
                pos = _linear(pe, lp.attn_pos_w)
                ph = pos.reshape(-1, hp.n_heads, hp.d_head)
                pp = jnp.einsum("phd,ps->hds", ph.astype(jnp.float32),
                                onehot[0].astype(jnp.float32))

                def ab(res, lp=lp, pp=pp, kc=kv_layer(k_cache, layer),
                       vc=kv_layer(v_cache, layer)):
                    if is_quant(kc):  # opt-in Pallas block: dense operands
                        from ..ops.kvquant import dequantize_kv

                        kc = dequantize_kv(kc, res.dtype)
                        vc = dequantize_kv(vc, res.dtype)
                    out2, (kn, vn) = t1_attention_block(
                        res[:, 0, :], lp.norm_attn_w, lp.norm_attn_b,
                        lp.attn_q_w, lp.attn_k_w, lp.attn_v_w,
                        lp.attn_out_w, lp.pos_bias_u, lp.pos_bias_v,
                        pp, mask_full, kc, vc,
                        n_heads=hp.n_heads, d_head=hp.d_head,
                        bb_sub=PALLAS_ATTN_BLOCK_BS,
                        interpret=_pallas_interpret())
                    return (out2[:, None, :], kn[:, :, None, :],
                            vn[:, :, None, :])
            x, k_new, v_new, cc2 = conformer_layer(
                x, pe, lp, hp,
                k_cache=kv_layer(k_cache, layer),
                v_cache=kv_layer(v_cache, layer),
                conv_cache=conv_cache[layer],
                attn_mask=mask_full, left_context=lc,
                shift_onehot=onehot, attn_block=ab,
            )
            kn_l.append(k_new)
            vn_l.append(v_new)
            cc_l.append(cc2)
        if kn_l:  # n_layers=0 is a legal (frontend-only) configuration
            k_new_all = jnp.stack(kn_l)  # [L, B, H, T, Dh]
            v_new_all = jnp.stack(vn_l)
            conv_out = jnp.stack(cc_l)
            if is_quant(k_cache):
                k_new_all = quantize_kv(k_new_all)
                v_new_all = quantize_kv(v_new_all)
            if active_mask is not None:
                # masked fast path: inactive slots keep their old append
                # region / conv cache bit-for-bit (tiny where on the
                # new-frame tensors — in the quantized domain when the cache
                # is int8 — big buffers untouched)
                old_k = kv_slice(k_cache, win_hi, win_hi + chunk_len, axis=3)
                old_v = kv_slice(v_cache, win_hi, win_hi + chunk_len, axis=3)
                k_new_all = kv_where(active_mask, k_new_all, old_k,
                                     batch_axis=1)
                v_new_all = kv_where(active_mask, v_new_all, old_v,
                                     batch_axis=1)
                conv_out = jnp.where(active_mask[None, :, None, None],
                                     conv_out, conv_cache)
            k_out = kv_update_slice(k_cache, k_new_all, (0, 0, 0, win_hi, 0))
            v_out = kv_update_slice(v_cache, v_new_all, (0, 0, 0, win_hi, 0))
        else:
            k_out, v_out, conv_out = k_cache, v_cache, conv_cache

        if params.prompt is not None and prompt_onehot is not None:
            x = prompt_fusion(params.prompt, x, prompt_onehot)
        valid2 = jnp.minimum(cache_valid + chunk_len, lc)
        if active_mask is not None:
            valid2 = jnp.where(active_mask, valid2, cache_valid)
        return x, k_out, v_out, conv_out, valid2

    pos_idx = jnp.arange(kv_len, dtype=jnp.int32)[None, :]
    attn_mask = jnp.where(pos_idx < offset[:, None], -1e9, 0.0).astype(x.dtype)

    def body(carry, per_layer):
        lp, kc_buf, vc_buf, cc = per_layer
        kc = kv_slice(kc_buf, win_lo, win_hi, axis=2)
        vc = kv_slice(vc_buf, win_lo, win_hi, axis=2)
        y, k_new, v_new, cc2 = conformer_layer(
            carry, pe, lp, hp,
            k_cache=kc, v_cache=vc, conv_cache=cc,
            attn_mask=attn_mask, left_context=lc, split_kv=True,
        )
        return y, (k_new, v_new, cc2)

    x, (k_new_all, v_new_all, conv_out) = jax.lax.scan(
        body, x, (params.layers, k_cache, v_cache, conv_cache),
        unroll=LAYER_SCAN_UNROLL,
    )

    if is_quant(k_cache):
        k_new_all = quantize_kv(k_new_all)
        v_new_all = quantize_kv(v_new_all)
    if advance_phase:
        # append-only: the big buffers update in place (donated); only the
        # [L, B, H, chunk_len, Dh] new frames are written
        if active_mask is not None:
            old_k = kv_slice(k_cache, win_hi, win_hi + chunk_len, axis=3)
            old_v = kv_slice(v_cache, win_hi, win_hi + chunk_len, axis=3)
            k_new_all = kv_where(active_mask, k_new_all, old_k, batch_axis=1)
            v_new_all = kv_where(active_mask, v_new_all, old_v, batch_axis=1)
            conv_out = jnp.where(active_mask[None, :, None, None],
                                 conv_out, conv_cache)
        k_out = kv_update_slice(k_cache, k_new_all, (0, 0, 0, win_hi, 0))
        v_out = kv_update_slice(v_cache, v_new_all, (0, 0, 0, win_hi, 0))
    else:
        # phase-stationary shift (reference semantics for gated ticks)
        kc_win = kv_slice(k_cache, win_lo, win_hi, axis=3)
        vc_win = kv_slice(v_cache, win_lo, win_hi, axis=3)
        k_shift = kv_concat(
            [kv_slice(kc_win, chunk_len, lc, axis=3), k_new_all], axis=3)
        v_shift = kv_concat(
            [kv_slice(vc_win, chunk_len, lc, axis=3), v_new_all], axis=3)
        k_out = kv_update_slice(k_cache, k_shift, (0, 0, 0, win_lo, 0))
        v_out = kv_update_slice(v_cache, v_shift, (0, 0, 0, win_lo, 0))

    if params.prompt is not None and prompt_onehot is not None:
        x = prompt_fusion(params.prompt, x, prompt_onehot)

    valid2 = jnp.minimum(cache_valid + chunk_len, lc)
    if active_mask is not None:
        valid2 = jnp.where(active_mask, valid2, cache_valid)
    return x, k_out, v_out, conv_out, valid2


def compact_cache(cfg: CacheConfig, hp: Hparams, k_cache, v_cache,
                  phase: int | None = None, mask=None):
    """Move the live history window back to phase 0 (run once every n_phases
    chunks; amortizes the 70-frame rewrite).

    `phase` is the STATIC phase the caller is currently at: the live window
    sits at [phase*chunk_len, phase*chunk_len + left_context). The default
    (phase=n_phases, the wrap) is the window at the very end of the slack
    buffer. Compaction at any mid-cycle phase (fast->gated transition in the
    engine) MUST pass its phase — copying the buffer tail there would install
    stale history.

    `mask` ([B] bool): compact only these slots — slots that are paused at an
    earlier phase keep their window untouched (per-slot realign flow; the
    unmasked wrap would overwrite a paused slot's frames at [0, 70))."""
    lc = cfg.att_left_context
    if phase is None:
        phase = cfg.n_phases
    lo = phase * cfg.chunk_len(hp)
    if lo == 0:
        return k_cache, v_cache  # window already at phase 0
    win_k = kv_slice(k_cache, lo, lo + lc, axis=3)
    win_v = kv_slice(v_cache, lo, lo + lc, axis=3)
    if mask is not None:
        win_k = kv_where(mask, win_k, kv_slice(k_cache, 0, lc, axis=3),
                         batch_axis=1)
        win_v = kv_where(mask, win_v, kv_slice(v_cache, 0, lc, axis=3),
                         batch_axis=1)
    k2 = kv_update_slice(k_cache, win_k, (0, 0, 0, 0, 0))
    v2 = kv_update_slice(v_cache, win_v, (0, 0, 0, 0, 0))
    return k2, v2


def realign_cache(cfg: CacheConfig, hp: Hparams, k_cache, v_cache,
                  delta: int, mask):
    """Per-slot realign-on-resume: move the masked slots' live window forward
    by `delta` phases (to wherever the group's current phase is).

    A slot that pauses stops moving through the slack buffer while the rest
    of its group advances one phase per chunk. On resume, its last
    left_context frames are still its attention history (relative positions
    count stream frames, not wall clock — reference semantics,
    nemo-stream.cpp:505-512), they just sit `delta` phases behind the
    group's window. Implemented as a masked STATIC roll of the S axis
    (roll = two static slices + concat; no gathers), one compiled variant
    per delta (delta in [-(n_phases-1), n_phases-1] \\ {0} — at most
    2*(n_phases-1) tiny programs over the server's life). The rolled
    wrap-around region is garbage for the realigned slot, but it lies
    outside its live window and the phase constants never read it.

    Dispatched only on resume ticks; every other tick stays on the phased
    fast path (the old behavior compacted + full-rewrote the window on EVERY
    tick with any paused slot)."""
    assert delta != 0
    shift = delta * cfg.chunk_len(hp)
    k2 = kv_where(mask, kv_roll(k_cache, shift, axis=3), k_cache,
                  batch_axis=1)
    v2 = kv_where(mask, kv_roll(v_cache, shift, axis=3), v_cache,
                  batch_axis=1)
    return k2, v2
