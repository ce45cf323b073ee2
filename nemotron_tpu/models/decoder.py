"""RNNT prediction network + joint + on-device greedy decode.

This is the component where the TPU rebuild departs hardest from the reference:
the reference runs the per-symbol loop on the host with six device round-trips
per symbol (src/nemo-stream.cpp:840-930) and even rebuilds the graph per symbol
in batch mode (nemo-ggml.cpp:1268-1351). Here the whole greedy loop is a nested
`lax.scan` inside the jitted step: zero host involvement, batched over streams.

Exact semantics preserved (nemo-ggml.cpp:1233-1382):
  - <= MAX_SYMBOLS_PER_STEP (10) emissions per encoder frame
  - argmax over the full 1025 logits; first-max tie-break (argmax default)
  - LSTM state and prev_token advance ONLY on non-blank emission
  - blank ends the frame's symbol loop
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp

from ..config import MAX_SYMBOLS_PER_STEP, Hparams
from ..ops.lstm import lstm2_step
from ..params import _ptree

# Per-token confidence (beyond reference): when enabled, each emitted token
# value carries a 7-bit quantized softmax probability of the chosen token,
# packed as tok + vocab_size * q (q in 0..127) so the emission tensor stays
# ONE int32 array (a second device output would cost a second tunnel fetch
# per tick). -1 stays the no-emission sentinel. Hosts unpack with
# unpack_tokens. Default OFF: the wire/token contract is unchanged and all
# golden parity suites run the exact reference semantics.
def confidence_enabled() -> bool:
    return os.environ.get("NEMOTRON_TPU_CONFIDENCE", "0") == "1"


def unpack_tokens(vals, vocab_size: int):
    """Split packed emission values -> (token_ids, conf in [0,1] | None).

    `vals` is a host numpy array (any shape); identity (conf=None) when
    confidence packing is off. No-emission sentinels (-1) pass through."""
    import numpy as np

    if not confidence_enabled():
        return vals, None
    emitted = vals >= 0
    ids = np.where(emitted, vals % vocab_size, vals)
    conf = np.where(emitted, (vals // vocab_size) / 127.0, 0.0)
    return ids, conf


def _pack_conf(tok, logits, vocab_size: int):
    """tok [B] int32 (argmax of logits [B, V]) -> packed tok + V*q."""
    if not confidence_enabled():
        return tok
    l32 = logits.astype(jnp.float32)
    m = jnp.max(l32, axis=-1)
    # P(argmax) = exp(m - logsumexp) = 1 / sum(exp(l - m))
    p = 1.0 / jnp.sum(jnp.exp(l32 - m[:, None]), axis=-1)
    q = jnp.clip(jnp.round(p * 127.0), 0, 127).astype(jnp.int32)
    return tok + vocab_size * q


# Batched greedy decode formulation. Default: "loop labels" — ONE while_loop
# in which every stream advances through its own frames (emit -> stay on the
# frame, blank -> next frame), so total joint+LSTM iterations are
# max_b(T + emissions_b) instead of the nested form's sum_t(1 + max_b
# emissions_bt): one noisy stream no longer forces up to 10 full-batch
# iterations on every frame (the reference's per-stream bound is by
# construction, nemo-ggml.cpp:1258 — this is its batched-SPMD equivalent).
# NEMOTRON_TPU_LOOP_LABELS=0 restores the frame-scan x symbol-while form.
LOOP_LABELS = os.environ.get("NEMOTRON_TPU_LOOP_LABELS", "1") == "1"


@_ptree
class DecodeState:
    h: Any           # [B, 2, decoder_dim]
    c: Any           # [B, 2, decoder_dim]
    prev_token: Any  # [B] int32
    frame_offset: Any  # [B] int32 (for word timestamps)


def init_decode_state(batch: int, hp: Hparams, dtype=jnp.float32) -> DecodeState:
    return DecodeState(
        h=jnp.zeros((batch, hp.decoder_layers, hp.decoder_dim), dtype=dtype),
        c=jnp.zeros((batch, hp.decoder_layers, hp.decoder_dim), dtype=dtype),
        prev_token=jnp.full((batch,), hp.blank_id, dtype=jnp.int32),
        frame_offset=jnp.zeros((batch,), dtype=jnp.int32),
    )


def joint_step(jp, enc_t, dec_out):
    """Single-frame joint: enc_t [B, D], dec_out [B, decoder_dim] -> [B, V]."""
    e = enc_t @ jp.enc_w.T + jp.enc_b
    return joint_from_proj(jp, e, dec_out)


def joint_from_proj(jp, enc_proj, dec_out):
    """Joint with the encoder-side projection precomputed ([B, joint_dim]).

    The projection is invariant across the per-frame symbol loop (the
    reference recomputes it per symbol, nemo-ggml.cpp:1310-1320) — hoisting it
    saves one [B, D]x[D, joint_dim] matmul per greedy iteration."""
    d = dec_out @ jp.dec_w.T + jp.dec_b
    h = jax.nn.relu(enc_proj + d)
    return h @ jp.out_w.T + jp.out_b


def greedy_decode(
    params,
    hp: Hparams,
    enc_out,
    state: DecodeState,
    n_valid=None,
):
    """Greedy RNNT decode over a batch of encoder frame sequences.

    enc_out: [B, T, D]; n_valid: [B] int32 — frames >= n_valid are skipped
    entirely (used for the zero-padded final chunk and for inactive slots in
    the batched server). Defaults to all T frames.

    Returns (state', tokens [B, T, S] int32 with -1 = no emission). A token at
    [b, t, s] was emitted at absolute frame state.frame_offset[b] + t.
    """
    b, t, _ = enc_out.shape
    blank = hp.blank_id
    if n_valid is None:
        n_valid = jnp.full((b,), t, dtype=jnp.int32)

    if LOOP_LABELS:
        return _greedy_decode_loop_labels(params, hp, enc_out, state, n_valid)

    emb_table = params.decoder.embedding
    s_max = MAX_SYMBOLS_PER_STEP

    def frame_body(carry, inp):
        h, c, prev = carry
        enc_proj_t, t_idx = inp  # enc_proj_t: [B, joint_dim]
        frame_active = t_idx < n_valid  # [B]

        # Early-exit symbol loop: most frames emit 0-2 symbols before blank,
        # so a while_loop that stops once every stream has blanked typically
        # runs 1-3 joint+LSTM steps instead of a fixed 10.
        def sym_cond(st):
            _h, _c, _prev, done, _toks, sym = st
            return jnp.logical_and(sym < s_max, jnp.any(~done))

        def sym_body(st):
            h, c, prev, done, toks, sym = st
            # embedding lookup as one-hot matmul: row gathers are slow on TPU
            # and the [B, V] x [V, D] product is exact (0/1 selector)
            onehot = jax.nn.one_hot(prev, emb_table.shape[0],
                                    dtype=emb_table.dtype)
            emb = onehot @ emb_table  # [B, decoder_dim]
            dec_out, h2, c2 = lstm2_step(params.decoder, emb, h, c)
            logits = joint_from_proj(params.joint, enc_proj_t, dec_out)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            is_blank = tok == blank
            emit = jnp.logical_and(~done, ~is_blank)
            out_tok = jnp.where(emit, _pack_conf(tok, logits, hp.vocab_size),
                                -1)
            gate = emit[:, None, None]
            h = jnp.where(gate, h2, h)
            c = jnp.where(gate, c2, c)
            prev = jnp.where(emit, tok, prev)
            done = jnp.logical_or(done, is_blank)
            toks = jax.lax.dynamic_update_slice(
                toks, out_tok[:, None], (0, sym)
            )
            return (h, c, prev, done, toks, sym + 1)

        done0 = ~frame_active
        toks0 = jnp.full((enc_proj_t.shape[0], s_max), -1, dtype=jnp.int32)
        h, c, prev, _, toks, _ = jax.lax.while_loop(
            sym_cond, sym_body, (h, c, prev, done0, toks0, jnp.int32(0))
        )
        return (h, c, prev), toks  # toks: [B, S]

    # encoder-side joint projection for ALL frames in one matmul, hoisted out
    # of both the frame scan and the symbol loop (loop-invariant)
    enc_proj = enc_out @ params.joint.enc_w.T + params.joint.enc_b  # [B,T,J]
    enc_pm = jnp.swapaxes(enc_proj, 0, 1)  # [T, B, J]
    (h, c, prev), toks = jax.lax.scan(
        frame_body,
        (state.h, state.c, state.prev_token),
        (enc_pm, jnp.arange(t, dtype=jnp.int32)),
    )
    tokens = jnp.transpose(toks, (1, 0, 2))  # [T, B, S] -> [B, T, S]
    new_state = DecodeState(
        h=h,
        c=c,
        prev_token=prev,
        frame_offset=state.frame_offset + n_valid,
    )
    return new_state, tokens


def _greedy_decode_loop_labels(params, hp: Hparams, enc_out, state, n_valid):
    """Loop-labels batched greedy decode (token-identical to the nested form).

    One while_loop over joint evaluations; per stream, a non-blank emission
    updates the LSTM/prev and stays on the same frame, a blank (or hitting
    the 10-symbol frame cap) advances the frame pointer. The loop exits when
    every stream's pointer passes its n_valid. Per-stream frame selection is
    a comparison-based one-hot contraction over T (streaming T is 1-14; no
    dynamic gathers — the op class that once dominated the step).
    """
    b, t, _ = enc_out.shape
    blank = hp.blank_id
    emb_table = params.decoder.embedding
    s_max = MAX_SYMBOLS_PER_STEP
    t_iota = jnp.arange(t, dtype=jnp.int32)

    # encoder-side joint projection for ALL frames in one matmul (hoisted)
    enc_proj = enc_out @ params.joint.enc_w.T + params.joint.enc_b  # [B,T,J]

    def cond(st):
        _h, _c, _prev, frame_idx, _sym, _acc, it = st
        # worst case: s_max emissions + 1 forced-advance eval per frame
        return jnp.logical_and(jnp.any(frame_idx < n_valid),
                               it < t * (s_max + 1) + 1)

    def body(st):
        h, c, prev, frame_idx, sym_idx, acc, it = st
        active = frame_idx < n_valid  # [B]
        t_oh = (frame_idx[:, None] == t_iota[None, :]).astype(enc_proj.dtype)
        enc_t = jnp.einsum("bt,btj->bj", t_oh, enc_proj)  # [B, J]

        onehot = jax.nn.one_hot(prev, emb_table.shape[0],
                                dtype=emb_table.dtype)
        emb = onehot @ emb_table
        dec_out, h2, c2 = lstm2_step(params.decoder, emb, h, c)
        logits = joint_from_proj(params.joint, enc_t, dec_out)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

        is_blank = tok == blank
        forced = sym_idx >= s_max  # frame emission cap reached
        emit = active & ~is_blank & ~forced
        advance = active & (is_blank | forced)

        s_oh = (sym_idx[:, None]
                == jnp.arange(s_max, dtype=jnp.int32)[None, :])
        cell = t_oh.astype(jnp.bool_)[:, :, None] & s_oh[:, None, :]
        write = emit[:, None, None] & cell  # [B, T, S] one-hot position
        packed = _pack_conf(tok, logits, hp.vocab_size)
        acc = jnp.where(write, (packed + 1)[:, None, None], acc)

        gate = emit[:, None, None]
        h = jnp.where(gate, h2, h)
        c = jnp.where(gate, c2, c)
        prev = jnp.where(emit, tok, prev)
        frame_idx = frame_idx + advance.astype(jnp.int32)
        sym_idx = jnp.where(advance, 0,
                            sym_idx + emit.astype(jnp.int32))
        return (h, c, prev, frame_idx, sym_idx, acc, it + 1)

    acc0 = jnp.zeros((b, t, s_max), dtype=jnp.int32)
    h, c, prev, _, _, acc, _ = jax.lax.while_loop(
        cond, body,
        (state.h, state.c, state.prev_token,
         jnp.zeros((b,), jnp.int32), jnp.zeros((b,), jnp.int32),
         acc0, jnp.int32(0)),
    )
    tokens = acc - 1  # 0 (never written) -> -1 sentinel
    new_state = DecodeState(
        h=h, c=c, prev_token=prev,
        frame_offset=state.frame_offset + n_valid,
    )
    return new_state, tokens
