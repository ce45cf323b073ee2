"""Top-level ASR entry points: batch transcription and the streaming chunk step.

`stream_step` is the unit of work for the whole serving stack: one jitted call
advances a batch of streams by one chunk — mel -> cached encoder -> on-device
greedy RNNT — returning updated state and an emission tensor. There is exactly
one compile per (latency mode, batch size); all shapes are static.

Per-stream gating (`active`, `n_valid`) lets one batched call serve streams in
different lifecycle phases (steady, finalizing with a zero-padded tail chunk as
in nemo-stream.cpp:1217-1259, or idle).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from ..config import CacheConfig, Hparams
from ..streaming.state import StreamState
from .decoder import DecodeState, greedy_decode, init_decode_state
from .encoder import encode_batch, stream_encode_step


def _gate_batch0(active, new, old):
    mm = active.reshape((active.shape[0],) + (1,) * (new.ndim - 1))
    return jnp.where(mm, new, old)


def _gate_batch1(active, new, old):
    def g(n, o):
        mm = active.reshape((1, active.shape[0]) + (1,) * (n.ndim - 2))
        return jnp.where(mm, n, o)

    return jax.tree.map(g, new, old)  # leaves may be pytrees (QuantKV)


def stream_step(
    params,
    state: StreamState,
    mel_chunk,
    n_valid,
    active,
    prompt_idx=None,
    *,
    hp: Hparams,
    cfg: CacheConfig,
    phase: int = 0,
):
    """Advance a batch of streams by one chunk.

    mel_chunk: [B, chunk_mel_frames, n_mels]
    n_valid:   [B] int32 — encoder output frames to decode this chunk
               (valid_out_len normally; fewer on the final zero-padded chunk)
    active:    [B] bool — inactive slots keep their state bit-for-bit
    prompt_idx:[B] int32 language prompt index (multilingual models) or None
    phase:     STATIC slack-buffer phase (see stream_encode_step). With
               active=None (all-active fast path) the step appends at the
               phase offset and the caller must advance phase and run
               models.encoder.compact_cache at the wrap. The gated path is
               phase-stationary, so paused streams stay aligned.

    Returns (state', tokens [B, chunk_len, S] int32 with -1 = no emission).
    """
    if active is None:
        enc, k2, v2, c2, valid2 = stream_encode_step(
            params, hp, cfg, mel_chunk,
            state.k_cache, state.v_cache, state.conv_cache, state.cache_valid,
            prompt_onehot=(
                jax.nn.one_hot(prompt_idx, hp.num_prompts, dtype=mel_chunk.dtype)
                if params.prompt is not None and prompt_idx is not None else None
            ),
            phase=phase, advance_phase=True,
        )
        dec_state, tokens = greedy_decode(
            params, hp, enc, state.decode, n_valid=n_valid.astype(jnp.int32)
        )
        return StreamState(k_cache=k2, v_cache=v2, conv_cache=c2,
                           cache_valid=valid2, decode=dec_state,
                           pp_tail=state.pp_tail, pp_last=state.pp_last,
                           mel_ov=state.mel_ov), tokens

    active = active.astype(bool)
    n_valid = jnp.where(active, n_valid, 0).astype(jnp.int32)

    prompt_onehot = None
    if params.prompt is not None and prompt_idx is not None:
        prompt_onehot = jax.nn.one_hot(
            prompt_idx, hp.num_prompts, dtype=mel_chunk.dtype
        )

    enc, k2, v2, c2, valid2 = stream_encode_step(
        params,
        hp,
        cfg,
        mel_chunk,
        state.k_cache,
        state.v_cache,
        state.conv_cache,
        state.cache_valid,
        prompt_onehot=prompt_onehot,
        phase=phase, advance_phase=False,
    )

    dec_state, tokens = greedy_decode(params, hp, enc, state.decode, n_valid=n_valid)

    new_state = StreamState(
        k_cache=_gate_batch1(active, k2, state.k_cache),
        v_cache=_gate_batch1(active, v2, state.v_cache),
        conv_cache=_gate_batch1(active, c2, state.conv_cache),
        cache_valid=jnp.where(active, valid2, state.cache_valid),
        decode=dec_state,  # already gated per-frame via n_valid
        pp_tail=state.pp_tail, pp_last=state.pp_last, mel_ov=state.mel_ov,
    )
    return new_state, tokens


def fused_encode_tick(
    params,
    state: StreamState,
    audio_block,
    active,
    prompt_idx=None,
    *,
    hp: Hparams,
    cfg: CacheConfig,
    phase: int = 0,
    fast_gated: bool = False,
    phase_consts=None,
):
    """Frontend + encoder half of the fused serving tick: raw PCM blocks in ->
    encoder frames out, all frontend/cache state advanced (decode state
    untouched). Split out so the profiling mode (NEMOTRON_TPU_PHASE_TIMERS)
    can time encoder vs decoder like the reference (nemo-stream.h:237-244).

    audio_block: [B, shift_samples] int16 (or f32 in [-1, 1]) — exactly one
    chunk's worth of new samples per stream. The mel frontend (pre-emphasis
    carry + framing + DFT + filterbank, src/preprocessor.cpp:330-395) runs on
    device against the carried pp_tail/pp_last/mel_ov state, so the host never
    touches mel.
    """
    from ..ops import mel as melops

    x = audio_block.astype(jnp.float32)
    if jnp.issubdtype(audio_block.dtype, jnp.integer):
        x = x / 32768.0
    window512 = melops.padded_window(params.preproc.window)
    fb = params.preproc.filterbank.astype(jnp.float32)
    mel_new, tail2, last2 = melops.mel_step(
        x, state.pp_tail, state.pp_last, window512, fb,
        n_frames=cfg.shift_mel_frames,
    )
    mel_chunk = jnp.concatenate([state.mel_ov, mel_new], axis=1)
    new_ov = mel_chunk[:, cfg.shift_mel_frames :, :]
    mel_cast = mel_chunk.astype(params.pos_emb.dtype)

    prompt_onehot = None
    if params.prompt is not None and prompt_idx is not None:
        prompt_onehot = jax.nn.one_hot(
            prompt_idx, hp.num_prompts, dtype=mel_cast.dtype
        )

    act = None if active is None else active.astype(bool)
    enc, k2, v2, c2, valid2 = stream_encode_step(
        params, hp, cfg, mel_cast,
        state.k_cache, state.v_cache, state.conv_cache, state.cache_valid,
        prompt_onehot=prompt_onehot,
        phase=phase, advance_phase=active is None or fast_gated,
        active_mask=act if fast_gated else None,
        phase_consts=phase_consts,
    )

    if active is None:
        new_state = dataclasses.replace(
            state, k_cache=k2, v_cache=v2, conv_cache=c2, cache_valid=valid2,
            pp_tail=tail2, pp_last=last2, mel_ov=new_ov,
        )
    elif fast_gated:
        # masked fast path: K/V append, conv cache and cache_valid were
        # already gated INSIDE stream_encode_step (only the small new-frame
        # tensors are touched — no full-buffer where); gate the frontend
        # carries here. Paused slots' windows stay at their old phase — the
        # engine realigns them on resume (encoder.realign_cache).
        new_state = dataclasses.replace(
            state, k_cache=k2, v_cache=v2, conv_cache=c2, cache_valid=valid2,
            pp_tail=_gate_batch0(act, tail2, state.pp_tail),
            pp_last=jnp.where(act, last2, state.pp_last),
            mel_ov=_gate_batch0(act, new_ov, state.mel_ov),
        )
    else:
        new_state = dataclasses.replace(
            state,
            k_cache=_gate_batch1(act, k2, state.k_cache),
            v_cache=_gate_batch1(act, v2, state.v_cache),
            conv_cache=_gate_batch1(act, c2, state.conv_cache),
            cache_valid=jnp.where(act, valid2, state.cache_valid),
            pp_tail=_gate_batch0(act, tail2, state.pp_tail),
            pp_last=jnp.where(act, last2, state.pp_last),
            mel_ov=_gate_batch0(act, new_ov, state.mel_ov),
        )
    return new_state, enc


def decode_tick(params, state: StreamState, enc, n_valid, active=None, *,
                hp: Hparams):
    """Greedy-RNNT half of the fused tick (inactive slots via n_valid=0)."""
    if active is not None:
        n_valid = jnp.where(active.astype(bool), n_valid, 0)
    dec_state, tokens = greedy_decode(
        params, hp, enc, state.decode, n_valid=n_valid.astype(jnp.int32)
    )
    return dataclasses.replace(state, decode=dec_state), tokens


def fused_serve_tick(
    params,
    state: StreamState,
    audio_block,
    n_valid,
    active,
    prompt_idx=None,
    *,
    hp: Hparams,
    cfg: CacheConfig,
    phase: int = 0,
    fast_gated: bool = False,
    phase_consts=None,
):
    """Whole serving hot path in ONE device program: raw PCM in -> tokens out.
    This removes the mel upload+readback round-trips that capped the tunneled
    end-to-end server (PERF.md) — the only per-tick transfers are the audio
    upload and the (pipelined) token readback.

    Finalize semantics: the host pads the final partial block with zeros and
    passes the reduced n_valid. The junk mel frames computed from the zero
    padding sit at positions > the last real frame; the causal subsampling
    stack means valid output j depends only on mel <= 8(j+2), which for
    n_valid = L//8 is exactly the last real frame — identical tokens to the
    reference's zero-padded-mel flush (nemo-stream.cpp:1217-1259).
    """
    new_state, enc = fused_encode_tick(
        params, state, audio_block, active, prompt_idx, hp=hp, cfg=cfg,
        phase=phase, fast_gated=fast_gated, phase_consts=phase_consts,
    )
    return decode_tick(params, new_state, enc, n_valid, active, hp=hp)


def fused_serve_tick_multi(
    params,
    state: StreamState,
    audio_blocks,
    n_valid,
    prompt_idx=None,
    *,
    hp: Hparams,
    cfg: CacheConfig,
    k: int,
    phase: int = 0,
):
    """k sequential all-active fused ticks in ONE device program (backlog
    micro-batching): when every live stream has >= k chunks of audio staged
    (clients pushing faster than real time, catch-up after a stall, batch
    jobs), one dispatch advances everyone by k chunks — k x the audio per
    tunnel round-trip. Slack-buffer phase wraps (compaction) are handled
    inside; the caller's new phase is (phase + k) % n_phases.

    audio_blocks: [B, k * shift_samples]; returns tokens [B, k*chunk_len, S].
    """
    from .encoder import compact_cache

    toks = []
    p = phase
    for i in range(k):
        shift = cfg.shift_samples
        block = jax.lax.slice_in_dim(audio_blocks, i * shift, (i + 1) * shift,
                                     axis=1)
        state, t = fused_serve_tick(
            params, state, block, n_valid, None, prompt_idx,
            hp=hp, cfg=cfg, phase=p,
        )
        toks.append(t)
        p += 1
        if p >= cfg.n_phases:
            k2, v2 = compact_cache(cfg, hp, state.k_cache, state.v_cache)
            state = dataclasses.replace(state, k_cache=k2, v_cache=v2)
            p = 0
    return state, jnp.concatenate(toks, axis=1)


def fused_serve_tick_scan(
    params,
    state: StreamState,
    audio_blocks,
    n_valid,
    prompt_idx=None,
    *,
    hp: Hparams,
    cfg: CacheConfig,
    k: int,
    phase: int = 0,
):
    """k sequential all-active fused ticks as a `lax.scan` over chunks with
    the stream state as donated carry — the chunk-loop form of
    fused_serve_tick_multi.

    The unrolled multi program's compile-time HBM footprint grows with k*B
    (XLA materializes per-chunk copies of the K/V slack buffers: measured
    16.4 GB at k=4, B=512 — it OOMed a v5e at compile time and capped backlog
    micro-batching at k=2 for B>=512). Here the tick body compiles ONCE and
    the per-iteration phase arrives as tensor inputs (scan xs): the rel-shift
    one-hot + window mask stacked per phase, and the K/V append offset as a
    dynamic_update_slice start (a tiny [L,B,H,T,Dh] write — the attention
    reads the full buffer either way, so no gathers are reintroduced).

    Caller contract: phase % k == 0 and k divides cfg.n_phases (the engine's
    trigger rule), so the slack-buffer wrap can only land after the LAST
    chunk — compaction happens statically after the scan, never inside it.

    audio_blocks: [B, k * shift_samples]; returns tokens [B, k*chunk_len, S].
    """
    import numpy as np

    from .encoder import _phase_attn_constants, compact_cache

    if cfg.n_phases % k or phase % k:
        raise ValueError(
            f"scan micro-batch needs k | n_phases and phase % k == 0 "
            f"(k={k}, phase={phase}, n_phases={cfg.n_phases})")
    b = audio_blocks.shape[0]
    shift = cfg.shift_samples
    chunk_len = cfg.chunk_len(hp)
    lc = cfg.att_left_context
    from ..ops.kvquant import kv_seq_len

    s_buf = kv_seq_len(state.k_cache, 3)
    j_l, oh_l, wh_l = [], [], []
    for i in range(k):
        p = phase + i
        j_np, oh_np = _phase_attn_constants(lc, chunk_len, s_buf, p)
        j_l.append(j_np)
        oh_l.append(oh_np)
        wh_l.append(p * chunk_len + lc)
    dtype = params.pos_emb.dtype
    xs = (
        jnp.moveaxis(audio_blocks.reshape(b, k, shift), 1, 0),  # [k, B, shift]
        jnp.asarray(np.stack(j_l)),                   # [k, S_buf+T] int32
        jnp.asarray(np.stack(oh_l), dtype=dtype),     # [k, T, pos, S_buf+T]
        jnp.asarray(wh_l, dtype=jnp.int32),           # [k] append offsets
    )

    def body(carry, xs_i):
        block, j_i, oh_i, wh_i = xs_i
        carry, toks = fused_serve_tick(
            params, carry, block, n_valid, None, prompt_idx,
            hp=hp, cfg=cfg, phase=0, phase_consts=(j_i, oh_i, wh_i),
        )
        return carry, toks

    state, toks = jax.lax.scan(body, state, xs)
    if phase + k == cfg.n_phases:  # wrap: move the window back to phase 0
        k2, v2 = compact_cache(cfg, hp, state.k_cache, state.v_cache)
        state = dataclasses.replace(state, k_cache=k2, v_cache=v2)
    tokens = jnp.moveaxis(toks, 0, 1)  # [B, k, T, S]
    return state, tokens.reshape(b, k * tokens.shape[2], tokens.shape[3])


def transcribe_batch(params, mel, *, hp: Hparams, prompt_idx=None, n_frames=None,
                     dec_state=None, n_mel_frames=None):
    """Offline path: mel [B, T, n_mels] -> (tokens [B, T', S], dec_state').

    Mirrors nemo_encode (nemo-ggml.cpp:1592-1668): full-context encoder over the
    utterance, then greedy decode; T is capped at 8*hp.max_pos_len mel frames.
    n_frames ([B] int32, subsampled-frame counts) plus n_mel_frames ([B] int32,
    valid mel frames) enable padded/bucketed input bit-equal to exact-length
    runs (see encode_batch); dec_state carries the RNNT decoder across
    segments of long audio (nemo_transcribe_audio_with_state,
    nemo-ggml.cpp:1739-1819).
    """
    prompt_onehot = None
    if params.prompt is not None and prompt_idx is not None:
        prompt_onehot = jax.nn.one_hot(prompt_idx, hp.num_prompts, dtype=mel.dtype)
    enc = encode_batch(
        params, hp, mel, prompt_onehot=prompt_onehot, n_frames=n_frames,
        n_mel_frames=n_mel_frames,
    )
    b = enc.shape[0]
    if dec_state is None:
        dec_state = init_decode_state(b, hp, dtype=enc.dtype)
    dec_state, tokens = greedy_decode(params, hp, enc, dec_state, n_valid=n_frames)
    return tokens, dec_state


def make_stream_step(params, hp: Hparams, cfg: CacheConfig, donate: bool = True):
    """Build the jitted streaming step for one latency mode.

    State buffers are donated so the ~8 MB/stream caches update in place on
    device (no reallocation per chunk).
    """

    def fn(params, state, mel_chunk, n_valid, active, prompt_idx=None):
        return stream_step(
            params, state, mel_chunk, n_valid, active, prompt_idx, hp=hp, cfg=cfg
        )

    donate_argnums = (1,) if donate else ()
    return jax.jit(fn, donate_argnums=donate_argnums)


@functools.partial(jax.jit, static_argnames=("hp",))
def transcribe_batch_jit(params, mel, n_frames, dec_state, *, hp: Hparams,
                         n_mel_frames=None):
    return transcribe_batch(
        params, mel, hp=hp, n_frames=n_frames, dec_state=dec_state,
        n_mel_frames=n_mel_frames,
    )


def tokens_to_list(tokens, n_valid=None, vocab_size=None,
                   with_conf: bool = False):
    """Decode the emission tensor on host: [B, T, S] -> per-stream ordered
    [(token_id, frame_idx), ...] (frame_idx relative to this chunk).

    Under NEMOTRON_TPU_CONFIDENCE=1 the values carry a packed per-token
    confidence (decoder._pack_conf) — pass vocab_size so it can be stripped;
    with_conf=True returns (token_id, frame_idx, conf | None) triples."""
    import numpy as np

    from .decoder import confidence_enabled, unpack_tokens

    arr = np.asarray(tokens)
    conf = None
    if confidence_enabled():
        if vocab_size is None:
            raise ValueError(
                "NEMOTRON_TPU_CONFIDENCE=1 needs vocab_size to unpack")
        arr, conf = unpack_tokens(arr, vocab_size)
    out = []
    for b in range(arr.shape[0]):
        seq = []
        tmax = arr.shape[1] if n_valid is None else int(n_valid[b])
        for t in range(min(tmax, arr.shape[1])):
            for s in range(arr.shape[2]):
                tok = int(arr[b, t, s])
                if tok >= 0:
                    if with_conf:
                        seq.append((tok, t,
                                    float(conf[b, t, s])
                                    if conf is not None else None))
                    else:
                        seq.append((tok, t))
        out.append(seq)
    return out
