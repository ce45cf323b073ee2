"""Per-stream device-resident state for cache-aware streaming.

One pytree holds everything the reference keeps per stream
(src/nemo-stream.h:177-262): attention K/V caches, conv caches, cache-validity
counter, and the RNNT decoder state — with a leading batch axis so hundreds of
streams step together in one jitted call, and a [L] leading axis on the caches
so the layer stack is a lax.scan.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

import jax

from ..config import CacheConfig, Hparams
from ..models.decoder import DecodeState, init_decode_state
from ..ops.kvquant import kv_int8_enabled, kv_zeros
from ..params import _ptree


# Steady-state preprocessor tail: with the carry primed as [256 center-pad
# zeros || first 96 pre-emphasized samples], every shift_samples block yields
# exactly shift_mel_frames mel frames (fixed shapes for the fused tick).
PP_TAIL_LEN = 512 - 160  # n_fft - hop


@_ptree
class StreamState:
    k_cache: Any      # [L, B, H, cache_buf_len, Dh] head-major (see encoder)
                      # — or ops.kvquant.QuantKV when NEMOTRON_TPU_KV_INT8=1
    v_cache: Any      # [L, B, H, cache_buf_len, Dh]
    conv_cache: Any   # [L, B, kernel-1, D]
    cache_valid: Any  # [B] int32
    decode: DecodeState
    # device-resident frontend state for the fused serving tick (raw audio in
    # -> tokens out; mel never returns to host). Unused by the host-mel paths.
    pp_tail: Any      # [B, PP_TAIL_LEN] f32 pre-emphasized sample carry
    pp_last: Any      # [B] f32 raw last sample (pre-emphasis continuity)
    mel_ov: Any       # [B, pre_encode_cache_size, n_mels] f32 mel overlap


def init_stream_state(
    batch: int, hp: Hparams, cfg: CacheConfig, dtype=jnp.float32
) -> StreamState:
    L, D = hp.n_layers, hp.d_model
    s = cfg.cache_buf_len(hp)  # left context + phase slack
    kv_shape = (L, batch, hp.n_heads, s, hp.d_head)
    mk_kv = kv_zeros if kv_int8_enabled() else jnp.zeros
    return StreamState(
        k_cache=mk_kv(kv_shape, dtype),
        v_cache=mk_kv(kv_shape, dtype),
        conv_cache=jnp.zeros((L, batch, cfg.conv_kernel_size - 1, D), dtype=dtype),
        cache_valid=jnp.zeros((batch,), dtype=jnp.int32),
        decode=init_decode_state(batch, hp, dtype=dtype),
        pp_tail=jnp.zeros((batch, PP_TAIL_LEN), dtype=jnp.float32),
        pp_last=jnp.zeros((batch,), dtype=jnp.float32),
        mel_ov=jnp.zeros(
            (batch, cfg.pre_encode_cache_size, cfg.n_mels), dtype=jnp.float32
        ),
    )


def reset_slots(state: StreamState, mask, hp: Hparams) -> StreamState:
    """Zero the state of slots where mask[b] is True (stream join/replace).

    Equivalent to nemo_stream_reset (nemo-stream.cpp:95-115) but per-slot in the
    batched state so a new stream can claim a slot without touching the others.
    """
    m = jnp.asarray(mask)
    b = m.shape[0]

    def z0(x):  # batch at axis 0
        mm = m.reshape((b,) + (1,) * (x.ndim - 1))
        return jnp.where(mm, jnp.zeros_like(x), x)

    def z1(x):  # [L, B, ...] (pytree-valued leaves, e.g. QuantKV, supported)
        def one(a):
            mm = m.reshape((1, b) + (1,) * (a.ndim - 2))
            return jnp.where(mm, jnp.zeros_like(a), a)

        return jax.tree.map(one, x)

    return StreamState(
        k_cache=z1(state.k_cache),
        v_cache=z1(state.v_cache),
        conv_cache=z1(state.conv_cache),
        cache_valid=jnp.where(m, 0, state.cache_valid),
        decode=DecodeState(
            h=z0(state.decode.h),
            c=z0(state.decode.c),
            prev_token=jnp.where(m, hp.blank_id, state.decode.prev_token).astype(
                jnp.int32
            ),
            frame_offset=jnp.where(m, 0, state.decode.frame_offset).astype(jnp.int32),
        ),
        pp_tail=z0(state.pp_tail),
        pp_last=jnp.where(m, 0.0, state.pp_last),
        mel_ov=z0(state.mel_ov),
    )


def extract_slot(state: StreamState, idx: int) -> StreamState:
    """Slot `idx` of a batched state as a host-side batch-1 StreamState.

    Basis of live-stream export (engine migration / checkpoint): the caches
    carry the batch at axis 1 ([L, B, ...]), everything else at axis 0.
    Leaves come back as numpy (QuantKV sub-leaves included), ready to
    serialize or to `install_slot` into another engine's batch."""
    import numpy as np

    def g0(x):
        return jax.tree.map(lambda a: np.asarray(a[idx : idx + 1]), x)

    def g1(x):
        return jax.tree.map(lambda a: np.asarray(a[:, idx : idx + 1]), x)

    return StreamState(
        k_cache=g1(state.k_cache),
        v_cache=g1(state.v_cache),
        conv_cache=g1(state.conv_cache),
        cache_valid=g0(state.cache_valid),
        decode=g0(state.decode),
        pp_tail=g0(state.pp_tail),
        pp_last=g0(state.pp_last),
        mel_ov=g0(state.mel_ov),
    )


def install_slot(state: StreamState, idx: int, snap: StreamState) -> StreamState:
    """Write a batch-1 snapshot (from extract_slot) into slot `idx`.

    Shapes (hence Hparams/CacheConfig/kv-int8 mode) must match the target
    batch; migration between differing configs is a caller error. Every leaf
    is shape-checked explicitly — .at[].set would silently BROADCAST a
    foreign-shaped snapshot into the slot instead of failing."""

    def _set(a, b, axis: int):
        b = jnp.asarray(b, a.dtype)
        want = a.shape[:axis] + (1,) + a.shape[axis + 1 :]
        if b.shape != want:
            raise ValueError(
                f"snapshot leaf shape {b.shape} != expected {want} "
                "(mismatched Hparams/CacheConfig?)")
        sel = (slice(None),) * axis + (slice(idx, idx + 1),)
        return a.at[sel].set(b)

    def s0(x, n):
        return jax.tree.map(lambda a, b: _set(a, b, 0), x, n)

    def s1(x, n):
        return jax.tree.map(lambda a, b: _set(a, b, 1), x, n)

    return StreamState(
        k_cache=s1(state.k_cache, snap.k_cache),
        v_cache=s1(state.v_cache, snap.v_cache),
        conv_cache=s1(state.conv_cache, snap.conv_cache),
        cache_valid=s0(state.cache_valid, snap.cache_valid),
        decode=s0(state.decode, snap.decode),
        pp_tail=s0(state.pp_tail, snap.pp_tail),
        pp_last=s0(state.pp_last, snap.pp_last),
        mel_ov=s0(state.mel_ov, snap.mel_ov),
    )


def prime_frontend(state: StreamState, mask, tails, lasts) -> StreamState:
    """Install per-slot frontend carries (slot join: tail = 256 center-pad
    zeros + the stream's first 96 pre-emphasized samples, so every subsequent
    shift_samples block yields exactly shift_mel_frames frames)."""
    import dataclasses

    m = jnp.asarray(mask)
    return dataclasses.replace(
        state,
        pp_tail=jnp.where(m[:, None], tails, state.pp_tail),
        pp_last=jnp.where(m, lasts, state.pp_last),
    )
