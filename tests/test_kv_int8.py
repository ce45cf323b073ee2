"""Int8-quantized K/V cache (NEMOTRON_TPU_KV_INT8): mechanics + numerics.

The quantized cache changes numerics (per-frame max-abs int8, ~0.4% relative
error on history reads), so golden parity stays on the exact path; these
tests pin down what MUST hold exactly:

  - scale folding in the attention contractions is algebraically exact
    (a QuantKV whose dequantized value equals a dense cache produces the
    same attention output on every code path: T=1 VPU, MXU dot, fullbuf)
  - the phased fast path and the gated stationary path see the same
    quantized history (they agree to fp tolerance under the flag)
  - masked ticks keep paused slots' int8 payload + scales bit-identical
  - compaction / realign / reset move or zero the quantized buffers exactly
  - end-to-end drift vs the dense cache stays small
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import tiny_cfg, tiny_model

from nemotron_tpu.models.asr import fused_serve_tick
from nemotron_tpu.models.encoder import (
    compact_cache,
    realign_cache,
    stream_encode_step,
)
from nemotron_tpu.ops.kvquant import (
    QuantKV,
    dequantize_kv,
    quantize_kv,
)
from nemotron_tpu.ops.rel_attention import rel_pos_mha, rel_pos_mha_fullbuf
from nemotron_tpu.streaming.state import init_stream_state, reset_slots

HP, PARAMS = tiny_model(seed=0)
CFG = tiny_cfg(HP)


def mx(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def _int8_state(batch, monkeypatch):
    monkeypatch.setenv("NEMOTRON_TPU_KV_INT8", "1")
    return init_stream_state(batch, HP, CFG)


def test_quantize_roundtrip_bound_and_exactness():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 3, 4, 7, 16)).astype(np.float32))
    q = quantize_kv(x)
    assert q.q.dtype == jnp.int8 and q.s.shape == x.shape[:-1]
    err = np.abs(np.asarray(dequantize_kv(q)) - np.asarray(x))
    bound = np.asarray(q.s)[..., None] * 0.5 + 1e-7
    assert np.all(err <= bound)

    # values that are exact int8 multiples of a power-of-two per-frame scale
    # (with the max |value| = 127 * scale present, so quantize recovers the
    # same scale) round-trip bit-exactly
    ints = rng.integers(-127, 128, (2, 3, 4, 7, 16)).astype(np.float32)
    ints[..., 0] = 127
    scale = (2.0 ** rng.integers(-6, 3, (2, 3, 4, 7, 1))).astype(np.float32)
    exact = jnp.asarray(ints * scale)
    q2 = quantize_kv(exact)
    assert mx(dequantize_kv(q2), exact) == 0.0

    # an all-zero frame must not divide by zero
    q3 = quantize_kv(jnp.zeros((1, 2, 16)))
    assert mx(dequantize_kv(q3), np.zeros((1, 2, 16))) == 0.0


def _mk_quant_cache(rng, shape):
    """A QuantKV and its EXACT dense equivalent. Power-of-two scales make
    the scale folding exact arithmetic (scaling each product term vs the
    reduced sum are both exact), so dense vs quantized attention outputs can
    be compared at fp-noise tolerance."""
    q = rng.integers(-127, 128, shape).astype(np.int8)
    s = (2.0 ** rng.integers(-5, 0, shape[:-1])).astype(np.float32)
    dense = q.astype(np.float32) * s[..., None]
    return QuantKV(q=jnp.asarray(q), s=jnp.asarray(s)), jnp.asarray(dense)


@pytest.mark.parametrize("t", [1, 3])
def test_split_kv_attention_scale_folding_exact(t):
    """rel_pos_mha split_kv (T=1 VPU branch and T>1 MXU branch): quantized
    cache == dense cache when the payload is exactly representable."""
    rng = np.random.default_rng(1)
    B, H, S, Dh = 2, HP.n_heads, 9, HP.d_head
    D = H * Dh
    kq, k_dense = _mk_quant_cache(rng, (B, H, S, Dh))
    vq, v_dense = _mk_quant_cache(rng, (B, H, S, Dh))
    x = jnp.asarray(rng.standard_normal((B, t, D)).astype(np.float32) * 0.3)
    pos = jnp.asarray(
        rng.standard_normal((2 * (S + t) - 1, D)).astype(np.float32) * 0.3)
    w = lambda: jnp.asarray(
        rng.standard_normal((D, D)).astype(np.float32) * 0.1)
    bias = lambda: jnp.asarray(
        rng.standard_normal((H, Dh)).astype(np.float32) * 0.1)
    args = dict(q_w=w(), k_w=w(), v_w=w(), pos_w=w(), out_w=w(),
                bias_u=bias(), bias_v=bias(), n_heads=H, d_head=Dh)

    out_d, kn_d, vn_d = rel_pos_mha(
        x, pos, k_cache=k_dense, v_cache=v_dense,
        left_context=S, split_kv=True, **args)
    out_q, kn_q, vn_q = rel_pos_mha(
        x, pos, k_cache=kq, v_cache=vq,
        left_context=S, split_kv=True, **args)
    assert mx(out_d, out_q) < 1e-5
    assert mx(kn_d, kn_q) == 0.0 and mx(vn_d, vn_q) == 0.0


@pytest.mark.parametrize("t", [1, 2])
def test_fullbuf_attention_scale_folding_exact(t):
    rng = np.random.default_rng(2)
    B, H, S, Dh = 2, HP.n_heads, 12, HP.d_head
    D = H * Dh
    pos_len = 2 * (8 + t) - 1
    kq, k_dense = _mk_quant_cache(rng, (B, H, S, Dh))
    vq, v_dense = _mk_quant_cache(rng, (B, H, S, Dh))
    x = jnp.asarray(rng.standard_normal((B, t, D)).astype(np.float32) * 0.3)
    pos = jnp.asarray(
        rng.standard_normal((pos_len, D)).astype(np.float32) * 0.3)
    onehot = jnp.asarray(
        (rng.uniform(0, 1, (t, pos_len, S + t)) < 0.05).astype(np.float32))
    mask = jnp.where(
        jnp.asarray(rng.uniform(0, 1, (B, S + t)) < 0.2), -1e9, 0.0
    ).astype(jnp.float32)
    w = lambda: jnp.asarray(
        rng.standard_normal((D, D)).astype(np.float32) * 0.1)
    bias = lambda: jnp.asarray(
        rng.standard_normal((H, Dh)).astype(np.float32) * 0.1)
    args = dict(q_w=w(), k_w=w(), v_w=w(), pos_w=w(), out_w=w(),
                bias_u=bias(), bias_v=bias(), n_heads=H, d_head=Dh,
                shift_onehot=onehot, attn_mask=mask)

    out_d, _, _ = rel_pos_mha_fullbuf(x, pos, k_buf=k_dense, v_buf=v_dense,
                                      **args)
    out_q, _, _ = rel_pos_mha_fullbuf(x, pos, k_buf=kq, v_buf=vq, **args)
    assert mx(out_d, out_q) < 1e-5


def test_int8_fast_path_matches_gated(monkeypatch):
    """Fast phased appends + compaction and the gated stationary rewrite
    attend the SAME quantized history -> encoder outputs agree to fp
    tolerance (mirrors test_all_active_fast_path_matches_gated)."""
    monkeypatch.setenv("NEMOTRON_TPU_KV_INT8", "1")
    B = 2
    n_chunks = CFG.n_phases + 2
    sf = init_stream_state(B, HP, CFG)
    kf, vf, cf, valf = sf.k_cache, sf.v_cache, sf.conv_cache, sf.cache_valid
    sg = init_stream_state(B, HP, CFG)
    kg, vg, cg, valg = sg.k_cache, sg.v_cache, sg.conv_cache, sg.cache_valid

    rng = np.random.default_rng(3)
    phase = 0
    for step in range(n_chunks):
        mel = jnp.asarray(rng.standard_normal(
            (B, CFG.chunk_mel_frames, HP.n_mels)).astype(np.float32))
        enc_f, kf, vf, cf, valf = stream_encode_step(
            PARAMS, HP, CFG, mel, kf, vf, cf, valf, phase=phase)
        phase += 1
        if phase >= CFG.n_phases:
            kf, vf = compact_cache(CFG, HP, kf, vf)
            phase = 0
        enc_g, kg, vg, cg, valg = stream_encode_step(
            PARAMS, HP, CFG, mel, kg, vg, cg, valg, phase=1,
            advance_phase=False)
        assert mx(enc_f, enc_g) < 1e-4, step


def test_int8_masked_tick_keeps_paused_bits(monkeypatch):
    """A paused slot's int8 payload AND scales are bit-identical through a
    masked fast tick; the active slot's buffer changes."""
    monkeypatch.setenv("NEMOTRON_TPU_KV_INT8", "1")
    B = 2
    state = init_stream_state(B, HP, CFG)
    rng = np.random.default_rng(4)
    audio = jnp.asarray(
        (rng.uniform(-0.3, 0.3, (B, CFG.shift_samples)) * 32767
         ).astype(np.int16))
    nv = jnp.full((B,), CFG.valid_out_len, jnp.int32)

    # one all-active tick to produce nonzero caches
    state, _ = fused_serve_tick(PARAMS, state, audio, nv, None,
                                hp=HP, cfg=CFG, phase=0)
    k0q = np.asarray(state.k_cache.q).copy()
    k0s = np.asarray(state.k_cache.s).copy()

    act = jnp.asarray([True, False])
    audio2 = jnp.asarray(
        (rng.uniform(-0.3, 0.3, (B, CFG.shift_samples)) * 32767
         ).astype(np.int16))
    state, _ = fused_serve_tick(PARAMS, state, audio2, nv, act,
                                hp=HP, cfg=CFG, phase=1, fast_gated=True)
    assert np.array_equal(np.asarray(state.k_cache.q)[:, 1], k0q[:, 1])
    assert np.array_equal(np.asarray(state.k_cache.s)[:, 1], k0s[:, 1])
    assert not np.array_equal(np.asarray(state.k_cache.q)[:, 0], k0q[:, 0])


def test_int8_compact_realign_reset_move_bits(monkeypatch):
    monkeypatch.setenv("NEMOTRON_TPU_KV_INT8", "1")
    B = 2
    lc = CFG.att_left_context
    chunk = CFG.chunk_len(HP)
    state = init_stream_state(B, HP, CFG)
    rng = np.random.default_rng(5)
    nv = jnp.full((B,), CFG.valid_out_len, jnp.int32)
    phase = 0
    for _ in range(3):
        audio = jnp.asarray(
            (rng.uniform(-0.3, 0.3, (B, CFG.shift_samples)) * 32767
             ).astype(np.int16))
        state, _ = fused_serve_tick(PARAMS, state, audio, nv, None,
                                    hp=HP, cfg=CFG, phase=phase)
        phase += 1

    # compaction at the current phase moves the live window to slot 0
    lo = phase * chunk
    k2, v2 = compact_cache(CFG, HP, state.k_cache, state.v_cache, phase=phase)
    assert np.array_equal(np.asarray(k2.q)[:, :, :, :lc],
                          np.asarray(state.k_cache.q)[:, :, :, lo:lo + lc])
    assert np.array_equal(np.asarray(k2.s)[:, :, :, :lc],
                          np.asarray(state.k_cache.s)[:, :, :, lo:lo + lc])

    # realign rolls only the masked slot
    mask = jnp.asarray([True, False])
    k3, v3 = realign_cache(CFG, HP, k2, v2, 1, mask)
    assert np.array_equal(np.asarray(k3.q)[:, 1], np.asarray(k2.q)[:, 1])
    assert np.array_equal(
        np.asarray(k3.q)[:, 0], np.roll(np.asarray(k2.q)[:, 0], chunk, axis=2))
    assert np.array_equal(
        np.asarray(k3.s)[:, 0], np.roll(np.asarray(k2.s)[:, 0], chunk, axis=2))

    # reset zeroes payload and scales of the masked slot only
    st2 = dataclasses.replace(state, k_cache=k3, v_cache=v3)
    st3 = reset_slots(st2, jnp.asarray([True, False]), HP)
    assert not np.any(np.asarray(st3.k_cache.q)[:, 0])
    assert not np.any(np.asarray(st3.k_cache.s)[:, 0])
    assert np.array_equal(np.asarray(st3.k_cache.q)[:, 1],
                          np.asarray(k3.q)[:, 1])


def test_int8_engine_matches_sessions(monkeypatch):
    """Under NEMOTRON_TPU_KV_INT8=1 the batched engine must still be
    token-identical to independent sessions (both sides run the quantized
    cache, so the equality is exact — this pins the engine's masked ticks /
    compaction / realign machinery on the QuantKV state)."""
    monkeypatch.setenv("NEMOTRON_TPU_KV_INT8", "1")
    from test_engine import build_model, make_audio

    from nemotron_tpu.streaming.engine import BatchedEngine
    from nemotron_tpu.streaming.session import StreamSession

    model, hp = build_model()
    audios = {i: make_audio(8000, seed=10 + i) for i in range(3)}

    want = {}
    for i, audio in audios.items():
        s = StreamSession(model, 0)
        s.process_incremental(audio)
        s.finalize()
        want[i] = s.get_transcript()

    engine = BatchedEngine(model, batch_per_group=4)  # 3 active + 1 idle slot
    texts = {i: "" for i in audios}
    sids = {engine.start_stream(0): i for i in audios}
    for off in range(0, 8000, 1600):
        for sid, i in sids.items():
            engine.push_audio(sid, audios[i][off:off + 1600])
        ev, _ = engine.tick()
        for e in ev:
            texts[sids[e.stream_id]] += e.text
    for sid in sids:
        engine.end_stream(sid)
    for _ in range(50):
        ev, more = engine.tick()
        for e in ev:
            texts[sids[e.stream_id]] += e.text
        if not more:
            break
    for i in audios:
        assert texts[i] == want[i], f"stream {i}"


def test_int8_tracks_dense_end_to_end(monkeypatch):
    """Whole fused ticks: the int8-cache encoder stays close to the dense
    one across a compaction cycle (drift is bounded quantization noise, not
    divergence)."""
    B = 2
    rng = np.random.default_rng(6)
    audios = [
        jnp.asarray((rng.uniform(-0.3, 0.3, (B, CFG.shift_samples)) * 32767
                     ).astype(np.int16))
        for _ in range(CFG.n_phases + 2)
    ]
    nv = jnp.full((B,), CFG.valid_out_len, jnp.int32)

    def run(int8: bool):
        if int8:
            monkeypatch.setenv("NEMOTRON_TPU_KV_INT8", "1")
        else:
            monkeypatch.delenv("NEMOTRON_TPU_KV_INT8", raising=False)
        state = init_stream_state(B, HP, CFG)
        outs = []
        phase = 0
        for audio in audios:
            from nemotron_tpu.models.asr import fused_encode_tick

            state, enc = fused_encode_tick(PARAMS, state, audio, None,
                                           hp=HP, cfg=CFG, phase=phase)
            outs.append(np.asarray(enc))
            phase += 1
            if phase >= CFG.n_phases:
                k, v = compact_cache(CFG, HP, state.k_cache, state.v_cache)
                state = dataclasses.replace(state, k_cache=k, v_cache=v)
                phase = 0
        return np.stack(outs)

    dense = run(False)
    quant = run(True)
    # layer-normed outputs are O(1); int8 history reads perturb them by
    # O(1e-2) on this tiny model — catches wrong-scale wiring (O(1) errors)
    # without flaking on legitimate quantization noise
    assert mx(dense, quant) < 0.2
    assert float(np.mean(np.abs(dense - quant))) < 0.02
    assert mx(dense, quant) > 0.0  # the quantized path actually quantized
