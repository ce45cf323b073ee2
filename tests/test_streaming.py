"""Streaming engine parity and behavior tests.

Mirrors the reference's tests/test_streaming.cpp: cache-config math
(test_latency_modes), decoder-state persistence, cached-encoder parity across
chunks, and full stream_step behavior — but with exact numeric golden parity
against the NumPy streaming reference rather than smoke checks.
"""

import jax.numpy as jnp
import numpy as np

from helpers import tiny_cfg, tiny_model, rand
from ref import numpy_ref as R

from nemotron_tpu.config import CacheConfig, Hparams, LatencyMode
from nemotron_tpu.models.asr import stream_step, tokens_to_list
from nemotron_tpu.models.encoder import stream_encode_step
from nemotron_tpu.streaming.state import init_stream_state, reset_slots

HP, PARAMS = tiny_model(seed=0)
CFG = tiny_cfg(HP)
NP_MODEL = R.model_to_numpy(PARAMS, HP)


def mx(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def test_latency_mode_math():
    """Chunk geometry per latency mode (reference: nemo-stream.h:65-100,
    docs/STREAMING_ANALYSIS.md:19-24)."""
    hp = Hparams()
    for mode, chunk, shift, valid, latency in [
        (LatencyMode.PURE_CAUSAL, 17, 8, 1, 170),
        (LatencyMode.ULTRA_LOW, 25, 16, 2, 250),
        (LatencyMode.LOW, 65, 56, 7, 650),
        (LatencyMode.DEFAULT, 121, 112, 14, 1210),
    ]:
        cfg = CacheConfig.for_mode(mode, hp)
        assert cfg.chunk_mel_frames == chunk
        assert cfg.shift_mel_frames == shift
        assert cfg.valid_out_len == valid
        assert cfg.latency_ms == latency
        # encoder frames out per chunk == valid_out_len
        assert cfg.chunk_len(hp) == valid


def test_stream_encoder_parity_multichunk():
    """Cached streaming encoder == golden NumPy streaming encoder over several
    chunks, including the cache warmup masking phase AND a slack-buffer
    compaction boundary (n_chunks > n_phases)."""
    from nemotron_tpu.models.encoder import compact_cache

    n_chunks = CFG.n_phases + 3
    chunk_mel = CFG.chunk_mel_frames
    ref = R.StreamingEncoderRef(NP_MODEL, HP, CFG)

    B = 2
    state = init_stream_state(B, HP, CFG)
    k, v, c, valid = state.k_cache, state.v_cache, state.conv_cache, state.cache_valid

    rng = np.random.default_rng(42)
    phase = 0
    for step in range(n_chunks):
        mel_np = rng.standard_normal((chunk_mel, HP.n_mels)).astype(np.float32)
        mel = jnp.asarray(np.stack([mel_np, mel_np * 0.5]))  # two distinct streams
        enc, k, v, c, valid = stream_encode_step(
            PARAMS, HP, CFG, mel, k, v, c, valid, phase=phase
        )
        phase += 1
        if phase >= CFG.n_phases:
            k, v = compact_cache(CFG, HP, k, v)
            phase = 0
        want = ref.step(mel_np)
        got = np.asarray(enc[0])[: CFG.valid_out_len]
        assert mx(got, want) < 2e-4, f"chunk {step}: {mx(got, want)}"
    assert int(valid[0]) == min(n_chunks * CFG.chunk_len(HP), CFG.att_left_context)


def test_stream_encoder_gated_stationary_parity():
    """The gated (phase-stationary) path must also match the golden encoder,
    at a nonzero phase."""
    n_chunks = 3
    chunk_mel = CFG.chunk_mel_frames
    ref = R.StreamingEncoderRef(NP_MODEL, HP, CFG)
    B = 1
    state = init_stream_state(B, HP, CFG)
    k, v, c, valid = state.k_cache, state.v_cache, state.conv_cache, state.cache_valid
    rng = np.random.default_rng(7)
    for step in range(n_chunks):
        mel_np = rng.standard_normal((chunk_mel, HP.n_mels)).astype(np.float32)
        enc, k, v, c, valid = stream_encode_step(
            PARAMS, HP, CFG, jnp.asarray(mel_np[None]), k, v, c, valid,
            phase=2, advance_phase=False,
        )
        want = ref.step(mel_np)
        assert mx(np.asarray(enc[0])[: CFG.valid_out_len], want) < 2e-4, step


def test_stream_step_full_decode_parity():
    """Full chunk step (encoder + greedy RNNT) matches running the golden
    streaming encoder + golden greedy decode chunk by chunk."""
    B = 1
    chunk_mel = CFG.chunk_mel_frames
    state = init_stream_state(B, HP, CFG)
    ref_enc = R.StreamingEncoderRef(NP_MODEL, HP, CFG)

    h = np.zeros((2, HP.decoder_dim), np.float32)
    c = np.zeros((2, HP.decoder_dim), np.float32)
    prev = HP.blank_id

    rng = np.random.default_rng(7)
    all_got, all_want = [], []
    for _ in range(5):
        mel_np = rng.standard_normal((chunk_mel, HP.n_mels)).astype(np.float32) * 2.0
        mel = jnp.asarray(mel_np[None])
        n_valid = jnp.full((B,), CFG.valid_out_len, dtype=jnp.int32)
        active = jnp.ones((B,), dtype=bool)
        state, tokens = stream_step(
            PARAMS, state, mel, n_valid, active, hp=HP, cfg=CFG
        )
        all_got.extend(tk for tk, _ in tokens_to_list(tokens)[0])

        enc_ref = ref_enc.step(mel_np)
        toks, _frames, h, c, prev = R.greedy_decode(
            enc_ref, NP_MODEL["decoder"], NP_MODEL["joint"], HP.blank_id,
            h=h, c=c, prev_token=prev,
        )
        all_want.extend(toks)

    assert all_got == all_want
    assert int(state.decode.prev_token[0]) == prev
    assert mx(state.decode.h[0], h) < 1e-4


def test_inactive_slot_state_untouched():
    B = 2
    state = init_stream_state(B, HP, CFG)
    # run one active chunk on both to get nonzero caches
    mel = jnp.asarray(rand(B, CFG.chunk_mel_frames, HP.n_mels, seed=3))
    n_valid = jnp.full((B,), CFG.valid_out_len, dtype=jnp.int32)
    state, _ = stream_step(
        PARAMS, state, mel, n_valid, jnp.ones((B,), bool), hp=HP, cfg=CFG
    )
    snapshot = np.asarray(state.k_cache[:, 1])
    snap_valid = int(state.cache_valid[1])
    snap_h = np.asarray(state.decode.h[1])
    # second chunk: only stream 0 active
    active = jnp.asarray([True, False])
    state, tokens = stream_step(
        PARAMS, state, mel, n_valid, active, hp=HP, cfg=CFG
    )
    np.testing.assert_array_equal(np.asarray(state.k_cache[:, 1]), snapshot)
    assert int(state.cache_valid[1]) == snap_valid
    np.testing.assert_array_equal(np.asarray(state.decode.h[1]), snap_h)
    assert np.all(np.asarray(tokens)[1] == -1)  # no emissions for inactive slot


def test_reset_slots():
    B = 2
    state = init_stream_state(B, HP, CFG)
    mel = jnp.asarray(rand(B, CFG.chunk_mel_frames, HP.n_mels, seed=4))
    n_valid = jnp.full((B,), CFG.valid_out_len, dtype=jnp.int32)
    state, _ = stream_step(
        PARAMS, state, mel, n_valid, jnp.ones((B,), bool), hp=HP, cfg=CFG
    )
    state2 = reset_slots(state, jnp.asarray([True, False]), HP)
    assert np.all(np.asarray(state2.k_cache[:, 0]) == 0)
    assert int(state2.cache_valid[0]) == 0
    assert int(state2.decode.prev_token[0]) == HP.blank_id
    assert int(state2.decode.frame_offset[0]) == 0
    # slot 1 untouched
    np.testing.assert_array_equal(
        np.asarray(state2.k_cache[:, 1]), np.asarray(state.k_cache[:, 1])
    )
    assert int(state2.cache_valid[1]) == int(state.cache_valid[1])


def test_final_chunk_valid_out_override():
    """Zero-padded tail chunk decodes only n_valid frames (finalize semantics,
    nemo-stream.cpp:1217-1259)."""
    hp, params = tiny_model(seed=2)
    cfg = tiny_cfg(hp, right_context=3)  # chunk_len = 4
    np_model = R.model_to_numpy(params, hp)
    B = 1
    state = init_stream_state(B, hp, cfg)
    ref_enc = R.StreamingEncoderRef(np_model, hp, cfg)
    rng = np.random.default_rng(9)

    # one normal chunk
    mel1 = rng.standard_normal((cfg.chunk_mel_frames, hp.n_mels)).astype(np.float32)
    state, t1 = stream_step(
        params, state, jnp.asarray(mel1[None]),
        jnp.full((B,), cfg.valid_out_len, jnp.int32), jnp.ones((B,), bool),
        hp=hp, cfg=cfg,
    )
    enc1 = ref_enc.step(mel1)
    toks1, _f, h, c, prev = R.greedy_decode(
        enc1, np_model["decoder"], np_model["joint"], hp.blank_id
    )

    # final partial chunk: 2 valid frames, rest zero-pad
    real_frames = cfg.pre_encode_cache_size + 2 * cfg.subsampling_factor
    mel2 = np.zeros((cfg.chunk_mel_frames, hp.n_mels), np.float32)
    mel2[:real_frames] = rng.standard_normal((real_frames, hp.n_mels)).astype(
        np.float32
    )
    n_valid = jnp.asarray([2], jnp.int32)
    state, t2 = stream_step(
        params, state, jnp.asarray(mel2[None]), n_valid, jnp.ones((B,), bool),
        hp=hp, cfg=cfg,
    )
    enc2 = ref_enc.step(mel2, valid_out_override=2)
    toks2, _f, h, c, prev = R.greedy_decode(
        enc2, np_model["decoder"], np_model["joint"], hp.blank_id,
        h=h, c=c, prev_token=prev,
    )
    got1 = [tk for tk, _ in tokens_to_list(t1)[0]]
    got2 = [tk for tk, _ in tokens_to_list(t2)[0]]
    assert got1 == toks1
    assert got2 == toks2
    # emissions beyond n_valid must be empty
    assert np.all(np.asarray(t2)[0, 2:] == -1)


def test_all_active_fast_path_matches_gated():
    """stream_step(active=None, phased) must equal the gated phase-stationary
    step with all-True — same tokens and the same logical cache window (the
    physical layouts differ: fast appends at the phase offset, gated shifts
    in place)."""
    B = 2
    chunk = CFG.chunk_len(HP)
    lc = CFG.att_left_context
    mel = jnp.asarray(np.random.default_rng(8).standard_normal(
        (B, CFG.chunk_mel_frames, HP.n_mels)).astype(np.float32))
    n_valid = jnp.full((B,), CFG.valid_out_len, jnp.int32)

    s1 = init_stream_state(B, HP, CFG)
    s1, t1 = stream_step(PARAMS, s1, mel, n_valid, jnp.ones((B,), bool),
                         hp=HP, cfg=CFG, phase=0)
    s2 = init_stream_state(B, HP, CFG)
    s2, t2 = stream_step(PARAMS, s2, mel, n_valid, None, hp=HP, cfg=CFG,
                         phase=0)

    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    # gated window stays at [0, lc); fast window is now at [chunk, lc+chunk)
    # (cache layout [L, B, H, S, Dh]: the window lives on axis 3)
    w1 = np.asarray(s1.k_cache)[:, :, :, 0:lc]
    w2 = np.asarray(s2.k_cache)[:, :, :, chunk : lc + chunk]
    np.testing.assert_allclose(w1, w2, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(s1.cache_valid),
                                  np.asarray(s2.cache_valid))


def test_unrolled_fullbuf_matches_scan_layers(monkeypatch):
    """The unrolled full-buffer-attention fast path (default) and the lax.scan
    windowed formulation are two lowerings of the same math — outputs and
    caches must match to float tolerance at every phase."""
    import nemotron_tpu.models.encoder as enc_mod

    B = 2
    rng = np.random.default_rng(11)
    mels = [rng.standard_normal((B, CFG.chunk_mel_frames, HP.n_mels))
            .astype(np.float32) for _ in range(CFG.n_phases)]

    outs = {}
    for scan in (False, True):
        monkeypatch.setattr(enc_mod, "SCAN_LAYERS", scan)
        state = init_stream_state(B, HP, CFG)
        k, v, c, valid = (state.k_cache, state.v_cache, state.conv_cache,
                          state.cache_valid)
        encs = []
        for phase, mel in enumerate(mels):
            e, k, v, c, valid = stream_encode_step(
                PARAMS, HP, CFG, jnp.asarray(mel), k, v, c, valid, phase=phase
            )
            encs.append(np.asarray(e))
        outs[scan] = (np.stack(encs), np.asarray(k), np.asarray(v),
                      np.asarray(c), np.asarray(valid))

    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_allclose(a, b, atol=2e-5)
