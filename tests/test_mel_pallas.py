"""Fused Pallas mel kernel vs the XLA mel path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nemotron_tpu.ops import mel as melops
from nemotron_tpu.ops.mel_pallas import (
    HAVE_PALLAS,
    _pad_fb,
    mel_frames_pallas,
)

pytestmark = pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")


def test_fused_mel_matches_xla_path():
    rng = np.random.default_rng(0)
    B, n_frames = 16, 8
    n_buf = (n_frames - 1) * melops.HOP + melops.N_FFT  # 1632
    buf = rng.standard_normal((B, n_buf)).astype(np.float32) * 0.1
    fb = rng.uniform(0, 1, (128, 257)).astype(np.float32)
    window = np.hanning(400).astype(np.float32)
    win512 = melops.padded_window(window)

    want = np.asarray(melops.mel_from_frames(
        melops.frame_signal(jnp.asarray(buf), n_frames), win512,
        jnp.asarray(fb)))

    got = np.asarray(mel_frames_pallas(
        jnp.asarray(buf), win512[None, :], jnp.asarray(_pad_fb(fb).T),
        n_frames=n_frames, interpret=True))

    assert got.shape == want.shape == (B, n_frames, 128)
    # identical math modulo f32 reduction order
    assert np.max(np.abs(got - want)) < 1e-3


def test_fused_mel_step_semantics():
    """make_mel_step_pallas == ops.mel.mel_step on a steady-state chunk."""
    from nemotron_tpu.ops.mel_pallas import make_mel_step_pallas

    rng = np.random.default_rng(1)
    B, n_frames = 16, 8
    n_new = n_frames * melops.HOP
    tail_len = 416
    audio = jnp.asarray(rng.uniform(-0.3, 0.3, (B, n_new)), dtype=jnp.float32)
    tail = jnp.asarray(rng.uniform(-0.3, 0.3, (B, tail_len)), dtype=jnp.float32)
    last = jnp.asarray(rng.uniform(-0.3, 0.3, B), dtype=jnp.float32)
    fb = rng.uniform(0, 1, (128, 257)).astype(np.float32)
    window = np.hanning(400).astype(np.float32)

    win512 = melops.padded_window(window)
    want_mel, want_tail, want_last = melops.mel_step(
        audio, tail, last, win512, jnp.asarray(fb), n_frames=n_frames)

    import nemotron_tpu.ops.mel_pallas as mp

    orig = mp.mel_frames_pallas
    mp.mel_frames_pallas = lambda *a, **k: orig(*a, **{**k, "interpret": True})
    try:
        step = make_mel_step_pallas(fb, window)
        got_mel, got_tail, got_last = step(audio, tail, last, n_frames=n_frames)
    finally:
        mp.mel_frames_pallas = orig

    np.testing.assert_allclose(np.asarray(got_mel), np.asarray(want_mel),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_tail), np.asarray(want_tail),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_last), np.asarray(want_last),
                               atol=1e-7)
