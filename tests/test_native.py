"""Native C++ host runtime vs NumPy fallback parity (and that the library
actually builds in this environment)."""

import numpy as np
import pytest

from nemotron_tpu import native


def test_native_builds():
    assert native.have_native(), "g++ available in this image; build must work"


def test_pcm_preemph_parity():
    rng = np.random.default_rng(0)
    audio = (rng.uniform(-0.5, 0.5, 4096) * 32767).astype(np.int16)
    out, carry = native.pcm_to_f32_preemph(audio, 0.97, 0.125)
    x = audio.astype(np.float32) / 32768.0
    prev = np.concatenate([[0.125], x[:-1]])
    want = x - 0.97 * prev
    np.testing.assert_allclose(out, want, atol=1e-7)
    assert abs(carry - float(x[-1])) < 1e-7


def test_pcm_preemph_f32_and_chunked_carry():
    rng = np.random.default_rng(1)
    audio = rng.uniform(-1, 1, 2000).astype(np.float32)
    whole, carry_w = native.pcm_to_f32_preemph(audio, 0.97, 0.0)
    a, c = native.pcm_to_f32_preemph(audio[:700], 0.97, 0.0)
    b, c = native.pcm_to_f32_preemph(audio[700:], 0.97, c)
    np.testing.assert_allclose(np.concatenate([a, b]), whole, atol=1e-7)
    assert abs(c - carry_w) < 1e-7


def test_frame_signal_parity():
    rng = np.random.default_rng(2)
    buf = rng.standard_normal(2048).astype(np.float32)
    out = native.frame_signal(buf, n_frames=10, hop=160, frame_len=512)
    for t in range(10):
        np.testing.assert_array_equal(out[t], buf[t * 160 : t * 160 + 512])
