"""80-mel logmel frontend for diarization, as batched TPU matmuls.

Matches src/diarize_audio.cpp:136-227 exactly:
  - pre-emphasis in place (y[0] = x[0])
  - STFT center=True with constant (zero) padding, n_frames = 1 + n//hop
  - power -> mel filterbank -> log(x + 2^-24)
  - optional per-feature normalization over t_valid with Bessel (n-1);
    std gets +1e-5 added to the *std* (not the variance)
  - frames >= t_valid zeroed; time padded to a multiple of 16

All window sizes are fixed (VAD 10080 samples -> 64 mel frames; speaker 24000
-> 160), so each call site compiles once and batches many windows.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..ops.mel import dft_bases

N_FFT = 512
HOP = 160
WIN_SIZE = 400
PREEMPH = 0.97
GUARD = 2.0 ** -24
PAD_TO = 16

VAD_WINDOW_SAMPLES = 10080   # 0.63 s
VAD_MEL_VALID = 63
VAD_MEL_PADDED = 64
SPK_WINDOW_SAMPLES = 24000   # 1.5 s
SPK_MEL_VALID = 150
SPK_MEL_PADDED = 160


def _frame_indices(n_samples: int):
    """Static gather indices for center=True framing over the zero-padded
    signal (pad n_fft/2 on the left; right padding as needed)."""
    n_frames = 1 + n_samples // HOP
    half = N_FFT // 2
    pad_right = max(0, (n_frames - 1) * HOP - half + N_FFT - n_samples)
    idx = (np.arange(n_frames)[:, None] * HOP
           + np.arange(N_FFT)[None, :])  # into padded signal
    return n_frames, half, pad_right, idx


def logmel(audio, fb, window, per_feature_norm: bool):
    """audio: [B, n_samples] f32 in [-1, 1]. Returns mel [B, T_padded, n_mels].
    t_valid/t_padded are static for a given n_samples."""
    b, n = audio.shape
    n_frames, half, pad_right, idx = _frame_indices(n)
    t_valid = n // HOP

    # preemphasis in place: y[0] = x[0]
    emph = jnp.concatenate(
        [audio[:, :1], audio[:, 1:] - PREEMPH * audio[:, :-1]], axis=1
    )
    padded = jnp.pad(emph, ((0, 0), (half, pad_right)))
    frames = padded[:, idx]  # [B, n_frames, n_fft]

    win = jnp.zeros((N_FFT,), jnp.float32)
    off = (N_FFT - WIN_SIZE) // 2
    win = win.at[off : off + WIN_SIZE].set(jnp.asarray(window, jnp.float32))

    cr, ci = dft_bases(N_FFT)
    x = frames * win
    re = x @ jnp.asarray(cr)
    im = x @ jnp.asarray(ci)
    power = re * re + im * im
    mel = jnp.log(power @ fb.T + GUARD)  # [B, n_frames, n_mels]

    if per_feature_norm:
        seg = mel[:, :t_valid]
        mean = seg.mean(axis=1, keepdims=True)
        var = jnp.sum((seg - mean) ** 2, axis=1, keepdims=True) / max(1, t_valid - 1)
        std = jnp.sqrt(var) + 1e-5
        seg = (seg - mean) / std
        mel = jnp.concatenate([seg, jnp.zeros_like(mel[:, t_valid:])], axis=1)
    else:
        valid_mask = (jnp.arange(n_frames) < t_valid).astype(mel.dtype)
        mel = mel * valid_mask[None, :, None]

    t_padded = t_valid + ((-t_valid) % PAD_TO)
    if t_padded > n_frames:
        mel = jnp.pad(mel, ((0, 0), (0, t_padded - n_frames), (0, 0)))
    else:
        mel = mel[:, :t_padded]
    return mel
