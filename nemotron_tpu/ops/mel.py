"""Mel-spectrogram frontend as MXU matmuls.

The reference computes the STFT with a hand-rolled radix-2 FFT on the host
(src/preprocessor.cpp:80-205). On TPU the natural speed-of-light formulation of
a 512-point real DFT over many frames is two matmuls against constant DFT bases
(512x257 each): windowing, DFT, power, mel filterbank and log all fuse into a
single XLA computation dominated by MXU work. At 257/512 sizes this is exact
(identical math to an FFT up to f32 rounding) and requires no Pallas.

Config (NeMo AudioToMelSpectrogramPreprocessor, preprocessor.cpp:45-74):
16 kHz, win 400, hop 160, n_fft 512, preemph 0.97, 128 mels, guard 2^-24,
power 2. Window is the GGUF 400-sample window centered in the 512 frame.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

N_FFT = 512
WIN_LENGTH = 400
HOP = 160
N_BINS = N_FFT // 2 + 1
PREEMPH = 0.97
LOG_ZERO_GUARD = 2.0 ** -24
SAMPLE_RATE = 16000


@functools.lru_cache(maxsize=2)
def dft_bases(n_fft: int = N_FFT) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag DFT basis matrices [n_fft, n_bins] (forward, e^{-2πi k n / N})."""
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def padded_window(window) -> jnp.ndarray:
    """Center the 400-sample GGUF window in the 512-point frame."""
    window = jnp.asarray(window, dtype=jnp.float32)
    pad = (N_FFT - window.shape[0]) // 2
    return jnp.pad(window, (pad, N_FFT - window.shape[0] - pad))


def mel_from_frames(frames, window512, filterbank):
    """frames: [..., n_frames, n_fft] already pre-emphasized audio windows.
    window512: [n_fft]; filterbank: [n_mels, n_bins].
    Returns log-mel [..., n_frames, n_mels]."""
    cr, ci = dft_bases()
    x = frames * window512
    re = x @ jnp.asarray(cr)
    im = x @ jnp.asarray(ci)
    power = re * re + im * im
    mel = power @ filterbank.T
    return jnp.log(mel + LOG_ZERO_GUARD)


def frame_signal(audio, n_frames: int):
    """audio: [..., n_samples] -> overlapping frames [..., n_frames, n_fft]
    (frame t starts at t*HOP; caller guarantees n_samples >= (n_frames-1)*HOP+N_FFT).

    Stacked static slices, NOT fancy indexing: constant-index gathers still
    lower to element-at-a-time TPU gathers, while slices are free layout ops.
    """
    frames = [
        jax.lax.slice_in_dim(audio, t * HOP, t * HOP + N_FFT, axis=-1)
        for t in range(n_frames)
    ]
    return jnp.stack(frames, axis=-2)


def frame_signal_bulk(audio, n_frames: int):
    """Equivalent to frame_signal for large n_frames (offline path).

    Builds the overlapping [..., n_frames, n_fft] frame tensor from
    ceil(n_fft/hop) shifted reshaped views instead of n_frames stacked
    slices: frame t = concat(block[t], block[t+1], ..., head of block[t+q]),
    where blocks are the hop-strided reshape of the signal. The slice count
    is constant (4 at 512/160), so the offline graph stays small at
    thousands of frames; numerically identical to frame_signal.
    """
    q, r = divmod(N_FFT, HOP)  # frame = q full hop-blocks + r remainder
    n_blocks = n_frames + q + (1 if r else 0)
    need = n_blocks * HOP
    pad = need - audio.shape[-1]
    if pad > 0:
        widths = [(0, 0)] * (audio.ndim - 1) + [(0, pad)]
        audio = jnp.pad(audio, widths)
    blocks = audio[..., :need].reshape(*audio.shape[:-1], n_blocks, HOP)
    parts = [
        jax.lax.slice_in_dim(blocks, i, i + n_frames, axis=-2)
        for i in range(q)
    ]
    if r:
        tail = jax.lax.slice_in_dim(blocks, q, q + n_frames, axis=-2)
        parts.append(tail[..., :r])
    return jnp.concatenate(parts, axis=-1)


def preemphasis(audio, last_sample):
    """audio: [..., N] float; last_sample: [...] carried from previous call."""
    prev = jnp.concatenate(
        [last_sample[..., None], audio[..., :-1]], axis=-1
    )
    return audio - PREEMPH * prev


@functools.partial(jax.jit, static_argnames=("n_frames",))
def mel_step(audio_i16_f32, tail, last_sample, window512, filterbank, *, n_frames):
    """One streaming frontend step (batched).

    audio_i16_f32: [B, n_new] raw samples already scaled to [-1, 1]
    tail:          [B, tail_len] carried pre-emphasized samples
    last_sample:   [B] carried raw sample for pre-emphasis continuity
    Returns (mel [B, n_frames, n_mels], new_tail [B, tail_len], new_last [B]).

    Semantics match src/preprocessor.cpp:330-395: the tail buffer holds
    already-pre-emphasized samples; n_frames consumed = n_frames*HOP samples
    removed from the front.
    """
    emph = preemphasis(audio_i16_f32, last_sample)
    new_last = audio_i16_f32[..., -1]
    buf = jnp.concatenate([tail, emph], axis=-1)
    frames = frame_signal(buf, n_frames)
    mel = mel_from_frames(frames, window512, filterbank)
    consumed = n_frames * HOP
    new_tail = buf[..., consumed:]
    # keep the tail the same length as the input tail for a fixed-shape carry
    new_tail = new_tail[..., new_tail.shape[-1] - tail.shape[-1] :]
    return mel, new_tail, new_last
