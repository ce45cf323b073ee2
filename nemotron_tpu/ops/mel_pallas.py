"""Fused Pallas mel-spectrogram kernel: framing + window + DFT + power +
filterbank + log in ONE kernel.

This is the north-star form of the frontend: the reference does this work
sample-by-sample on the host (src/preprocessor.cpp); the plain-XLA version in
ops/mel.py is already fused by the compiler; this kernel makes the fusion
explicit — per batch-block, the pre-emphasized audio is framed in VMEM with
static slices, windowed, pushed through the real/imag DFT bases on the MXU,
and reduced through the mel filterbank, so no [B, T, 512] frame tensor or
[B, T, 257] spectrogram ever exists in HBM.

DFT bin count (257) is zero-padded to 384 (3x128 lanes) — padded bins carry
zero energy through the (also padded) filterbank, so results are identical.

Select with NEMOTRON_TPU_MEL_KERNEL=pallas (default: xla path in ops/mel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .mel import HOP, LOG_ZERO_GUARD, N_FFT, dft_bases

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

N_BINS_PADDED = 384  # 257 rounded up to 3*128 lanes


@functools.lru_cache(maxsize=2)
def _padded_bases():
    cr, ci = dft_bases(N_FFT)  # [512, 257]
    crp = np.zeros((N_FFT, N_BINS_PADDED), np.float32)
    cip = np.zeros((N_FFT, N_BINS_PADDED), np.float32)
    crp[:, : cr.shape[1]] = cr
    cip[:, : ci.shape[1]] = ci
    return crp, cip


def _pad_fb(fb: np.ndarray) -> np.ndarray:
    out = np.zeros((fb.shape[0], N_BINS_PADDED), np.float32)
    out[:, : fb.shape[1]] = np.asarray(fb, np.float32)
    return out


def _mel_kernel(buf_ref, win_ref, cr_ref, ci_ref, fbt_ref, o_ref, *, n_frames):
    x = buf_ref[:]  # [TB, n_buf] pre-emphasized samples
    tb = x.shape[0]
    frames = [x[:, t * HOP : t * HOP + N_FFT] for t in range(n_frames)]
    fr = jnp.concatenate(frames, axis=0)          # [n_frames*TB, 512]
    fr = fr * win_ref[0]                          # window broadcast
    re = jnp.dot(fr, cr_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(fr, ci_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im                     # [n_frames*TB, 384]
    mel = jnp.dot(power, fbt_ref[:], preferred_element_type=jnp.float32)
    mel = jnp.log(mel + LOG_ZERO_GUARD)           # [n_frames*TB, n_mels]
    n_mels = mel.shape[-1]
    # de-interleave back to [TB, n_frames, n_mels]
    o_ref[:] = jnp.transpose(
        mel.reshape(n_frames, tb, n_mels), (1, 0, 2)
    )


@functools.partial(jax.jit, static_argnames=("n_frames", "block_b", "interpret"))
def mel_frames_pallas(buf, window512, fb_padded_t, *, n_frames,
                      block_b=16, interpret=False):
    """buf: [B, n_buf] pre-emphasized audio (n_buf >= (n_frames-1)*HOP+N_FFT).
    window512: [1, 512]; fb_padded_t: [384, n_mels] (padded, transposed).
    Returns log-mel [B, n_frames, n_mels]."""
    b, n_buf = buf.shape
    n_mels = fb_padded_t.shape[1]
    assert b % block_b == 0, (b, block_b)
    cr, ci = _padded_bases()
    grid = (b // block_b,)
    return pl.pallas_call(
        functools.partial(_mel_kernel, n_frames=n_frames),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, n_buf), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_FFT), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FFT, N_BINS_PADDED), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FFT, N_BINS_PADDED), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_BINS_PADDED, n_mels), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, n_frames, n_mels),
                               lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_frames, n_mels), jnp.float32),
        interpret=interpret,
    )(buf, window512, jnp.asarray(cr), jnp.asarray(ci), fb_padded_t)


def make_mel_step_pallas(filterbank, window):
    """Build a drop-in batched steady-state frontend step using the fused
    kernel: (audio [B, n_new], tail [B, tail_len], last [B]) -> (mel, tail',
    last'). Semantics identical to ops.mel.mel_step."""
    from .mel import PREEMPH, padded_window

    fb_t = jnp.asarray(_pad_fb(np.asarray(filterbank)).T)
    win = padded_window(window)[None, :]

    @functools.partial(jax.jit, static_argnames=("n_frames",))
    def step(audio, tail, last, *, n_frames):
        prev = jnp.concatenate([last[:, None], audio[:, :-1]], axis=1)
        emph = audio - PREEMPH * prev
        buf = jnp.concatenate([tail, emph], axis=1)
        mel = mel_frames_pallas(buf, win, fb_t, n_frames=n_frames)
        consumed = n_frames * HOP
        new_tail = buf[:, consumed:]
        return mel, new_tail, audio[:, -1]

    return step
