"""Streaming audio frontend: host-side sample bookkeeping + TPU mel kernel.

Replicates the exact stateful semantics of the reference preprocessor
(src/preprocessor.cpp:330-395): i16 -> f32 scale 1/32768, pre-emphasis with a
carried last-sample, an audio buffer initialized with n_fft/2 zeros (center
padding), frames of 512 at hop 160, and the buffer advanced by
n_frames*hop after each call.

The per-sample work (scale, pre-emphasis, buffer splice) is O(samples) host
numpy; the O(samples * n_fft) spectral work runs on TPU through the fused
DFT-matmul kernel in ops.mel. Frame counts are bucketed to multiples of 8 so a
stream triggers at most a handful of compilations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import mel as melops


import os as _os

_USE_PALLAS_MEL = _os.environ.get("NEMOTRON_TPU_MEL_KERNEL", "xla") == "pallas"


@functools.lru_cache(maxsize=1)
def _pallas_interpret() -> bool:
    """Mosaic only compiles for TPU; interpret elsewhere (CPU test runs)."""
    dev = jax.config.jax_default_device or jax.devices()[0]
    return dev.platform != "tpu"


@functools.partial(jax.jit, static_argnames=("n_frames",))
def _mel_kernel(buf, window512, filterbank, *, n_frames):
    """buf: [..., buf_len] contiguous pre-emphasized samples. Framing happens
    ON DEVICE (stacked slices): uploading the raw buffer instead of expanded
    512-sample windows cuts host->device traffic ~3.2x (frames overlap by 352
    of 512 samples) — the transfer is the serving bottleneck on tunneled TPUs.

    NEMOTRON_TPU_MEL_KERNEL=pallas routes batched 2D calls through the fused
    Pallas kernel (ops/mel_pallas.py) instead of the XLA fusion."""
    if _USE_PALLAS_MEL and buf.ndim == 2 and buf.shape[0] % 8 == 0:
        from ..ops.mel_pallas import HAVE_PALLAS, N_BINS_PADDED, mel_frames_pallas

        # Interpret-only: Mosaic rejects the hop-160 framing slices (lane
        # offsets must be 128-aligned) — measured round 4, lever CLOSED
        # (PERF.md "Fused Pallas mel"). On real TPU the flag falls back to
        # the XLA fusion instead of crashing the serving path.
        if HAVE_PALLAS and _pallas_interpret():
            fb_t = jnp.pad(
                filterbank, ((0, 0), (0, N_BINS_PADDED - filterbank.shape[1]))
            ).T
            return mel_frames_pallas(buf, window512[None, :], fb_t,
                                     n_frames=n_frames, block_b=8,
                                     interpret=True)
    frames = melops.frame_signal(buf, n_frames)
    return melops.mel_from_frames(frames, window512, filterbank)


class StreamPreprocessor:
    """Stateful per-stream mel frontend."""

    def __init__(self, filterbank, window, device=None):
        self.fb = jnp.asarray(filterbank, dtype=jnp.float32)
        self.window512 = melops.padded_window(window)
        self.n_fft = melops.N_FFT
        self.hop = melops.HOP
        self.n_mels = int(self.fb.shape[0])
        # center padding: n_fft/2 zeros (preprocessor.cpp:219-221)
        self.buf = np.zeros(self.n_fft // 2, dtype=np.float32)
        self.last_sample = 0.0
        self.device = device

    def reset(self) -> None:
        self.buf = np.zeros(self.n_fft // 2, dtype=np.float32)
        self.last_sample = 0.0

    def n_frames_for(self, n_new_samples: int) -> int:
        avail = len(self.buf) + n_new_samples
        if avail < self.n_fft:
            return 0
        return (avail - self.n_fft + self.hop) // self.hop

    def process(self, audio_i16) -> np.ndarray:
        """audio_i16: int16 (or float in [-1,1]) samples.
        Returns log-mel [n_frames, n_mels] (possibly empty)."""
        from .. import native

        audio = np.asarray(audio_i16)
        if audio.size == 0:
            return np.zeros((0, self.n_mels), dtype=np.float32)

        # s16 -> f32 scale + carried pre-emphasis (native C++ when available)
        emph, self.last_sample = native.pcm_to_f32_preemph(
            audio, melops.PREEMPH, self.last_sample
        )
        self.buf = np.concatenate([self.buf, emph])

        n_frames = self.n_frames_for(0)
        if n_frames <= 0:
            return np.zeros((0, self.n_mels), dtype=np.float32)

        # Upload the contiguous buffer; frame + mel on device. Frame count
        # padded to a bucket of 8 to bound recompiles.
        n_pad = -(-n_frames // 8) * 8
        buf_len = (n_pad - 1) * self.hop + self.n_fft
        buf = np.zeros(buf_len, dtype=np.float32)
        need = (n_frames - 1) * self.hop + self.n_fft
        buf[:need] = self.buf[:need]
        mel = _mel_kernel(jnp.asarray(buf), self.window512, self.fb,
                          n_frames=n_pad)
        self.buf = self.buf[n_frames * self.hop :].copy()
        return np.asarray(mel[:n_frames])


def process_many_start(pps: list[StreamPreprocessor], audios: list):
    """Phase 1 of process_many: host bookkeeping + async device dispatch.
    Returns a handle for process_many_finish (or None if no frames ready)."""
    from .. import native

    counts = []
    for pp, audio in zip(pps, audios):
        audio = np.asarray(audio)
        if audio.size:
            emph, pp.last_sample = native.pcm_to_f32_preemph(
                audio, melops.PREEMPH, pp.last_sample
            )
            pp.buf = np.concatenate([pp.buf, emph])
        counts.append(pp.n_frames_for(0))

    n_max = max(counts, default=0)
    if n_max <= 0:
        return None
    n_pad = -(-n_max // 8) * 8
    s_pad = 1
    while s_pad < len(pps):
        s_pad *= 2

    buf_len = (n_pad - 1) * melops.HOP + melops.N_FFT
    bufs = np.zeros((s_pad, buf_len), dtype=np.float32)
    for i, (pp, cnt) in enumerate(zip(pps, counts)):
        if cnt > 0:
            need = (cnt - 1) * pp.hop + pp.n_fft
            bufs[i, :need] = pp.buf[:need]
            pp.buf = pp.buf[cnt * pp.hop :].copy()

    mel_future = _mel_kernel(
        jnp.asarray(bufs), pps[0].window512, pps[0].fb, n_frames=n_pad
    )
    return (mel_future, counts)


def process_many_finish(handle) -> list[np.ndarray]:
    """Phase 2: block on the device result and unpack per stream."""
    mel_future, counts = handle
    mel = np.asarray(mel_future)
    return [mel[i, :cnt] for i, cnt in enumerate(counts)]


def process_many(pps: list[StreamPreprocessor], audios: list) -> list[np.ndarray]:
    """Advance many stream preprocessors with ONE device mel call.

    Host-side bookkeeping (pre-emphasis carry, buffer splice) runs per stream
    (native C++), but the spectral work for every stream lands in a single
    batched kernel — the per-slot-dispatch alternative costs one device
    round-trip per stream per tick. Frame counts are padded to the per-call
    max (bucketed) and results unpacked per stream.
    """
    handle = process_many_start(pps, audios)
    if handle is None:
        return [np.zeros((0, pp.n_mels), np.float32) for pp in pps]
    return process_many_finish(handle)


def mel_full(audio_i16, filterbank, window) -> np.ndarray:
    """One-shot (offline) mel of a whole utterance, identical semantics to a
    single process() call on a fresh stream."""
    pp = StreamPreprocessor(filterbank, window)
    return pp.process(audio_i16)
