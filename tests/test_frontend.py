"""Mel frontend parity: TPU DFT-matmul kernel vs the golden numpy/np.fft
preprocessor, including the carried pre-emphasis / tail-buffer streaming
semantics of src/preprocessor.cpp."""

import numpy as np

from helpers import rand
from ref.numpy_ref import PreprocessorRef

from nemotron_tpu.audio.frontend import StreamPreprocessor, mel_full


def make_audio(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    sig = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(n)
    return (sig * 32767).astype(np.int16)


def make_fb(n_mels=32, seed=1):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, (n_mels, 257)).astype(np.float32)


WINDOW = np.hanning(400).astype(np.float32)


def test_mel_matches_golden_single_call():
    fb = make_fb()
    audio = make_audio(8000)
    ref = PreprocessorRef(fb, WINDOW)
    want = ref.process(audio)
    got = mel_full(audio, fb, WINDOW)
    assert got.shape == want.shape
    assert np.max(np.abs(got - want)) < 2e-4


def test_mel_streaming_chunks_match_single_call():
    fb = make_fb()
    audio = make_audio(12800, seed=2)
    whole = mel_full(audio, fb, WINDOW)

    pp = StreamPreprocessor(fb, WINDOW)
    parts = []
    rng = np.random.default_rng(3)
    i = 0
    while i < len(audio):
        n = int(rng.integers(80, 2000))
        m = pp.process(audio[i : i + n])
        if m.shape[0]:
            parts.append(m)
        i += n
    got = np.concatenate(parts, axis=0)
    # streaming never *loses* frames vs the whole-file call; it may be a few
    # frames short at the end (still-buffered tail), exactly like the reference
    assert got.shape[0] >= whole.shape[0] - 4
    assert np.max(np.abs(got - whole[: got.shape[0]])) < 2e-4


def test_mel_streaming_matches_golden_statefully():
    fb = make_fb()
    audio = make_audio(6400, seed=4)
    ref = PreprocessorRef(fb, WINDOW)
    pp = StreamPreprocessor(fb, WINDOW)
    for chunk in np.split(audio, 4):
        want = ref.process(chunk)
        got = pp.process(chunk)
        assert got.shape == want.shape
        if want.size:
            assert np.max(np.abs(got - want)) < 2e-4


def test_frame_count_formula():
    fb = make_fb()
    pp = StreamPreprocessor(fb, WINDOW)
    # first call: 256 zeros prepad + 1280 samples -> 7 frames
    m = pp.process(make_audio(1280))
    assert m.shape[0] == 7
    # steady state: every 1280 samples -> 8 frames
    for _ in range(3):
        m = pp.process(make_audio(1280, seed=5))
        assert m.shape[0] == 8


def test_wav_reader_roundtrip(tmp_path):
    import struct

    from nemotron_tpu.audio.wavio import maybe_read_audio, read_wav

    samples = make_audio(4000, seed=9)
    path = str(tmp_path / "t.wav")
    data = samples.astype("<i2").tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000,
                                      32000, 2, 16))
        f.write(b"data" + struct.pack("<I", len(data)) + data)
    got, rate = read_wav(path)
    assert rate == 16000
    np.testing.assert_array_equal(got, samples)
    np.testing.assert_array_equal(maybe_read_audio(path), samples)


def test_process_many_matches_individual():
    from nemotron_tpu.audio.frontend import StreamPreprocessor, process_many

    fb = make_fb(seed=6)
    n_streams = 5
    rng = np.random.default_rng(7)
    audios = [make_audio(int(rng.integers(500, 6000)), seed=i)
              for i in range(n_streams)]

    pps_a = [StreamPreprocessor(fb, WINDOW) for _ in range(n_streams)]
    pps_b = [StreamPreprocessor(fb, WINDOW) for _ in range(n_streams)]

    # two rounds to exercise carried state through the batched path
    for rnd in range(2):
        batched = process_many(pps_a, audios)
        for i in range(n_streams):
            single = pps_b[i].process(audios[i])
            assert batched[i].shape == single.shape
            if single.size:
                assert np.max(np.abs(batched[i] - single)) < 1e-5


def test_frame_signal_bulk_matches_stacked_slices():
    """The constant-slice-count bulk framing (offline path) is numerically
    identical to the per-frame stacked-slice formulation."""
    import jax.numpy as jnp

    from nemotron_tpu.ops.mel import HOP, N_FFT, frame_signal, frame_signal_bulk

    rng = np.random.default_rng(7)
    for n_frames in (1, 4, 17, 53):
        n_samples = (n_frames - 1) * HOP + N_FFT
        for shape in ((n_samples,), (3, n_samples)):
            audio = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
            a = np.asarray(frame_signal(audio, n_frames))
            b = np.asarray(frame_signal_bulk(audio, n_frames))
            np.testing.assert_array_equal(a, b)
