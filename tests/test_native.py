"""Native C++ host runtime vs NumPy fallback parity (and that the library
actually builds in this environment)."""

import numpy as np
import pytest

from nemotron_tpu import native
from nemotron_tpu.serving import protocol as P


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


def test_wire_parse():
    frames = (
        P.pack(P.OP_STREAM_START, 0, b'{"right_context":0}')
        + P.pack(P.OP_PUSH, 3, b"\x01\x02\x03\x04")
        + P.pack(P.OP_STREAM_END, 3)
    )
    # add a trailing partial frame
    partial = P.pack(P.OP_PUSH, 3, b"x" * 100)[:50]
    buf = frames + partial
    parsed, consumed = native.wire_parse(buf)
    assert consumed == len(frames)
    assert [(op, sid, ln) for op, sid, _off, ln in parsed] == [
        (P.OP_STREAM_START, 0, 19),
        (P.OP_PUSH, 3, 4),
        (P.OP_STREAM_END, 3, 0),
    ]
    op, sid, off, ln = parsed[1]
    assert buf[off : off + ln] == b"\x01\x02\x03\x04"


def test_wire_parse_empty_and_garbage_lengths():
    parsed, consumed = native.wire_parse(b"")
    assert parsed == [] and consumed == 0
    # header claims a huge payload that never arrives -> nothing consumed
    import struct

    buf = struct.pack("<BII", 2, 1, 1 << 30) + b"abc"
    parsed, consumed = native.wire_parse(buf)
    assert parsed == [] and consumed == 0
