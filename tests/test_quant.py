"""Weight-only int8 (Q8_0) path: quantizer parity with the GGUF format,
dequant-in-matmul correctness, Pallas kernel vs XLA path, and a full model
loaded with keep_quantized=True."""

import numpy as np
import pytest

import jax.numpy as jnp

from helpers import tiny_hparams, rand

from nemotron_tpu.gguf.reader import GGML_Q8_0, read_gguf
from nemotron_tpu.ops.basic import linear
from nemotron_tpu.ops.quant import (
    QuantizedTensor,
    dequantize,
    from_gguf_q8,
    linear_q8_pallas,
    linear_q8_xla,
    quantize_q8,
)
from scripts_support import export_random_checkpoint


def test_quantize_roundtrip_error_bound():
    w = rand(64, 128, seed=1)
    qt = quantize_q8(w)
    deq = np.asarray(dequantize(qt))
    # error bounded by half a quantization step per 32-block
    step = np.abs(w).reshape(64, 4, 32).max(axis=2) / 127.0
    bound = np.repeat(step, 32, axis=1) * 0.51 + 1e-7
    assert np.all(np.abs(deq - w) <= bound)


def test_from_gguf_q8_matches_reader():
    """QuantizedTensor built from the raw GGUF payload must dequantize to
    exactly what the reader's reference dequantizer produces."""
    from nemotron_tpu.gguf.writer import write_gguf
    import tempfile, os

    w = rand(32, 96, seed=2)
    path = tempfile.mktemp(suffix=".gguf")
    try:
        write_gguf(path, {}, {"w": w}, {"w": GGML_Q8_0})
        g = read_gguf(path)
        want = g.load_all()["w"]  # reference dequant
        qt = from_gguf_q8(g.raw_tensor("w"), 32, 96)
        got = np.asarray(dequantize(qt))
        np.testing.assert_allclose(got, want, atol=1e-6)
    finally:
        os.unlink(path)


def test_linear_dispatch_quantized():
    w = rand(48, 64, seed=3)
    x = jnp.asarray(rand(5, 64, seed=4))
    qt = quantize_q8(w)
    got = np.asarray(linear(x, qt))
    want = np.asarray(linear(x, dequantize(qt)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pallas_kernel_matches_xla():
    w = rand(256, 512, seed=5)
    x = jnp.asarray(rand(64, 512, seed=6))
    qt = quantize_q8(w)
    want = np.asarray(linear_q8_xla(x, qt))
    got = np.asarray(linear_q8_pallas(x, qt, interpret=True))
    # pallas accumulates in f32 from bf16 operands; compare with bf16 tolerance
    scale = np.abs(want).max()
    assert np.max(np.abs(got - want)) / scale < 2e-2


def test_model_keep_quantized(tmp_path):
    """Full checkpoint with Q8_0 encoder matrices: keep_quantized=True must
    match the dequantize-at-load path bit-for-bit through the encoder."""
    from nemotron_tpu.models.encoder import encode_batch
    from nemotron_tpu.params import load_model

    hp = tiny_hparams()
    path = str(tmp_path / "q8.gguf")
    types = {}
    import re

    # quantize the encoder layer matrices like the reference default pattern
    pat = re.compile(
        r"encoder\.layers\.\d+\.(feed_forward\d+|self_attn|conv)\.[^.]+\.weight$"
    )
    tensors = export_random_checkpoint(hp, path, seed=9)
    types = {
        n: GGML_Q8_0
        for n, a in tensors.items()
        if pat.search(n) and a.ndim >= 2 and a.size >= 256
        and "depthwise" not in n
    }
    assert len(types) > 10
    from nemotron_tpu.gguf.writer import write_gguf

    kv_path = str(tmp_path / "q8b.gguf")
    # re-export with quantization types
    g = read_gguf(path)
    write_gguf(kv_path, g.kv, tensors, types)

    hp1, p_deq, _ = load_model(kv_path, keep_quantized=False)
    hp2, p_q, _ = load_model(kv_path, keep_quantized=True)
    assert isinstance(p_q.layers.ffn1_w1, QuantizedTensor)
    assert p_q.layers.ffn1_w1.w_i8.dtype == jnp.int8
    # depthwise stays dense
    assert not isinstance(p_q.layers.conv_dw_w, QuantizedTensor)

    mel = jnp.asarray(rand(1, 24, hp.n_mels, seed=10))
    out1 = np.asarray(encode_batch(p_deq, hp1, mel))
    out2 = np.asarray(encode_batch(p_q, hp2, mel))
    np.testing.assert_allclose(out1, out2, atol=1e-4)


def test_quantize_encoder_layers_stream_parity():
    """Weight-only int8 across the whole encoder: the fused tick runs and
    stays close to the dense model (Q8_0 error ~0.4%/matmul)."""
    import dataclasses as dc

    import jax.numpy as jnp
    from helpers import tiny_cfg, tiny_model

    from nemotron_tpu.models.asr import fused_serve_tick
    from nemotron_tpu.params import QUANT_LAYER_FIELDS, quantize_encoder_layers
    from nemotron_tpu.streaming.state import init_stream_state

    hp, params = tiny_model(seed=2)
    cfg = tiny_cfg(hp)
    qparams = quantize_encoder_layers(params)
    for f in QUANT_LAYER_FIELDS:
        v = getattr(qparams.layers, f)
        if np.asarray(getattr(params.layers, f)).shape[-1] % 32 == 0:
            assert hasattr(v, "w_i8"), f

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        (rng.uniform(-0.3, 0.3, (2, cfg.shift_samples)) * 32767).astype(np.int16))
    n_valid = jnp.full((2,), cfg.valid_out_len, jnp.int32)

    def run(p):
        state = init_stream_state(2, hp, cfg)
        for _ in range(3):
            state, tokens = fused_serve_tick(
                p, state, audio, n_valid, None, hp=hp, cfg=cfg, phase=0)
        return np.asarray(state.decode.h), np.asarray(tokens)

    h_dense, _ = run(params)
    h_q8, tok_q8 = run(qparams)
    assert np.isfinite(h_q8).all()
    rel = np.abs(h_q8 - h_dense).max() / (np.abs(h_dense).max() + 1e-9)
    assert rel < 0.2, rel


# ---------------------------------------------------------------------------
# Weight-only int4 (Q4_0)
# ---------------------------------------------------------------------------

def test_q4_quantize_roundtrip_error_bound():
    from nemotron_tpu.ops.quant import dequantize_q4, quantize_q4

    w = rand(64, 128, seed=11)
    qt = quantize_q4(w)
    deq = np.asarray(dequantize_q4(qt))
    step = np.abs(w).reshape(64, 4, 32).max(axis=2) / 7.0
    bound = np.repeat(step, 32, axis=1) * 0.51 + 1e-7
    assert np.all(np.abs(deq - w) <= bound)


def test_from_gguf_q4_matches_reader():
    """QuantizedTensor4 built from a raw GGUF Q4_0 payload (and repacked to
    the half-split TPU layout) must dequantize to exactly what the reader's
    reference dequantizer produces."""
    from nemotron_tpu.gguf.reader import dequantize_q4_0
    from nemotron_tpu.gguf.writer import GGML_Q4_0, encode_tensor
    from nemotron_tpu.ops.quant import dequantize_q4, from_gguf_q4

    w = rand(48, 128, seed=12)
    raw = encode_tensor(w, GGML_Q4_0)
    want = dequantize_q4_0(raw, w.size).reshape(48, 128)
    qt = from_gguf_q4(raw, 48, 128)
    got = np.asarray(dequantize_q4(qt))
    np.testing.assert_array_equal(got, want)


def test_linear_dispatch_q4():
    from nemotron_tpu.ops.quant import dequantize_q4, quantize_q4

    w = rand(48, 64, seed=13)
    x = jnp.asarray(rand(5, 64, seed=14))
    qt = quantize_q4(w)
    got = np.asarray(linear(x, qt))
    want = np.asarray(linear(x, dequantize_q4(qt)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_q4_pallas_kernel_matches_xla():
    from nemotron_tpu.ops.quant import (linear_q4_pallas, linear_q4_xla,
                                        quantize_q4)

    w = rand(256, 512, seed=15)
    x = jnp.asarray(rand(64, 512, seed=16))
    qt = quantize_q4(w)
    want = np.asarray(linear_q4_xla(x, qt))
    got = np.asarray(linear_q4_pallas(x, qt, interpret=True))
    scale = np.abs(want).max()
    assert np.max(np.abs(got - want)) / scale < 2e-2


def test_model_keep_quantized_q4(tmp_path):
    """Full checkpoint with Q4_0 encoder matrices: keep_quantized=True must
    match the dequantize-at-load path bit-for-bit through the encoder."""
    import re

    from nemotron_tpu.gguf.reader import GGML_Q4_0
    from nemotron_tpu.gguf.writer import write_gguf
    from nemotron_tpu.models.encoder import encode_batch
    from nemotron_tpu.ops.quant import QuantizedTensor4
    from nemotron_tpu.params import load_model

    hp = tiny_hparams()
    path = str(tmp_path / "q4.gguf")
    pat = re.compile(
        r"encoder\.layers\.\d+\.(feed_forward\d+|self_attn|conv)\.[^.]+\.weight$"
    )
    tensors = export_random_checkpoint(hp, path, seed=19)
    types = {
        n: GGML_Q4_0
        for n, a in tensors.items()
        if pat.search(n) and a.ndim >= 2 and a.size >= 256
        and "depthwise" not in n
    }
    assert len(types) > 10
    kv_path = str(tmp_path / "q4b.gguf")
    g = read_gguf(path)
    write_gguf(kv_path, g.kv, tensors, types)

    hp1, p_deq, _ = load_model(kv_path, keep_quantized=False)
    hp2, p_q, _ = load_model(kv_path, keep_quantized=True)
    has_q4 = any(
        isinstance(getattr(p_q.layers, f), QuantizedTensor4)
        for f in ("ffn1_w1", "attn_q_w", "conv_pw1_w")
    )
    assert has_q4

    mel = jnp.asarray(rand(1, 24, hp.n_mels, seed=20))
    out1 = np.asarray(encode_batch(p_deq, hp1, mel))
    out2 = np.asarray(encode_batch(p_q, hp2, mel))
    np.testing.assert_allclose(out1, out2, atol=1e-4)


def test_quantize_encoder_layers_q4_stream_runs():
    """Weight-only int4 across the encoder: the fused tick runs and stays
    close to the dense model (Q4_0 error ~5%/matmul on random weights)."""
    from helpers import tiny_cfg, tiny_model

    from nemotron_tpu.models.asr import fused_serve_tick
    from nemotron_tpu.params import quantize_encoder_layers
    from nemotron_tpu.streaming.state import init_stream_state

    hp, params = tiny_model(seed=2)
    cfg = tiny_cfg(hp)
    qparams = quantize_encoder_layers(params, bits=4)
    assert hasattr(qparams.layers.ffn1_w1, "w_packed")  # in=64 quantizes
    assert not hasattr(qparams.layers.ffn1_w2, "w_packed")  # in=96 % 64 != 0

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        (rng.uniform(-0.3, 0.3, (2, cfg.shift_samples)) * 32767)
        .astype(np.int16))
    n_valid = jnp.full((2,), cfg.valid_out_len, jnp.int32)
    state = init_stream_state(2, hp, cfg)
    state_q = init_stream_state(2, hp, cfg)
    _, tok_d = fused_serve_tick(params, state, audio, n_valid, None,
                                hp=hp, cfg=cfg)
    _, tok_q = fused_serve_tick(qparams, state_q, audio, n_valid, None,
                                hp=hp, cfg=cfg)
    assert np.asarray(tok_q).shape == np.asarray(tok_d).shape
