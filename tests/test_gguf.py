"""GGUF container round-trip and quantization tests.

Mirrors the role of tests/test_weights.cpp in the reference: every tensor that
goes through the container must come back bit-identical (F32) or within
quantization tolerance (Q8_0/Q4_0).
"""

import numpy as np
import pytest

from nemotron_tpu.gguf.reader import (
    GGML_F16,
    GGML_F32,
    GGML_Q4_0,
    GGML_Q8_0,
    read_gguf,
)
from nemotron_tpu.gguf.writer import write_gguf


def test_roundtrip_f32(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "a.weight": rng.standard_normal((7, 13)).astype(np.float32),
        "b.bias": rng.standard_normal((5,)).astype(np.float32),
        "c.w3d": rng.standard_normal((3, 4, 5)).astype(np.float32),
    }
    kv = {
        "general.architecture": "nemo",
        "nemo.d_model": 64,
        "nemo.eps": 1e-5,
        "tokenizer.vocab_list": ["a", "▁b", "<unk>"],
        "nemo.prompt_ids": [3, 1, 2],
    }
    path = str(tmp_path / "t.gguf")
    write_gguf(path, kv, tensors)
    g = read_gguf(path)
    assert g.kv["general.architecture"] == "nemo"
    assert g.kv["nemo.d_model"] == 64
    assert abs(g.kv["nemo.eps"] - 1e-5) < 1e-12
    assert g.kv["tokenizer.vocab_list"] == ["a", "▁b", "<unk>"]
    assert g.kv["nemo.prompt_ids"] == [3, 1, 2]
    loaded = g.load_all()
    for name, arr in tensors.items():
        assert loaded[name].shape == arr.shape
        np.testing.assert_array_equal(loaded[name], arr)


@pytest.mark.parametrize(
    "ggml_type,tol",
    [(GGML_F16, 1e-3), (GGML_Q8_0, 2.5e-2), (GGML_Q4_0, 4e-1)],
)
def test_roundtrip_quantized(tmp_path, ggml_type, tol):
    rng = np.random.default_rng(1)
    w = rng.standard_normal((64, 96)).astype(np.float32)
    path = str(tmp_path / "q.gguf")
    write_gguf(path, {"general.architecture": "nemo"}, {"w": w}, {"w": ggml_type})
    out = read_gguf(path).load_all()["w"]
    assert out.shape == w.shape
    err = np.abs(out - w).max()
    assert err < tol, f"max dequant err {err}"


def test_q8_matches_reference_block_layout(tmp_path):
    """Each 34-byte block is [f16 scale][32 i8]; scale = amax/127."""
    w = np.arange(64, dtype=np.float32).reshape(2, 32) - 10.0
    path = str(tmp_path / "q8.gguf")
    write_gguf(path, {}, {"w": w}, {"w": GGML_Q8_0})
    g = read_gguf(path)
    raw = g.raw_tensor("w")
    assert len(raw) == 2 * 34
    scale0 = np.frombuffer(raw[:2], dtype=np.float16)[0]
    assert abs(float(scale0) - 21.0 / 127.0) < 1e-3
    out = g.load_all()["w"]
    # worst-case error is half a quantization step: amax(block2)=53 -> 53/127/2
    assert np.abs(out - w).max() < 0.25


def test_alignment_and_offsets(tmp_path):
    tensors = {
        "t1": np.ones((3,), dtype=np.float32),  # 12 bytes -> next aligns to 32
        "t2": np.full((8,), 2.0, dtype=np.float32),
    }
    path = str(tmp_path / "a.gguf")
    write_gguf(path, {}, tensors)
    g = read_gguf(path)
    assert g.tensors["t1"].offset == 0
    assert g.tensors["t2"].offset == 32
    assert g.data_offset % 32 == 0
    loaded = g.load_all()
    np.testing.assert_array_equal(loaded["t2"], tensors["t2"])


def test_model_load_from_synthetic_gguf(tmp_path):
    """Full loader test: write a tiny checkpoint with reference tensor names
    (including the 3D->2D conv reshapes) and load it into pytrees."""
    from helpers import tiny_hparams
    from scripts_support import export_random_checkpoint

    hp = tiny_hparams()
    path = str(tmp_path / "model.gguf")
    export_random_checkpoint(hp, path, seed=3)

    from nemotron_tpu.params import load_model

    hp2, params, meta = load_model(path)
    assert hp2.d_model == hp.d_model
    assert hp2.n_layers == hp.n_layers
    assert hp2.kernel_size == hp.kernel_size
    assert params.layers.attn_q_w.shape == (hp.n_layers, hp.d_model, hp.d_model)
    assert params.layers.conv_dw_w.shape == (hp.n_layers, hp.kernel_size, hp.d_model)
    assert params.decoder.w_ih.shape == (2, 4 * hp.decoder_dim, hp.decoder_dim)
    assert params.subsampling.out_w.shape == (hp.d_model, hp.subsampling_flat_dim)
    assert len(meta["vocab"]) == hp.vocab_size - 1


def test_legacy_vocab_blob_fallback(tmp_path):
    """Files with only the legacy 8-byte-record 'tokenizer.vocab' blob must
    load (reference loader fallback: nemo-ggml.cpp:156-169)."""
    from helpers import tiny_hparams
    from scripts_support import export_random_checkpoint
    from nemotron_tpu.gguf.reader import read_gguf
    from nemotron_tpu.gguf.writer import write_gguf
    from nemotron_tpu.params import load_model

    hp = tiny_hparams()
    path = str(tmp_path / "m.gguf")
    export_random_checkpoint(hp, path, seed=5)
    g = read_gguf(path)
    kv = dict(g.kv)
    vocab = kv.pop("tokenizer.vocab_list")
    blob = bytearray()
    for tok in vocab:
        rec = tok.encode("utf-8")[:7] + b"\x00"
        blob += rec + b"\x00" * (8 - len(rec))
    kv["tokenizer.vocab"] = bytes(blob)
    path2 = str(tmp_path / "legacy.gguf")
    write_gguf(path2, kv, g.load_all())

    hp2, params, meta = load_model(path2)
    assert len(meta["vocab"]) == hp.vocab_size - 1
    # 7-byte-truncated tokens still decode
    assert meta["vocab"][1] == vocab[1][:7] or meta["vocab"][1] == vocab[1]
