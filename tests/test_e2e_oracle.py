"""Full-pipeline parity against the torch-composed oracle (tests/torch_oracle.py).

VERDICT round-3 item 1: end-to-end audio -> tokens parity against an oracle
built from torch/HF implementations (torch.stft mel, F.conv2d subsampling,
HF ParakeetEncoderAttention, torch.nn.LSTM, a torch greedy-RNNT loop) with
shared random weights — plus module-level parity for the three pieces the
HF block tests could not cover (causal conv subsampling, the conformer conv
module with a non-zeroed conv branch, the joint network).

After these, no ASR-path semantics rest solely on tests/ref/numpy_ref.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

import jax.numpy as jnp

import torch_oracle as O
from helpers import tiny_cfg, tiny_model

HP, PARAMS = tiny_model(seed=0)
CFG = tiny_cfg(HP)


def synth_audio(seconds: float = 1.0, seed: int = 3) -> np.ndarray:
    """Speech-ish PCM: tone bursts + noise (deterministic)."""
    rng = np.random.default_rng(seed)
    n = int(16000 * seconds)
    t = np.arange(n) / 16000.0
    sig = (0.4 * np.sin(2 * np.pi * 220 * t) * (np.sin(2 * np.pi * 3 * t) > 0)
           + 0.3 * np.sin(2 * np.pi * 530 * t)
           + 0.08 * rng.standard_normal(n))
    return (np.clip(sig, -1, 1) * 30000).astype(np.int16)


# --------------------------------------------------------------------------
# module-level parity (the three modules VERDICT flagged as uncovered)
# --------------------------------------------------------------------------
def test_subsampling_matches_torch_conv2d():
    """ops.conv.conv_subsampling (im2col conv0 + shifted-MAC depthwise) vs
    plain F.conv2d with explicit causal padding (nemo-ggml.cpp:897-1029)."""
    from nemotron_tpu.ops.conv import conv_subsampling

    rng = np.random.default_rng(5)
    mel = rng.standard_normal((2, 41, HP.n_mels)).astype(np.float32)
    got = np.asarray(conv_subsampling(PARAMS.subsampling, jnp.asarray(mel)))
    want = O.torch_subsample(torch.from_numpy(mel), PARAMS.subsampling).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_conv_module_matches_torch():
    """The conformer conv module (pw1 -> GLU -> causal depthwise -> LN ->
    SiLU -> pw2) vs torch F.conv1d/F.glu — the branch the HF block tests had
    to zero (nemo-ggml.cpp:760-838)."""
    from nemotron_tpu.ops.basic import glu, linear
    from nemotron_tpu.ops.conv import depthwise_causal_conv1d
    from nemotron_tpu.params import layer_slice

    lp = layer_slice(PARAMS.layers, 0)
    rng = np.random.default_rng(6)
    x = rng.standard_normal((3, 19, HP.d_model)).astype(np.float32)

    cur = glu(linear(jnp.asarray(x), lp.conv_pw1_w))
    cur, _ = depthwise_causal_conv1d(cur, lp.conv_dw_w)
    from nemotron_tpu.ops.basic import layer_norm

    cur = layer_norm(cur, lp.conv_ln_w, lp.conv_ln_b)
    import jax

    got = np.asarray(linear(jax.nn.silu(cur), lp.conv_pw2_w))

    view = O._LayerView(PARAMS.layers, 0, HP)
    want = O.torch_conv_module(torch.from_numpy(x), view).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_conformer_layer_full_conv_matches_torch():
    """Whole conformer layer with the conv branch LIVE (the HF-only test
    zeroes it) vs the torch-composed layer."""
    from transformers.models.parakeet.modeling_parakeet import (
        ParakeetEncoderRelPositionalEncoding,
    )

    from nemotron_tpu.models.encoder import conformer_layer
    from nemotron_tpu.params import layer_slice

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 13, HP.d_model)).astype(np.float32)
    lp = layer_slice(PARAMS.layers, 0)
    view = O._LayerView(PARAMS.layers, 0, HP)

    cfg = O._hf_config(HP, x.shape[1])
    pe_t = ParakeetEncoderRelPositionalEncoding(cfg)(torch.from_numpy(x))
    want = O.torch_conformer_layer(
        torch.from_numpy(x), pe_t, view, attn_mask=None).numpy()

    got = np.asarray(conformer_layer(
        jnp.asarray(x), jnp.asarray(pe_t.numpy()[0]), lp, HP))
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_joint_matches_torch():
    """Joint network (enc proj + dec proj -> relu -> out) vs torch."""
    from nemotron_tpu.models.decoder import joint_step

    rng = np.random.default_rng(8)
    enc_t = rng.standard_normal((4, HP.d_model)).astype(np.float32)
    dec_o = rng.standard_normal((4, HP.decoder_dim)).astype(np.float32)
    got = np.asarray(joint_step(PARAMS.joint, jnp.asarray(enc_t),
                                jnp.asarray(dec_o)))
    jp = PARAMS.joint
    e = torch.from_numpy(enc_t) @ O._t(jp.enc_w).T + O._t(jp.enc_b)
    d = torch.from_numpy(dec_o) @ O._t(jp.dec_w).T + O._t(jp.dec_b)
    want = (torch.relu(e + d) @ O._t(jp.out_w).T + O._t(jp.out_b)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


# --------------------------------------------------------------------------
# framing equivalence that underpins the streaming oracle
# --------------------------------------------------------------------------
def test_streaming_subsample_equals_offline_shifted():
    """The session's chunked subsampled frames == offline causal subsampling
    of the zero-primed mel stream at offset drop_extra_pre_encoded —
    BIT-EXACT (the identity oracle_transcribe_streaming builds on)."""
    from nemotron_tpu.ops.conv import conv_subsampling

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((40, HP.n_mels)).astype(np.float32)
    pre = np.concatenate(
        [np.zeros((CFG.pre_encode_cache_size, HP.n_mels), np.float32), mel])

    buf = pre.copy()
    frames = []
    while buf.shape[0] >= CFG.chunk_mel_frames:
        x = conv_subsampling(
            PARAMS.subsampling, jnp.asarray(buf[None, :CFG.chunk_mel_frames]))
        frames.append(np.asarray(x[0])[CFG.drop_extra_pre_encoded:]
                      [:CFG.chunk_len(HP)])
        buf = buf[CFG.shift_mel_frames:]
    stream_cat = np.concatenate(frames)

    off = np.asarray(conv_subsampling(PARAMS.subsampling, jnp.asarray(pre[None]))[0])
    d = CFG.drop_extra_pre_encoded
    np.testing.assert_array_equal(stream_cat, off[d:d + len(stream_cat)])


# --------------------------------------------------------------------------
# end-to-end token identity
# --------------------------------------------------------------------------
def test_offline_e2e_tokens_match_torch_oracle():
    """audio -> tokens: our full offline pipeline (our mel frontend +
    encode_batch + on-device greedy RNNT) vs the torch oracle (torch.stft
    mel + F.conv2d subsampling + HF attention + torch LSTM/joint/greedy).
    Token IDENTITY, not closeness (docs/STATUS.md:241-260 is the
    real-weights analogue: 121/121 tokens exact)."""
    from nemotron_tpu.api import ASRModel
    from nemotron_tpu.audio.frontend import StreamPreprocessor

    model = ASRModel.random(HP, seed=0)
    pcm = synth_audio(1.0)

    pp = StreamPreprocessor(PARAMS.preproc.filterbank, PARAMS.preproc.window)
    mel_ours = pp.process(pcm)
    got, _frames = model.transcribe_mel(mel_ours)

    mel_oracle = O.torch_mel(
        pcm, np.asarray(PARAMS.preproc.filterbank),
        np.asarray(PARAMS.preproc.window)).numpy()[: mel_ours.shape[0]]
    # the two frontends agree to ~3e-4 (test_independent_parity); both
    # pipelines from mel onward must produce IDENTICAL tokens
    want = O.oracle_transcribe_offline(mel_oracle, PARAMS, HP)
    assert len(want) > 3, "oracle produced a trivial transcript"
    assert got == want


@pytest.mark.parametrize("right_context", [0, 1])
def test_streaming_e2e_tokens_match_torch_oracle(right_context):
    """Chunked StreamSession (incremental PCM feed + finalize) vs the torch
    banded-attention oracle over the same audio: token identity. This is
    batch-vs-stream consistency anchored to an EXTERNAL oracle, not the
    self-authored numpy stream golden.

    right_context=1 exercises the lookahead modes (the reference's default
    is R=13): the chunk grows to chunk_len frames which attend each other
    (within-chunk lookahead), so the SAME banded mask covers every latency
    mode — only chunk_len changes."""
    from nemotron_tpu.api import ASRModel
    from nemotron_tpu.streaming.session import StreamSession

    model = ASRModel.random(HP, seed=0)
    pcm = synth_audio(1.0)
    cfg = tiny_cfg(HP, right_context=right_context)

    sess = StreamSession(model, cfg)
    step = 1600  # 100 ms feeds
    for i in range(0, len(pcm), step):
        sess.process_incremental(pcm[i:i + step])
    sess.finalize()
    got = sess.get_tokens()
    n_frames = int(sess.state.decode.frame_offset[0])
    assert n_frames > 5

    mel_oracle = O.torch_mel(
        pcm, np.asarray(PARAMS.preproc.filterbank),
        np.asarray(PARAMS.preproc.window)).numpy()
    want = O.oracle_transcribe_streaming(mel_oracle, PARAMS, HP, cfg, n_frames)
    assert len(want) > 3, "oracle produced a trivial transcript"
    assert got == want
