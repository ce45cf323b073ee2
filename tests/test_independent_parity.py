"""ASR-core parity against implementations NOT authored in this repo.

Every other parity test in the suite compares the JAX model against NumPy
goldens transcribed from the same reference by the same builder — a shared
misreading would pass all of them. These tests compare the core encoder math
against two independently-authored implementations that ship in this image:

  - HuggingFace transformers' Parakeet (`models/parakeet/modeling_parakeet.py`,
    HF's own port of the NVIDIA FastConformer architecture this model family
    uses): relative sinusoidal positions, rel-pos multi-head attention
    (bias_u/bias_v + rel-shift — the single most misreadable piece of the
    encoder), the conformer feed-forward, and the full block residual
    structure with its 0.5 factors.
  - torch.nn.LSTM for the RNNT prediction network (gate order / gate math).

Scope notes (why not the whole encoder): the reference model is the
cache-aware STREAMING FastConformer — its subsampling and conv-module
convolutions are causal and its conv norm is a layer norm
(src/nemo-ggml.cpp:760-838, 1014-1022), while HF Parakeet implements the
offline variant (centered 'SAME' convs, BatchNorm). Those modules differ by
model family, not by reading; the block-structure test therefore zeroes the
conv branch on both sides (pointwise_conv2 = 0) so everything shared is
compared and nothing family-specific is.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from nemotron_tpu.ops.rel_attention import rel_pos_mha
from nemotron_tpu.params import compute_pos_emb

D_MODEL, N_HEADS, D_FF, T, B = 64, 4, 128, 17, 3
D_HEAD = D_MODEL // N_HEADS
CONV_K = 9


def hf_encoder_config():
    from transformers.models.parakeet import ParakeetEncoderConfig

    return ParakeetEncoderConfig(
        hidden_size=D_MODEL,
        num_hidden_layers=2,
        num_attention_heads=N_HEADS,
        intermediate_size=D_FF,
        attention_bias=False,   # the GGUF checkpoints carry no attn biases
        conv_kernel_size=CONV_K,
        dropout=0.0,
        dropout_positions=0.0,
        layerdrop=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        max_position_embeddings=512,
        attn_implementation="eager",
    )


def rand(rng, *shape):
    return (rng.standard_normal(shape) * 0.1).astype(np.float32)


# --------------------------------------------------------------------------
def test_pos_emb_matches_hf_parakeet():
    """NeMo's descending rel-pos table (params.compute_pos_emb, reference
    nemo-ggml.cpp:17-32) vs HF's ParakeetEncoderRelPositionalEncoding."""
    from transformers.models.parakeet.modeling_parakeet import (
        ParakeetEncoderRelPositionalEncoding,
    )

    mod = ParakeetEncoderRelPositionalEncoding(hf_encoder_config())
    hidden = torch.zeros(1, T, D_MODEL)
    want = mod(hidden).numpy()[0]  # [2T-1, D]

    full = compute_pos_emb(T, D_MODEL)  # rows: +(T-1) ... -(T-1)
    np.testing.assert_allclose(full, want, atol=1e-5)


def _fill_hf_attention(attn, w, rng):
    with torch.no_grad():
        attn.q_proj.weight.copy_(torch.from_numpy(w["q"]))
        attn.k_proj.weight.copy_(torch.from_numpy(w["k"]))
        attn.v_proj.weight.copy_(torch.from_numpy(w["v"]))
        attn.o_proj.weight.copy_(torch.from_numpy(w["o"]))
        attn.relative_k_proj.weight.copy_(torch.from_numpy(w["pos"]))
        attn.bias_u.copy_(torch.from_numpy(w["bias_u"]))
        attn.bias_v.copy_(torch.from_numpy(w["bias_v"]))


def _attn_weights(rng):
    return {
        "q": rand(rng, D_MODEL, D_MODEL),
        "k": rand(rng, D_MODEL, D_MODEL),
        "v": rand(rng, D_MODEL, D_MODEL),
        "o": rand(rng, D_MODEL, D_MODEL),
        "pos": rand(rng, D_MODEL, D_MODEL),
        "bias_u": rand(rng, N_HEADS, D_HEAD),
        "bias_v": rand(rng, N_HEADS, D_HEAD),
    }


def test_rel_pos_mha_matches_hf_parakeet():
    """ops.rel_attention.rel_pos_mha (batch regime, incl. the rel-shift
    realized as pad->reshape->slice / one-hot matmul) vs HF
    ParakeetEncoderAttention. Same weights, same positions, same input."""
    from transformers.models.parakeet.modeling_parakeet import (
        ParakeetEncoderAttention,
        ParakeetEncoderRelPositionalEncoding,
    )

    rng = np.random.default_rng(0)
    cfg = hf_encoder_config()
    w = _attn_weights(rng)
    x = rand(rng, B, T, D_MODEL)

    attn = ParakeetEncoderAttention(cfg, layer_idx=0).eval()
    _fill_hf_attention(attn, w, rng)
    pos_mod = ParakeetEncoderRelPositionalEncoding(cfg)
    xt = torch.from_numpy(x)
    pe_t = pos_mod(xt)  # [1, 2T-1, D]
    with torch.no_grad():
        want, _ = attn(xt, position_embeddings=pe_t)
    want = want.numpy()

    pe = jnp.asarray(pe_t.numpy()[0])
    got = rel_pos_mha(
        jnp.asarray(x), pe,
        jnp.asarray(w["q"]), jnp.asarray(w["k"]), jnp.asarray(w["v"]),
        jnp.asarray(w["pos"]), jnp.asarray(w["o"]),
        jnp.asarray(w["bias_u"]), jnp.asarray(w["bias_v"]),
        N_HEADS, D_HEAD,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_ffn_matches_hf_parakeet():
    from transformers.models.parakeet.modeling_parakeet import (
        ParakeetEncoderFeedForward,
    )

    rng = np.random.default_rng(1)
    w1 = rand(rng, D_FF, D_MODEL)
    w2 = rand(rng, D_MODEL, D_FF)
    x = rand(rng, B, T, D_MODEL)

    ff = ParakeetEncoderFeedForward(hf_encoder_config()).eval()
    with torch.no_grad():
        ff.linear1.weight.copy_(torch.from_numpy(w1))
        ff.linear2.weight.copy_(torch.from_numpy(w2))
        want = ff(torch.from_numpy(x)).numpy()

    from nemotron_tpu.ops.basic import ffn

    got = ffn(jnp.asarray(x), jnp.asarray(w1), jnp.asarray(w2))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def _layer_params(rng, zero_conv: bool):
    """Random ConformerLayerParams with the conv branch optionally zeroed via
    conv_pw2_w = 0 (the conv-internal weights stay random: both sides compute
    their family-specific conv stack, then multiply it by zero)."""
    from nemotron_tpu.params import ConformerLayerParams

    def ln():
        return (1.0 + rand(rng, D_MODEL), rand(rng, D_MODEL))

    n_ff1, n_attn, n_conv, n_ff2, n_fin = ln(), ln(), ln(), ln(), ln()
    w = _attn_weights(rng)
    return ConformerLayerParams(
        norm_ff1_w=jnp.asarray(n_ff1[0]), norm_ff1_b=jnp.asarray(n_ff1[1]),
        ffn1_w1=jnp.asarray(rand(rng, D_FF, D_MODEL)),
        ffn1_w2=jnp.asarray(rand(rng, D_MODEL, D_FF)),
        norm_attn_w=jnp.asarray(n_attn[0]), norm_attn_b=jnp.asarray(n_attn[1]),
        attn_q_w=jnp.asarray(w["q"]), attn_k_w=jnp.asarray(w["k"]),
        attn_v_w=jnp.asarray(w["v"]), attn_pos_w=jnp.asarray(w["pos"]),
        attn_out_w=jnp.asarray(w["o"]),
        pos_bias_u=jnp.asarray(w["bias_u"]), pos_bias_v=jnp.asarray(w["bias_v"]),
        norm_conv_w=jnp.asarray(n_conv[0]), norm_conv_b=jnp.asarray(n_conv[1]),
        conv_pw1_w=jnp.asarray(rand(rng, 2 * D_MODEL, D_MODEL)),
        conv_dw_w=jnp.asarray(rand(rng, CONV_K, D_MODEL)),
        conv_ln_w=jnp.asarray(1.0 + rand(rng, D_MODEL)),
        conv_ln_b=jnp.asarray(rand(rng, D_MODEL)),
        conv_pw2_w=jnp.zeros((D_MODEL, D_MODEL), jnp.float32) if zero_conv
        else jnp.asarray(rand(rng, D_MODEL, D_MODEL)),
        norm_ff2_w=jnp.asarray(n_ff2[0]), norm_ff2_b=jnp.asarray(n_ff2[1]),
        ffn2_w1=jnp.asarray(rand(rng, D_FF, D_MODEL)),
        ffn2_w2=jnp.asarray(rand(rng, D_MODEL, D_FF)),
        norm_final_w=jnp.asarray(n_fin[0]), norm_final_b=jnp.asarray(n_fin[1]),
    ), w


def _fill_hf_block(block, lp, w):
    def set_ln(mod, wt, bt):
        with torch.no_grad():
            mod.weight.copy_(torch.from_numpy(np.array(wt)))
            mod.bias.copy_(torch.from_numpy(np.array(bt)))

    set_ln(block.norm_feed_forward1, lp.norm_ff1_w, lp.norm_ff1_b)
    set_ln(block.norm_self_att, lp.norm_attn_w, lp.norm_attn_b)
    set_ln(block.norm_conv, lp.norm_conv_w, lp.norm_conv_b)
    set_ln(block.norm_feed_forward2, lp.norm_ff2_w, lp.norm_ff2_b)
    set_ln(block.norm_out, lp.norm_final_w, lp.norm_final_b)
    with torch.no_grad():
        block.feed_forward1.linear1.weight.copy_(
            torch.from_numpy(np.array(lp.ffn1_w1)))
        block.feed_forward1.linear2.weight.copy_(
            torch.from_numpy(np.array(lp.ffn1_w2)))
        block.feed_forward2.linear1.weight.copy_(
            torch.from_numpy(np.array(lp.ffn2_w1)))
        block.feed_forward2.linear2.weight.copy_(
            torch.from_numpy(np.array(lp.ffn2_w2)))
        # conv branch: zero pointwise_conv2 on the HF side too; the interior
        # (GLU, depthwise, BatchNorm-vs-LayerNorm) is family-specific and is
        # multiplied by zero on both sides
        block.conv.pointwise_conv2.weight.zero_()
        block.conv.pointwise_conv2.bias.zero_()
    _fill_hf_attention(block.self_attn, w, None)


def test_conformer_block_matches_hf_parakeet():
    """Full block: x + .5*FFN1 -> +MHA -> (+0*conv) -> +.5*FFN2 -> final LN
    (models/encoder.conformer_layer) vs ParakeetEncoderBlock."""
    from transformers.models.parakeet.modeling_parakeet import (
        ParakeetEncoderBlock,
        ParakeetEncoderRelPositionalEncoding,
    )

    from nemotron_tpu.config import Hparams
    from nemotron_tpu.models.encoder import conformer_layer

    rng = np.random.default_rng(2)
    cfg = hf_encoder_config()
    lp, w = _layer_params(rng, zero_conv=True)
    x = rand(rng, B, T, D_MODEL)

    block = ParakeetEncoderBlock(cfg, layer_idx=0).eval()
    _fill_hf_block(block, lp, w)
    pos_mod = ParakeetEncoderRelPositionalEncoding(cfg)
    xt = torch.from_numpy(x)
    pe_t = pos_mod(xt)
    with torch.no_grad():
        want = block(xt, position_embeddings=pe_t).numpy()

    hp = Hparams(d_model=D_MODEL, n_layers=1, n_heads=N_HEADS,
                 d_head=D_HEAD, d_ff=D_FF)
    got = conformer_layer(jnp.asarray(x), jnp.asarray(pe_t.numpy()[0]), lp, hp)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


def test_encoder_stack_matches_hf_parakeet():
    """Three stacked blocks driven exactly like encode_batch's layer loop
    (models/encoder.py:183-186) vs the HF blocks applied in sequence — the
    position embedding is computed once and shared, as in both frameworks."""
    from transformers.models.parakeet.modeling_parakeet import (
        ParakeetEncoderBlock,
        ParakeetEncoderRelPositionalEncoding,
    )

    from nemotron_tpu.config import Hparams
    from nemotron_tpu.models.encoder import conformer_layer

    rng = np.random.default_rng(3)
    cfg = hf_encoder_config()
    x = rand(rng, B, T, D_MODEL)
    layers = [_layer_params(rng, zero_conv=True) for _ in range(3)]

    pos_mod = ParakeetEncoderRelPositionalEncoding(cfg)
    xt = torch.from_numpy(x)
    pe_t = pos_mod(xt)
    with torch.no_grad():
        cur = xt
        for lp, w in layers:
            block = ParakeetEncoderBlock(cfg, layer_idx=0).eval()
            _fill_hf_block(block, lp, w)
            cur = block(cur, position_embeddings=pe_t)
    want = cur.numpy()

    hp = Hparams(d_model=D_MODEL, n_layers=3, n_heads=N_HEADS,
                 d_head=D_HEAD, d_ff=D_FF)
    pe = jnp.asarray(pe_t.numpy()[0])
    got = jnp.asarray(x)
    for lp, _ in layers:
        got = conformer_layer(got, pe, lp, hp)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


# --------------------------------------------------------------------------
def test_lstm_prediction_net_matches_torch():
    """ops.lstm.lstm2_step (the RNNT prediction network cell,
    nemo-ggml.cpp:580-619) vs torch.nn.LSTM with the same weights."""
    from nemotron_tpu.ops.lstm import lstm2_step
    from nemotron_tpu.params import DecoderParams

    rng = np.random.default_rng(4)
    # layer 1's input is layer 0's hidden, and the stacked DecoderParams
    # layout requires equal widths across layers — so d_in == d_h
    d_in = d_h = 56
    steps = 5
    ref = torch.nn.LSTM(d_in, d_h, num_layers=2, batch_first=True).eval()
    dec = DecoderParams(
        embedding=None,
        w_ih=jnp.asarray(np.stack([ref.weight_ih_l0.detach().numpy(),
                                   ref.weight_ih_l1.detach().numpy()])),
        w_hh=jnp.asarray(np.stack([ref.weight_hh_l0.detach().numpy(),
                                   ref.weight_hh_l1.detach().numpy()])),
        b_ih=jnp.asarray(np.stack([ref.bias_ih_l0.detach().numpy(),
                                   ref.bias_ih_l1.detach().numpy()])),
        b_hh=jnp.asarray(np.stack([ref.bias_hh_l0.detach().numpy(),
                                   ref.bias_hh_l1.detach().numpy()])),
    )

    x = (rng.standard_normal((B, steps, d_in)) * 0.5).astype(np.float32)
    with torch.no_grad():
        want, (h_t, c_t) = ref(torch.from_numpy(x))
    want = want.numpy()

    h = jnp.zeros((B, 2, d_h), jnp.float32)
    c = jnp.zeros((B, 2, d_h), jnp.float32)
    outs = []
    for t in range(steps):
        out, h, c = lstm2_step(dec, jnp.asarray(x[:, t]), h, c)
        outs.append(np.asarray(out))
    got = np.stack(outs, axis=1)
    np.testing.assert_allclose(got, want, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(h).transpose(1, 0, 2), h_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(c).transpose(1, 0, 2), c_t.numpy(), atol=1e-5)


# --------------------------------------------------------------------------
def test_mel_frontend_matches_torch_stft():
    """The ASR 128-mel frontend (pre-emphasis, centered framing, DFT, power,
    filterbank matmul, log-zero-guard 2^-24) vs torch.stft with NeMo's exact
    conventions (hann 400 periodic=False inside a 512 FFT, hop 160, constant
    center pad) — the same call HF's ParakeetFeatureExtractor makes
    (feature_extraction_parakeet.py:_torch_extract_fbank_features; its full
    class needs librosa only for the mel FILTERBANK, which is checkpoint
    data shipped in the GGUF, so both sides share one here). Independently-
    authored STFT semantics; our DFT runs as an MXU matmul
    (preprocessor.cpp:330-395 is the reference implementation)."""
    from nemotron_tpu.audio.frontend import StreamPreprocessor

    rng = np.random.default_rng(11)
    n = 16000
    t = np.arange(n) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 317 * t) + 0.1 * rng.standard_normal(n)
    pcm = (np.clip(sig, -1, 1) * 32767).astype(np.int16)

    window = torch.hann_window(400, periodic=False).numpy().astype(np.float32)
    fb = (rng.uniform(0.0, 1.0, (128, 257)) * 0.01).astype(np.float32)

    ours = StreamPreprocessor(fb, window).process(pcm)  # [T, 128]

    x = torch.from_numpy(pcm.astype(np.float32) / 32768.0)
    y = torch.cat([x[:1], x[1:] - 0.97 * x[:-1]])  # NeMo pre-emphasis
    stft = torch.stft(
        y, 512, hop_length=160, win_length=400,
        window=torch.hann_window(400, periodic=False),
        center=True, pad_mode="constant", return_complex=True)
    power = stft.abs() ** 2                      # [257, frames]
    mel = torch.from_numpy(fb) @ power
    want = torch.log(mel + 2.0 ** -24).T.numpy()  # [frames, 128]

    # our streaming framing emits only fully-available frames; torch's
    # center=True additionally right-pads — compare the shared prefix
    k = ours.shape[0]
    assert 90 <= k <= want.shape[0]
    np.testing.assert_allclose(ours, want[:k], atol=3e-4, rtol=1e-4)
