"""End-to-end torch-composed oracle for the full ASR pipeline.

VERDICT round-3 item 1: the NumPy goldens in tests/ref/numpy_ref.py are
self-authored (same builder as the JAX model — correlated misreadings would
pass), and real checkpoints are unavailable in this environment. This module
composes an audio -> tokens pipeline out of implementations NOT authored in
this repo:

  - mel frontend:        torch.stft (NeMo conventions — the call HF's
                         ParakeetFeatureExtractor makes)
  - conv arithmetic:     torch.nn.functional.conv2d / conv1d (subsampling
                         stack and the conformer depthwise conv)
  - rel-pos attention:   HF transformers' ParakeetEncoderAttention +
                         ParakeetEncoderRelPositionalEncoding (HF's own port
                         of the FastConformer attention, incl. the rel-shift)
  - LN / GLU / SiLU:     torch.nn.functional
  - prediction network:  torch.nn.LSTM
  - joint + greedy loop: ~30 lines of torch below (the loop STRUCTURE follows
                         the published RNNT greedy algorithm: <=10 symbols
                         per frame, state advances only on non-blank —
                         reference semantics nemo-ggml.cpp:1233-1382)

Only the glue (causal padding amounts, module order, chunk banding) is
written here; every tensor op that could hide a math misreading is torch/HF.

Streaming oracle: cache-aware chunked streaming over a causal-conv conformer
is numerically IDENTICAL to one full-sequence pass whose attention is banded
per chunk (each query attends its chunk plus att_left_context frames before
it) — the K/V cache entries a chunk reads are exactly the frames a banded
full pass attends, computed from the same restricted windows. The subsampled
frame stream equals the offline causal subsampling of the zero-primed mel
stream shifted by drop_extra_pre_encoded (verified bit-exact in
test_e2e_oracle.py). Reference semantics: nemo-stream.cpp:132-267.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

MAX_SYMBOLS_PER_STEP = 10


def _t(a) -> torch.Tensor:
    return torch.from_numpy(np.asarray(a, dtype=np.float32))


def torch_mel(pcm_i16: np.ndarray, filterbank: np.ndarray,
              window400: np.ndarray) -> torch.Tensor:
    """PCM s16 -> log-mel [frames, n_mels], NeMo conventions via torch.stft
    (pre-emphasis 0.97, hann 400 in a 512 FFT, hop 160, constant center pad,
    log zero-guard 2^-24). Reference: src/preprocessor.cpp:330-395."""
    x = torch.from_numpy(np.asarray(pcm_i16).astype(np.float32) / 32768.0)
    y = torch.cat([x[:1], x[1:] - 0.97 * x[:-1]])
    stft = torch.stft(
        y, 512, hop_length=160, win_length=400, window=_t(window400),
        center=True, pad_mode="constant", return_complex=True)
    power = stft.abs() ** 2                      # [257, frames]
    mel = _t(filterbank) @ power
    return torch.log(mel + 2.0 ** -24).T         # [frames, n_mels]


def torch_subsample(mel: torch.Tensor, sub) -> torch.Tensor:
    """Causal depthwise-separable 8x subsampling via F.conv2d.

    mel: [B, T, n_mels]. Asymmetric causal padding (k-1, s-1) on both spatial
    axes; flatten order [W, C, H] (flat = c*W_out + w). Reference:
    nemo-ggml.cpp:897-1029."""
    w0, b0 = _t(sub.conv0_w), _t(sub.conv0_b)
    w2, b2 = _t(sub.conv2_w), _t(sub.conv2_b)
    w3, b3 = _t(sub.conv3_w), _t(sub.conv3_b)
    w5, b5 = _t(sub.conv5_w), _t(sub.conv5_b)
    w6, b6 = _t(sub.conv6_w), _t(sub.conv6_b)
    c = w0.shape[0]

    x = mel.unsqueeze(1)                         # [B, 1, H=T, W=mels]
    # F.pad spatial order: (W_left, W_right, H_top, H_bottom)
    x = F.conv2d(F.pad(x, (2, 1, 2, 1)), w0, b0, stride=2)
    x = F.relu(x)
    x = F.conv2d(F.pad(x, (2, 1, 2, 1)), w2, b2, stride=2, groups=c)
    x = F.conv2d(x, w3, b3)
    x = F.relu(x)
    x = F.conv2d(F.pad(x, (2, 1, 2, 1)), w5, b5, stride=2, groups=c)
    x = F.conv2d(x, w6, b6)
    x = F.relu(x)
    b, ch, h, w = x.shape
    flat = x.permute(0, 2, 1, 3).reshape(b, h, ch * w)
    return flat @ _t(sub.out_w).T + _t(sub.out_b)


def _hf_config(hp, max_pos: int):
    from transformers.models.parakeet import ParakeetEncoderConfig

    return ParakeetEncoderConfig(
        hidden_size=hp.d_model,
        num_hidden_layers=hp.n_layers,
        num_attention_heads=hp.n_heads,
        intermediate_size=hp.d_ff,
        attention_bias=False,
        conv_kernel_size=max(hp.kernel_size, 3),
        dropout=0.0, dropout_positions=0.0, layerdrop=0.0,
        activation_dropout=0.0, attention_dropout=0.0,
        max_position_embeddings=max(2 * max_pos, 64),
        attn_implementation="eager",
    )


def _build_hf_attention(cfg, lp):
    from transformers.models.parakeet.modeling_parakeet import (
        ParakeetEncoderAttention,
    )

    attn = ParakeetEncoderAttention(cfg, layer_idx=0).eval()
    with torch.no_grad():
        attn.q_proj.weight.copy_(_t(lp.attn_q_w))
        attn.k_proj.weight.copy_(_t(lp.attn_k_w))
        attn.v_proj.weight.copy_(_t(lp.attn_v_w))
        attn.o_proj.weight.copy_(_t(lp.attn_out_w))
        attn.relative_k_proj.weight.copy_(_t(lp.attn_pos_w))
        attn.bias_u.copy_(_t(lp.pos_bias_u))
        attn.bias_v.copy_(_t(lp.pos_bias_v))
    return attn


def _ln(x, w, b):
    return F.layer_norm(x, (x.shape[-1],), _t(w), _t(b), eps=1e-5)


def torch_conv_module(x: torch.Tensor, lp) -> torch.Tensor:
    """Conformer conv module AFTER its entry LN: pw1 -> GLU -> causal
    depthwise conv1d -> LN -> SiLU -> pw2. x: [B, T, D].
    Reference: nemo-ggml.cpp:760-838 (the 'batch_norm' acts as a layer norm).
    """
    cur = x @ _t(lp.conv_pw1_w).T
    cur = F.glu(cur, dim=-1)
    dw = _t(lp.conv_dw_w)                        # [K, D] kernel-major
    k, d = dw.shape
    w1d = dw.T.unsqueeze(1)                      # [D, 1, K]
    y = F.conv1d(F.pad(cur.transpose(1, 2), (k - 1, 0)), w1d, groups=d)
    cur = y.transpose(1, 2)
    cur = _ln(cur, lp.conv_ln_w, lp.conv_ln_b)
    cur = F.silu(cur)
    return cur @ _t(lp.conv_pw2_w).T


def torch_conformer_layer(x: torch.Tensor, pe: torch.Tensor, lp,
                          attn_mask: torch.Tensor | None) -> torch.Tensor:
    """x + .5*FFN1 -> +MHA -> +Conv -> +.5*FFN2 -> final LN
    (nemo-ggml.cpp:845-890). attn_mask: bool [1, 1, T, T], True = attend."""
    hp = lp._hp
    cfg = _hf_config(hp, x.shape[1])
    res = x
    cur = _ln(res, lp.norm_ff1_w, lp.norm_ff1_b)
    ff = F.silu(cur @ _t(lp.ffn1_w1).T) @ _t(lp.ffn1_w2).T
    res = res + 0.5 * ff

    cur = _ln(res, lp.norm_attn_w, lp.norm_attn_b)
    attn = _build_hf_attention(cfg, lp)
    with torch.no_grad():
        out, _ = attn(cur, position_embeddings=pe, attention_mask=attn_mask)
    res = res + out

    cur = _ln(res, lp.norm_conv_w, lp.norm_conv_b)
    res = res + torch_conv_module(cur, lp)

    cur = _ln(res, lp.norm_ff2_w, lp.norm_ff2_b)
    ff = F.silu(cur @ _t(lp.ffn2_w1).T) @ _t(lp.ffn2_w2).T
    res = res + 0.5 * ff
    return _ln(res, lp.norm_final_w, lp.norm_final_b)


class _LayerView:
    """Per-layer numpy view of the stacked ConformerLayerParams + hp handle."""

    def __init__(self, layers, i: int, hp):
        for f in layers.__dataclass_fields__:
            setattr(self, f, np.asarray(getattr(layers, f))[i])
        self._hp = hp


def chunk_banded_mask(t: int, chunk_len: int, left_context: int) -> torch.Tensor:
    """Bool [1, 1, T, T]: query in chunk c attends keys in
    [c*chunk_len - left_context, (c+1)*chunk_len) — the full-sequence
    equivalent of cache-aware chunked streaming attention."""
    q = torch.arange(t)[:, None]
    kk = torch.arange(t)[None, :]
    c = q // chunk_len
    lo = c * chunk_len - left_context
    hi = (c + 1) * chunk_len
    return ((kk >= lo) & (kk < hi))[None, None]


def torch_encoder(x: torch.Tensor, params, hp,
                  attn_mask: torch.Tensor | None = None) -> torch.Tensor:
    """Full conformer stack over subsampled features x: [B, T, D]."""
    from transformers.models.parakeet.modeling_parakeet import (
        ParakeetEncoderRelPositionalEncoding,
    )

    cfg = _hf_config(hp, x.shape[1])
    pe = ParakeetEncoderRelPositionalEncoding(cfg)(x)  # [1, 2T-1, D]
    for i in range(hp.n_layers):
        lp = _LayerView(params.layers, i, hp)
        x = torch_conformer_layer(x, pe, lp, attn_mask)
    return x


def torch_greedy_rnnt(enc: torch.Tensor, params, hp) -> list[int]:
    """Greedy RNNT over one stream's encoder frames. enc: [T, D].

    <= MAX_SYMBOLS_PER_STEP emissions per frame; argmax over the full logits
    (first-max tie-break); LSTM state and prev token advance ONLY on
    non-blank; blank ends the frame. Reference: nemo-ggml.cpp:1233-1382."""
    dec = params.decoder
    jp = params.joint
    emb_table = _t(dec.embedding)
    lstm = torch.nn.LSTM(hp.decoder_dim, hp.decoder_dim, num_layers=2,
                         batch_first=True).eval()
    with torch.no_grad():
        lstm.weight_ih_l0.copy_(_t(dec.w_ih[0]))
        lstm.weight_ih_l1.copy_(_t(dec.w_ih[1]))
        lstm.weight_hh_l0.copy_(_t(dec.w_hh[0]))
        lstm.weight_hh_l1.copy_(_t(dec.w_hh[1]))
        lstm.bias_ih_l0.copy_(_t(dec.b_ih[0]))
        lstm.bias_ih_l1.copy_(_t(dec.b_ih[1]))
        lstm.bias_hh_l0.copy_(_t(dec.b_hh[0]))
        lstm.bias_hh_l1.copy_(_t(dec.b_hh[1]))

    enc_w, enc_b = _t(jp.enc_w), _t(jp.enc_b)
    dec_w, dec_b = _t(jp.dec_w), _t(jp.dec_b)
    out_w, out_b = _t(jp.out_w), _t(jp.out_b)
    blank = hp.blank_id

    h = torch.zeros(2, 1, hp.decoder_dim)
    c = torch.zeros(2, 1, hp.decoder_dim)
    prev = blank
    tokens: list[int] = []
    with torch.no_grad():
        for t in range(enc.shape[0]):
            e = enc[t] @ enc_w.T + enc_b
            for _s in range(MAX_SYMBOLS_PER_STEP):
                x = emb_table[prev][None, None, :]
                dec_out, (h2, c2) = lstm(x, (h, c))
                d = dec_out[0, 0] @ dec_w.T + dec_b
                logits = F.relu(e + d) @ out_w.T + out_b
                tok = int(torch.argmax(logits))
                if tok == blank:
                    break
                tokens.append(tok)
                h, c, prev = h2, c2, tok
    return tokens


def oracle_transcribe_offline(mel: np.ndarray, params, hp) -> list[int]:
    """Offline pipeline: mel [T, n_mels] -> token ids (full attention, as the
    reference batch path — nemo-ggml.cpp:1038-1079)."""
    x = torch_subsample(_t(mel)[None], params.subsampling)
    enc = torch_encoder(x, params, hp)
    return torch_greedy_rnnt(enc[0], params, hp)


def oracle_transcribe_streaming(mel: np.ndarray, params, hp, cfg,
                                n_frames: int) -> list[int]:
    """Streaming pipeline as one banded full pass.

    mel: the stream's raw mel [T, n_mels] (no priming). The subsampled frame
    stream the session feeds its encoder equals the offline causal
    subsampling of [pre_encode_cache_size zero frames | mel | zero tail]
    shifted by drop_extra_pre_encoded; n_frames is how many encoder frames
    the session actually decoded (chunks * chunk_len + finalize tail)."""
    pre = np.zeros((cfg.pre_encode_cache_size, mel.shape[1]), np.float32)
    tail = np.zeros((cfg.chunk_mel_frames, mel.shape[1]), np.float32)
    full = np.concatenate([pre, mel.astype(np.float32), tail])
    x = torch_subsample(_t(full)[None], params.subsampling)
    x = x[:, cfg.drop_extra_pre_encoded:, :][:, :n_frames, :]
    chunk_len = cfg.chunk_len(hp)
    mask = chunk_banded_mask(x.shape[1], chunk_len, cfg.att_left_context)
    enc = torch_encoder(x, params, hp, attn_mask=mask)
    return torch_greedy_rnnt(enc[0], params, hp)
