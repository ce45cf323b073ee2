"""Golden NumPy reference implementation (test-only).

Plays the role of the reference repo's scalar C++ implementation
(reference: src/reference/, used by tests/test_compute.cpp): a simple,
loop-heavy, obviously-correct implementation of every module, against which the
JAX/TPU implementation is compared op-by-op and end-to-end.

Semantics are transcribed from the reference's graph builders:
  - layer norm / ffn / lstm / joint: src/nemo-ggml.cpp:547-619, 1186-1224
  - rel-shift + rel-pos MHA (batch): src/nemo-ggml.cpp:625-755
  - conformer conv + layer: src/nemo-ggml.cpp:760-890
  - causal conv2d subsampling: src/nemo-ggml.cpp:897-1029
  - cached (streaming) variants: src/nemo-stream.cpp:336-690
  - greedy RNNT decode: src/nemo-ggml.cpp:1233-1382

All functions operate on single-sequence numpy arrays [T, D] (no batch dim).
Weights come in PyTorch orientation (out, in).
"""

from __future__ import annotations

import numpy as np


def np_leaf(x):
    return np.asarray(x, dtype=np.float32)


def layer_norm(x, w, b, eps=1e-5):
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def silu(x):
    return x / (1.0 + np.exp(-x))


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def ffn(x, w1, w2):
    return silu(x @ w1.T) @ w2.T


def lstm_cell(x, h, c, w_ih, w_hh, b_ih, b_hh):
    """PyTorch LSTM cell, gate order [i, f, g, o]."""
    gates = x @ w_ih.T + h @ w_hh.T + b_ih + b_hh
    hs = h.shape[-1]
    i = sigmoid(gates[..., 0 * hs : 1 * hs])
    f = sigmoid(gates[..., 1 * hs : 2 * hs])
    g = np.tanh(gates[..., 2 * hs : 3 * hs])
    o = sigmoid(gates[..., 3 * hs : 4 * hs])
    c_new = f * c + i * g
    h_new = o * np.tanh(c_new)
    return h_new, c_new


def decoder_step(dec, token_emb, h, c):
    """2-layer LSTM step. h, c: [2, hidden]. Returns (out, h', c')."""
    h0, c0 = lstm_cell(token_emb, h[0], c[0], dec["w_ih"][0], dec["w_hh"][0],
                       dec["b_ih"][0], dec["b_hh"][0])
    h1, c1 = lstm_cell(h0, h[1], c[1], dec["w_ih"][1], dec["w_hh"][1],
                       dec["b_ih"][1], dec["b_hh"][1])
    return h1, np.stack([h0, h1]), np.stack([c0, c1])


def joint(jp, enc, dec):
    e = enc @ jp["enc_w"].T + jp["enc_b"]
    d = dec @ jp["dec_w"].T + jp["dec_b"]
    h = np.maximum(e + d, 0.0)
    return h @ jp["out_w"].T + jp["out_b"]


def rel_shift(raw, klen):
    """The exact pad->reshape->drop->reshape->slice trick of the C++ builders
    (nemo-ggml.cpp:625-662, nemo-stream.cpp:419-461), transcribed to numpy
    row-major. raw: [qlen, pos_len]; returns [qlen, klen]."""
    q, pos_len = raw.shape
    padded = np.concatenate([np.zeros((q, 1), raw.dtype), raw], axis=1)
    flat = padded.reshape(-1)
    dropped = flat[q:]
    back = dropped[: q * pos_len].reshape(q, pos_len)
    return back[:, :klen].copy()


def rel_pos_mha(x, pos_emb, lp, n_heads, d_head, k_cache=None, v_cache=None,
                attn_mask=None, left_context=None):
    """Relative-position MHA. x: [T, D]. pos_emb: [pos_len, D].

    Batch mode: k_cache/v_cache None, klen = T, pos_len = 2T-1.
    Cached mode: k_cache/v_cache [cache_len, D]; pos_len = 2*(cache+T)-1;
    returns (out, k_cache_new, v_cache_new) where new caches are the last
    `left_context` rows of the concatenated K/V projections.
    attn_mask: [klen] additive (0 valid / -1e9 masked) or None.
    """
    T, D = x.shape
    q = x @ lp["attn_q_w"].T
    k_new = x @ lp["attn_k_w"].T
    v_new = x @ lp["attn_v_w"].T
    if k_cache is not None:
        k = np.concatenate([k_cache, k_new], axis=0)
        v = np.concatenate([v_cache, v_new], axis=0)
    else:
        k, v = k_new, v_new
    klen = k.shape[0]
    cache_out = None
    if left_context is not None:
        n_keep = min(klen, left_context)
        cache_out = (k[klen - n_keep:].copy(), v[klen - n_keep:].copy())

    pos = pos_emb @ lp["attn_pos_w"].T  # [pos_len, D]
    pos_len = pos.shape[0]

    out_ctx = np.zeros((T, D), dtype=np.float32)
    scale = 1.0 / np.sqrt(d_head)
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        qh = q[:, sl]
        kh = k[:, sl]
        vh = v[:, sl]
        ph = pos[:, sl]
        bu = np.asarray(lp["pos_bias_u"])[h]
        bv = np.asarray(lp["pos_bias_v"])[h]
        content = (qh + bu) @ kh.T                       # [T, klen]
        pos_raw = (qh + bv) @ ph.T                        # [T, pos_len]
        pos_sc = rel_shift(pos_raw, klen)                 # [T, klen]
        scores = (content + pos_sc) * scale
        if attn_mask is not None:
            scores = scores + attn_mask[None, :]
        scores = scores - scores.max(axis=-1, keepdims=True)
        w = np.exp(scores)
        w = w / w.sum(axis=-1, keepdims=True)
        out_ctx[:, sl] = w @ vh
    out = out_ctx @ lp["attn_out_w"].T
    if left_context is not None:
        return out, cache_out[0], cache_out[1]
    return out


def depthwise_causal_conv1d(x, dw_w, cache=None):
    """x: [T, D]; dw_w: [K, D] kernel-major. Causal: left pad K-1 (zeros or cache).
    Returns (y [T, D], new_cache [K-1, D])."""
    K, D = dw_w.shape
    T = x.shape[0]
    if cache is None:
        cache = np.zeros((K - 1, D), dtype=np.float32)
    padded = np.concatenate([cache, x], axis=0)  # [K-1+T, D]
    y = np.zeros((T, D), dtype=np.float32)
    for t in range(T):
        for k in range(K):
            y[t] += padded[t + k] * dw_w[k]
    new_cache = padded[-(K - 1):].copy()
    return y, new_cache


def conformer_conv(x, lp, cache=None):
    """Conv module: pw1 -> GLU -> causal dw conv -> LN -> SiLU -> pw2.
    Returns (y, new_cache)."""
    d = x.shape[-1]
    cur = x @ lp["conv_pw1_w"].T            # [T, 2D]
    a, b = cur[:, :d], cur[:, d:]
    cur = a * sigmoid(b)
    cur, new_cache = depthwise_causal_conv1d(cur, np.asarray(lp["conv_dw_w"]), cache)
    cur = layer_norm(cur, lp["conv_ln_w"], lp["conv_ln_b"])
    cur = silu(cur)
    return cur @ lp["conv_pw2_w"].T, new_cache


def conformer_layer(x, pos_emb, lp, n_heads, d_head, k_cache=None, v_cache=None,
                    conv_cache=None, attn_mask=None, left_context=None):
    """Full layer: .5*FFN1 -> MHA -> Conv -> .5*FFN2 -> final LN.
    Batch mode when caches None; cached mode returns (y, kc, vc, cc)."""
    cached = k_cache is not None or left_context is not None
    res = x
    cur = layer_norm(res, lp["norm_ff1_w"], lp["norm_ff1_b"])
    res = res + 0.5 * ffn(cur, lp["ffn1_w1"], lp["ffn1_w2"])

    cur = layer_norm(res, lp["norm_attn_w"], lp["norm_attn_b"])
    if cached:
        cur, kc, vc = rel_pos_mha(cur, pos_emb, lp, n_heads, d_head,
                                  k_cache, v_cache, attn_mask, left_context)
    else:
        cur = rel_pos_mha(cur, pos_emb, lp, n_heads, d_head)
        kc = vc = None
    res = res + cur

    cur = layer_norm(res, lp["norm_conv_w"], lp["norm_conv_b"])
    cur, cc = conformer_conv(cur, lp, conv_cache)
    res = res + cur

    cur = layer_norm(res, lp["norm_ff2_w"], lp["norm_ff2_b"])
    res = res + 0.5 * ffn(cur, lp["ffn2_w1"], lp["ffn2_w2"])

    y = layer_norm(res, lp["norm_final_w"], lp["norm_final_b"])
    if cached:
        return y, kc, vc, cc
    return y


def causal_conv2d(x, w, b, stride):
    """x: [H, W, C_in] (H=time, W=freq); w: (OC, IC, KH, KW) torch layout.
    Causal asymmetric pad: (k-1, s-1) on both spatial axes (nemo-ggml.cpp:897-919).
    """
    OC, IC, KH, KW = w.shape
    H, W, _ = x.shape
    xp = np.pad(x, ((KH - 1, stride - 1), (KW - 1, stride - 1), (0, 0)))
    Ho = (xp.shape[0] - KH) // stride + 1
    Wo = (xp.shape[1] - KW) // stride + 1
    y = np.zeros((Ho, Wo, OC), dtype=np.float32)
    for i in range(Ho):
        for j in range(Wo):
            patch = xp[i * stride : i * stride + KH, j * stride : j * stride + KW, :]
            # patch [KH, KW, IC] ; w [OC, IC, KH, KW]
            y[i, j] = np.einsum("hwc,ochw->o", patch, w) + b
    return y


def causal_dw_conv2d(x, w, b, stride):
    """Depthwise: w (C, 1, KH, KW)."""
    C, _, KH, KW = w.shape
    xp = np.pad(x, ((KH - 1, stride - 1), (KW - 1, stride - 1), (0, 0)))
    Ho = (xp.shape[0] - KH) // stride + 1
    Wo = (xp.shape[1] - KW) // stride + 1
    y = np.zeros((Ho, Wo, C), dtype=np.float32)
    for i in range(Ho):
        for j in range(Wo):
            patch = xp[i * stride : i * stride + KH, j * stride : j * stride + KW, :]
            y[i, j] = np.einsum("hwc,chw->c", patch, w[:, 0]) + b
    return y


def conv_subsampling(mel, sub):
    """mel: [T, n_mels] -> [T_out, d_model]. Flatten order flat = c*W + w
    (nemo-ggml.cpp:1014-1022)."""
    x = mel[:, :, None]  # [H=T, W=mels, C=1]
    x = causal_conv2d(x, np_leaf(sub["conv0_w"]), np_leaf(sub["conv0_b"]), 2)
    x = np.maximum(x, 0)
    x = causal_dw_conv2d(x, np_leaf(sub["conv2_w"]), np_leaf(sub["conv2_b"]), 2)
    # pointwise conv = per-pixel linear over channels
    w3 = np_leaf(sub["conv3_w"])[:, :, 0, 0]
    x = x @ w3.T + np_leaf(sub["conv3_b"])
    x = np.maximum(x, 0)
    x = causal_dw_conv2d(x, np_leaf(sub["conv5_w"]), np_leaf(sub["conv5_b"]), 2)
    w6 = np_leaf(sub["conv6_w"])[:, :, 0, 0]
    x = x @ w6.T + np_leaf(sub["conv6_b"])
    x = np.maximum(x, 0)
    # x: [Ho, Wo, C] -> flat [Ho, C*Wo] with index c*Wo + w
    Ho, Wo, C = x.shape
    flat = x.transpose(0, 2, 1).reshape(Ho, C * Wo)
    return flat @ np_leaf(sub["out_w"]).T + np_leaf(sub["out_b"])


def pos_emb_slice(pos_table, pos_len):
    """Centered slice of the precomputed table (nemo-ggml.cpp:1059-1068)."""
    max_pos_len = pos_table.shape[0]
    off = (max_pos_len - pos_len) // 2
    return pos_table[off : off + pos_len]


def encoder_batch(mel, model, hp):
    """Full batch encoder: subsampling + all layers (nemo-ggml.cpp:1038-1079)."""
    x = conv_subsampling(mel, model["subsampling"])
    T = x.shape[0]
    pe = pos_emb_slice(np_leaf(model["pos_emb"]), 2 * T - 1)
    for lp in model["layers"]:
        x = conformer_layer(x, pe, lp, hp.n_heads, hp.d_head)
    return x


def prompt_fusion(enc, onehot, pk):
    """Multilingual lang-ID fusion (nemo-ggml.cpp:1087-1105)."""
    cat = np.concatenate([enc, onehot], axis=-1)
    h = np.maximum(cat @ np_leaf(pk["fc1_w"]).T + np_leaf(pk["fc1_b"]), 0)
    return h @ np_leaf(pk["fc2_w"]).T + np_leaf(pk["fc2_b"])


def greedy_decode(enc_out, dec, jp, blank_id, max_symbols=10,
                  h=None, c=None, prev_token=None):
    """Greedy RNNT over encoder frames. LSTM state advances only on non-blank
    emission (nemo-ggml.cpp:1358-1369). Returns (tokens, frames, h, c, prev)."""
    Dd = dec["w_hh"].shape[-1]
    if h is None:
        h = np.zeros((2, Dd), dtype=np.float32)
        c = np.zeros((2, Dd), dtype=np.float32)
        prev_token = blank_id
    tokens, frames = [], []
    emb = np_leaf(dec["embedding"])
    for t in range(enc_out.shape[0]):
        enc_t = enc_out[t]
        for _ in range(max_symbols):
            dec_out, h_new, c_new = decoder_step(dec, emb[prev_token], h, c)
            logits = joint(jp, enc_t, dec_out)
            tok = int(np.argmax(logits))
            if tok == blank_id:
                break
            tokens.append(tok)
            frames.append(t)
            prev_token = tok
            h, c = h_new, c_new
    return tokens, frames, h, c, prev_token


class StreamingEncoderRef:
    """Golden streaming encoder: per-chunk cached conformer stack with the exact
    mask / drop / truncation semantics of nemo-stream.cpp:1013-1128."""

    def __init__(self, model, hp, cfg):
        self.model = model
        self.hp = hp
        self.cfg = cfg
        L, D = hp.n_layers, hp.d_model
        C = cfg.att_left_context
        self.k_cache = np.zeros((L, C, D), dtype=np.float32)
        self.v_cache = np.zeros((L, C, D), dtype=np.float32)
        self.conv_cache = np.zeros((L, cfg.conv_kernel_size - 1, D), dtype=np.float32)
        self.cache_valid = 0

    def step(self, mel_chunk, valid_out_override=None):
        """mel_chunk: [chunk_mel_frames, n_mels] -> [n_valid, d_model]."""
        hp, cfg = self.hp, self.cfg
        x = conv_subsampling(mel_chunk, self.model["subsampling"])
        x = x[cfg.drop_extra_pre_encoded:]
        chunk_len = x.shape[0]
        C = cfg.att_left_context
        kv_len = C + chunk_len
        pe = pos_emb_slice(np_leaf(self.model["pos_emb"]), 2 * kv_len - 1)
        offset = C - self.cache_valid
        mask = np.where(np.arange(kv_len) < offset, -1e9, 0.0).astype(np.float32)
        for li, lp in enumerate(self.model["layers"]):
            x, kc, vc, cc = conformer_layer(
                x, pe, lp, hp.n_heads, hp.d_head,
                k_cache=self.k_cache[li], v_cache=self.v_cache[li],
                conv_cache=self.conv_cache[li], attn_mask=mask, left_context=C,
            )
            self.k_cache[li] = kc
            self.v_cache[li] = vc
            self.conv_cache[li] = cc
        self.cache_valid = min(self.cache_valid + chunk_len, C)
        n_valid = cfg.valid_out_len if valid_out_override is None else valid_out_override
        return x[: min(chunk_len, n_valid)]


class PreprocessorRef:
    """Golden stateful mel frontend mirroring src/preprocessor.cpp exactly
    (center pre-pad, carried preemphasis, tail carry), with np.fft for the DFT."""

    def __init__(self, filterbank, window, sample_rate=16000, n_fft=512,
                 win_length=400, hop=160, preemph=0.97,
                 log_zero_guard=2.0 ** -24):
        self.n_fft = n_fft
        self.hop = hop
        self.preemph = preemph
        self.guard = log_zero_guard
        self.fb = np.asarray(filterbank, dtype=np.float32)  # [n_mels, n_bins]
        pad = (n_fft - win_length) // 2
        self.window = np.zeros(n_fft, dtype=np.float32)
        self.window[pad : pad + win_length] = np.asarray(window, dtype=np.float32)
        self.audio_buf = np.zeros(n_fft // 2, dtype=np.float32)  # center padding
        self.last_sample = 0.0

    def process(self, audio_i16):
        """audio: int16 samples. Returns mel [n_frames, n_mels] (may be empty)."""
        x = np.asarray(audio_i16, dtype=np.float32) / 32768.0
        prev = np.concatenate([[self.last_sample], x[:-1]])
        emph = x - self.preemph * prev
        self.last_sample = float(x[-1]) if len(x) else self.last_sample
        buf = np.concatenate([self.audio_buf, emph])
        if len(buf) < self.n_fft:
            self.audio_buf = buf
            return np.zeros((0, self.fb.shape[0]), dtype=np.float32)
        n_frames = (len(buf) - self.n_fft + self.hop) // self.hop
        mel = np.zeros((n_frames, self.fb.shape[0]), dtype=np.float32)
        for t in range(n_frames):
            frame = buf[t * self.hop : t * self.hop + self.n_fft] * self.window
            spec = np.fft.rfft(frame)
            power = (spec.real ** 2 + spec.imag ** 2).astype(np.float32)
            mel[t] = np.log(self.fb @ power + self.guard)
        self.audio_buf = buf[n_frames * self.hop :]
        return mel


def model_to_numpy(params, hp):
    """Convert a ModelParams pytree into the plain-dict form this module uses."""
    import jax

    leaf = lambda x: np.asarray(x, dtype=np.float32)  # noqa: E731
    sub = {k: leaf(getattr(params.subsampling, k)) for k in (
        "conv0_w", "conv0_b", "conv2_w", "conv2_b", "conv3_w", "conv3_b",
        "conv5_w", "conv5_b", "conv6_w", "conv6_b", "out_w", "out_b")}
    layers = []
    for i in range(hp.n_layers):
        lp_i = jax.tree.map(lambda x: np.asarray(x[i], dtype=np.float32),
                            params.layers)
        layers.append({k: getattr(lp_i, k) for k in (
            "norm_ff1_w", "norm_ff1_b", "ffn1_w1", "ffn1_w2",
            "norm_attn_w", "norm_attn_b", "attn_q_w", "attn_k_w", "attn_v_w",
            "attn_pos_w", "attn_out_w", "pos_bias_u", "pos_bias_v",
            "norm_conv_w", "norm_conv_b", "conv_pw1_w", "conv_dw_w",
            "conv_ln_w", "conv_ln_b", "conv_pw2_w",
            "norm_ff2_w", "norm_ff2_b", "ffn2_w1", "ffn2_w2",
            "norm_final_w", "norm_final_b")})
    dec = {k: leaf(getattr(params.decoder, k)) for k in (
        "embedding", "w_ih", "w_hh", "b_ih", "b_hh")}
    jp = {k: leaf(getattr(params.joint, k)) for k in (
        "enc_w", "enc_b", "dec_w", "dec_b", "out_w", "out_b")}
    model = {
        "subsampling": sub,
        "layers": layers,
        "decoder": dec,
        "joint": jp,
        "pos_emb": leaf(params.pos_emb),
    }
    if params.prompt is not None:
        model["prompt"] = {k: leaf(getattr(params.prompt, k)) for k in (
            "fc1_w", "fc1_b", "fc2_w", "fc2_b")}
    return model
