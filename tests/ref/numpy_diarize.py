"""Golden NumPy reference for the diarization subsystem (test-only).

Transcribed from the reference implementation:
  - 80-mel logmel frontend: src/diarize_audio.cpp:136-227
  - MarbleNet VAD: src/diarize_vad.cpp (topology :25-32, graph :267-326,
    decoder :436-488)
  - TitaNet-L: src/diarize_spk.cpp (topology :28-34, graph :320-515)
  - NME-SC clustering: src/diarize_cluster.cpp

All arrays channel-LAST here ([T, C]); weights in torch orientation (out, in);
depthwise kernels kernel-major [k, C].
"""

from __future__ import annotations

import numpy as np

VAD_TOPOLOGY = [
    # (kernel, dilation, repeat, in_ch, out_ch, residual, separable, has_se)
    (11, 1, 1, 80, 128, False, True, False),
    (13, 1, 2, 128, 64, True, True, False),
    (15, 1, 2, 64, 64, True, True, False),
    (17, 1, 2, 64, 64, True, True, False),
    (29, 2, 1, 64, 128, False, True, False),
    (1, 1, 1, 128, 128, False, False, False),
]

SPK_TOPOLOGY = [
    (3, 1, 1, 80, 1024, False, True, True),
    (7, 1, 3, 1024, 1024, True, True, True),
    (11, 1, 3, 1024, 1024, True, True, True),
    (15, 1, 3, 1024, 1024, True, True, True),
    (1, 1, 1, 1024, 3072, False, True, True),
]


# ---------------------------------------------------------------------------
# Frontend
# ---------------------------------------------------------------------------

def logmel(audio_f32, fb, window, n_fft=512, hop=160, win_size=400,
           preemph=0.97, guard=2.0 ** -24, pad_to=16, per_feature_norm=False):
    """Returns (mel [T_padded, n_mels], t_valid)."""
    audio = np.asarray(audio_f32, dtype=np.float32).copy()
    n = len(audio)
    # preemph in place: y[0] = x[0]
    if n > 1:
        audio[1:] = audio[1:] - preemph * audio[:-1]
    win_pad = np.zeros(n_fft, np.float32)
    off = (n_fft - win_size) // 2
    win_pad[off : off + win_size] = window

    n_frames = 1 + n // hop
    n_bins = n_fft // 2 + 1
    half = n_fft // 2
    power = np.zeros((n_frames, n_bins), np.float32)
    for t in range(n_frames):
        start = t * hop - half
        frame = np.zeros(n_fft, np.float32)
        lo = max(0, start)
        hi = min(n, start + n_fft)
        if hi > lo:
            frame[lo - start : hi - start] = audio[lo:hi]
        spec = np.fft.rfft(frame * win_pad)
        power[t] = (spec.real ** 2 + spec.imag ** 2).astype(np.float32)

    mel = np.log(power @ np.asarray(fb, np.float32).T + guard)  # [T, n_mels]
    t_valid = n // hop

    if per_feature_norm:
        n_eff = t_valid
        seg = mel[:n_eff]
        mean = seg.mean(axis=0)
        var = ((seg - mean) ** 2).sum(axis=0) / max(1, n_eff - 1)
        std = np.sqrt(var) + 1e-5
        mel[:n_eff] = (seg - mean) / std
    mel[t_valid:] = 0.0

    t_padded = t_valid
    if pad_to > 1 and t_valid % pad_to:
        t_padded += pad_to - t_valid % pad_to
    out = np.zeros((t_padded, mel.shape[1]), np.float32)
    out[: min(t_valid, t_padded)] = mel[:t_valid]
    return out, t_valid


# ---------------------------------------------------------------------------
# Jasper building blocks
# ---------------------------------------------------------------------------

def fold_bn(gamma, beta, mean, var, eps):
    scale = gamma / np.sqrt(var + eps)
    return scale, beta - mean * scale


def depthwise_same(x, dw, dilation=1):
    """x [T, C]; dw [k, C]; same padding with dilation."""
    k, c = dw.shape
    t = x.shape[0]
    if k == 1:
        return x * dw[0]
    pad = dilation * (k - 1) // 2
    xp = np.pad(x, ((pad, pad), (0, 0)))
    y = np.zeros_like(x)
    for i in range(k):
        y += xp[i * dilation : i * dilation + t] * dw[i]
    return y


def subconv(x, mask, sub, eps=1e-3):
    """sub: dict(dw [k,C] or None, pw [out,in], bn_scale, bn_bias, dilation)."""
    y = x
    if sub.get("dw") is not None:
        y = y * mask
        y = depthwise_same(y, sub["dw"], sub.get("dilation", 1))
    y = y * mask
    y = y @ sub["pw"].T
    return y * sub["bn_scale"] + sub["bn_bias"]


def se_module(x_masked, fc1, fc2, inv_lens):
    """x_masked [T, C]; fc1 (C/r, C), fc2 (C, C/r)."""
    mean = x_masked.sum(axis=0) * inv_lens
    y = np.maximum(mean @ fc1.T, 0.0)
    y = 1.0 / (1.0 + np.exp(-(y @ fc2.T)))
    return x_masked * y


def jasper_block(x, mask, block, inv_lens=None):
    """block: dict(subs=[subconv...], residual=sub or None, se=(fc1,fc2) or None)."""
    x_in = x
    cur = x
    subs = block["subs"]
    for i, s in enumerate(subs):
        cur = subconv(cur, mask, s)
        if i + 1 < len(subs):
            cur = np.maximum(cur, 0.0)
    if block.get("se") is not None:
        fc1, fc2 = block["se"]
        cur = se_module(cur * mask, fc1, fc2, inv_lens)
    if block.get("residual") is not None:
        r = subconv(x_in, mask, block["residual"])
        cur = cur + r
    return np.maximum(cur, 0.0)


def vad_forward(mel, lens, blocks, dec_w, dec_b):
    """mel [T, 80]; lens = valid frames. Returns P(speech)."""
    t = mel.shape[0]
    mask = (np.arange(t) < lens).astype(np.float32)[:, None]
    cur = mel
    for b in blocks:
        cur = jasper_block(cur, mask, b)
    # AdaptiveAvgPool1d(1) over ALL T frames, then linear + softmax
    pooled = cur.mean(axis=0)
    logits = pooled @ dec_w.T + dec_b
    e = np.exp(logits - logits.max())
    p = e / e.sum()
    return float(p[1])


def spk_forward(mel, lens, blocks, dec):
    """mel [T, 80]; returns 192-d embedding.

    dec: dict(attn1_w, attn1_b, attn_bn_scale, attn_bn_bias, attn2_w, attn2_b,
              emb_bn_scale, emb_bn_bias, emb_w, emb_b)."""
    t = mel.shape[0]
    mask = (np.arange(t) < lens).astype(np.float32)[:, None]
    inv_lens = 1.0 / float(lens)
    cur = mel
    for b in blocks:
        cur = jasper_block(cur, mask, b, inv_lens=inv_lens)
    x_masked = cur * mask  # [T, C]

    mean = x_masked.sum(axis=0) * inv_lens
    diff = (x_masked - mean) * mask[:, 0:1]
    var = (diff ** 2).sum(axis=0) * inv_lens
    std = np.sqrt(np.clip(var, 1e-10, None))

    cat = np.concatenate(
        [x_masked, np.broadcast_to(mean, x_masked.shape),
         np.broadcast_to(std, x_masked.shape)], axis=1)  # [T, 3C]
    a = cat @ dec["attn1_w"].T + dec["attn1_b"]
    a = np.maximum(a, 0.0)
    a = a * dec["attn_bn_scale"] + dec["attn_bn_bias"]
    a = np.tanh(a)
    a = a @ dec["attn2_w"].T + dec["attn2_b"]  # [T, C]
    a = a + np.where(mask[:, 0:1] > 0, 0.0, -1e9)
    a = a - a.max(axis=0)
    e = np.exp(a)
    alpha = e / e.sum(axis=0)  # softmax over T, per channel

    mu = (x_masked * alpha).sum(axis=0)
    sg = np.sqrt(np.clip(((x_masked - mu) ** 2 * alpha).sum(axis=0), 1e-10, None))
    pool = np.concatenate([mu, sg])  # [2C]
    emb = pool * dec["emb_bn_scale"] + dec["emb_bn_bias"]
    return emb @ dec["emb_w"].T + dec["emb_b"]


# ---------------------------------------------------------------------------
# Clustering helpers (golden)
# ---------------------------------------------------------------------------

def cosine_affinity(emb):
    """NeMo getCosAffinityMatrix with eps=3.5e-4, diag=1, min-max scale."""
    emb = np.asarray(emb, np.float64)
    n = emb.shape[0]
    if n <= 1:
        return np.ones((1, 1), np.float32)
    norm = np.sqrt((emb ** 2).sum(axis=1))
    normed = emb / (norm + 3.5e-4)[:, None]
    aff = normed @ normed.T
    np.fill_diagonal(aff, 1.0)
    lo, hi = aff.min(), aff.max()
    if hi > lo:
        aff = (aff - lo) / (hi - lo)
    return aff.astype(np.float32)


def binarize_topk(aff, p):
    n = aff.shape[0]
    out = np.zeros_like(aff)
    for i in range(n):
        order = np.lexsort((np.arange(n), -aff[i]))
        out[i, order[: min(p, n)]] = 1.0
    return 0.5 * (out + out.T)


def laplacian(a):
    m = a.copy().astype(np.float64)
    np.fill_diagonal(m, 0.0)
    d = np.abs(m).sum(axis=1)
    lap = -m
    np.fill_diagonal(lap, d)
    return lap
