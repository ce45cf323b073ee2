"""MarbleNet VAD + TitaNet-L forward passes (batched, jitted).

TPU-first departures from the reference:
  - The reference re-encodes one full 0.63 s window per 10 ms VAD shift, one
    window per graph compute (63x redundant work, diarize_pipeline.cpp:204-211).
    Here VAD windows are *batched*: one jitted call scores B windows at once.
  - Speaker embeddings are likewise batched over sub-segments.
  - Depthwise convs are K shifted multiply-adds (VPU); pointwise convs are
    matmuls (MXU); BN is pre-folded scale/bias.

Semantics follow src/diarize_vad.cpp:267-326 / diarize_spk.cpp:320-515:
per-time masking before every conv (NeMo MaskedConv1d), SE before residual,
ReLU between repeats, attentive stat pooling with masked mean/std.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .audio import (
    HOP,
    SPK_MEL_PADDED,
    SPK_MEL_VALID,
    VAD_MEL_PADDED,
    VAD_MEL_VALID,
    logmel,
)
from .params import SPK_TOPOLOGY, VAD_TOPOLOGY, SpkParams, VadParams


def depthwise_same(x, dw, dilation: int):
    """x [B, T, C]; dw [k, C]; 'same' padding with dilation."""
    k = dw.shape[0]
    if k == 1:
        return x * dw[0]
    t = x.shape[1]
    pad = dilation * (k - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    y = xp[:, 0 : t, :] * dw[0]
    for i in range(1, k):
        y = y + xp[:, i * dilation : i * dilation + t, :] * dw[i]
    return y


def subconv(x, mask, sub, dilation: int):
    """mask [B, T, 1]. Masked (dw ->) pw -> folded BN."""
    y = x
    if sub.dw is not None:
        y = y * mask
        y = depthwise_same(y, sub.dw, dilation)
    y = y * mask
    y = y @ sub.pw.T
    return y * sub.bn_scale + sub.bn_bias


def jasper_block(x, mask, block, dilation: int, inv_lens=None):
    x_in = x
    cur = x
    n = len(block.subs)
    for i, s in enumerate(block.subs):
        cur = subconv(cur, mask, s, dilation)
        if i + 1 < n:
            cur = jax.nn.relu(cur)
    if block.se_fc1 is not None:
        xm = cur * mask
        mean = xm.sum(axis=1) * inv_lens[:, None]            # [B, C]
        g = jax.nn.relu(mean @ block.se_fc1.T)
        g = jax.nn.sigmoid(g @ block.se_fc2.T)               # [B, C]
        cur = xm * g[:, None, :]
    if block.res is not None:
        r = subconv(x_in, mask, block.res, 1)
        cur = cur + r
    return jax.nn.relu(cur)


def _encoder(x, mask, blocks, topology, inv_lens=None):
    for block, topo in zip(blocks, topology):
        x = jasper_block(x, mask, block, dilation=topo[1], inv_lens=inv_lens)
    return x


def vad_probs(params: VadParams, windows, lens_samples):
    """windows: [B, 10080] f32 audio; lens_samples: [B] int32 real samples.
    Returns [B] P(speech)."""
    mel = logmel(windows, params.fb, params.window, per_feature_norm=False)
    t = mel.shape[1]  # 64
    lens_mel = jnp.clip(lens_samples // HOP, 0, VAD_MEL_VALID)
    mask = (jnp.arange(t)[None, :] < lens_mel[:, None]).astype(mel.dtype)[..., None]
    enc = _encoder(mel, mask, params.blocks, VAD_TOPOLOGY)
    pooled = enc.mean(axis=1)  # AdaptiveAvgPool1d over all T_padded frames
    logits = pooled @ params.dec_w.T + params.dec_b
    return jax.nn.softmax(logits, axis=-1)[:, 1]


def spk_embed(params: SpkParams, windows, lens_samples):
    """windows: [B, 24000] f32 audio; lens: [B] int32. Returns [B, 192]."""
    mel = logmel(windows, params.fb, params.window, per_feature_norm=True)
    t = mel.shape[1]  # 160
    lens_mel = jnp.clip(lens_samples // HOP, 1, SPK_MEL_VALID)
    mask = (jnp.arange(t)[None, :] < lens_mel[:, None]).astype(mel.dtype)[..., None]
    inv_lens = 1.0 / lens_mel.astype(mel.dtype)

    enc = _encoder(mel, mask, params.blocks, SPK_TOPOLOGY, inv_lens=inv_lens)
    xm = enc * mask  # [B, T, C]

    d = params.dec
    mean = xm.sum(axis=1) * inv_lens[:, None]                   # [B, C]
    diff = (xm - mean[:, None, :]) * mask
    var = (diff ** 2).sum(axis=1) * inv_lens[:, None]
    std = jnp.sqrt(jnp.clip(var, 1e-10, None))                  # [B, C]

    b, tt, c = xm.shape
    cat = jnp.concatenate(
        [xm, jnp.broadcast_to(mean[:, None, :], (b, tt, c)),
         jnp.broadcast_to(std[:, None, :], (b, tt, c))], axis=-1)  # [B, T, 3C]
    a = cat @ d.attn1_w.T + d.attn1_b
    a = jax.nn.relu(a)
    a = a * d.attn_bn_scale + d.attn_bn_bias
    a = jnp.tanh(a)
    a = a @ d.attn2_w.T + d.attn2_b                             # [B, T, C]
    a = a + jnp.where(mask > 0, 0.0, -1e9)
    alpha = jax.nn.softmax(a, axis=1)                           # over T

    mu = (xm * alpha).sum(axis=1)                               # [B, C]
    sg = jnp.sqrt(jnp.clip(((xm - mu[:, None, :]) ** 2 * alpha).sum(axis=1),
                           1e-10, None))
    pool = jnp.concatenate([mu, sg], axis=-1)                   # [B, 2C]
    e = pool * d.emb_bn_scale + d.emb_bn_bias
    return e @ d.emb_w.T + d.emb_b                              # [B, 192]


vad_probs_jit = jax.jit(vad_probs)
spk_embed_jit = jax.jit(spk_embed)
