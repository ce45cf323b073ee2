"""Convolutions: causal conv2d subsampling stack + streaming depthwise conv1d.

Reference semantics: src/nemo-ggml.cpp:897-1029 (subsampling, asymmetric causal
padding pad=(k-1, s-1) on both spatial axes) and src/nemo-stream.cpp:336-412
(cached causal depthwise conv1d).

TPU notes:
  - The k=9 depthwise conv is expressed as K static shifted multiply-adds on
    [B, T, D]; XLA fuses these into a handful of VPU ops — far better than a
    grouped convolution with 1024 groups.
  - Pointwise (1x1) convs are plain matmuls (MXU).
  - The 3x3 convs run via lax.conv_general_dilated in NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .basic import linear


def causal_conv2d(x, w, b, stride: int):
    """x: [B, H, W, C_in]; w: (OC, IC, KH, KW) torch layout.
    Asymmetric causal padding: (k-1, s-1) on H and W.

    C_in == 1 (the subsampling entry conv) is reformulated as im2col patches
    + one [KH*KW -> OC] matmul: a single-input-channel NHWC convolution is
    pathological on TPU (the lane dimension is 1/128 occupied and XLA inserts
    layout transforms), while the patch matmul runs on the MXU directly."""
    kh, kw = w.shape[2], w.shape[3]
    if w.shape[1] == 1 and x.shape[-1] == 1:
        x2 = x[..., 0]  # [B, H, W]
        xp = jnp.pad(x2, ((0, 0), (kh - 1, stride - 1), (kw - 1, stride - 1)))
        ho = (xp.shape[1] - kh) // stride + 1
        wo = (xp.shape[2] - kw) // stride + 1
        taps = [
            xp[:, di : di + stride * ho : stride,
               dj : dj + stride * wo : stride]
            for di in range(kh) for dj in range(kw)
        ]
        patches = jnp.stack(taps, axis=-1)  # [B, ho, wo, KH*KW]
        wmat = w[:, 0].reshape(w.shape[0], kh * kw)  # [OC, taps]
        return jnp.einsum("bhwt,ot->bhwo", patches, wmat) + b
    w_hwio = jnp.transpose(w, (2, 3, 1, 0))
    y = jax.lax.conv_general_dilated(
        x,
        w_hwio,
        window_strides=(stride, stride),
        padding=[(kh - 1, stride - 1), (kw - 1, stride - 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


def causal_dw_conv2d(x, w, b, stride: int):
    """Depthwise: x [B, H, W, C]; w (C, 1, KH, KW).

    Implemented as KH*KW strided shifted multiply-adds on the VPU: XLA's
    grouped-convolution path (feature_group_count=C) is far slower than C
    independent elementwise MACs for 3x3 kernels.
    """
    kh, kw = w.shape[2], w.shape[3]
    xp = jnp.pad(x, ((0, 0), (kh - 1, stride - 1), (kw - 1, stride - 1), (0, 0)))
    ho = (xp.shape[1] - kh) // stride + 1
    wo = (xp.shape[2] - kw) // stride + 1
    y = None
    for di in range(kh):
        for dj in range(kw):
            sl = xp[:, di : di + stride * ho : stride,
                    dj : dj + stride * wo : stride, :]
            term = sl * w[:, 0, di, dj]
            y = term if y is None else y + term
    return y + b


def conv_subsampling(sub, mel):
    """Depthwise-separable 8x subsampling. mel: [B, T, n_mels] -> [B, T', d_model].

    Flatten order matches the reference ([W, C, H] permute, flat = c*W_out + w:
    nemo-ggml.cpp:1014-1022).
    """
    mel = mel.astype(sub.conv0_w.dtype)  # frontend emits f32; follow params
    x = mel[..., None]  # [B, H=T, W=mels, C=1]
    x = causal_conv2d(x, sub.conv0_w, sub.conv0_b, 2)
    x = jax.nn.relu(x)
    x = causal_dw_conv2d(x, sub.conv2_w, sub.conv2_b, 2)
    x = linear(x, sub.conv3_w[:, :, 0, 0], sub.conv3_b)  # pointwise = matmul
    x = jax.nn.relu(x)
    x = causal_dw_conv2d(x, sub.conv5_w, sub.conv5_b, 2)
    x = linear(x, sub.conv6_w[:, :, 0, 0], sub.conv6_b)
    x = jax.nn.relu(x)
    b, ho, wo, c = x.shape
    flat = jnp.transpose(x, (0, 1, 3, 2)).reshape(b, ho, c * wo)
    return linear(flat, sub.out_w, sub.out_b)


def depthwise_causal_conv1d(x, dw_w, cache=None):
    """Causal depthwise conv over time.

    x: [B, T, D]; dw_w: [K, D] (kernel-major, as stored in the GGUF);
    cache: [B, K-1, D] carried left context, or None for zero-pad.
    Returns (y [B, T, D], new_cache [B, K-1, D]).
    """
    k = dw_w.shape[0]
    t = x.shape[1]
    if cache is None:
        cache = jnp.zeros((x.shape[0], k - 1, x.shape[2]), dtype=x.dtype)
    padded = jnp.concatenate([cache, x], axis=1)  # [B, K-1+T, D]
    if t == 1:
        # streaming 80 ms mode: the K shifted windows collapse to ONE
        # contraction over the padded buffer (K ops -> 1)
        y = jnp.einsum("bkd,kd->bd", padded, dw_w)[:, None, :]
    else:
        y = padded[:, 0:t, :] * dw_w[0]
        for i in range(1, k):
            y = y + padded[:, i : i + t, :] * dw_w[i]
    new_cache = padded[:, t:, :]
    return y, new_cache
