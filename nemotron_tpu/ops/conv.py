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


def _mask_valid_h(x, valid):
    """Zero time positions >= valid ([B] int32) of x [B, H, W, C].

    Ragged-batch equivalence: each stride-2 level's right pad is (s-1)=1, so
    the LAST output of an exact-length run reads one position past the end —
    a pad ZERO. In a zero-padded batch that position holds a computed value
    instead (the conv bias + relu propagate nonzero constants through zero
    input), so without this mask the boundary output frame differs from the
    exact-length run and attention spreads the error everywhere (caught by
    tests/test_e2e_oracle.py). Zeroing each level at its exact-length valid
    width restores bit-equivalence."""
    pos = jnp.arange(x.shape[1], dtype=jnp.int32)[None, :]
    keep = (pos < valid[:, None])[:, :, None, None]
    return jnp.where(keep, x, jnp.zeros((), x.dtype))


def conv_subsampling(sub, mel, n_frames=None):
    """Depthwise-separable 8x subsampling. mel: [B, T, n_mels] -> [B, T', d_model].

    Flatten order matches the reference ([W, C, H] permute, flat = c*W_out + w:
    nemo-ggml.cpp:1014-1022).

    n_frames: optional [B] int32 valid MEL frames for zero-padded ragged
    batches. Each stride-2 level is masked to its exact-length output width
    (t -> t//2 + 1), making the valid prefix BIT-EQUAL to an exact-length
    run (see _mask_valid_h). Without it, padded batches are only correct for
    full-width inputs (the streaming path, whose chunks are always exact).
    """
    mel = mel.astype(sub.conv0_w.dtype)  # frontend emits f32; follow params
    valid = None if n_frames is None else n_frames.astype(jnp.int32)

    def step_valid(v):
        return None if v is None else v // 2 + 1

    x = mel[..., None]  # [B, H=T, W=mels, C=1]
    x = causal_conv2d(x, sub.conv0_w, sub.conv0_b, 2)
    x = jax.nn.relu(x)
    valid = step_valid(valid)
    if valid is not None:
        x = _mask_valid_h(x, valid)
    x = causal_dw_conv2d(x, sub.conv2_w, sub.conv2_b, 2)
    x = linear(x, sub.conv3_w[:, :, 0, 0], sub.conv3_b)  # pointwise = matmul
    x = jax.nn.relu(x)
    valid = step_valid(valid)
    if valid is not None:
        x = _mask_valid_h(x, valid)
    x = causal_dw_conv2d(x, sub.conv5_w, sub.conv5_b, 2)
    x = linear(x, sub.conv6_w[:, :, 0, 0], sub.conv6_b)
    x = jax.nn.relu(x)
    valid = step_valid(valid)
    if valid is not None:
        x = _mask_valid_h(x, valid)
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
