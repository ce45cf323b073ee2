"""Diarization model parameters: MarbleNet VAD + TitaNet-L speaker encoder.

Loads the combined diarize.gguf (vad.* / spk.* namespaces, produced by the
reference's scripts/convert_diarize_to_gguf.py or ours). BatchNorms are folded
into per-channel (scale, bias) at load — encoder BNs with eps=1e-3 (NeMo
Jasper), decoder BNs with eps=1e-5 (reference: diarize_vad.cpp:34-36,
diarize_spk.cpp:36-41)."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..gguf.reader import read_gguf
# norm_featurizer_fb is shared with the ASR loader — a fb-layout quirk fixed
# in one loader must not ship broken in the other
from ..params import _ptree, norm_featurizer_fb as _norm_fb

ENC_BN_EPS = 1e-3
DEC_BN_EPS = 1e-5

# (kernel, dilation, repeat, in_ch, out_ch, residual, separable, has_se)
VAD_TOPOLOGY = (
    (11, 1, 1, 80, 128, False, True, False),
    (13, 1, 2, 128, 64, True, True, False),
    (15, 1, 2, 64, 64, True, True, False),
    (17, 1, 2, 64, 64, True, True, False),
    (29, 2, 1, 64, 128, False, True, False),
    (1, 1, 1, 128, 128, False, False, False),
)
SPK_TOPOLOGY = (
    (3, 1, 1, 80, 1024, False, True, True),
    (7, 1, 3, 1024, 1024, True, True, True),
    (11, 1, 3, 1024, 1024, True, True, True),
    (15, 1, 3, 1024, 1024, True, True, True),
    (1, 1, 1, 1024, 3072, False, True, True),
)
SE_REDUCTION = 8


@_ptree
class SubConvParams:
    dw: Any        # [k, C_in] kernel-major, or None (non-separable)
    pw: Any        # [C_out, C_in]
    bn_scale: Any  # [C_out]
    bn_bias: Any   # [C_out]


@_ptree
class JasperBlockParams:
    subs: Any      # tuple[SubConvParams]
    res: Any       # SubConvParams | None
    se_fc1: Any    # [C/r, C] | None
    se_fc2: Any    # [C, C/r] | None


@_ptree
class VadParams:
    blocks: Any    # tuple[JasperBlockParams]
    dec_w: Any     # [n_classes, C]
    dec_b: Any     # [n_classes]
    fb: Any        # [80, 257]
    window: Any    # [400]


@_ptree
class SpkDecoderParams:
    attn1_w: Any       # [attn_C, 3C]
    attn1_b: Any       # [attn_C]
    attn_bn_scale: Any
    attn_bn_bias: Any
    attn2_w: Any       # [C, attn_C]
    attn2_b: Any       # [C]
    emb_bn_scale: Any  # [2C]
    emb_bn_bias: Any
    emb_w: Any         # [emb_dim, 2C]
    emb_b: Any         # [emb_dim]


@_ptree
class SpkParams:
    blocks: Any
    dec: SpkDecoderParams
    fb: Any
    window: Any


@dataclasses.dataclass
class DiarizeModelParams:
    vad: VadParams
    spk: SpkParams
    kv: dict


def _fold(raw, prefix, eps):
    gamma = raw[f"{prefix}.weight"]
    beta = raw[f"{prefix}.bias"]
    mean = raw[f"{prefix}.running_mean"]
    var = raw[f"{prefix}.running_var"]
    scale = gamma / np.sqrt(var + eps)
    return scale.astype(np.float32), (beta - mean * scale).astype(np.float32)


def _norm_dw(arr):
    """Depthwise conv weight to [k, C] regardless of on-disk layout."""
    if arr.ndim == 3:  # torch (C, 1, k)
        return np.ascontiguousarray(arr[:, 0, :].T)
    return arr  # already (k, C) from the converter


def _norm_pw(arr):
    if arr.ndim == 3:  # torch (out, in, 1)
        return np.ascontiguousarray(arr[:, :, 0])
    return arr


def _load_subconv(raw, prefix, dw_idx, pw_idx, bn_idx, separable, eps):
    J = lambda a: jnp.asarray(a, dtype=jnp.float32)  # noqa: E731
    dw = None
    if separable:
        dw = J(_norm_dw(raw[f"{prefix}.mconv.{dw_idx}.conv.weight"]))
    pw = J(_norm_pw(raw[f"{prefix}.mconv.{pw_idx}.conv.weight"]))
    scale, bias = _fold(raw, f"{prefix}.mconv.{bn_idx}", eps)
    return SubConvParams(dw=dw, pw=pw, bn_scale=J(scale), bn_bias=J(bias))


def _load_residual(raw, prefix, eps):
    J = lambda a: jnp.asarray(a, dtype=jnp.float32)  # noqa: E731
    pw = J(_norm_pw(raw[f"{prefix}.res.0.0.conv.weight"]))
    scale, bias = _fold(raw, f"{prefix}.res.0.1", eps)
    return SubConvParams(dw=None, pw=pw, bn_scale=J(scale), bn_bias=J(bias))


def _load_blocks(raw, ns, topology):
    """ns = 'vad' or 'spk'. mconv layout: 5 modules per repeat (dw, pw, bn,
    relu, dropout); SE (if any) is the final mconv entry at 5*(R-1)+3
    (reference: diarize_vad.cpp:148-170, diarize_spk.cpp:141-160)."""
    J = lambda a: jnp.asarray(a, dtype=jnp.float32)  # noqa: E731
    blocks = []
    for b, (k, dil, repeat, cin, cout, residual, separable, has_se) in enumerate(
        topology
    ):
        prefix = f"{ns}.encoder.encoder.{b}"
        subs = []
        for s in range(repeat):
            base = 5 * s
            if separable:
                subs.append(_load_subconv(raw, prefix, base, base + 1, base + 2,
                                          True, ENC_BN_EPS))
            else:
                subs.append(_load_subconv(raw, prefix, -1, 0, 1, False,
                                          ENC_BN_EPS))
        res = _load_residual(raw, prefix, ENC_BN_EPS) if residual else None
        se_fc1 = se_fc2 = None
        if has_se:
            se_idx = 5 * (repeat - 1) + 3
            se_fc1 = J(raw[f"{prefix}.mconv.{se_idx}.fc.0.weight"])
            se_fc2 = J(raw[f"{prefix}.mconv.{se_idx}.fc.2.weight"])
        blocks.append(JasperBlockParams(subs=tuple(subs), res=res,
                                        se_fc1=se_fc1, se_fc2=se_fc2))
    return tuple(blocks)


def load_diarize_model(path: str) -> DiarizeModelParams:
    g = read_gguf(path)
    raw = g.load_all()
    J = lambda a: jnp.asarray(a, dtype=jnp.float32)  # noqa: E731

    vad = VadParams(
        blocks=_load_blocks(raw, "vad", VAD_TOPOLOGY),
        dec_w=J(raw["vad.decoder.decoder_layers.0.weight"]),
        dec_b=J(raw["vad.decoder.decoder_layers.0.bias"]),
        fb=J(_norm_fb(raw["vad.preprocessor.featurizer.fb"])),
        window=J(np.asarray(raw["vad.preprocessor.featurizer.window"]).reshape(-1)),
    )

    dp = "spk.decoder"
    a_scale, a_bias = _fold(raw, f"{dp}._pooling.attention_layer.0.bn", DEC_BN_EPS)
    e_scale, e_bias = _fold(raw, f"{dp}.emb_layers.0.0", DEC_BN_EPS)
    dec = SpkDecoderParams(
        attn1_w=J(_norm_pw(raw[f"{dp}._pooling.attention_layer.0.conv_layer.weight"])),
        attn1_b=J(raw[f"{dp}._pooling.attention_layer.0.conv_layer.bias"]),
        attn_bn_scale=J(a_scale),
        attn_bn_bias=J(a_bias),
        attn2_w=J(_norm_pw(raw[f"{dp}._pooling.attention_layer.2.weight"])),
        attn2_b=J(raw[f"{dp}._pooling.attention_layer.2.bias"]),
        emb_bn_scale=J(e_scale),
        emb_bn_bias=J(e_bias),
        emb_w=J(_norm_pw(raw[f"{dp}.emb_layers.0.1.weight"])),
        emb_b=J(raw[f"{dp}.emb_layers.0.1.bias"]),
    )
    spk = SpkParams(
        blocks=_load_blocks(raw, "spk", SPK_TOPOLOGY),
        dec=dec,
        fb=J(_norm_fb(raw["spk.preprocessor.featurizer.fb"])),
        window=J(np.asarray(raw["spk.preprocessor.featurizer.window"]).reshape(-1)),
    )
    return DiarizeModelParams(vad=vad, spk=spk, kv=g.kv)
