"""Parameter pytrees for the nemotron-speech streaming ASR model.

Design: weights live in typed dataclass pytrees; the 24 conformer layers are
*stacked* along a leading axis so the encoder runs as one `lax.scan` over layers
(one trace, compact HLO, good for TPU compile times).

Orientation convention: all linear weights keep PyTorch (out_features, in_features)
order; matmuls are written `x @ W.T`. The GGUF reader already returns numpy-order
arrays, so weights come off disk in exactly this orientation
(reference mapping: src/nemo-ggml.cpp:294-398, shapes: docs/TENSOR_SHAPES.md).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .config import Hparams
from .gguf.reader import read_gguf


def _ptree(cls):
    """Register a plain dataclass as a JAX pytree (all fields are leaves)."""
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_ptree
class SubsamplingParams:
    # Depthwise-separable causal conv2d stack (reference: nemo-ggml.h:58-82)
    conv0_w: Any  # (C, 1, 3, 3)   full conv, stride 2
    conv0_b: Any  # (C,)
    conv2_w: Any  # (C, 1, 3, 3)   depthwise, stride 2
    conv2_b: Any
    conv3_w: Any  # (C, C, 1, 1)   pointwise
    conv3_b: Any
    conv5_w: Any  # (C, 1, 3, 3)   depthwise, stride 2
    conv5_b: Any
    conv6_w: Any  # (C, C, 1, 1)   pointwise
    conv6_b: Any
    out_w: Any    # (d_model, flat_dim)
    out_b: Any    # (d_model,)


@_ptree
class ConformerLayerParams:
    """One conformer layer; in the full model every leaf gains a leading [L] axis."""

    norm_ff1_w: Any
    norm_ff1_b: Any
    ffn1_w1: Any      # (d_ff, d_model)
    ffn1_w2: Any      # (d_model, d_ff)
    norm_attn_w: Any
    norm_attn_b: Any
    attn_q_w: Any     # (d_model, d_model)
    attn_k_w: Any
    attn_v_w: Any
    attn_pos_w: Any
    attn_out_w: Any
    pos_bias_u: Any   # (n_heads, d_head)
    pos_bias_v: Any
    norm_conv_w: Any
    norm_conv_b: Any
    conv_pw1_w: Any   # (2*d_model, d_model)
    conv_dw_w: Any    # (kernel_size, d_model) — stored kernel-major like the GGUF
    conv_ln_w: Any
    conv_ln_b: Any
    conv_pw2_w: Any   # (d_model, d_model)
    norm_ff2_w: Any
    norm_ff2_b: Any
    ffn2_w1: Any
    ffn2_w2: Any
    norm_final_w: Any
    norm_final_b: Any


@_ptree
class DecoderParams:
    embedding: Any  # (vocab_size, decoder_dim)
    w_ih: Any       # (2, 4*hidden, input)   stacked LSTM layers
    w_hh: Any       # (2, 4*hidden, hidden)
    b_ih: Any       # (2, 4*hidden)
    b_hh: Any       # (2, 4*hidden)


@_ptree
class JointParams:
    enc_w: Any  # (joint_dim, d_model)
    enc_b: Any
    dec_w: Any  # (joint_dim, decoder_dim)
    dec_b: Any
    out_w: Any  # (vocab_size, joint_dim)
    out_b: Any


@_ptree
class PromptParams:
    """Language-ID fusion MLP (multilingual checkpoints; nemo-ggml.h:167-172)."""

    fc1_w: Any  # (2*d_model, d_model + num_prompts)
    fc1_b: Any
    fc2_w: Any  # (d_model, 2*d_model)
    fc2_b: Any


@_ptree
class PreprocParams:
    filterbank: Any  # (n_mels, n_fft//2+1)
    window: Any      # (400,)


@_ptree
class ModelParams:
    subsampling: SubsamplingParams
    layers: ConformerLayerParams       # stacked: every leaf has leading [L]
    decoder: DecoderParams
    joint: JointParams
    preproc: PreprocParams
    pos_emb: Any                       # (2*max_pos_len-1, d_model)
    prompt: PromptParams | None = None


def compute_pos_emb(max_len: int, d_model: int) -> np.ndarray:
    """Sinusoidal table in NeMo's descending order: row p holds position
    (max_len-1) - p, so row 0 is the most positive relative distance.
    (reference: nemo-ggml.cpp:17-32)
    """
    total = 2 * max_len - 1
    p = (max_len - 1) - np.arange(total, dtype=np.float32)
    i = np.arange(0, d_model, 2, dtype=np.float32)
    div = np.exp(-i * np.log(10000.0) / d_model)  # (d_model/2,)
    ang = p[:, None] * div[None, :]
    out = np.zeros((total, d_model), dtype=np.float32)
    out[:, 0::2] = np.sin(ang)
    out[:, 1::2] = np.cos(ang)
    return out


# --------------------------------------------------------------------------
# GGUF tensor-name mapping (reference: src/nemo-ggml.cpp:294-398)
# --------------------------------------------------------------------------

_SUB_MAP = {
    "conv0_w": "encoder.pre_encode.conv.0.weight",
    "conv0_b": "encoder.pre_encode.conv.0.bias",
    "conv2_w": "encoder.pre_encode.conv.2.weight",
    "conv2_b": "encoder.pre_encode.conv.2.bias",
    "conv3_w": "encoder.pre_encode.conv.3.weight",
    "conv3_b": "encoder.pre_encode.conv.3.bias",
    "conv5_w": "encoder.pre_encode.conv.5.weight",
    "conv5_b": "encoder.pre_encode.conv.5.bias",
    "conv6_w": "encoder.pre_encode.conv.6.weight",
    "conv6_b": "encoder.pre_encode.conv.6.bias",
    "out_w": "encoder.pre_encode.out.weight",
    "out_b": "encoder.pre_encode.out.bias",
}

_LAYER_MAP = {
    "norm_ff1_w": "norm_feed_forward1.weight",
    "norm_ff1_b": "norm_feed_forward1.bias",
    "ffn1_w1": "feed_forward1.linear1.weight",
    "ffn1_w2": "feed_forward1.linear2.weight",
    "norm_attn_w": "norm_self_att.weight",
    "norm_attn_b": "norm_self_att.bias",
    "attn_q_w": "self_attn.linear_q.weight",
    "attn_k_w": "self_attn.linear_k.weight",
    "attn_v_w": "self_attn.linear_v.weight",
    "attn_pos_w": "self_attn.linear_pos.weight",
    "attn_out_w": "self_attn.linear_out.weight",
    "pos_bias_u": "self_attn.pos_bias_u",
    "pos_bias_v": "self_attn.pos_bias_v",
    "norm_conv_w": "norm_conv.weight",
    "norm_conv_b": "norm_conv.bias",
    "conv_pw1_w": "conv.pointwise_conv1.weight",
    "conv_dw_w": "conv.depthwise_conv.weight",
    "conv_ln_w": "conv.batch_norm.weight",
    "conv_ln_b": "conv.batch_norm.bias",
    "conv_pw2_w": "conv.pointwise_conv2.weight",
    "norm_ff2_w": "norm_feed_forward2.weight",
    "norm_ff2_b": "norm_feed_forward2.bias",
    "ffn2_w1": "feed_forward2.linear1.weight",
    "ffn2_w2": "feed_forward2.linear2.weight",
    "norm_final_w": "norm_out.weight",
    "norm_final_b": "norm_out.bias",
}

_DEC_MAP = {
    "embedding": "decoder.prediction.embed.weight",
}

_JOINT_MAP = {
    "enc_w": "joint.enc.weight",
    "enc_b": "joint.enc.bias",
    "dec_w": "joint.pred.weight",
    "dec_b": "joint.pred.bias",
    "out_w": "joint.joint_net.2.weight",
    "out_b": "joint.joint_net.2.bias",
}


def hparams_from_kv(kv: dict) -> Hparams:
    def get(key, default):
        return int(kv.get(f"nemo.{key}", default))

    d_model = get("d_model", 1024)
    n_heads = get("n_heads", 8)
    hp = Hparams(
        n_mels=get("n_mels", 128),
        d_model=d_model,
        n_heads=n_heads,
        d_head=get("d_head", d_model // n_heads),
        d_ff=get("d_ff", 4096),
        n_layers=get("n_layers", 24),
        kernel_size=get("kernel_size", 9),
        vocab_size=get("vocab_size", 1025),
        decoder_dim=get("decoder_dim", 640),
        joint_dim=get("joint_dim", 640),
        subsampling_factor=get("subsampling_factor", 8),
        subsampling_channels=get("subsampling_channels", 256),
        att_left_context=get("att_left_context", 70),
        num_prompts=get("num_prompts", 0),
    )
    return hp


def _normalize_conv_weights(name: str, arr: np.ndarray) -> np.ndarray:
    """Accept both the reshaped-2D GGUF layout and raw PyTorch 3D conv layouts
    (reference reshape rationale: docs/TENSOR_FORMAT.md:21-77)."""
    if name.endswith("conv.depthwise_conv.weight"):
        if arr.ndim == 3:  # (ch, 1, k) -> (k, ch)
            arr = arr[:, 0, :].T
        return np.ascontiguousarray(arr)
    if name.endswith(("pointwise_conv1.weight", "pointwise_conv2.weight")):
        if arr.ndim == 3:  # (out, in, 1) -> (out, in)
            arr = arr[:, :, 0]
        return np.ascontiguousarray(arr)
    return arr


def norm_featurizer_fb(arr) -> np.ndarray:
    """NeMo's FilterbankFeatures registers fb as [1, n_mels, n_bins] (librosa
    mel matrix unsqueezed); converted checkpoints pass it through raw —
    normalize to the 2D [n_mels, n_bins] the frontends consume. Shared by the
    ASR loader here and the diarize loader (diarize/params.py)."""
    arr = np.asarray(arr, dtype=np.float32)
    if arr.ndim == 3:
        arr = arr.reshape(arr.shape[-2], arr.shape[-1])
    return arr


def load_model(
    path: str, dtype=jnp.float32, keep_quantized: bool = False
) -> tuple[Hparams, ModelParams, dict]:
    """Load a GGUF checkpoint into stacked JAX parameter pytrees.

    Returns (hparams, params, meta) where meta carries vocab / prompt dict.
    Q4_0/F16 tensors are dequantized at load. Q8_0 tensors are dequantized
    unless keep_quantized: then encoder-layer Q8_0 matrices stay quantized as
    QuantizedTensor pytrees (int8 + per-32-block scales) and dequantize inside
    the matmuls — halving model memory and weight HBM traffic.
    """
    g = read_gguf(path)
    hp = hparams_from_kv(g.kv)
    raw = g.load_all()

    # Infer kernel_size from the depthwise weight like the reference loader
    # (nemo-ggml.cpp:376-380).
    dw = raw.get("encoder.layers.0.conv.depthwise_conv.weight")
    if dw is not None:
        k = dw.shape[0] if dw.ndim == 2 else dw.shape[-1]
        hp = dataclasses.replace(hp, kernel_size=int(k))
    c0 = raw.get("encoder.pre_encode.conv.0.weight")
    if c0 is not None:
        hp = dataclasses.replace(hp, subsampling_channels=int(c0.shape[0]))

    def J(name):
        arr = _normalize_conv_weights(name, raw[name])
        return jnp.asarray(arr, dtype=dtype)

    sub = SubsamplingParams(**{f: J(n) for f, n in _SUB_MAP.items()})

    stacked = {}
    for field, suffix in _LAYER_MAP.items():
        names = [f"encoder.layers.{i}.{suffix}" for i in range(hp.n_layers)]
        types = {g.tensors[n].ggml_type for n in names}
        if keep_quantized and types == {8}:  # GGML_Q8_0
            from .ops.quant import QuantizedTensor, from_gguf_q8

            qts = [
                from_gguf_q8(g.raw_tensor(n), *g.tensors[n].shape) for n in names
            ]
            stacked[field] = QuantizedTensor(
                w_i8=jnp.stack([q.w_i8 for q in qts]),
                scales=jnp.stack([q.scales for q in qts]),
            )
            continue
        if keep_quantized and types == {2}:  # GGML_Q4_0
            from .ops.quant import QuantizedTensor4, from_gguf_q4

            qts = [
                from_gguf_q4(g.raw_tensor(n), *g.tensors[n].shape) for n in names
            ]
            stacked[field] = QuantizedTensor4(
                w_packed=jnp.stack([q.w_packed for q in qts]),
                scales=jnp.stack([q.scales for q in qts]),
            )
            continue
        per_layer = [
            _normalize_conv_weights(n, raw[n]) for n in names
        ]
        stacked[field] = jnp.asarray(np.stack(per_layer), dtype=dtype)
    layers = ConformerLayerParams(**stacked)

    dec = DecoderParams(
        embedding=J(_DEC_MAP["embedding"]),
        w_ih=jnp.stack(
            [J(f"decoder.prediction.dec_rnn.lstm.weight_ih_l{i}") for i in range(2)]
        ),
        w_hh=jnp.stack(
            [J(f"decoder.prediction.dec_rnn.lstm.weight_hh_l{i}") for i in range(2)]
        ),
        b_ih=jnp.stack(
            [J(f"decoder.prediction.dec_rnn.lstm.bias_ih_l{i}") for i in range(2)]
        ),
        b_hh=jnp.stack(
            [J(f"decoder.prediction.dec_rnn.lstm.bias_hh_l{i}") for i in range(2)]
        ),
    )
    joint = JointParams(**{f: J(n) for f, n in _JOINT_MAP.items()})

    prompt = None
    if hp.num_prompts > 0:
        prompt = PromptParams(
            fc1_w=J("prompt_kernel.0.weight"),
            fc1_b=J("prompt_kernel.0.bias"),
            fc2_w=J("prompt_kernel.2.weight"),
            fc2_b=J("prompt_kernel.2.bias"),
        )

    fb = norm_featurizer_fb(raw["preprocessor.featurizer.fb"])
    win = np.asarray(raw["preprocessor.featurizer.window"],
                     dtype=np.float32).reshape(-1)
    preproc = PreprocParams(
        filterbank=jnp.asarray(fb),
        window=jnp.asarray(win),
    )

    pos_emb = jnp.asarray(compute_pos_emb(hp.max_pos_len, hp.d_model), dtype=dtype)

    params = ModelParams(
        subsampling=sub,
        layers=layers,
        decoder=dec,
        joint=joint,
        preproc=preproc,
        pos_emb=pos_emb,
        prompt=prompt,
    )

    vocab = g.kv.get("tokenizer.vocab_list")
    if vocab is None and "tokenizer.vocab" in g.kv:
        blob = g.kv["tokenizer.vocab"]
        if isinstance(blob, str):
            blob = blob.encode("utf-8", errors="replace")
        n_tokens = hp.vocab_size - 1
        vocab = [
            blob[i * 8 : i * 8 + 8].split(b"\x00")[0].decode("utf-8", errors="replace")
            for i in range(n_tokens)
        ]
    prompt_dict = {}
    if "nemo.prompt_langs" in g.kv and "nemo.prompt_ids" in g.kv:
        prompt_dict = dict(zip(g.kv["nemo.prompt_langs"], g.kv["nemo.prompt_ids"]))

    meta = {"vocab": vocab or [], "prompt_dict": prompt_dict, "kv": g.kv}
    return hp, params, meta


# --------------------------------------------------------------------------
# Random init (tests / benchmarks when no checkpoint is available)
# --------------------------------------------------------------------------

def random_params(hp: Hparams, seed: int = 0, dtype=jnp.float32) -> ModelParams:
    rng = np.random.default_rng(seed)

    def r(*shape, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(shape[-1]) if len(shape) > 1 else 0.02
        return jnp.asarray(
            rng.standard_normal(shape).astype(np.float32) * scale, dtype=dtype
        )

    C = hp.subsampling_channels
    D, H, Dh, F, L = hp.d_model, hp.n_heads, hp.d_head, hp.d_ff, hp.n_layers
    V, Dd, K = hp.vocab_size, hp.decoder_dim, hp.kernel_size

    sub = SubsamplingParams(
        conv0_w=r(C, 1, 3, 3, scale=0.2), conv0_b=r(C),
        conv2_w=r(C, 1, 3, 3, scale=0.2), conv2_b=r(C),
        conv3_w=r(C, C, 1, 1), conv3_b=r(C),
        conv5_w=r(C, 1, 3, 3, scale=0.2), conv5_b=r(C),
        conv6_w=r(C, C, 1, 1), conv6_b=r(C),
        out_w=r(D, hp.subsampling_flat_dim), out_b=r(D),
    )
    ones = lambda *s: jnp.ones(s, dtype=dtype)  # noqa: E731
    zeros = lambda *s: jnp.zeros(s, dtype=dtype)  # noqa: E731
    layers = ConformerLayerParams(
        norm_ff1_w=ones(L, D), norm_ff1_b=zeros(L, D),
        ffn1_w1=r(L, F, D), ffn1_w2=r(L, D, F),
        norm_attn_w=ones(L, D), norm_attn_b=zeros(L, D),
        attn_q_w=r(L, D, D), attn_k_w=r(L, D, D), attn_v_w=r(L, D, D),
        attn_pos_w=r(L, D, D), attn_out_w=r(L, D, D),
        pos_bias_u=r(L, H, Dh, scale=0.1), pos_bias_v=r(L, H, Dh, scale=0.1),
        norm_conv_w=ones(L, D), norm_conv_b=zeros(L, D),
        conv_pw1_w=r(L, 2 * D, D), conv_dw_w=r(L, K, D, scale=0.3),
        conv_ln_w=ones(L, D), conv_ln_b=zeros(L, D),
        conv_pw2_w=r(L, D, D),
        norm_ff2_w=ones(L, D), norm_ff2_b=zeros(L, D),
        ffn2_w1=r(L, F, D), ffn2_w2=r(L, D, F),
        norm_final_w=ones(L, D), norm_final_b=zeros(L, D),
    )
    dec = DecoderParams(
        embedding=r(V, Dd, scale=0.1),
        w_ih=r(2, 4 * Dd, Dd),
        w_hh=r(2, 4 * Dd, Dd),
        b_ih=zeros(2, 4 * Dd),
        b_hh=zeros(2, 4 * Dd),
    )
    joint = JointParams(
        enc_w=r(hp.joint_dim, D), enc_b=zeros(hp.joint_dim),
        dec_w=r(hp.joint_dim, Dd), dec_b=zeros(hp.joint_dim),
        out_w=r(V, hp.joint_dim), out_b=zeros(V),
    )
    prompt = None
    if hp.num_prompts > 0:
        prompt = PromptParams(
            fc1_w=r(2 * D, D + hp.num_prompts), fc1_b=zeros(2 * D),
            fc2_w=r(D, 2 * D), fc2_b=zeros(D),
        )
    n_bins = 257
    fb = rng.uniform(0.0, 1.0, (hp.n_mels, n_bins)).astype(np.float32)
    preproc = PreprocParams(
        filterbank=jnp.asarray(fb),
        window=jnp.asarray(np.hanning(400).astype(np.float32)),
    )
    return ModelParams(
        subsampling=sub,
        layers=layers,
        decoder=dec,
        joint=joint,
        preproc=preproc,
        pos_emb=jnp.asarray(compute_pos_emb(hp.max_pos_len, hp.d_model), dtype=dtype),
        prompt=prompt,
    )


def layer_slice(layers: ConformerLayerParams, i: int) -> ConformerLayerParams:
    """Extract a single (unstacked) layer — handy for tests."""
    return jax.tree.map(lambda x: x[i], layers)


# The reference's default quantization set: encoder-layer 2D matrices only;
# depthwise conv, norms, biases and pos biases stay dense
# (convert_to_gguf.py:237-263).
QUANT_LAYER_FIELDS = (
    "ffn1_w1", "ffn1_w2", "ffn2_w1", "ffn2_w2",
    "attn_q_w", "attn_k_w", "attn_v_w", "attn_pos_w", "attn_out_w",
    "conv_pw1_w", "conv_pw2_w",
)


def quantize_encoder_layers(params: ModelParams, bits: int = 8) -> ModelParams:
    """Weight-only quantization: convert the stacked encoder-layer matrices
    to Q8_0 (bits=8) or Q4_0 (bits=4) QuantizedTensors in place (per-32-block
    scales; dequantized inside the matmul, optionally via the Pallas
    kernels). int8 halves, int4 quarters encoder weight memory and HBM read
    bandwidth for serving."""
    from .ops.quant import (QuantizedTensor, QuantizedTensor4, quantize_q4,
                            quantize_q8)

    lay = params.layers
    upd = {}
    for name in QUANT_LAYER_FIELDS:
        v = np.asarray(getattr(lay, name), np.float32)  # [L, out, in]
        if v.ndim != 3 or v.shape[-1] % (32 if bits == 8 else 64):
            continue
        if bits == 4:
            qts = [quantize_q4(v[i]) for i in range(v.shape[0])]
            upd[name] = QuantizedTensor4(
                w_packed=jnp.stack([q.w_packed for q in qts]),
                scales=jnp.stack([q.scales for q in qts]),
            )
        else:
            qts = [quantize_q8(v[i]) for i in range(v.shape[0])]
            upd[name] = QuantizedTensor(
                w_i8=jnp.stack([q.w_i8 for q in qts]),
                scales=jnp.stack([q.scales for q in qts]),
            )
    return dataclasses.replace(params, layers=dataclasses.replace(lay, **upd))
