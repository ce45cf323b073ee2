"""Test support: synthesize a GGUF checkpoint with the reference tensor naming.

Generates random weights for an arbitrary Hparams and writes them with the
exact names/layouts the real converter produces (scripts/convert_to_gguf.py in
the reference: pointwise convs squeezed to 2D, depthwise squeezed+transposed to
(k, ch), vocab as string array). Used to exercise the loader end-to-end without
the 2.3 GB real checkpoint.
"""

from __future__ import annotations

import numpy as np

from nemotron_tpu.config import Hparams
from nemotron_tpu.gguf.writer import write_gguf


def export_random_checkpoint(
    hp: Hparams, path: str, seed: int = 0, tensor_types: dict | None = None
) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)

    def r(*shape, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(shape[-1]) if len(shape) > 1 else 0.02
        return rng.standard_normal(shape).astype(np.float32) * scale

    C = hp.subsampling_channels
    D, H, Dh, F, L = hp.d_model, hp.n_heads, hp.d_head, hp.d_ff, hp.n_layers
    V, Dd, K = hp.vocab_size, hp.decoder_dim, hp.kernel_size

    t: dict[str, np.ndarray] = {}
    t["encoder.pre_encode.conv.0.weight"] = r(C, 1, 3, 3, scale=0.2)
    t["encoder.pre_encode.conv.0.bias"] = r(C)
    t["encoder.pre_encode.conv.2.weight"] = r(C, 1, 3, 3, scale=0.2)
    t["encoder.pre_encode.conv.2.bias"] = r(C)
    t["encoder.pre_encode.conv.3.weight"] = r(C, C, 1, 1)
    t["encoder.pre_encode.conv.3.bias"] = r(C)
    t["encoder.pre_encode.conv.5.weight"] = r(C, 1, 3, 3, scale=0.2)
    t["encoder.pre_encode.conv.5.bias"] = r(C)
    t["encoder.pre_encode.conv.6.weight"] = r(C, C, 1, 1)
    t["encoder.pre_encode.conv.6.bias"] = r(C)
    t["encoder.pre_encode.out.weight"] = r(D, hp.subsampling_flat_dim)
    t["encoder.pre_encode.out.bias"] = r(D)

    for i in range(L):
        p = f"encoder.layers.{i}"
        t[f"{p}.norm_feed_forward1.weight"] = np.ones(D, np.float32)
        t[f"{p}.norm_feed_forward1.bias"] = np.zeros(D, np.float32)
        t[f"{p}.feed_forward1.linear1.weight"] = r(F, D)
        t[f"{p}.feed_forward1.linear2.weight"] = r(D, F)
        t[f"{p}.norm_self_att.weight"] = np.ones(D, np.float32)
        t[f"{p}.norm_self_att.bias"] = np.zeros(D, np.float32)
        t[f"{p}.self_attn.linear_q.weight"] = r(D, D)
        t[f"{p}.self_attn.linear_k.weight"] = r(D, D)
        t[f"{p}.self_attn.linear_v.weight"] = r(D, D)
        t[f"{p}.self_attn.linear_pos.weight"] = r(D, D)
        t[f"{p}.self_attn.linear_out.weight"] = r(D, D)
        t[f"{p}.self_attn.pos_bias_u"] = r(H, Dh, scale=0.1)
        t[f"{p}.self_attn.pos_bias_v"] = r(H, Dh, scale=0.1)
        t[f"{p}.norm_conv.weight"] = np.ones(D, np.float32)
        t[f"{p}.norm_conv.bias"] = np.zeros(D, np.float32)
        # converter layout: pointwise squeezed 2D, depthwise (k, ch)
        t[f"{p}.conv.pointwise_conv1.weight"] = r(2 * D, D)
        t[f"{p}.conv.depthwise_conv.weight"] = r(K, D, scale=0.3)
        t[f"{p}.conv.batch_norm.weight"] = np.ones(D, np.float32)
        t[f"{p}.conv.batch_norm.bias"] = np.zeros(D, np.float32)
        t[f"{p}.conv.pointwise_conv2.weight"] = r(D, D)
        t[f"{p}.norm_feed_forward2.weight"] = np.ones(D, np.float32)
        t[f"{p}.norm_feed_forward2.bias"] = np.zeros(D, np.float32)
        t[f"{p}.feed_forward2.linear1.weight"] = r(F, D)
        t[f"{p}.feed_forward2.linear2.weight"] = r(D, F)
        t[f"{p}.norm_out.weight"] = np.ones(D, np.float32)
        t[f"{p}.norm_out.bias"] = np.zeros(D, np.float32)

    t["decoder.prediction.embed.weight"] = r(V, Dd, scale=0.1)
    for i in range(2):
        t[f"decoder.prediction.dec_rnn.lstm.weight_ih_l{i}"] = r(4 * Dd, Dd)
        t[f"decoder.prediction.dec_rnn.lstm.weight_hh_l{i}"] = r(4 * Dd, Dd)
        t[f"decoder.prediction.dec_rnn.lstm.bias_ih_l{i}"] = np.zeros(
            4 * Dd, np.float32
        )
        t[f"decoder.prediction.dec_rnn.lstm.bias_hh_l{i}"] = np.zeros(
            4 * Dd, np.float32
        )

    t["joint.enc.weight"] = r(hp.joint_dim, D)
    t["joint.enc.bias"] = np.zeros(hp.joint_dim, np.float32)
    t["joint.pred.weight"] = r(hp.joint_dim, Dd)
    t["joint.pred.bias"] = np.zeros(hp.joint_dim, np.float32)
    t["joint.joint_net.2.weight"] = r(V, hp.joint_dim)
    t["joint.joint_net.2.bias"] = np.zeros(V, np.float32)

    if hp.num_prompts > 0:
        t["prompt_kernel.0.weight"] = r(2 * D, D + hp.num_prompts)
        t["prompt_kernel.0.bias"] = np.zeros(2 * D, np.float32)
        t["prompt_kernel.2.weight"] = r(D, 2 * D)
        t["prompt_kernel.2.bias"] = np.zeros(D, np.float32)

    n_bins = 257
    t["preprocessor.featurizer.fb"] = rng.uniform(
        0, 1, (hp.n_mels, n_bins)
    ).astype(np.float32)
    t["preprocessor.featurizer.window"] = np.hanning(400).astype(np.float32)

    vocab = [f"▁tok{i}" if i % 3 == 0 else f"tok{i}" for i in range(hp.vocab_size - 1)]

    kv = {
        "general.architecture": "nemo",
        "general.name": "synthetic-test-model",
        "tokenizer.vocab_list": vocab,
        "nemo.n_mels": hp.n_mels,
        "nemo.d_model": hp.d_model,
        "nemo.n_heads": hp.n_heads,
        "nemo.d_head": hp.d_head,
        "nemo.d_ff": hp.d_ff,
        "nemo.n_layers": hp.n_layers,
        "nemo.kernel_size": hp.kernel_size,
        "nemo.vocab_size": hp.vocab_size,
        "nemo.decoder_dim": hp.decoder_dim,
        "nemo.joint_dim": hp.joint_dim,
        "nemo.subsampling_factor": hp.subsampling_factor,
        "nemo.att_left_context": hp.att_left_context,
        "nemo.num_prompts": hp.num_prompts,
    }
    write_gguf(path, kv, t, tensor_types)
    return t


def export_random_diarize_checkpoint(path: str, seed: int = 0):
    """Synthesize a diarize.gguf (vad.* MarbleNet + spk.* TitaNet) with the
    converter's tensor names and layouts (reference:
    scripts/convert_diarize_to_gguf.py)."""
    from nemotron_tpu.diarize.params import SPK_TOPOLOGY, VAD_TOPOLOGY

    rng = np.random.default_rng(seed)

    def r(*shape, scale=None):
        if scale is None:
            scale = 1.0 / np.sqrt(shape[-1]) if len(shape) > 1 else 0.05
        return rng.standard_normal(shape).astype(np.float32) * scale

    t: dict[str, np.ndarray] = {}

    def add_bn(prefix, c):
        t[f"{prefix}.weight"] = 1.0 + 0.1 * r(c)
        t[f"{prefix}.bias"] = 0.1 * r(c)
        t[f"{prefix}.running_mean"] = 0.1 * r(c)
        t[f"{prefix}.running_var"] = np.abs(r(c)) + 0.5

    def add_blocks(ns, topology, se_reduction=8):
        for b, (k, _dil, repeat, cin, cout, residual, separable, has_se) in \
                enumerate(topology):
            prefix = f"{ns}.encoder.encoder.{b}"
            c_in = cin
            for s in range(repeat):
                base = 5 * s
                if separable:
                    t[f"{prefix}.mconv.{base}.conv.weight"] = r(k, c_in, scale=0.2)
                    t[f"{prefix}.mconv.{base + 1}.conv.weight"] = r(cout, c_in)
                    add_bn(f"{prefix}.mconv.{base + 2}", cout)
                else:
                    t[f"{prefix}.mconv.0.conv.weight"] = r(cout, c_in)
                    add_bn(f"{prefix}.mconv.1", cout)
                c_in = cout
            if residual:
                t[f"{prefix}.res.0.0.conv.weight"] = r(cout, cin)
                add_bn(f"{prefix}.res.0.1", cout)
            if has_se:
                se_idx = 5 * (repeat - 1) + 3
                t[f"{prefix}.mconv.{se_idx}.fc.0.weight"] = r(
                    cout // se_reduction, cout)
                t[f"{prefix}.mconv.{se_idx}.fc.2.weight"] = r(
                    cout, cout // se_reduction)

    add_blocks("vad", VAD_TOPOLOGY)
    add_blocks("spk", SPK_TOPOLOGY)

    t["vad.decoder.decoder_layers.0.weight"] = r(2, 128)
    t["vad.decoder.decoder_layers.0.bias"] = r(2)

    c_enc = SPK_TOPOLOGY[-1][4]  # 3072
    attn_c = 128
    emb_dim = 192
    dp = "spk.decoder"
    t[f"{dp}._pooling.attention_layer.0.conv_layer.weight"] = r(attn_c, 3 * c_enc)
    t[f"{dp}._pooling.attention_layer.0.conv_layer.bias"] = r(attn_c)
    add_bn(f"{dp}._pooling.attention_layer.0.bn", attn_c)
    t[f"{dp}._pooling.attention_layer.2.weight"] = r(c_enc, attn_c)
    t[f"{dp}._pooling.attention_layer.2.bias"] = r(c_enc)
    add_bn(f"{dp}.emb_layers.0.0", 2 * c_enc)
    t[f"{dp}.emb_layers.0.1.weight"] = r(emb_dim, 2 * c_enc)
    t[f"{dp}.emb_layers.0.1.bias"] = r(emb_dim)

    for ns in ("vad", "spk"):
        t[f"{ns}.preprocessor.featurizer.fb"] = rng.uniform(
            0, 1, (80, 257)).astype(np.float32)
        t[f"{ns}.preprocessor.featurizer.window"] = np.hanning(400).astype(
            np.float32)

    kv = {
        "general.architecture": "nemo-diarize",
        "general.name": "synthetic-diarize",
        "vad.sample_rate": 16000, "vad.n_mels": 80, "vad.n_fft": 512,
        "vad.window_size": 0.025, "vad.window_stride": 0.01,
        "vad.normalize": "None", "vad.window": "hann", "vad.n_classes": 2,
        "spk.sample_rate": 16000, "spk.n_mels": 80, "spk.n_fft": 512,
        "spk.window_size": 0.025, "spk.window_stride": 0.01,
        "spk.normalize": "per_feature", "spk.window": "hann",
        "spk.emb_dim": 192, "spk.attn_channels": 128,
    }
    write_gguf(path, kv, t)
    return t
