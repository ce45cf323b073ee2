#!/usr/bin/env python3
"""Convert a NeMo ASR checkpoint (.nemo) to GGUF for nemotron_tpu.

Produces files compatible with both this framework's loader and the reference
C++ loader (same tensor names, conv reshapes, KV keys — format contract:
reference scripts/convert_to_gguf.py and docs/TENSOR_FORMAT.md).

Usage:
    python scripts/convert_nemo_to_gguf.py model.nemo model.gguf [-q q8_0|q4_0|f16]
        [-p PATTERN]... [-x EXCLUDE]...
"""

from __future__ import annotations

import argparse
import re
import sys
import tarfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nemotron_tpu.gguf.reader import GGML_F16, GGML_F32, GGML_Q4_0, GGML_Q8_0
from nemotron_tpu.gguf.writer import write_gguf

QUANT_TYPES = {"q8_0": GGML_Q8_0, "q8": GGML_Q8_0, "q4_0": GGML_Q4_0,
               "q4": GGML_Q4_0, "f16": GGML_F16, "fp16": GGML_F16}

# Default quantization set: encoder layer matrices only (weights, not biases
# or norms); depthwise conv excluded (reference behavior).
DEFAULT_PATTERN = r"encoder\.layers\.\d+\.(feed_forward\d+|self_attn|conv)\.[^.]+\.weight$"
DEPTHWISE_RE = re.compile(r"\.conv\.depthwise_conv\.weight$")
POINTWISE_RE = re.compile(r"\.conv\.(pointwise_conv1|pointwise_conv2)\.weight$")


def extract_member(tar: tarfile.TarFile, basename: str):
    """Archives are inconsistent about a leading './'; match by basename."""
    for name in tar.getnames():
        if Path(name).name == basename:
            return tar.extractfile(name)
    raise KeyError(f"{basename} not found in archive")


def load_nemo(path: str):
    import torch
    import yaml

    with tarfile.open(path) as tar:
        config = yaml.safe_load(extract_member(tar, "model_config.yaml"))
        ckpt = torch.load(extract_member(tar, "model_weights.ckpt"),
                          weights_only=True, map_location="cpu")
    weights = {k: v.numpy() for k, v in ckpt.items() if hasattr(v, "numpy")}
    return weights, config


def reshape_conv(name: str, data: np.ndarray) -> np.ndarray:
    """2D-ify conv weights so ne[0] >= 32 for block quantization."""
    if DEPTHWISE_RE.search(name) and data.ndim == 3:
        assert data.shape[1] == 1, name
        return np.ascontiguousarray(data[:, 0, :].T)  # (ch,1,k) -> (k,ch)
    if POINTWISE_RE.search(name) and data.ndim == 3:
        assert data.shape[2] == 1, name
        return np.ascontiguousarray(data[:, :, 0])  # (out,in,1) -> (out,in)
    return data


def should_quantize(name: str, data: np.ndarray,
                    patterns: list[str], excludes: list[str]) -> bool:
    if DEPTHWISE_RE.search(name):
        return False  # reference keeps depthwise F32
    if data.ndim < 2 or data.size < 256:
        return False
    for pat in excludes:
        if re.search(pat, name):
            return False
    for pat in patterns or [DEFAULT_PATTERN]:
        if re.search(pat, name):
            return True
    return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("-q", "--quantize", choices=sorted(QUANT_TYPES))
    ap.add_argument("-p", "--pattern", action="append", default=[])
    ap.add_argument("-x", "--exclude", action="append", default=[])
    args = ap.parse_args()

    weights, config = load_nemo(args.input)
    print(f"loaded {len(weights)} tensors")

    enc = config["encoder"]
    vocab = [str(t) for t in config["joint"]["vocabulary"]]
    num_classes = int(config["joint"]["num_classes"])
    assert num_classes == len(vocab)
    att_left = max(p[0] for p in enc["att_context_size"])

    kv = {
        "general.architecture": "nemo",
        "general.name": Path(args.input).stem,
        "tokenizer.vocab_list": vocab,
        "nemo.n_mels": int(enc["feat_in"]),
        "nemo.d_model": int(enc["d_model"]),
        "nemo.n_heads": int(enc["n_heads"]),
        "nemo.d_head": int(enc["d_model"]) // int(enc["n_heads"]),
        "nemo.d_ff": int(enc["d_model"]) * int(enc["ff_expansion_factor"]),
        "nemo.n_layers": int(enc["n_layers"]),
        "nemo.kernel_size": int(enc["conv_kernel_size"]),
        "nemo.vocab_size": num_classes + 1,
        "nemo.decoder_dim": int(config["decoder"]["prednet"]["pred_hidden"]),
        "nemo.joint_dim": int(config["joint"]["jointnet"]["joint_hidden"]),
        "nemo.subsampling_factor": int(enc["subsampling_factor"]),
        "nemo.att_left_context": att_left,
        "nemo.num_prompts": int(config.get("num_prompts", 0)),
    }
    prompt_dict = config.get("model_defaults", {}).get("prompt_dictionary", {})
    if prompt_dict:
        langs = sorted(prompt_dict)
        kv["nemo.prompt_langs"] = langs
        kv["nemo.prompt_ids"] = [int(prompt_dict[k]) for k in langs]

    qt = QUANT_TYPES.get(args.quantize or "", GGML_F32)
    tensors, types = {}, {}
    n_q = 0
    for name, data in weights.items():
        data = reshape_conv(name, data.astype(np.float32))
        tensors[name] = data
        if qt != GGML_F32 and should_quantize(name, data, args.pattern,
                                              args.exclude):
            types[name] = qt
            n_q += 1
    print(f"quantizing {n_q}/{len(tensors)} tensors to {args.quantize or 'f32'}")

    write_gguf(args.output, kv, tensors, types)
    print(f"wrote {args.output} ({Path(args.output).stat().st_size / 1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
