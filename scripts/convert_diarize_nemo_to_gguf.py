#!/usr/bin/env python3
"""Convert MarbleNet VAD + TitaNet-L .nemo checkpoints into one diarize.gguf.

Tensor names are namespaced vad.* / spk.*; conv weights get the same 2D
reshapes as the ASR converter, with depthwise checked BEFORE pointwise because
TitaNet block 4 has a k=1 depthwise conv (format contract: reference
scripts/convert_diarize_to_gguf.py).

Usage:
    python scripts/convert_diarize_nemo_to_gguf.py vad.nemo titanet.nemo diarize.gguf
"""

from __future__ import annotations

import argparse
import sys
import tarfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nemotron_tpu.gguf.writer import write_gguf

DROP_SUFFIXES = ("num_batches_tracked",)
# TitaNet ships a 16681-class training classifier we don't need.
DROP_SUBSTRINGS = {"spk": ("final.",), "vad": ()}


def extract_member(tar, basename):
    for name in tar.getnames():
        if Path(name).name == basename:
            return tar.extractfile(name)
    raise KeyError(f"{basename} not found")


def load_nemo(path):
    import torch
    import yaml

    with tarfile.open(path) as tar:
        config = yaml.safe_load(extract_member(tar, "model_config.yaml"))
        ckpt = torch.load(extract_member(tar, "model_weights.ckpt"),
                          weights_only=True, map_location="cpu")
    return {k: v.numpy() for k, v in ckpt.items() if hasattr(v, "numpy")}, config


def reshape(data: np.ndarray) -> np.ndarray:
    """Depthwise FIRST (middle dim 1, holds even for k=1), then pointwise."""
    if data.ndim == 3:
        out, mid, k = data.shape
        if mid == 1:
            return np.ascontiguousarray(data[:, 0, :].T)  # (ch,1,k)->(k,ch)
        if k == 1:
            return np.ascontiguousarray(data[:, :, 0])  # (out,in,1)->(out,in)
    return data


def gather(ns: str, weights: dict) -> dict:
    out = {}
    for name, data in weights.items():
        if name.endswith(DROP_SUFFIXES):
            continue
        if any(s in name for s in DROP_SUBSTRINGS.get(ns, ())):
            continue
        if not hasattr(data, "shape"):
            continue
        out[f"{ns}.{name}"] = reshape(np.asarray(data, np.float32))
    return out


def pp_kv(ns: str, cfg: dict, extra: dict) -> dict:
    p = cfg["preprocessor"]
    kv = {
        f"{ns}.sample_rate": int(p["sample_rate"]),
        f"{ns}.n_mels": int(p["features"]),
        f"{ns}.n_fft": int(p["n_fft"]),
        f"{ns}.window_size": float(p["window_size"]),
        f"{ns}.window_stride": float(p["window_stride"]),
        f"{ns}.dither": float(p.get("dither", 0.0)),
        f"{ns}.normalize": str(p.get("normalize", "None")),
        f"{ns}.window": str(p.get("window", "hann")),
    }
    kv.update(extra)
    return kv


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("vad_nemo")
    ap.add_argument("spk_nemo")
    ap.add_argument("output")
    args = ap.parse_args()

    vad_w, vad_cfg = load_nemo(args.vad_nemo)
    spk_w, spk_cfg = load_nemo(args.spk_nemo)

    tensors = {}
    tensors.update(gather("vad", vad_w))
    tensors.update(gather("spk", spk_w))
    print(f"vad: {sum(k.startswith('vad.') for k in tensors)} tensors, "
          f"spk: {sum(k.startswith('spk.') for k in tensors)} tensors")

    kv = {
        "general.architecture": "nemo-diarize",
        "general.name": "nemo-diarize-v0.1",
    }
    kv.update(pp_kv("vad", vad_cfg, {"vad.n_classes": 2}))
    kv.update(pp_kv("spk", spk_cfg, {"spk.emb_dim": 192,
                                     "spk.attn_channels": 128}))

    write_gguf(args.output, kv, tensors)
    print(f"wrote {args.output} ({Path(args.output).stat().st_size / 1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
