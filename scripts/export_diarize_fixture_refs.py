#!/usr/bin/env python3
"""NeMo-side fixture exporters for the diarization parity suite.

Produces the exact on-disk fixture layout the reference repo checks in under
tests/diarize/ (and that tests/test_reference_fixtures.py consumes):

  cluster_ref/: embeddings.f32, affinity.f32, labels.i32, cluster_meta.json
  vad_ref/ | spk_ref/: input_audio.f32, mel.f32 (+ per-block enc_block_*.f32
  when a model is given), shapes.json

The cluster fixture builder is NeMo-free (synthetic embeddings + NeMo's
offline_clustering if available, else labels must be supplied); the mel/block
exporters need NeMo models and exit cleanly without them.

Usage:
    python scripts/export_diarize_fixture_refs.py cluster --out tests_out/cluster_ref
    python scripts/export_diarize_fixture_refs.py vad --model marblenet.nemo \
        --audio x.wav --out tests_out/vad_ref
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def write_cluster_fixture(out_dir: str, embeddings: np.ndarray,
                          labels: np.ndarray, affinity: np.ndarray,
                          meta: dict) -> None:
    """Write the reference's self-contained clustering fixture layout
    (consumed permutation-invariantly by test_diarize_cluster.cpp:38-58 and
    tests/test_reference_fixtures.py)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    embeddings.astype("<f4").tofile(out / "embeddings.f32")
    affinity.astype("<f4").tofile(out / "affinity.f32")
    labels.astype("<i4").tofile(out / "labels.i32")
    (out / "cluster_meta.json").write_text(json.dumps(meta, indent=2))


def synth_embeddings(n_per: int = 30, dim: int = 192, seed: int = 0,
                     anchors_dot: float = 0.11, noise: float = 0.2):
    """Two-anchor synthetic speaker embeddings (the reference fixture's
    recipe: two unit anchors at cos-similarity ~0.11 with per-sample noise)."""
    rng = np.random.default_rng(seed)
    a = rng.standard_normal(dim)
    a /= np.linalg.norm(a)
    b = rng.standard_normal(dim)
    b -= (a @ b) * a
    b /= np.linalg.norm(b)
    b = anchors_dot * a + np.sqrt(1.0 - anchors_dot ** 2) * b
    embs = []
    labels = []
    for anchor, lab in ((a, 0), (b, 1)):
        for _ in range(n_per):
            e = anchor + noise * rng.standard_normal(dim)
            embs.append(e / np.linalg.norm(e))
            labels.append(lab)
    return np.asarray(embs, np.float32), np.asarray(labels, np.int32)


def cmd_cluster(args) -> int:
    from nemotron_tpu.diarize.cluster import (NmescConfig, cosine_affinity,
                                              nmesc_cluster)

    embs, true_labels = synth_embeddings(seed=args.seed)
    aff = cosine_affinity(embs)
    # labels: prefer NeMo's offline_clustering as ground truth when installed
    try:
        import torch
        from nemo.collections.asr.parts.utils.offline_clustering import (
            SpeakerClustering,
        )

        sc = SpeakerClustering(cuda=False)
        labels = sc.forward_unit_infer(
            mat=torch.from_numpy(aff), oracle_num_speakers=-1,
            max_num_speakers=8,
        ).cpu().numpy().astype(np.int32)
        source = "nemo"
    except ImportError:
        out = nmesc_cluster(embs, NmescConfig())
        labels = out.labels
        source = "nemotron_tpu (NeMo absent — self-labels, NOT independent truth)"
    res = nmesc_cluster(embs, NmescConfig())
    meta = {
        "N": int(embs.shape[0]), "D": int(embs.shape[1]),
        "true_labels_first30": true_labels[:30].tolist(),
        "est_num_spk": int(res.est_num_speakers), "p_hat": int(res.p_hat),
        "max_num_speakers": 8, "max_rp_threshold": 0.25,
        "sparse_search_volume": 30, "nme_mat_size": 512,
        "labels_source": source,
    }
    write_cluster_fixture(args.out, embs, labels, aff, meta)
    print(f"wrote {args.out} (labels from {source})")
    return 0


def export_net_fixture(model, audio: np.ndarray, out_dir: str,
                       per_feature_norm: bool) -> None:
    """Run a NeMo MarbleNet/TitaNet on `audio` with per-block hooks, writing
    mel.f32 / enc_block_*.f32 / encoder_out.f32 / shapes.json in the
    reference fixture layout (channels-first rows, time innermost)."""
    import torch

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    shapes: dict[str, list] = {}

    def save(name: str, t) -> None:
        arr = t.detach().float().cpu().numpy()
        arr.astype("<f4").tofile(out / f"{name}.f32")
        shapes[name] = [list(arr.shape), "float32"]

    audio = np.asarray(audio, np.float32)
    audio.astype("<f4").tofile(out / "input_audio.f32")
    shapes["input_audio"] = [[len(audio)], "float32"]

    sig = torch.from_numpy(audio)[None]
    sig_len = torch.tensor([len(audio)])
    mel, mel_len = model.preprocessor(input_signal=sig, length=sig_len)
    save("mel", mel)

    def _first(x):
        while isinstance(x, (tuple, list)) and x:
            x = x[0]
        return x

    hooks = []
    blocks = dict(model.encoder.named_modules())
    i = 0
    while f"encoder.{i}" in blocks:
        def mk(idx):
            def hook(module, args, output):
                save(f"enc_block_{idx}", _first(output))
            return hook
        hooks.append(blocks[f"encoder.{i}"].register_forward_hook(mk(i)))
        i += 1

    with torch.inference_mode():
        enc, enc_len = model.encoder(audio_signal=mel, length=mel_len)
        save("encoder_out", enc)
        dec_out = model.decoder(encoder_output=enc)
        save("embedding" if per_feature_norm else "logits", _first(dec_out))
    for h in hooks:
        h.remove()
    (out / "shapes.json").write_text(json.dumps(shapes, indent=2))


def cmd_net(args, per_feature_norm: bool) -> int:
    try:
        import nemo.collections.asr as nemo_asr
    except ImportError as e:
        print(f"NeMo required for the producer side: {e}", file=sys.stderr)
        return 2
    from nemotron_tpu.audio.wavio import read_wav

    model = nemo_asr.models.EncDecClassificationModel.restore_from(
        args.model, map_location="cpu"
    ) if not per_feature_norm else (
        nemo_asr.models.EncDecSpeakerLabelModel.restore_from(
            args.model, map_location="cpu")
    )
    model.eval()
    samples, rate = read_wav(args.audio)
    assert rate == 16000
    export_net_fixture(model, samples.astype(np.float32) / 32768.0,
                       args.out, per_feature_norm)
    print(f"wrote {args.out}")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("cluster")
    c.add_argument("--out", default="tests_out/cluster_ref")
    c.add_argument("--seed", type=int, default=0)
    for name in ("vad", "spk"):
        p = sub.add_parser(name)
        p.add_argument("--model", required=True)
        p.add_argument("--audio", required=True)
        p.add_argument("--out", default=f"tests_out/{name}_ref")
    args = ap.parse_args(argv)
    if args.cmd == "cluster":
        return cmd_cluster(args)
    return cmd_net(args, per_feature_norm=args.cmd == "spk")


if __name__ == "__main__":
    raise SystemExit(main())
