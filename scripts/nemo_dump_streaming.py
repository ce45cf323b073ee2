#!/usr/bin/env python3
"""NeMo-side parity producer: run NVIDIA NeMo's cache-aware streaming on an
audio file with forward hooks that dump per-module tensors in the shape-headed
binary format of nemotron_tpu.utils.dump (the same on-disk format the
reference engine appends, src/nemo-stream.cpp:938-1010). The dumps are then
diffed against this repo's activations with scripts/compare_tensors.py /
scripts/dump_activations.py — the reference repo's dump-and-diff workflow
(scripts/my_streaming.py, docs/STREAMING-v2.md:117-149), reimplemented as a
data-driven hook map.

Requires NeMo (not in this image): the hook machinery below is importable and
tested standalone against any torch module tree; main() exits cleanly when
NeMo is absent.

Usage:
    python scripts/nemo_dump_streaming.py --model model.nemo --audio x.wav \
        [--out my_bin] [--right-context 0] [--layers 0,1,2]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nemotron_tpu.utils.dump import append_dump_array  # noqa: E402


def hook_spec(layers=(0, 1, 2)) -> dict[str, str]:
    """module path (under the NeMo ASRModel) -> dump file stem.

    Mirrors the tensors this repo's dump_activations.py emits so the two
    sides diff file-for-file: subsampling in/out, per-layer outputs, attention
    in/out of the chosen layers, encoder output, joint projections."""
    spec = {
        "encoder.pre_encode": "subsampling",
        "joint.enc": "joint_enc",
        "joint.pred": "joint_pred",
        "joint.joint_net": "joint_logits",
    }
    for i in layers:
        spec[f"encoder.layers.{i}"] = f"layer{i}"
        spec[f"encoder.layers.{i}.self_attn"] = f"layer{i}_attn"
        spec[f"encoder.layers.{i}.conv.depthwise_conv"] = f"layer{i}_dwconv"
    return spec


def _first_tensor(x):
    """Unwrap (tensor, ...) tuples / lists down to the first tensor."""
    while isinstance(x, (tuple, list)) and x:
        x = x[0]
    return x


def install_dump_hooks(root, spec: dict[str, str], out_dir: str):
    """Attach forward hooks on `root` (a torch.nn.Module) for every module
    path in `spec`, appending input/output tensors per call. Returns the hook
    handles (call .remove() to detach). Unknown paths are reported, not
    fatal — NeMo module trees shift between releases."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    modules = dict(root.named_modules())
    handles = []

    def make_hook(stem: str):
        def hook(module, args, output):
            t_in = _first_tensor(args)
            t_out = _first_tensor(output)
            if hasattr(t_in, "detach"):
                append_dump_array(
                    t_in.detach().float().cpu().numpy(),
                    str(out / f"nemo_{stem}_in.bin"),
                )
            if hasattr(t_out, "detach"):
                append_dump_array(
                    t_out.detach().float().cpu().numpy(),
                    str(out / f"nemo_{stem}_out.bin"),
                )
        return hook

    missing = []
    for path, stem in spec.items():
        mod = modules.get(path)
        if mod is None:
            missing.append(path)
            continue
        handles.append(mod.register_forward_hook(make_hook(stem)))
    if missing:
        print(f"[dump] {len(missing)} hook paths not found: {missing}",
              file=sys.stderr)
    return handles


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", required=True, help=".nemo checkpoint")
    ap.add_argument("--audio", required=True, help="16 kHz wav")
    ap.add_argument("--out", default="my_bin")
    ap.add_argument("--right-context", type=int, default=0)
    ap.add_argument("--layers", default="0,1,2")
    args = ap.parse_args(argv)

    try:
        import torch
        import nemo.collections.asr as nemo_asr
        from nemo.collections.asr.parts.utils.streaming_utils import (
            CacheAwareStreamingAudioBuffer,
        )
    except ImportError as e:
        print(f"NeMo required for the producer side: {e}", file=sys.stderr)
        return 2

    model = nemo_asr.models.ASRModel.restore_from(args.model, map_location="cpu")
    model.eval()
    model.encoder.setup_streaming_params(
        att_context_size=[70, args.right_context],
    )
    layers = tuple(int(x) for x in args.layers.split(",") if x != "")
    install_dump_hooks(model, hook_spec(layers), args.out)

    buffer = CacheAwareStreamingAudioBuffer(model=model)
    _ = buffer.append_audio_file(args.audio, stream_id=-1)
    (cache_ch, cache_t, cache_len) = model.encoder.get_initial_cache_state(
        batch_size=1
    )
    prev_hyp = None
    texts = []
    with torch.inference_mode():
        for chunk_i, (chunk, chunk_len) in enumerate(buffer):
            (enc, enc_len, cache_ch, cache_t, cache_len) = (
                model.encoder.cache_aware_stream_step(
                    processed_signal=chunk,
                    processed_signal_length=chunk_len,
                    cache_last_channel=cache_ch,
                    cache_last_time=cache_t,
                    cache_last_channel_len=cache_len,
                    keep_all_outputs=buffer.is_buffer_empty(),
                )
            )
            append_dump_array(enc.detach().float().cpu().numpy(),
                              str(Path(args.out) / "nemo_encoder_out.bin"))
            hyp = model.decoding.rnnt_decoder_predictions_tensor(
                enc, enc_len, return_hypotheses=True,
                partial_hypotheses=prev_hyp,
            )[0]
            prev_hyp = [hyp[0]] if isinstance(hyp, list) else [hyp]
            texts = [h.text for h in prev_hyp]
    print(texts[0] if texts else "")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
