#!/usr/bin/env python3
"""Dump per-module activations for cross-implementation parity checks.

Our side of the reference's dump-and-diff workflow (NeMo hooks in
scripts/my_streaming.py + GGML append_dump_tensor -> compare_tensors.py):
runs a checkpoint on PCM audio and appends shape-checked binary dumps
(utils/dump format, byte-compatible with the reference's) for the mel
frontend, subsampling output, streaming encoder output per chunk, and decode
emissions. Diff against any other implementation's dumps with
scripts/compare_tensors.py.

Usage:
    python scripts/dump_activations.py model.gguf audio.pcm out_dir/
        [--right-context N] [--batch]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("audio")
    ap.add_argument("out_dir")
    ap.add_argument("--right-context", type=int, default=0)
    ap.add_argument("--batch", action="store_true",
                    help="also dump the offline (batch) encoder path")
    ap.add_argument("--per-layer", action="store_true",
                    help="also dump every conformer layer's output on the "
                         "batch path (the compare_layers.py / debug_* tap)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from nemotron_tpu.api import ASRModel
    from nemotron_tpu.audio.wavio import maybe_read_audio
    from nemotron_tpu.config import CacheConfig
    from nemotron_tpu.models.encoder import encode_batch, stream_encode_step
    from nemotron_tpu.ops.conv import conv_subsampling
    from nemotron_tpu.streaming.session import StreamSession
    from nemotron_tpu.utils import dump

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    model = ASRModel.from_gguf(args.model)
    audio = maybe_read_audio(args.audio)
    cfg = CacheConfig.for_mode(args.right_context, model.hp)

    # --- streaming path: dump mel chunks + per-chunk encoder out + tokens ---
    sess = StreamSession(model, cfg)
    mel = sess.preprocessor.process(audio)
    dump.append_dump_array(mel, str(out / "mel_full.bin"))
    sess.preprocessor.reset()

    k = v = c = valid = None
    state = model.init_stream_state(1, cfg)
    k, v, c, valid = (state.k_cache, state.v_cache, state.conv_cache,
                      state.cache_valid)
    mel_buffer = np.zeros((cfg.pre_encode_cache_size, model.hp.n_mels),
                          np.float32)
    mel2 = sess.preprocessor.process(audio)
    mel_buffer = np.concatenate([mel_buffer, mel2])
    n_chunks = 0
    while mel_buffer.shape[0] >= cfg.chunk_mel_frames:
        chunk = mel_buffer[: cfg.chunk_mel_frames]
        dump.append_dump_array(chunk, str(out / "mel_chunks.bin"))
        sub = conv_subsampling(model.params.subsampling,
                               jnp.asarray(chunk[None]))
        dump.append_dump_array(np.asarray(sub[0]),
                               str(out / "subsampled_chunks.bin"))
        enc, k, v, c, valid = stream_encode_step(
            model.params, model.hp, cfg, jnp.asarray(chunk[None]),
            k, v, c, valid, phase=0, advance_phase=False)
        dump.append_dump_array(np.asarray(enc[0][: cfg.valid_out_len]),
                               str(out / "encoder_out_chunks.bin"))
        mel_buffer = mel_buffer[cfg.shift_mel_frames :]
        n_chunks += 1
    print(f"dumped {n_chunks} streaming chunks", file=sys.stderr)

    # --- full session tokens (text-level parity) ---
    sess2 = StreamSession(model, cfg)
    sess2.process_incremental(audio)
    sess2.finalize()
    toks = np.asarray(sess2.get_tokens(), np.float32)
    if toks.size:
        dump.append_dump_array(toks, str(out / "tokens.bin"))
    (out / "transcript.txt").write_text(sess2.get_transcript())

    if args.batch:
        enc = encode_batch(model.params, model.hp, jnp.asarray(
            mel[None].astype(np.float32)))
        dump.append_dump_array(np.asarray(enc[0]),
                               str(out / "encoder_out_batch.bin"))

    if args.per_layer:
        # batch-path layer ladder (the role of the reference's
        # compare_layers.py / debug_*.py one-offs): subsampling out, then
        # every conformer layer's output, appended in order to one dump file
        import jax

        from nemotron_tpu.models.encoder import conformer_layer, pos_emb_slice

        x = conv_subsampling(model.params.subsampling,
                             jnp.asarray(mel[None].astype(np.float32)))
        pe = pos_emb_slice(model.params.pos_emb, 2 * x.shape[1] - 1)
        dump.append_dump_array(np.asarray(x[0]),
                               str(out / "layers_batch.bin"))
        for i in range(model.hp.n_layers):
            lp = jax.tree_util.tree_map(lambda a, i=i: a[i],
                                        model.params.layers)
            x = conformer_layer(x, pe, lp, model.hp)
            dump.append_dump_array(np.asarray(x[0]),
                                   str(out / "layers_batch.bin"))
        print(f"dumped subsampling + {model.hp.n_layers} layer outputs",
              file=sys.stderr)

    print(f"dumps in {out}/ — diff with scripts/compare_tensors.py",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
