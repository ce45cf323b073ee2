"""Streaming transcription CLI — same argv contract as the reference binary
(src/transcribe_stream.cpp:33-105):

    python -m nemotron_tpu.cli.transcribe_stream <model.gguf> <audio.pcm|->
        [chunk_ms=80] [right_context=0]
        [--lang <code>] [--diarize <diarize.gguf>] [--rttm] [--speaker-text]
        [--json] [--num-speakers N] [--sub-shift MS] [--timestamps]

Reads s16le 16 kHz mono PCM from a file or stdin, prints incremental text as it
decodes, and a final RTF summary on stderr.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def parse_args(argv: list[str]) -> dict:
    opts = {
        "model": None,
        "audio": None,
        "chunk_ms": 80,
        "right_context": 0,
        "lang": None,
        "diarize": None,
        "rttm": False,
        "speaker_text": False,
        "json": False,
        "num_speakers": -1,
        "sub_shift_ms": 750,
        "timestamps": False,
        "confidence": False,
        "bf16": False,
        "quantized": False,
    }
    pos = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--lang":
            i += 1
            opts["lang"] = argv[i]
        elif a == "--diarize":
            i += 1
            opts["diarize"] = argv[i]
        elif a == "--rttm":
            opts["rttm"] = True
        elif a == "--speaker-text":
            opts["speaker_text"] = True
        elif a == "--json":
            opts["json"] = True
        elif a == "--num-speakers":
            i += 1
            opts["num_speakers"] = int(argv[i])
        elif a == "--sub-shift":
            i += 1
            opts["sub_shift_ms"] = int(argv[i])
        elif a == "--timestamps":
            opts["timestamps"] = True
        elif a == "--confidence":
            # per-token softmax confidence packed into the emission tensor
            # (beyond reference): --json word records gain a "conf" field
            opts["confidence"] = True
        elif a == "--bf16":
            opts["bf16"] = True
        elif a == "--quantized":
            opts["quantized"] = True
        elif a in ("--cpu", "--cuda", "--metal", "--tpu"):
            pass  # backend flags accepted for CLI compatibility; JAX picks the device
        else:
            pos.append(a)
        i += 1
    if len(pos) < 2:
        raise SystemExit(
            "usage: transcribe_stream <model.gguf> <audio.pcm|-> [chunk_ms] "
            "[right_context] [--lang CODE] [--diarize GGUF] [--rttm] "
            "[--speaker-text] [--json]"
        )
    opts["model"] = pos[0]
    opts["audio"] = pos[1]
    if len(pos) > 2:
        opts["chunk_ms"] = int(pos[2])
    if len(pos) > 3:
        opts["right_context"] = int(pos[3])
    return opts


def _chunk_conf(sess) -> float:
    """Min confidence over the session's most recent chunk of tokens
    (-1 when confidence packing is off)."""
    if not sess.token_confs:
        return -1.0
    n = len(sess.token_confs)
    k = min(n, 16)
    return float(min(sess.token_confs[n - k :]))


def main(argv=None) -> int:
    opts = parse_args(argv if argv is not None else sys.argv[1:])
    if opts["confidence"]:
        # must be set before the decode programs trace (read at trace time)
        import os

        os.environ["NEMOTRON_TPU_CONFIDENCE"] = "1"

    from ..api import ASRModel
    from ..config import CacheConfig
    from ..streaming.session import StreamSession

    import jax.numpy as jnp

    t0 = time.time()
    model = ASRModel.from_gguf(
        opts["model"],
        dtype=jnp.bfloat16 if opts["bf16"] else jnp.float32,
        keep_quantized=opts["quantized"],
    )
    print(f"loaded model in {time.time() - t0:.1f}s "
          f"(d_model={model.hp.d_model}, layers={model.hp.n_layers})",
          file=sys.stderr)

    cfg = CacheConfig.for_mode(opts["right_context"], model.hp)
    sess = StreamSession(model, cfg, lang=opts["lang"],
                         timestamp_words=opts["timestamps"])

    diar = None
    if opts["diarize"]:
        from ..diarize.pipeline import DiarizePipeline

        diar = DiarizePipeline.from_gguf(
            opts["diarize"],
            num_speakers=opts["num_speakers"],
            sub_shift_ms=opts["sub_shift_ms"],
        )

    chunk_samples = opts["chunk_ms"] * cfg.sample_rate // 1000
    if opts["audio"] == "-":
        f = sys.stdin.buffer
    elif opts["audio"].endswith(".wav"):
        import io

        from ..audio.wavio import read_wav

        samples, rate = read_wav(opts["audio"])
        if rate != cfg.sample_rate:
            raise SystemExit(f"expected {cfg.sample_rate} Hz wav, got {rate}")
        f = io.BytesIO(samples.astype("<i2").tobytes())
    else:
        f = open(opts["audio"], "rb")

    print(f"streaming: chunk={opts['chunk_ms']}ms right_context="
          f"{opts['right_context']} latency={cfg.latency_ms}ms",
          file=sys.stderr)

    total_samples = 0
    t_start = time.time()
    try:
        while True:
            raw = f.read(chunk_samples * 2)
            if not raw:
                break
            audio = np.frombuffer(raw, dtype="<i2")
            total_samples += len(audio)
            text = sess.process_incremental(audio)
            if text and not (diar and opts["speaker_text"]):
                sys.stdout.write(text)
                sys.stdout.flush()
            if diar is not None:
                diar.push_audio(audio.astype(np.float32) / 32768.0)
                if text:
                    diar.push_text(text, sess.total_audio_seconds,
                                   conf=_chunk_conf(sess))
                if opts["json"]:
                    for line in diar.drain_json():
                        print(line)
    finally:
        if f is not sys.stdin.buffer and hasattr(f, "close"):
            f.close()

    tail = sess.finalize()
    if tail and not (diar and opts["speaker_text"]):
        sys.stdout.write(tail)
    if not (diar and opts["speaker_text"]):
        sys.stdout.write("\n")
    sys.stdout.flush()

    if diar is not None:
        if tail:
            diar.push_text(tail, sess.total_audio_seconds,
                           conf=_chunk_conf(sess))
        result = diar.finalize()
        if opts["speaker_text"] or not opts["rttm"]:
            print(result.speaker_text)
        if opts["rttm"]:
            sys.stdout.write(result.rttm)

    elapsed = time.time() - t_start
    audio_secs = total_samples / cfg.sample_rate
    rtf = elapsed / audio_secs if audio_secs else 0.0
    print(f"\naudio: {audio_secs:.2f}s  compute: {elapsed:.2f}s  "
          f"RTF: {rtf:.4f} ({1.0 / rtf if rtf else 0:.1f}x real-time)",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
