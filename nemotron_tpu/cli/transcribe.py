"""Offline batch transcription CLI (reference: src/transcribe.cpp).

    python -m nemotron_tpu.cli.transcribe <model.gguf> <audio.pcm> [--timestamps]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    timestamps = "--timestamps" in argv
    pos = [a for a in argv if not a.startswith("--")]
    if len(pos) < 2:
        raise SystemExit("usage: transcribe <model.gguf> <audio.pcm|-> [--timestamps]")

    from ..api import ASRModel

    model = ASRModel.from_gguf(pos[0])
    if pos[1] == "-":
        audio = np.frombuffer(sys.stdin.buffer.read(), dtype="<i2")
    else:
        from ..audio.wavio import maybe_read_audio

        audio = maybe_read_audio(pos[1])

    t0 = time.time()
    text = model.transcribe_audio(audio, timestamp_words=timestamps)
    dt = time.time() - t0
    print(text)
    secs = len(audio) / 16000.0
    print(f"audio: {secs:.2f}s  compute: {dt:.2f}s  RTF: {dt / secs:.4f}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
