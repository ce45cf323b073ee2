"""Offline batch transcription CLI (reference: src/transcribe.cpp).

    python -m nemotron_tpu.cli.transcribe <model.gguf> <audio.pcm|-> \
        [more.pcm ...] [--timestamps]

Several files transcribe as ONE padded batch per device program (ragged
lengths via the key mask) — the reference runs one exact-length graph per
file.
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
        raise SystemExit("usage: transcribe <model.gguf> <audio.pcm|-> "
                         "[more.pcm ...] [--timestamps]")

    from ..api import ASRModel

    model = ASRModel.from_gguf(pos[0])
    audios = []
    stdin_audio = None
    for path in pos[1:]:
        if path == "-":
            if stdin_audio is None:  # stdin reads once; '-' twice reuses it
                stdin_audio = np.frombuffer(sys.stdin.buffer.read(),
                                            dtype="<i2")
            audios.append(stdin_audio)
        else:
            from ..audio.wavio import maybe_read_audio

            audios.append(maybe_read_audio(path))

    t0 = time.time()
    if len(audios) == 1:
        texts = [model.transcribe_audio(audios[0], timestamp_words=timestamps)]
    else:
        texts = model.transcribe_audios(audios, timestamp_words=timestamps)
    dt = time.time() - t0
    for name, text in zip(pos[1:], texts):
        if len(texts) > 1:
            print(f"{name}\t{text}")
        else:
            print(text)
    secs = sum(len(a) for a in audios) / 16000.0
    rtf = dt / secs if secs > 0 else float("inf")
    print(f"audio: {secs:.2f}s  compute: {dt:.2f}s  RTF: {rtf:.4f}",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
