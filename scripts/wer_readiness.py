#!/usr/bin/env python3
"""WER-readiness drill: .nemo -> GGUF -> parity suite -> WER, one command.

The moment a real checkpoint (and/or network) exists, the full parity claim
is one command away (VERDICT round-3 item 7; the real-weights analogue is
/root/reference/docs/STATUS.md:241-260 — encoder max diff 4.5e-05, 121/121
greedy tokens exact):

    python scripts/wer_readiness.py --nemo parakeet.nemo \
        --wav-list eval.tsv --workdir /tmp/wer

    # eval.tsv lines: <wav-or-pcm path> <TAB> <reference transcript>

Steps:
  1. convert the .nemo to GGUF (scripts/convert_nemo_to_gguf.py), unless
     --gguf points at an existing one
  2. load it; transcribe every wav offline AND chunked-streaming, asserting
     the stream transcript is exactly invariant to push granularity (the
     batch==stream token-equality claim itself is step 3's armed suite)
  3. run the armed real-checkpoint pytest suite with
     NEMOTRON_TPU_MODEL_GGUF set (tests/test_reference_fixtures.py)
  4. compute corpus WER against the reference transcripts

`--synthetic` rehearses the EXACT same path end-to-end with a synthesized
.nemo + wav list whose references are the model's own batch transcripts
(expected WER 0.0) — keeping every step green in CI until weights land.
Exercised by tests/test_converters.py::test_wer_readiness_drill_synthetic.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import wave
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def read_audio(path: str) -> np.ndarray:
    if path.endswith(".wav"):
        with wave.open(path, "rb") as w:
            assert w.getframerate() == 16000, f"{path}: need 16 kHz"
            assert w.getsampwidth() == 2, f"{path}: need s16"
            data = w.readframes(w.getnframes())
        return np.frombuffer(data, "<i2")
    return np.fromfile(path, "<i2")  # raw pcm s16le 16 kHz


def wer(ref: str, hyp: str) -> tuple[int, int]:
    """(edit distance, #ref words) — standard word-level Levenshtein."""
    r, h = ref.split(), hyp.split()
    d = np.arange(len(h) + 1)
    for i, rw in enumerate(r, 1):
        prev = d.copy()
        d[0] = i
        for j, hw in enumerate(h, 1):
            d[j] = min(prev[j] + 1, d[j - 1] + 1,
                       prev[j - 1] + (rw != hw))
    return int(d[-1]), len(r)


def synth_fixture(workdir: Path) -> tuple[Path, Path]:
    """Synthesize a .nemo + wav list for the rehearsal mode."""
    sys.path.insert(0, str(REPO / "tests"))
    from helpers import tiny_hparams
    from scripts_support import export_random_checkpoint
    from test_converters import asr_config, asr_raw_state, make_nemo_tarball

    hp = tiny_hparams(d_ff=128)
    t = export_random_checkpoint(hp, str(workdir / "unused_ref.gguf"), seed=11)
    nemo = workdir / "model.nemo"
    make_nemo_tarball(nemo, asr_raw_state(t), asr_config(hp))

    rng = np.random.default_rng(0)
    lines = []
    for i in range(2):
        n = 12800 + 3200 * i
        tt = np.arange(n) / 16000.0
        sig = (0.4 * np.sin(2 * np.pi * (260 + 90 * i) * tt)
               + 0.2 * rng.standard_normal(n))
        pcm = (np.clip(sig, -1, 1) * 32767).astype(np.int16)
        p = workdir / f"utt{i}.wav"
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        lines.append(str(p))  # reference filled in after conversion
    wav_list = workdir / "eval.tsv"
    wav_list.write_text("\n".join(lines) + "\n")
    return nemo, wav_list


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nemo", help=".nemo checkpoint to convert")
    ap.add_argument("--gguf", help="already-converted GGUF (skips step 1)")
    ap.add_argument("--wav-list",
                    help="TSV: <wav/pcm path> [<TAB> reference transcript]")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--quantize", default=None,
                    help="also convert+check this quant (e.g. q8_0)")
    ap.add_argument("--skip-pytest", action="store_true",
                    help="skip step 3 (the armed pytest suite)")
    ap.add_argument("--synthetic", action="store_true",
                    help="rehearse the whole drill on synthesized weights "
                         "(references = own batch output; expect WER 0)")
    ap.add_argument("--tpu", action="store_true",
                    help="run step 2/4 transcriptions on the default (TPU) "
                         "device instead of pinning CPU")
    args = ap.parse_args()

    if not args.tpu:
        # the axon TPU plugin registers via sitecustomize and ignores
        # JAX_PLATFORMS=cpu (CLAUDE.md) — without this pin the drill's f32
        # parity transcriptions would silently run bf16 on the tunneled TPU
        # (and pay minutes of remote compiles per shape)
        import jax

        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    workdir = Path(args.workdir or tempfile.mkdtemp(prefix="wer_drill_"))
    workdir.mkdir(parents=True, exist_ok=True)

    if args.synthetic:
        args.nemo, wav_list_path = synth_fixture(workdir)
        args.wav_list = str(wav_list_path)
    elif not (args.nemo or args.gguf) or not args.wav_list:
        ap.error("need --nemo or --gguf, and --wav-list (or --synthetic)")

    # ---- step 1: convert --------------------------------------------------
    if args.gguf:
        gguf = Path(args.gguf)
        print(f"[1/4] using existing GGUF {gguf}")
    else:
        gguf = workdir / "model.gguf"
        cmd = [sys.executable, str(REPO / "scripts" / "convert_nemo_to_gguf.py"),
               str(args.nemo), str(gguf)]
        print(f"[1/4] {' '.join(cmd)}")
        subprocess.run(cmd, check=True)
        if args.quantize:
            qout = workdir / f"model.{args.quantize}.gguf"
            subprocess.run(cmd[:-1] + [str(qout), "-q", args.quantize],
                           check=True)
            print(f"      quantized variant at {qout}")

    # ---- step 2: batch-vs-stream token parity per wav ---------------------
    from nemotron_tpu.api import ASRModel
    from nemotron_tpu.streaming.session import StreamSession

    model = ASRModel.from_gguf(str(gguf))
    entries = []
    for line in Path(args.wav_list).read_text().splitlines():
        if not line.strip():
            continue
        parts = line.split("\t")
        entries.append((parts[0], parts[1] if len(parts) > 1 else None))

    # Step 2 checks what holds for ANY weights: both paths transcribe, and
    # the chunked session is EXACTLY invariant to the client's push
    # granularity (the incremental mel buffer/shift math). Batch==stream
    # token equality is NOT asserted here — it only holds for trained
    # limited-context weights and is the armed suite's job (step 3).
    print(f"[2/4] batch + stream transcription, chunking-invariance, on "
          f"{len(entries)} files")
    hyps = []
    for path, _ in entries:
        pcm = read_audio(path)
        text_batch = model.transcribe_audio(pcm)

        def stream(chunk: int) -> str:
            sess = StreamSession(model)
            for off in range(0, len(pcm), chunk):
                sess.process_incremental(pcm[off:off + chunk])
            sess.finalize()
            return sess.get_transcript()

        text_stream = stream(1280)
        text_stream_b = stream(3200)
        assert text_batch, f"{path}: empty batch transcript"
        assert text_stream, f"{path}: empty streaming transcript"
        assert text_stream == text_stream_b, (
            f"{path}: streaming transcript depends on push chunking "
            f"(80 ms vs 200 ms pushes)")
        hyps.append(text_batch)
        print(f"      {path}: batch={len(text_batch)}ch "
              f"stream={len(text_stream)}ch chunk-invariant ok")

    if args.synthetic:
        # rehearsal references = own batch output -> expected WER 0
        entries = [(p, h) for (p, _), h in zip(entries, hyps)]

    # ---- step 3: parity pytest suite ---------------------------------------
    if args.skip_pytest:
        print("[3/4] skipped (--skip-pytest)")
    else:
        env = dict(os.environ,
                   JAX_PLATFORMS=os.environ.get("JAX_PLATFORMS", "cpu"))
        if args.synthetic:
            # the armed R=13 stream==batch equality only holds for TRAINED
            # weights (limited-context training); the synthetic rehearsal
            # runs the torch-oracle e2e suite instead — the random-weights
            # analogue of the same claim (plus the unarmed fixture suite to
            # exercise the exact command).
            targets = ["test_e2e_oracle.py", "test_reference_fixtures.py"]
        else:
            env["NEMOTRON_TPU_MODEL_GGUF"] = str(gguf)
            targets = ["test_reference_fixtures.py"]
        cmd = [sys.executable, "-m", "pytest", "-q",
               *(str(REPO / "tests" / t) for t in targets)]
        print(f"[3/4] {' '.join(cmd)}")
        r = subprocess.run(cmd, cwd=str(REPO), env=env)
        if r.returncode != 0:
            print("parity suite FAILED", file=sys.stderr)
            return 1

    # ---- step 4: WER -------------------------------------------------------
    tot_err = tot_words = 0
    scored = 0
    for (path, ref), hyp in zip(entries, hyps):
        if ref is None:
            continue
        e, n = wer(ref, hyp)
        tot_err += e
        tot_words += n
        scored += 1
    w = (tot_err / tot_words) if tot_words else None
    print(f"[4/4] WER over {scored} scored files: "
          f"{'n/a (no references)' if w is None else f'{w:.4f}'}")
    print(json.dumps({"gguf": str(gguf), "files": len(entries),
                      "scored": scored, "wer": w}))
    return 0 if (w is None or w < 1.0) else 1


if __name__ == "__main__":
    raise SystemExit(main())
