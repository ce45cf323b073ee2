#!/usr/bin/env python3
"""Diarization compute throughput per chip.

The reference's diarization cost model (SURVEY 2.5/3.4): per audio-second
per stream it scores 100 MarbleNet VAD windows (one full 0.63 s window
re-encoded per 10 ms shift — 63x redundancy it pays on host/GPU one window
at a time) and ~1.33 TitaNet-L windows (1.5 s / 0.75 s shift while speech is
active), then NME-SC clustering at finalize (Eigen eigendecomposition,
~60 ms per N=512 solve on CPU, BASELINE.md).

Here the same workload is batched: vad_probs / spk_embed take [B, samples]
window batches in one jitted call each, and the NME-SC p-sweep runs as ONE
batched eigvalsh. This measures, on the real chip:

  - VAD windows/sec at batch W      -> audio-sec/sec = wps / 100
  - TitaNet windows/sec at batch W  -> audio-sec/sec = wps / 1.333
  - combined streaming diarize throughput (both in series, worst-case
    all-speech audio)
  - NME-SC wall time at N=512 (vs the reference's Eigen numbers)

Methodology per CLAUDE.md axon quirks: never-repeated inputs (execution
memoization), output->input chaining so ONE final fetch closes the timed
window, warmup fetch per program. Prints one JSON line:
diarize_realtime_streams = concurrent real-time streams whose full
diarization compute fits one chip (no published reference throughput
exists, so vs_baseline is against 1 stream = the reference's
single-session design point).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

VAD_WIN = 10080    # 0.63 s window, one per 10 ms  -> 100 windows/audio-sec
SPK_WIN = 24000    # 1.5 s window, 0.75 s shift    -> 1.333 windows/audio-sec
VAD_PER_SEC = 100.0
SPK_PER_SEC = 1.0 / 0.75


def _chain_time(fn, make_input, steps: int):
    """Time `steps` chained dispatches closed by one fetch (axon-safe)."""
    carry = jnp.float32(0.0)
    out, carry = fn(make_input(0), carry)
    np.asarray(out)  # compile + execute
    out, carry = fn(make_input(1), carry)
    np.asarray(out)
    t0 = time.time()
    for i in range(steps):
        out, carry = fn(make_input(2 + i), carry)
    np.asarray(out)
    return (time.time() - t0) / steps


def run(vad_batch=1024, spk_batch=16, steps=10, seed=0):
    from tests.scripts_support import export_random_diarize_checkpoint
    from nemotron_tpu.diarize.nets import spk_embed, vad_probs
    from nemotron_tpu.diarize.params import load_diarize_model

    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform}", file=sys.stderr)

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        path = str(Path(td) / "diar.gguf")
        export_random_diarize_checkpoint(path, seed=seed)
        model = load_diarize_model(path)

    rng = np.random.default_rng(1)

    # ---- VAD: [W, 10080] windows -> [W] P(speech) -------------------------
    @jax.jit
    def vad_fn(windows, carry):
        p = vad_probs(model.vad, windows + carry * 1e-20,
                      jnp.full((windows.shape[0],), VAD_WIN, jnp.int32))
        return p, p.sum()

    n_in = steps + 4
    vad_in = [jnp.asarray(rng.uniform(-0.3, 0.3, (vad_batch, VAD_WIN))
                          .astype(np.float32)) for _ in range(n_in)]
    t_vad = _chain_time(vad_fn, lambda i: vad_in[i], steps)
    vad_wps = vad_batch / t_vad
    print(f"VAD: W={vad_batch} step={t_vad * 1e3:.1f} ms -> "
          f"{vad_wps:.0f} windows/s = {vad_wps / VAD_PER_SEC:.0f} "
          f"audio-sec/sec", file=sys.stderr)

    # ---- TitaNet: [W, 24000] windows -> [W, 192] --------------------------
    @jax.jit
    def spk_fn(windows, carry):
        e = spk_embed(model.spk, windows + carry * 1e-20,
                      jnp.full((windows.shape[0],), SPK_WIN, jnp.int32))
        return e, e.sum()

    spk_in = [jnp.asarray(rng.uniform(-0.3, 0.3, (spk_batch, SPK_WIN))
                          .astype(np.float32)) for _ in range(n_in)]
    t_spk = _chain_time(spk_fn, lambda i: spk_in[i], steps)
    spk_wps = spk_batch / t_spk
    print(f"SPK: W={spk_batch} step={t_spk * 1e3:.1f} ms -> "
          f"{spk_wps:.0f} windows/s = {spk_wps / SPK_PER_SEC:.0f} "
          f"audio-sec/sec", file=sys.stderr)

    # combined: per audio-second the pipeline needs 100 VAD + 1.333 SPK
    # window-equivalents (worst case: continuous speech)
    sec_per_audio_sec = VAD_PER_SEC / vad_wps + SPK_PER_SEC / spk_wps
    streams = 1.0 / sec_per_audio_sec
    print(f"combined streaming diarization: {streams:.0f} real-time streams "
          f"(all-speech worst case)", file=sys.stderr)

    # ---- NME-SC at N=512 (finalize-time clustering) ------------------------
    from nemotron_tpu.diarize.cluster import NmescConfig, nmesc_cluster

    embs = rng.standard_normal((512, 192)).astype(np.float32)
    embs[:256] += 2.0 * rng.standard_normal(192).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    res = nmesc_cluster(embs, NmescConfig())  # warm compile
    t0 = time.time()
    res = nmesc_cluster(embs, NmescConfig())
    t_cluster = time.time() - t0
    print(f"NME-SC N=512: {t_cluster * 1e3:.0f} ms full cluster "
          f"(p-sweep batched eigvalsh; est {res.est_num_speakers} spk; "
          f"reference: ~60 ms PER Eigen solve x p-sweep on CPU)",
          file=sys.stderr)

    return streams


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--vad-batch", type=int, default=1024)
    ap.add_argument("--spk-batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()
    streams = run(vad_batch=args.vad_batch, spk_batch=args.spk_batch,
                  steps=args.steps)
    print(json.dumps({
        "metric": "diarize_realtime_streams",
        "value": round(streams, 1),
        "unit": "streams/chip",
        "vs_baseline": round(streams, 2),  # reference design point: 1 stream
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
