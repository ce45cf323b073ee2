#!/usr/bin/env python3
"""Measure the fused Pallas mel kernel vs the XLA mel path on TPU.

VERDICT round-3 item 4: ops/mel_pallas.py was interpret-parity tested but
never TPU-measured. This microbench times the batched steady-state frontend
step (the exact op the fused serving tick runs per chunk, models/asr.py:151)
in both implementations, chained across steps with never-repeated inputs
(axon memoizes identical executions — CLAUDE.md).

    python scripts/bench_mel.py [--batch 768] [--frames 8] [--steps 30]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=768)
    ap.add_argument("--frames", type=int, default=8,
                    help="mel frames per step (shift_mel_frames at R=0)")
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from nemotron_tpu.ops import mel as melops
    from nemotron_tpu.ops.mel_pallas import make_mel_step_pallas

    B, F = args.batch, args.frames
    n_new = F * melops.HOP
    tail_len = melops.N_FFT - melops.HOP
    rng = np.random.default_rng(0)
    fb = rng.uniform(0, 1, (128, 257)).astype(np.float32) * 0.01
    window = np.hanning(400).astype(np.float32)
    win512 = melops.padded_window(window)
    fbj = jnp.asarray(fb)

    n_blocks = args.steps + 3
    audios = [jnp.asarray(rng.uniform(-0.5, 0.5, (B, n_new)).astype(np.float32))
              for _ in range(n_blocks)]

    dev = jax.devices()[0]
    print(f"device: {dev} B={B} frames={F}", file=sys.stderr)

    def time_variant(name, step):
        tail = jnp.zeros((B, tail_len), jnp.float32)
        last = jnp.zeros((B,), jnp.float32)
        i = [0]

        def one(tail, last):
            a = audios[i[0] % n_blocks]
            i[0] += 1
            return step(a, tail, last, n_frames=F)

        t0 = time.time()
        mel, tail, last = one(tail, last)
        np.asarray(mel)
        compile_s = time.time() - t0
        for _ in range(2):
            mel, tail, last = one(tail, last)
            np.asarray(mel)
        t0 = time.time()
        for _ in range(args.steps):
            mel, tail, last = one(tail, last)
        np.asarray(mel)
        dt = (time.time() - t0) / args.steps
        print(f"{name}: {dt * 1e3:.3f} ms/step (compile {compile_s:.1f}s)",
              file=sys.stderr)
        return dt

    import functools

    @functools.partial(jax.jit, static_argnames=("n_frames",))
    def xla_step(audio, tail, last, *, n_frames):
        return melops.mel_step(audio, tail, last, win512, fbj,
                               n_frames=n_frames)

    t_xla = time_variant("xla", xla_step)
    pallas_step = make_mel_step_pallas(fb, window)
    t_pal = time_variant("pallas", pallas_step)

    import json

    print(json.dumps({"batch": B, "frames": F,
                      "xla_ms": round(t_xla * 1e3, 3),
                      "pallas_ms": round(t_pal * 1e3, 3),
                      "speedup": round(t_xla / t_pal, 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
