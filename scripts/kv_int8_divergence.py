#!/usr/bin/env python3
"""Quantify kv-int8 TOKEN divergence over long streams (VERDICT r3 item 8).

The kv-int8 serving configuration (int8 attention-cache HISTORY + per-frame
scales, ops/kvquant.py) is the measured headline (+8% over bf16 at B=768) but
carries ~0.4% relative cache-read error. This study runs the SAME long audio
through a StreamSession with f32 caches and with int8 caches — minutes of
stream, the phased slack buffer wrapped many times — and reports token-level
divergence, the data behind the default-on vs opt-in decision.

CPU-runnable (tiny or full geometry):

    python scripts/kv_int8_divergence.py --seconds 120 [--full-size]

Interpretation caveat: random weights produce near-degenerate logit margins
(argmax flips on noise a trained checkpoint would shrug off), so these
numbers are a PESSIMISTIC bound; re-run with the real GGUF (--gguf) the
moment weights exist for the decision-grade number.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def edit_distance(a: list[int], b: list[int]) -> int:
    d = np.arange(len(b) + 1)
    for i, x in enumerate(a, 1):
        prev = d.copy()
        d[0] = i
        for j, y in enumerate(b, 1):
            d[j] = min(prev[j] + 1, d[j - 1] + 1, prev[j - 1] + (x != y))
    return int(d[-1])


def run_session(model, cfg, pcm, chunk=1600):
    from nemotron_tpu.streaming.session import StreamSession

    sess = StreamSession(model, cfg)
    for off in range(0, len(pcm), chunk):
        sess.process_incremental(pcm[off:off + chunk])
    sess.finalize()
    return sess.get_tokens(), sess.total_chunks


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=120.0)
    ap.add_argument("--gguf", help="real checkpoint (else random weights)")
    ap.add_argument("--full-size", action="store_true",
                    help="full 0.6B geometry random weights (slow on CPU)")
    ap.add_argument("--right-context", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--blank-bias", type=float, default=-1.5,
                    help="added to the joint's blank logit bias on random "
                         "weights (negative = denser emissions; ~0.3-1 "
                         "token/frame matches real speech — bench.py uses "
                         "the same device). Ignored with --gguf.")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    from nemotron_tpu.api import ASRModel

    def debias(model):
        if args.gguf or args.blank_bias == 0.0:
            return model
        import dataclasses as dc

        out_b = model.params.joint.out_b.at[model.hp.blank_id].add(
            args.blank_bias)
        model.params = dc.replace(
            model.params, joint=dc.replace(model.params.joint, out_b=out_b))
        return model

    if args.gguf:
        build = lambda: ASRModel.from_gguf(args.gguf)  # noqa: E731
    elif args.full_size:
        build = lambda: debias(ASRModel.random(seed=args.seed))  # noqa: E731
    else:
        sys.path.insert(0, str(REPO / "tests"))
        from helpers import tiny_hparams

        hp = tiny_hparams()
        build = lambda: debias(ASRModel.random(hp, seed=args.seed))  # noqa: E731

    n = int(args.seconds * 16000)
    rng = np.random.default_rng(args.seed)
    t = np.arange(n) / 16000.0
    # band-limited chatter: slow AM over two tones + noise floor
    sig = (0.4 * np.sin(2 * np.pi * 230 * t) * (np.sin(2 * np.pi * 1.7 * t) > -0.2)
           + 0.25 * np.sin(2 * np.pi * 520 * t) * (np.sin(2 * np.pi * 0.9 * t) > 0)
           + 0.06 * rng.standard_normal(n))
    pcm = (np.clip(sig, -1, 1) * 30000).astype(np.int16)

    os.environ.pop("NEMOTRON_TPU_KV_INT8", None)
    model = build()
    cfg = model.cache_config(args.right_context)
    base_tokens, n_chunks = run_session(model, cfg, pcm)

    os.environ["NEMOTRON_TPU_KV_INT8"] = "1"
    try:
        model_q = build()
        q_tokens, _ = run_session(model_q, cfg, pcm)
    finally:
        os.environ.pop("NEMOTRON_TPU_KV_INT8", None)

    dist = edit_distance(base_tokens, q_tokens)
    wraps = n_chunks // cfg.n_phases
    out = {
        "seconds": args.seconds,
        "chunks": n_chunks,
        "slack_buffer_wraps": wraps,
        "right_context": args.right_context,
        "tokens_f32": len(base_tokens),
        "tokens_kv_int8": len(q_tokens),
        "token_edit_distance": dist,
        "token_divergence_rate": round(dist / max(len(base_tokens), 1), 4),
        "weights": args.gguf or ("random-full" if args.full_size
                                 else "random-tiny"),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
