#!/usr/bin/env python3
"""End-to-end serving benchmark: real server, real sockets, N concurrent
clients streaming synthetic audio, full-size model.

Unlike bench.py (pure compute hot path), this measures the whole system:
protocol parsing, admission control, per-slot frontends, the batched engine
tick, and text delivery.

Usage:
    python scripts/bench_serving.py [--streams 64] [--secs 20] [--batch 64]
"""

from __future__ import annotations

import argparse
import asyncio
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


async def run(n_streams: int, secs: float, batch: int, chunk_ms: int) -> int:
    import dataclasses as dc

    import jax.numpy as jnp

    from nemotron_tpu.api import ASRModel
    from nemotron_tpu.serving.client import transcribe_file
    from nemotron_tpu.serving.server import StreamServer

    print(f"loading full-size random model (bf16)...", file=sys.stderr)
    model = ASRModel.random(dtype=jnp.bfloat16)
    # ~2.4 tokens/frame emissions — denser than real speech, so decode and
    # text-delivery costs are over- not under-stated (see bench.py)
    out_b = model.params.joint.out_b.at[model.hp.blank_id].add(2.4)
    model.params = dc.replace(
        model.params, joint=dc.replace(model.params.joint, out_b=out_b))

    srv = StreamServer(model, batch_per_group=batch)
    engine_task = asyncio.create_task(srv.engine_loop())
    server = await asyncio.start_server(srv.handle_conn, "127.0.0.1", 0)
    port = server.sockets[0].getsockname()[1]
    print(f"server on :{port}, {n_streams} streams x {secs:.0f}s audio",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    n_samp = int(secs * 16000)
    t = np.arange(n_samp) / 16000.0

    def make_audio(i):
        sig = 0.4 * np.sin(2 * np.pi * (150 + 17 * i) * t) \
            + 0.1 * rng.standard_normal(n_samp)
        return (np.clip(sig, -1, 1) * 32767).astype(np.int16)

    # warm up ALL jit variants before timing: a full-batch pass compiles the
    # all-active fast path at every slack-buffer phase plus the gated variant,
    # prime and compaction (each remote compile costs seconds through the
    # tunnel; timing them would measure the compiler, not the server)
    warm = [
        asyncio.create_task(transcribe_file(
            make_audio(i)[: 4 * 16000], host="127.0.0.1", port=port,
            chunk_ms=chunk_ms))
        for i in range(n_streams)
    ]
    await asyncio.wait_for(asyncio.gather(*warm), timeout=1800)
    print("warmup done; timing...", file=sys.stderr)

    import copy

    stats0 = copy.deepcopy(srv.engine.stats())
    t0 = time.time()
    tasks = [
        asyncio.create_task(transcribe_file(
            make_audio(i), host="127.0.0.1", port=port, chunk_ms=chunk_ms))
        for i in range(n_streams)
    ]
    results = await asyncio.gather(*tasks)
    wall = time.time() - t0
    stats1 = srv.engine.stats()
    for rc, g1 in stats1["groups"].items():
        g0 = stats0["groups"].get(rc, {})
        delta = {k: round(g1[k] - g0.get(k, 0), 3)
                 for k in ("ticks", "steps", "chunks", "step_seconds",
                           "transfer_seconds")}
        n = max(1, delta["steps"])
        print(f"[timed pass rc={rc}] {delta}  per-step: "
              f"step={1e3 * delta['step_seconds'] / n:.1f}ms "
              f"transfer={1e3 * delta['transfer_seconds'] / n:.1f}ms "
              f"wall={1e3 * wall / n:.1f}ms", file=sys.stderr)

    total_audio = n_streams * secs
    print(
        f"\n{n_streams} streams x {secs:.0f}s = {total_audio:.0f} audio-sec "
        f"in {wall:.1f}s wall", file=sys.stderr)
    rt = total_audio / wall
    print(f"end-to-end throughput: {rt:.0f} real-time streams "
          f"({rt * 3600 / 3600:.1f} audio-sec/sec, "
          f"{total_audio / 3600 / wall * 3600:.1f} audio-hours/hour)",
          file=sys.stderr)
    n_text = sum(1 for r in results if r)
    print(f"streams with text: {n_text}/{n_streams}", file=sys.stderr)
    import json

    print(json.dumps({
        "metric": "e2e_serving_realtime_streams",
        "value": round(rt, 1),
        "unit": "streams/chip",
        "vs_baseline": round(rt / 15.6, 2),
    }))
    server.close()
    engine_task.cancel()
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--secs", type=float, default=20.0)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--chunk-ms", type=int, default=320)
    args = ap.parse_args()
    return asyncio.run(run(args.streams, args.secs, args.batch, args.chunk_ms))


if __name__ == "__main__":
    raise SystemExit(main())
