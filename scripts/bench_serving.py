#!/usr/bin/env python3
"""End-to-end serving benchmark: real server, real sockets, N concurrent
clients streaming synthetic audio, full-size model.

Unlike bench.py (pure compute hot path), this measures the whole system:
protocol parsing, admission control, per-slot frontends, the batched engine
tick, and text delivery.

Clients run in SEPARATE worker processes (--procs): hundreds of in-process
asyncio clients contend with the engine thread for the GIL and cap the
measurement at the client side, not the server. Workers speak the wire
protocol inline (stdlib + numpy only — no jax / package import, so they never
touch the TPU plugin).

Usage:
    python scripts/bench_serving.py [--streams 256] [--secs 20] [--batch 256]
                                    [--procs 8] [--chunk-ms 320]
"""

from __future__ import annotations

import argparse
import asyncio
import json
import socket
import struct
import sys
import time
from pathlib import Path

import numpy as np

HEADER = struct.Struct("<BII")
OP_STREAM_START, OP_PUSH, OP_STREAM_END = 0x01, 0x02, 0x03
OP_STARTED, OP_TEXT, OP_ENDED, OP_ERROR = 0x81, 0x83, 0x84, 0x8F


def make_audio(i: int, n_samp: int) -> np.ndarray:
    rng = np.random.default_rng(i)
    t = np.arange(n_samp) / 16000.0
    sig = 0.4 * np.sin(2 * np.pi * (150 + 17 * i) * t) \
        + 0.1 * rng.standard_normal(n_samp)
    return (np.clip(sig, -1, 1) * 32767).astype(np.int16)


# ---------------------------------------------------------------- worker mode
def worker_sync_main(args) -> int:
    """Lean client worker: one selectors loop drives all this worker's
    streams over non-blocking sockets with PREBUILT per-client send buffers
    (all PUSH frames + END concatenated once). On a 1-core host the asyncio
    variant's per-chunk task switching dominated the measurement; here the
    per-byte client cost is ~memcpy + frame scanning, so the benchmark
    measures the server, not the harness.

    Protocol with the parent: the worker synthesizes all audio, connects and
    ADMITS every stream (STREAM_START -> STARTED, send buffers built), then
    prints READY and blocks on stdin for GO. Audio only flows after GO, so
    the parent's measured window contains serving work — not interpreter
    boot, audio synthesis, or admission (a one-time cost real deployments
    amortize over arbitrarily long streams)."""
    import selectors

    host, _, port = args.worker.partition(":")
    port = int(port)
    n_samp = int(args.secs * 16000)
    step = 16 * args.chunk_ms * 2  # bytes per PUSH payload

    class C:
        __slots__ = ("sock", "sid", "sendbuf", "sent", "rbuf", "texts",
                     "t0", "t_started", "t_pushed", "t_ended", "audio",
                     "frames", "next_push", "t_last_push", "end_sent")

    # phase 1: synthesize every stream's audio (outside the timed window)
    audios = [make_audio(args.seed_base + i, n_samp).tobytes()
              for i in range(args.streams)]

    # phase 2: connect + admit every stream; build send buffers on STARTED
    t_admit0 = time.time()
    sel = selectors.DefaultSelector()
    clients: list[C] = []
    for i in range(args.streams):
        c = C()
        c.audio = audios[i]
        c.sid = -1
        c.sent = 0
        c.sendbuf = b""
        c.rbuf = bytearray()
        c.texts = []
        c.t0 = time.time()
        c.t_started = c.t_pushed = c.t_ended = 0.0
        c.frames = None
        c.next_push = 0
        c.t_last_push = 0.0
        c.end_sent = False
        c.sock = socket.create_connection((host, port))
        c.sock.setblocking(False)
        c.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        start_pl = b'{"right_context":0}'
        c.sock.sendall(HEADER.pack(OP_STREAM_START, 0, len(start_pl))
                       + start_pl)
        sel.register(c.sock, selectors.EVENT_READ, c)
        clients.append(c)

    def build_sendbuf(c: C) -> bytes:
        parts = []
        for off in range(0, len(c.audio), step):
            pl = c.audio[off : off + step]
            parts.append(HEADER.pack(OP_PUSH, c.sid, len(pl)))
            parts.append(pl)
        parts.append(HEADER.pack(OP_STREAM_END, c.sid, 0))
        if args.realtime:  # paced mode sends frame-by-frame on a schedule
            c.frames = [parts[i] + parts[i + 1]
                        for i in range(0, len(parts) - 1, 2)] + [parts[-1]]
        return b"".join(parts)

    lats: list[float] = []  # realtime mode: per-TEXT latency seconds

    def on_frames(c: C) -> None:
        buf = c.rbuf
        pos = 0
        while len(buf) - pos >= HEADER.size:
            op, sid, ln = HEADER.unpack_from(buf, pos)
            if len(buf) - pos - HEADER.size < ln:
                break
            payload = bytes(buf[pos + HEADER.size : pos + HEADER.size + ln])
            pos += HEADER.size + ln
            if op == OP_STARTED:
                c.sid = int(json.loads(payload)["id"])
                c.t_started = time.time()
                c.sendbuf = memoryview(build_sendbuf(c))
            elif op == OP_TEXT and sid == c.sid:
                c.texts.append(payload)
                if args.realtime and c.t_last_push:
                    # per-chunk text latency: receipt minus the most recent
                    # completed push for this stream. Exact while the server
                    # keeps up (text for chunk j lands before push j+1);
                    # under backlog it UNDER-states — the sustained-stream
                    # count alongside it says whether the pace held.
                    lats.append(time.time() - c.t_last_push)
            elif op == OP_ENDED and sid == c.sid:
                if payload:
                    c.texts.append(payload)
                c.t_ended = time.time()
                sel.unregister(c.sock)
                c.sock.close()
            elif op == OP_ERROR:
                raise RuntimeError(payload.decode())
        del buf[:pos]

    n_started = 0
    while n_started < len(clients):
        for key, ev in sel.select(timeout=60):
            c: C = key.data
            if ev & selectors.EVENT_READ:
                try:
                    data = c.sock.recv(1 << 18)
                except (BlockingIOError, InterruptedError):
                    data = None
                if data:
                    had_sid = c.sid >= 0
                    c.rbuf += data
                    on_frames(c)
                    if not had_sid and c.sid >= 0:
                        n_started += 1
                elif data == b"":  # peer closed: fail loudly, don't spin
                    raise RuntimeError(
                        "server closed the connection before STARTED")

    # phase 3: barrier — tell the parent we're staged, wait for GO
    print(json.dumps({"ready": 1, "admit_seconds":
                      round(time.time() - t_admit0, 3)}), flush=True)
    if sys.stdin.readline().strip() != "GO":
        raise RuntimeError("parent closed stdin before GO")

    # phase 4 (realtime mode): paced pushes — every client sends chunk j at
    # start + j*chunk_s, mimicking live microphones; per-TEXT latency is
    # recorded in on_frames. The firehose mode below measures throughput;
    # this mode measures the BASELINE "p50 per-chunk latency" under a load
    # the server is expected to sustain.
    if args.realtime:
        chunk_s = args.chunk_ms / 1000.0
        start = time.time()

        def send_frame(c: C, frame) -> None:
            mv, sent = memoryview(frame), 0
            while sent < len(mv):
                try:
                    sent += c.sock.send(mv[sent:])
                except (BlockingIOError, InterruptedError):
                    time.sleep(0.001)  # tiny frames; kernel buffer recovers

        n_done = 0
        while n_done < len(clients):
            now = time.time()
            next_due = start + 86400.0
            for c in clients:
                if c.t_ended:
                    continue
                due = start + c.next_push * chunk_s
                while c.next_push < len(c.frames) - 1 and due <= now:
                    send_frame(c, c.frames[c.next_push])
                    c.next_push += 1
                    c.t_last_push = time.time()
                    due = start + c.next_push * chunk_s
                if c.next_push >= len(c.frames) - 1:
                    if not c.end_sent:
                        send_frame(c, c.frames[-1])
                        c.end_sent = True
                        c.t_pushed = time.time()
                else:
                    next_due = min(next_due, due)
            timeout = max(0.0, min(next_due - time.time(), 0.02))
            for key, ev in sel.select(timeout=timeout):
                c = key.data
                try:
                    data = c.sock.recv(1 << 18)
                except (BlockingIOError, InterruptedError):
                    data = None
                if data:
                    c.rbuf += data
                    was_open = c.t_ended == 0.0
                    on_frames(c)
                    if was_open and c.t_ended:
                        n_done += 1
                elif data == b"":
                    raise RuntimeError(
                        "server closed the connection before ENDED")
        end = time.time()
        if len(lats) > 20000:  # bound the result JSON; uniform subsample
            lats = lats[:: len(lats) // 20000 + 1]
        print(json.dumps({
            "start": start, "end": end,
            "audio": args.streams * args.secs,
            "ok": sum(1 for c in clients if c.texts),
            "t_conn0": min(c.t0 for c in clients),
            "t_started_max": max(c.t_started for c in clients),
            "t_pushed_max": max(c.t_pushed for c in clients),
            "t_ended_max": max(c.t_ended for c in clients),
            "lat_ms": [round(x * 1e3, 1) for x in lats],
        }), flush=True)
        return 0

    # phase 4: the timed window — push everything, collect text, drain ENDs
    start = time.time()
    for c in clients:
        sel.modify(c.sock, selectors.EVENT_READ | selectors.EVENT_WRITE, c)
    n_done = 0
    while n_done < len(clients):
        for key, ev in sel.select(timeout=30):
            c: C = key.data
            if ev & selectors.EVENT_WRITE and c.sent < len(c.sendbuf):
                try:
                    n = c.sock.send(c.sendbuf[c.sent :])
                except (BlockingIOError, InterruptedError):
                    n = 0
                c.sent += n
                if c.sent >= len(c.sendbuf):
                    c.t_pushed = time.time()
                    sel.modify(c.sock, selectors.EVENT_READ, c)
            if ev & selectors.EVENT_READ:
                try:
                    data = c.sock.recv(1 << 18)
                except (BlockingIOError, InterruptedError):
                    data = None
                if data:
                    c.rbuf += data
                    was_open = c.t_ended == 0.0
                    on_frames(c)
                    if was_open and c.t_ended:
                        n_done += 1
                elif data == b"":  # peer closed mid-stream: fail loudly
                    raise RuntimeError(
                        "server closed the connection before ENDED")
    end = time.time()
    print(json.dumps({
        "start": start, "end": end,
        "audio": args.streams * args.secs,
        "ok": sum(1 for c in clients if c.texts),
        "t_conn0": min(c.t0 for c in clients),
        "t_started_max": max(c.t_started for c in clients),
        "t_pushed_max": max(c.t_pushed for c in clients),
        "t_ended_max": max(c.t_ended for c in clients),
    }), flush=True)
    return 0


# ---------------------------------------------------------------- parent mode
async def _run_pass(procs: int, streams: int, secs: float, chunk_ms: int,
                    port: int, seed_base: int, label: str,
                    realtime: bool = False):
    import os

    # workers never touch JAX — strip PYTHONPATH so the TPU plugin's
    # sitecustomize doesn't load in each (1.9 s of interpreter boot per
    # worker, serialized on this 1-core host)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    per = [streams // procs + (1 if i < streams % procs else 0)
           for i in range(procs)]
    subs = []
    base = seed_base
    for k in per:
        if k == 0:
            continue
        argv = [sys.executable, __file__, "--worker", f"127.0.0.1:{port}",
                "--streams", str(k), "--secs", str(secs),
                "--chunk-ms", str(chunk_ms), "--seed-base", str(base)]
        if realtime:
            argv.append("--realtime")
        subs.append(await asyncio.create_subprocess_exec(
            *argv, stdin=asyncio.subprocess.PIPE,
            stdout=asyncio.subprocess.PIPE, env=env))
        base += k
    t_spawned = time.time()

    # barrier: wait until every worker has synthesized its audio and admitted
    # all of its streams (STARTED received, send buffers staged), then GO
    readies = await asyncio.gather(*(p.stdout.readline() for p in subs))
    admit = max(json.loads(r)["admit_seconds"] for r in readies)
    t_go = time.time()
    for p in subs:
        p.stdin.write(b"GO\n")
        await p.stdin.drain()
        p.stdin.close()
    outs = await asyncio.gather(*(p.communicate() for p in subs))
    t_gathered = time.time()
    stats = [json.loads(o[0].decode().strip().splitlines()[-1]) for o in outs]
    wall = max(s["t_ended_max"] for s in stats) - t_go
    audio = sum(s["audio"] for s in stats)
    ok = sum(s["ok"] for s in stats)
    print(f"[{label} phases] spawn->allREADY {t_go - t_spawned:.1f}s "
          f"(slowest admit {admit:.1f}s); after GO: all-pushed at "
          f"{max(s['t_pushed_max'] for s in stats) - t_go:.1f}s, "
          f"all-ENDED at {wall:.1f}s; "
          f"lastend->gathered {t_gathered - max(s['end'] for s in stats):.1f}s",
          file=sys.stderr)
    print(f"[{label}] {audio:.0f} audio-sec in {wall:.1f}s serving wall "
          f"({ok}/{streams} streams with text)", file=sys.stderr)
    lats: list[float] = []
    for s in stats:
        lats.extend(s.get("lat_ms", ()))
    if lats:
        import numpy as _np

        p50, p90, p99 = _np.percentile(_np.asarray(lats), (50, 90, 99))
        print(f"[{label}] per-chunk text latency (n={len(lats)}): "
              f"p50={p50:.0f} ms  p90={p90:.0f} ms  p99={p99:.0f} ms",
              file=sys.stderr)
    return audio, wall, ok, lats


async def run_native(n_streams: int, secs: float, batch: int, chunk_ms: int,
                     procs: int, mem_budget: int,
                     attach: str | None = None,
                     realtime: bool = False) -> int:
    """Native-ingest variant: the server runs as a SUBPROCESS with the C++
    epoll ingest (python -m nemotron_tpu.serving.server --native). The bench
    parent holds no JAX at all; clients are worker subprocesses as before.

    --attach HOST:PORT skips the server spawn and benches an already-running
    server — prewarm through the remote compiler costs minutes, so iterate
    on the harness against one long-lived server process."""
    import socket as _socket

    if attach:
        _, _, p = attach.rpartition(":")
        port = int(p)
        await _run_pass(procs, n_streams, 4.0, chunk_ms, port, 10_000,
                        "warmup", realtime=realtime)
        audio, wall, ok, lats = await _run_pass(
            procs, n_streams, secs, chunk_ms, port, 20_000, "timed",
            realtime=realtime)
        rt = audio / wall
        print(f"\nend-to-end throughput (native ingest, attached): {rt:.0f} "
              f"real-time streams ({ok}/{n_streams} streams with text)",
              file=sys.stderr)
        if lats:
            import numpy as _np

            p50, p90, p99 = _np.percentile(_np.asarray(lats), (50, 90, 99))
            print(json.dumps({
                "metric": "e2e_chunk_text_latency_ms",
                "value": round(float(p50), 1), "unit": "ms (p50)",
                "p90": round(float(p90), 1), "p99": round(float(p99), 1),
                "sustained_streams": n_streams, "ok": ok,
            }))
        else:
            print(json.dumps({
                "metric": "e2e_serving_realtime_streams",
                "value": round(rt, 1),
                "unit": "streams/chip",
                "vs_baseline": round(rt / 15.6, 2),
            }))
        return 0

    s = _socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    proc = await asyncio.create_subprocess_exec(
        sys.executable, "-m", "nemotron_tpu.serving.server", "random",
        "--native", "--bf16", "--port", str(port), "--batch", str(batch),
        "--mem-budget", str(mem_budget), "--blank-bias", "2.4", "--prewarm",
        cwd=str(Path(__file__).resolve().parent.parent),
        stderr=asyncio.subprocess.PIPE)
    try:
        while True:  # wait for the listener line (model load ~30 s; first-
            # boot prewarm can take many minutes through the remote compiler)
            line = await asyncio.wait_for(proc.stderr.readline(), timeout=3600)
            if not line:
                raise RuntimeError("server exited before listening")
            sys.stderr.buffer.write(line)
            sys.stderr.flush()
            if b"listening" in line:
                break

        async def pump():  # keep relaying server [stats] lines
            while True:
                line = await proc.stderr.readline()
                if not line:
                    return
                sys.stderr.buffer.write(line)
                sys.stderr.flush()

        pump_task = asyncio.create_task(pump())
        await _run_pass(procs, n_streams, 4.0, chunk_ms, port, 10_000,
                        "warmup", realtime=realtime)
        audio, wall, ok, _lats = await _run_pass(
            procs, n_streams, secs, chunk_ms, port, 20_000, "timed",
            realtime=realtime)
        pump_task.cancel()
        rt = audio / wall
        print(f"\nend-to-end throughput (native ingest): {rt:.0f} real-time "
              f"streams ({ok}/{n_streams} streams with text)",
              file=sys.stderr)
        print(json.dumps({
            "metric": "e2e_serving_realtime_streams",
            "value": round(rt, 1),
            "unit": "streams/chip",
            "vs_baseline": round(rt / 15.6, 2),
        }))
    finally:
        proc.terminate()
        try:
            await asyncio.wait_for(proc.wait(), timeout=10)
        except asyncio.TimeoutError:
            proc.kill()
    return 0


async def run(n_streams: int, secs: float, batch: int, chunk_ms: int,
              procs: int, mem_budget: int) -> int:
    import dataclasses as dc

    import jax.numpy as jnp

    from nemotron_tpu.api import ASRModel
    from nemotron_tpu.serving.server import StreamServer

    print("loading full-size random model (bf16)...", file=sys.stderr)
    model = ASRModel.random(dtype=jnp.bfloat16)
    # ~2.4 tokens/frame emissions — denser than real speech, so decode and
    # text-delivery costs are over- not under-stated (see bench.py)
    out_b = model.params.joint.out_b.at[model.hp.blank_id].add(2.4)
    model.params = dc.replace(
        model.params, joint=dc.replace(model.params.joint, out_b=out_b))

    # the bench's clients push whole files as fast as ACKed (real clients
    # pace at 1x real time and never approach the budget) — with the
    # reference's 64 MB default the budget-release round-trip, not the
    # engine, becomes the throttle. Size it for the offered load.
    srv = StreamServer(model, batch_per_group=batch, mem_budget=mem_budget)
    engine_task = asyncio.create_task(srv.engine_loop())
    server = await asyncio.start_server(srv.handle_conn, "127.0.0.1", 0)
    port = server.sockets[0].getsockname()[1]
    print(f"server on :{port}, {n_streams} streams x {secs:.0f}s audio, "
          f"{procs} client procs", file=sys.stderr)

    # warmup pass: compiles the all-active fast path at every slack-buffer
    # phase plus the gated variant, prime and compaction (remote compiles cost
    # minutes through the tunnel; timing them would measure the compiler)
    await _run_pass(procs, n_streams, 4.0, chunk_ms, port, 10_000, "warmup")


    import copy

    stats0 = copy.deepcopy(srv.engine.stats())
    audio, wall, ok, _lats = await _run_pass(
        procs, n_streams, secs, chunk_ms, port, 20_000, "timed")
    stats1 = srv.engine.stats()
    for rc, g1 in stats1["groups"].items():
        g0 = stats0["groups"].get(rc, {})
        delta = {k: round(g1[k] - g0.get(k, 0), 3)
                 for k in ("ticks", "steps", "chunks", "step_seconds",
                           "transfer_seconds", "upload_seconds",
                           "dispatch_seconds", "tick_seconds",
                           "pack_seconds", "scatter_seconds")}
        n = max(1, delta["steps"])
        print(f"[timed pass rc={rc}] {delta}  per-step: "
              f"step={1e3 * delta['step_seconds'] / n:.1f}ms "
              f"upload={1e3 * delta['upload_seconds'] / n:.1f}ms "
              f"dispatch={1e3 * delta['dispatch_seconds'] / n:.1f}ms "
              f"transfer={1e3 * delta['transfer_seconds'] / n:.1f}ms "
              f"tick={1e3 * delta['tick_seconds'] / max(1, delta['ticks']):.1f}ms "
              f"pack={1e3 * delta['pack_seconds'] / n:.1f}ms "
              f"scatter={1e3 * delta['scatter_seconds'] / n:.1f}ms "
              f"wall={1e3 * wall / n:.1f}ms", file=sys.stderr)

    rt = audio / wall
    print(f"\nend-to-end throughput: {rt:.0f} real-time streams "
          f"({ok}/{n_streams} streams with text)", file=sys.stderr)
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
    ap.add_argument("--streams", type=int, default=256)
    ap.add_argument("--secs", type=float, default=20.0)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--chunk-ms", type=int, default=320)
    ap.add_argument("--procs", type=int, default=8)
    ap.add_argument("--mem-budget", type=int, default=1 << 30,
                    help="admission budget bytes (bench default 1 GB; the "
                         "server's production default stays 64 MB)")
    ap.add_argument("--native", action="store_true",
                    help="run the server as a subprocess with the GIL-free "
                         "C++ ingest (serving/native_server.py)")
    ap.add_argument("--attach", default=None, metavar="HOST:PORT",
                    help="bench an already-running --native server instead "
                         "of spawning one (implies --native)")
    ap.add_argument("--worker", default=None,
                    help="internal: run as a client worker against HOST:PORT")
    ap.add_argument("--seed-base", type=int, default=0)
    ap.add_argument("--realtime", action="store_true",
                    help="pace every client at 1x real time (one chunk per "
                         "chunk-ms wall clock) and measure per-chunk text "
                         "latency percentiles — the BASELINE 'p50 per-chunk "
                         "latency' metric — instead of firehose throughput")
    args = ap.parse_args()
    if args.worker:
        return worker_sync_main(args)
    if args.native or args.attach:
        return asyncio.run(run_native(args.streams, args.secs, args.batch,
                                      args.chunk_ms, args.procs,
                                      args.mem_budget, args.attach,
                                      args.realtime))
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    return asyncio.run(run(args.streams, args.secs, args.batch, args.chunk_ms,
                           args.procs, args.mem_budget))


if __name__ == "__main__":
    raise SystemExit(main())
