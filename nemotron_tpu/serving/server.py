"""Multi-session streaming ASR server (TCP / Unix socket).

Protocol-compatible with the reference server (src/nemo-server.cpp) but with a
fundamentally different compute model: instead of one worker thread stepping
sessions one-by-one, all sessions are slots in the BatchedEngine and advance
together in one jitted TPU call per tick.

Concurrency model:
  - asyncio readers: byte-moving only (like the reference's reader threads)
  - a dedicated ENGINE THREAD owns all model state and ticks continuously
    while work exists — its cadence is independent of event-loop scheduling
    (hundreds of connections' callbacks would otherwise sit between ticks);
    event batches are posted back to the loop for delivery
  - global queued-PCM budget for admission control (64 MB default) with PUSH
    payloads split into <= 8000-sample segments for fairness
"""

from __future__ import annotations

import asyncio
import json
import os
import sys
import threading

import numpy as np

from ..streaming.engine import DEVICE_LOCK, BatchedEngine
from . import protocol as P


class StreamServer:
    def __init__(self, model, batch_per_group: int = 32,
                 mem_budget: int = P.DEFAULT_MEM_BUDGET,
                 diarize_params=None):
        self.engine = BatchedEngine(model, batch_per_group)
        self.mem_budget = mem_budget
        self.mem_used = 0
        self.mem_free = asyncio.Condition()
        self.writers: dict[int, asyncio.StreamWriter] = {}  # stream_id -> conn
        self.conn_streams: dict[asyncio.StreamWriter, set[int]] = {}
        # threading.Event: the engine runs on its OWN thread (see engine_loop)
        # so its tick cadence is decoupled from event-loop scheduling churn;
        # protocol handlers set this to wake it, from the loop thread.
        self.wake = threading.Event()
        self._engine_task: asyncio.Task | None = None
        self._stop = False
        self._queued_samples: dict[int, int] = {}
        # Optional per-stream diarization ({"diarize": true} on START).
        # Pipelines run ON THE ENGINE THREAD (the process's single device
        # thread — axon deadlocks under concurrent device calls); protocol
        # handlers only append PCM to the per-stream deque (GIL-atomic).
        self.diarize_params = diarize_params
        self._diar: dict[int, dict] = {}  # sid -> {pipeline, audio: deque}
        # NME-SC finalize runs OFF the tick critical path: a worker thread
        # clusters (host numpy + CPU-pinned eigvalsh — no device lock) while
        # engine ticks continue; the stream's 'ended' event is held and
        # delivered together with its result frame (_diarize_poll). The
        # reference clusters at CLI exit where a 1+ s stall is invisible
        # (diarize_cluster.cpp:322-406); inside a multi-stream server it
        # would freeze every stream's 80 ms tick cadence.
        self._diar_exec = None  # lazy ThreadPoolExecutor
        self._diar_pending: list = []  # (sid, Future, held ended events)
        # Hot model swap (see hot_swap): while a swap is in flight the event
        # loop parks stream-mutating opcodes on this gate so no PUSH can
        # land between a slot's export from the old engine and the moment
        # self.engine points at the new one.
        self._swap_gate: asyncio.Event | None = None
        self._pending_swap: tuple | None = None  # (new_model, Future)
        # Samples staged in _diar[sid]["audio"] awaiting the engine thread.
        # This duplicate of the engine-queued PCM is billed against the
        # admission budget too (2 bytes/sample), or a fast-pushing diarize
        # client could hold ~2x its admitted share with no backpressure.
        # Loop thread increments (OP_PUSH), decrements on the drained counts
        # _diarize_step reports back.
        self._diar_staged: dict[int, int] = {}

    # ------------------------------------------------------------------
    async def _send(self, writer: asyncio.StreamWriter, frame: bytes) -> None:
        try:
            writer.write(frame)
            await writer.drain()
        except (ConnectionError, RuntimeError):
            pass  # sends to closed connections are silently dropped

    async def handle_conn(self, reader: asyncio.StreamReader,
                          writer: asyncio.StreamWriter) -> None:
        self.conn_streams[writer] = set()
        try:
            while True:
                hdr = await reader.readexactly(P.HEADER_SIZE)
                opcode, stream_id, length = P.HEADER.unpack(hdr)
                payload = await reader.readexactly(length) if length else b""
                await self._dispatch(writer, opcode, stream_id, payload)
        except (asyncio.IncompleteReadError, ConnectionError):
            pass
        finally:
            # disconnect reclaims this connection's sessions (and their
            # reserved admission budget)
            freed = 0
            for sid in list(self.conn_streams.get(writer, ())):
                self.engine.drop_stream(sid)
                self.writers.pop(sid, None)
                self._diar.pop(sid, None)
                freed += 2 * self._queued_samples.pop(sid, 0)
                freed += 2 * self._diar_staged.pop(sid, 0)
            self.conn_streams.pop(writer, None)
            if freed:
                async with self.mem_free:
                    self.mem_used = max(0, self.mem_used - freed)
                    self.mem_free.notify_all()
            writer.close()

    async def _dispatch(self, writer, opcode: int, stream_id: int,
                        payload: bytes) -> None:
        if self._swap_gate is not None and opcode in (
                P.OP_STREAM_START, P.OP_PUSH, P.OP_STREAM_END, P.OP_SET_LANG):
            # hot swap in flight: park stream mutations until the new engine
            # owns every migrated slot (clients just see delayed ACKs)
            await self._swap_gate.wait()
        if opcode == P.OP_STREAM_START:
            cfg = {}
            if payload:
                try:
                    cfg = json.loads(payload.decode("utf-8"))
                except (ValueError, UnicodeDecodeError):
                    cfg = {}
            want_diar = bool(cfg.get("diarize"))
            if want_diar and self.diarize_params is None:
                await self._send(writer, P.pack(
                    P.OP_ERROR, 0,
                    "diarization not enabled (start the server with "
                    "--diarize <diarize.gguf>)"))
                return
            # client-controlled: restrict to the supported latency presets.
            # An arbitrary int would allocate a whole new batch-sized device
            # state + minutes of remote compiles per distinct value (and
            # right_context<=-1 gives shift 0: an engine busy-spin).
            try:
                rc = int(cfg.get("right_context", 0))
            except (TypeError, ValueError):
                rc = -1
            if rc not in (0, 1, 6, 13):
                await self._send(writer, P.pack(
                    P.OP_ERROR, 0,
                    f"right_context must be one of 0, 1, 6, 13 (got "
                    f"{cfg.get('right_context')!r})"))
                return
            try:
                sid = self.engine.start_stream(
                    right_context=rc,
                    lang=cfg.get("lang"),
                )
            except RuntimeError as e:
                await self._send(writer, P.pack(P.OP_ERROR, 0, str(e)))
                return
            if want_diar:
                from collections import deque

                from ..diarize.pipeline import DiarizePipeline

                self._diar[sid] = {
                    "pipeline": DiarizePipeline(
                        self.diarize_params,
                        num_speakers=int(cfg.get("num_speakers", -1))),
                    "audio": deque(),
                }
                self._diar_staged[sid] = 0
            self.writers[sid] = writer
            self.conn_streams[writer].add(sid)
            self._queued_samples[sid] = 0
            await self._send(writer, P.pack_json(P.OP_STARTED, sid, {"id": sid}))

        elif opcode == P.OP_PUSH:
            if stream_id not in self.conn_streams.get(writer, ()):
                # stale-session DATA ignored (nemo-server.cpp:233) — and
                # stream ids are small sequential ints, so DATA for a stream
                # this connection does NOT own must never feed another
                # client's transcript
                return
            audio = np.frombuffer(payload, dtype="<i2")
            n = len(audio)
            # admission control: block while over the global budget. A
            # diarize stream stages a second copy of the PCM for its
            # pipeline, so it is billed double (released as _diarize_step
            # drains the stage into the pipeline).
            bill = 4 * n if stream_id in self._diar else 2 * n
            async with self.mem_free:
                while self.mem_used + bill > self.mem_budget:
                    await self.mem_free.wait()
                self.mem_used += bill
            # bill BEFORE handing to the engine: a tick running concurrently
            # in the executor may consume the samples immediately, and its
            # drain_consumed release is capped at the billed count
            self._queued_samples[stream_id] = (
                self._queued_samples.get(stream_id, 0) + n
            )
            for off in range(0, n, P.MAX_SEGMENT_SAMPLES):
                self.engine.push_audio(
                    stream_id, audio[off : off + P.MAX_SEGMENT_SAMPLES]
                )
            d = self._diar.get(stream_id)
            if d is not None:
                d["audio"].append(audio)
                self._diar_staged[stream_id] = (
                    self._diar_staged.get(stream_id, 0) + n)
            self.wake.set()
            await self._send(
                writer,
                P.pack_json(P.OP_ACK, stream_id,
                            {"queued_samples": self._queued_samples[stream_id]}),
            )

        elif opcode == P.OP_STREAM_END:
            if stream_id in self.conn_streams.get(writer, ()):
                self.engine.end_stream(stream_id)
                self.wake.set()

        elif opcode == P.OP_SET_LANG:
            if stream_id not in self.conn_streams.get(writer, ()):
                await self._send(
                    writer, P.pack(P.OP_ERROR, stream_id,
                                   f"unknown stream {stream_id}"))
                return
            lang = payload.decode("utf-8", errors="replace")
            try:
                idx = self.engine.set_language(stream_id, lang)
            except KeyError:
                # the engine thread pops a stream as its 'ended' event is
                # emitted; this connection's OP_ENDED may still be in flight
                await self._send(
                    writer, P.pack(P.OP_ERROR, stream_id,
                                   f"stream {stream_id} already ended"))
                return
            if idx is None:
                await self._send(
                    writer, P.pack(P.OP_ERROR, stream_id,
                                   f"unknown language '{lang}'"))
            else:
                await self._send(
                    writer,
                    P.pack_json(P.OP_LANG_SET, stream_id,
                                {"id": stream_id, "lang": lang, "index": idx}),
                )
        else:
            await self._send(
                writer, P.pack(P.OP_ERROR, stream_id, f"bad opcode {opcode}"))

    # ------------------------------------------------------------------
    def _diarize_step(
            self, events) -> tuple[list[tuple[int, str]], dict[int, int]]:
        """Advance diarization pipelines (ENGINE THREAD ONLY — device calls).

        Drains each diarize stream's staged PCM, feeds this tick's text
        events as words, and returns ((stream_id, json_line) frames,
        per-stream drained sample counts for budget release): word JSONL
        incrementally, a {"type":"result",...} object on end (emitted
        BEFORE the stream's OP_ENDED by engine_loop's ordering)."""
        frames: list[tuple[int, str]] = []
        drained: dict[int, int] = {}
        for sid, d in list(self._diar.items()):
            p = d["pipeline"]
            q = d["audio"]
            while q:
                a = q.popleft()
                drained[sid] = drained.get(sid, 0) + len(a)
                with DEVICE_LOCK:
                    # VAD/TitaNet dispatch+fetch: the event-loop thread can
                    # concurrently create a new EngineGroup (a device call
                    # under DEVICE_LOCK) — unlocked concurrent axon calls
                    # hang both threads forever (CLAUDE.md)
                    p.push_audio(a.astype(np.float32) / 32768.0)
            for ev in events:
                if ev.stream_id == sid and ev.text:
                    # stamp words at the DECODE position the engine reports,
                    # not the staged-audio position: a non-realtime client
                    # pushes its whole file ahead of decode, and
                    # total_samples would pin every word to the file end
                    # (wrong speaker attribution). Same clock the CLI uses
                    # (sess.total_audio_seconds).
                    at = ev.at_sec if ev.at_sec >= 0.0 \
                        else p.total_samples / 16000.0
                    p.push_text(ev.text, at, conf=getattr(ev, "conf", -1.0))
            for line in p.drain_json():
                frames.append((sid, line))
            held = [ev for ev in events
                    if ev.stream_id == sid and ev.kind == "ended"]
            if held:
                with DEVICE_LOCK:  # tail TitaNet embeddings: device math
                    p.finalize_embeddings()
                for line in p.drain_json():  # flushes the last word
                    frames.append((sid, line))
                # clustering + timeline + RTTM on the worker thread; hold
                # the 'ended' event so the final result frame still
                # precedes OP_ENDED on the wire (_diarize_poll re-emits it)
                if self._diar_exec is None:
                    import concurrent.futures

                    self._diar_exec = concurrent.futures.ThreadPoolExecutor(
                        max_workers=1, thread_name_prefix="diar-cluster")
                fut = self._diar_exec.submit(p.finalize_cluster)
                events[:] = [ev for ev in events if ev not in held]
                self._diar_pending.append((sid, fut, held))
                # the event-loop disconnect handler pops concurrently — a
                # plain del here can KeyError, and an engine-thread exception
                # fail-stops the whole server
                self._diar.pop(sid, None)
        return frames, drained

    def _diarize_poll(self) -> tuple[list[tuple[int, str]], list]:
        """Collect finished off-thread clusterings (engine thread): returns
        (result frames, the held 'ended' events to deliver after them)."""
        frames: list[tuple[int, str]] = []
        events: list = []
        if not self._diar_pending:
            return frames, events
        still = []
        for sid, fut, held in self._diar_pending:
            if not fut.done():
                still.append((sid, fut, held))
                continue
            try:
                res = fut.result()
                frames.append((sid, json.dumps({
                    "type": "result",
                    "speaker_text": res.speaker_text,
                    "rttm": res.rttm,
                    "n_speakers": res.n_speakers,
                })))
            except Exception:  # noqa: BLE001 — one bad stream must not
                import traceback  # fail-stop the whole server

                traceback.print_exc()
                frames.append((sid, json.dumps({
                    "type": "result", "error": "diarization finalize failed",
                    "speaker_text": "", "rttm": "", "n_speakers": 0,
                })))
            events.extend(held)
        self._diar_pending = still
        return frames, events

    # ------------------------------------------------------------------
    async def hot_swap(self, new_model) -> int:
        """Replace the serving model under live streams (beyond reference —
        the reference cannot even serialize a live stream, SURVEY §5.4).

        Every in-flight stream is exported from the current engine and
        imported into a fresh BatchedEngine built on `new_model`, KEEPING its
        stream id; transcripts continue seamlessly (bit-identical when the
        weights are identical; under genuinely new weights the carried K/V
        caches were computed by the old model — a deliberate operator
        trade). Stream-mutating opcodes are parked on a gate for the swap's
        duration, so no audio is lost. Returns the number of migrated
        streams. Compiles on the new engine happen lazily on its first ticks
        (prewarm the .jax_cache beforehand for a stall-free swap)."""
        if self.engine.source is not None:
            raise NotImplementedError(
                "hot swap is not supported on native-ingest engines")
        if self._swap_gate is not None:
            raise RuntimeError("a hot swap is already in progress")
        import concurrent.futures

        self._swap_gate = asyncio.Event()
        fut: concurrent.futures.Future = concurrent.futures.Future()
        self._pending_swap = (new_model, fut)
        self.wake.set()
        try:
            return await asyncio.wrap_future(fut)
        finally:
            gate, self._swap_gate = self._swap_gate, None
            gate.set()  # release parked dispatches

    def _maybe_swap(self, loop, out_q) -> None:
        """Engine thread: perform a queued hot swap between ticks."""
        swap = self._pending_swap
        if swap is None:
            return
        self._pending_swap = None
        new_model, fut = swap
        try:
            fut.set_result(self._do_swap(new_model, loop, out_q))
        except BaseException as e:  # surfaced to the hot_swap caller
            fut.set_exception(e)

    def _do_swap(self, new_model, loop, out_q) -> int:
        """Export every live stream from the current engine, import into a
        fresh engine on new_model (same ids), swap the engine attribute.
        Runs on the engine thread — the process's single device thread."""
        from ..streaming.engine import BatchedEngine

        old = self.engine
        new = BatchedEngine(new_model, old.batch)

        def post(events):
            if not events:
                return
            diar = self._diarize_step(events) if self._diar else ([], {})
            try:
                loop.call_soon_threadsafe(
                    out_q.put_nowait,
                    (events, old.drain_consumed(), diar[0], diar[1]))
            except RuntimeError:
                pass  # loop closed: shutting down

        snaps: dict[int, dict] = {}
        # streams mid-finalize cannot export — tick the old engine until
        # they end; everything else exports (the export tick drains each
        # stream's in-flight readbacks into deliverable text events)
        for _ in range(200):
            sids = [sid for sid in list(old._route) if sid not in snaps]
            futs = {}
            for sid in sids:
                try:
                    futs[sid] = old.request_export(sid)
                except KeyError:
                    continue  # ended concurrently
            events, more = old.tick()
            post(events)
            for sid, f in futs.items():
                if f.done() and f.exception() is None:
                    snaps[sid] = f.result()
            if not old._route and not more:
                break
        else:
            raise RuntimeError("hot swap: old engine did not drain")

        im_futs = {sid: new.request_import(snap, stream_id=sid,
                                           trust_model=True)
                   for sid, snap in snaps.items()}
        for _ in range(200):
            if all(f.done() for f in im_futs.values()):
                break
            events, _more = new.tick()
            post(events)
        for sid, f in im_futs.items():
            got = f.result()  # raises on a failed install
            assert got == sid, f"import renumbered stream {sid} -> {got}"
        self.engine = new
        consumed = old.drain_consumed()  # last budget releases from A
        if consumed:
            try:
                loop.call_soon_threadsafe(out_q.put_nowait,
                                          ([], consumed, [], {}))
            except RuntimeError:
                pass
        return len(snaps)

    def _engine_thread(self, loop: asyncio.AbstractEventLoop,
                       out_q: asyncio.Queue) -> None:
        """Tick loop on a dedicated thread: runs back-to-back ticks while work
        exists, independent of event-loop latency (wakeups come from the
        protocol handlers via self.wake plus a 50 ms poll for readback
        tails). Events + consumed-sample batches are posted to the loop for
        delivery."""
        try:
            while not self._stop:
                self.wake.wait(timeout=0.05)
                self.wake.clear()
                more = True
                while more and not self._stop:
                    self._maybe_swap(loop, out_q)
                    events, more = self.engine.tick()
                    consumed = self.engine.drain_consumed()
                    diar_frames, diar_drained = (
                        self._diarize_step(events) if self._diar
                        else ([], {}))
                    done_frames, done_events = self._diarize_poll()
                    diar_frames.extend(done_frames)
                    events.extend(done_events)
                    if events or consumed or diar_frames or diar_drained:
                        try:
                            loop.call_soon_threadsafe(
                                out_q.put_nowait,
                                (events, consumed, diar_frames,
                                 diar_drained))
                        except RuntimeError:  # loop closed: shutting down
                            self._stop = True
                            return
        except BaseException:  # a dead engine thread must never be silent
            import traceback

            traceback.print_exc()
            self._stop = True
            # fail-stop: without this sentinel the loop would keep accepting
            # connections and buffering PCM forever with no transcription
            try:
                loop.call_soon_threadsafe(out_q.put_nowait, None)
            except RuntimeError:
                pass
            raise

    async def engine_loop(self) -> None:
        loop = asyncio.get_running_loop()
        out_q: asyncio.Queue = asyncio.Queue()
        thread = threading.Thread(
            target=self._engine_thread, args=(loop, out_q),
            daemon=True, name="engine-tick")
        thread.start()
        last_stats = 0.0
        try:
            while True:
                item = await out_q.get()
                if item is None:  # engine thread died — shut the server down
                    raise RuntimeError(
                        "engine thread died; shutting the server down")
                events, consumed, diar_frames, diar_drained = item
                # release budget as the engine consumes queued PCM (reference
                # semantics: nemo-server.cpp:116-126 releases per DATA event,
                # not on stream end — long-lived streams must not accumulate)
                freed = 0
                for sid, n in consumed.items():
                    have = self._queued_samples.get(sid, 0)
                    take = min(have, n)
                    self._queued_samples[sid] = have - take
                    freed += 2 * take
                # ... and as _diarize_step drains the diarize staging copy
                for sid, n in diar_drained.items():
                    have = self._diar_staged.get(sid, 0)
                    take = min(have, n)
                    self._diar_staged[sid] = have - take
                    freed += 2 * take
                # batched delivery: buffer every frame first, then one drain
                # per touched writer (per-event awaits serialized the loop)
                touched: set[asyncio.StreamWriter] = set()
                # diarize frames first so a stream's final result precedes
                # its OP_ENDED on the wire
                for sid, line in diar_frames:
                    w = self.writers.get(sid)
                    if w is not None:
                        try:
                            w.write(P.pack(P.OP_DIARIZE, sid, line))
                            touched.add(w)
                        except (ConnectionError, RuntimeError):
                            pass
                for ev in events:
                    w = self.writers.get(ev.stream_id)
                    if ev.kind == "text":
                        if w is not None and ev.text:
                            try:
                                w.write(P.pack(P.OP_TEXT, ev.stream_id, ev.text))
                                touched.add(w)
                            except (ConnectionError, RuntimeError):
                                pass
                    elif ev.kind == "ended":
                        if w is not None:
                            try:
                                w.write(P.pack(P.OP_ENDED, ev.stream_id, ev.text))
                                touched.add(w)
                            except (ConnectionError, RuntimeError):
                                pass
                            self.conn_streams.get(w, set()).discard(ev.stream_id)
                        self.writers.pop(ev.stream_id, None)
                        freed += 2 * self._queued_samples.pop(ev.stream_id, 0)
                        freed += 2 * self._diar_staged.pop(ev.stream_id, 0)
                for w in touched:
                    try:
                        await w.drain()
                    except (ConnectionError, RuntimeError):
                        pass
                if freed:
                    async with self.mem_free:
                        self.mem_used = max(0, self.mem_used - freed)
                        self.mem_free.notify_all()
                import time as _t

                if _t.monotonic() - last_stats > 30.0:
                    last_stats = _t.monotonic()
                    print(f"[stats] {json.dumps(self.engine.stats())} "
                          f"mem={self.mem_used >> 20}MB", file=sys.stderr)
        finally:
            self._stop = True
            self.wake.set()

    async def serve(self, host: str | None = None, port: int | None = None,
                    unix_path: str | None = None) -> None:
        self._engine_task = asyncio.create_task(self.engine_loop())
        if unix_path:
            server = await asyncio.start_unix_server(self.handle_conn,
                                                     path=unix_path)
            where = unix_path
        else:
            server = await asyncio.start_server(self.handle_conn,
                                                host or "127.0.0.1",
                                                port or 8090)
            where = f"{host or '127.0.0.1'}:{port or 8090}"
        print(f"listening on {where}", file=sys.stderr)
        async with server:
            # fail-stop: a dead engine must take the listener down with it
            # (otherwise clients keep connecting and queueing PCM against a
            # server that will never transcribe)
            serve_task = asyncio.create_task(server.serve_forever())
            done, _ = await asyncio.wait(
                {serve_task, self._engine_task},
                return_when=asyncio.FIRST_COMPLETED)
            if self._engine_task in done:
                serve_task.cancel()
                self._engine_task.result()  # re-raise the engine failure


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description="nemotron_tpu streaming server")
    ap.add_argument("model", help="model.gguf path, or 'random' for a random "
                                  "full-size model (benchmarks)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8090)
    ap.add_argument("--unix", default=None, help="unix socket path")
    ap.add_argument("--batch", type=int, default=32,
                    help="stream slots per latency group")
    ap.add_argument("--bf16", action="store_true",
                    help="load weights as bfloat16 (half memory, TPU-native)")
    ap.add_argument("--quantized", action="store_true",
                    help="keep Q8_0 weights quantized in HBM (quarter memory)")
    ap.add_argument("--kv-int8", action="store_true",
                    help="int8-quantized attention K/V caches (halves the "
                         "per-stream cache memory and its HBM read traffic; "
                         "~0.4%% relative error on attention history reads — "
                         "see ops/kvquant.py)")
    ap.add_argument("--native", action="store_true",
                    help="GIL-free C++ ingest path (serving/native_server.py);"
                         " same wire protocol, ~none of the Python socket"
                         " overhead")
    ap.add_argument("--mem-budget", type=int, default=P.DEFAULT_MEM_BUDGET,
                    help="global queued-PCM admission budget in bytes")
    ap.add_argument("--dp", type=int, default=1,
                    help="shard the stream batch over this many chips (one "
                         "engine ticks dp x tp devices over ICI; --batch must "
                         "divide --dp)")
    ap.add_argument("--tp", type=int, default=1,
                    help="additionally megatron-shard the big matmuls over "
                         "this many chips per dp shard")
    ap.add_argument("--blank-bias", type=float, default=0.0,
                    help="benchmark plumbing: add this to the joint blank "
                         "logit bias (random-weight models emit ~nothing "
                         "without it; see bench.py)")
    ap.add_argument("--diarize", default=None, metavar="DIARIZE_GGUF",
                    help="enable per-stream diarization: streams that START "
                         "with {\"diarize\": true} get OP_DIARIZE word JSONL "
                         "frames + a final result frame (the reference only "
                         "exposes diarization via CLI). Not supported with "
                         "--native yet.")
    ap.add_argument("--prewarm", action="store_true",
                    help="compile every tick variant before accepting "
                         "connections (the reference pre-builds all graphs "
                         "at startup; avoids first-occurrence compile stalls "
                         "mid-serving — can take minutes per latency mode "
                         "through a remote compiler on first boot, cached "
                         "after)")
    args = ap.parse_args(argv)

    if args.kv_int8:
        # must be set before any engine state is allocated (read at
        # init_stream_state time, ops/kvquant.kv_int8_enabled)
        os.environ["NEMOTRON_TPU_KV_INT8"] = "1"

    from ..api import ASRModel
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.model == "random":
        model = ASRModel.random(dtype=dtype)
    else:
        model = ASRModel.from_gguf(args.model, dtype=dtype,
                                   keep_quantized=args.quantized)
    if args.blank_bias:
        import dataclasses as dc

        out_b = model.params.joint.out_b.at[model.hp.blank_id].add(
            args.blank_bias)
        model.params = dc.replace(
            model.params, joint=dc.replace(model.params.joint, out_b=out_b))

    if args.dp * args.tp > 1:
        from ..parallel.mesh import make_mesh

        model.shard(make_mesh(args.dp, args.tp))
        print(f"mesh serving: dp={args.dp} x tp={args.tp}", file=sys.stderr)

    diarize_params = None
    if args.diarize:
        from ..diarize.params import load_diarize_model

        diarize_params = load_diarize_model(args.diarize)
        print(f"diarization enabled ({args.diarize})", file=sys.stderr)

    if args.native:
        if diarize_params is not None:
            ap.error("--diarize is not supported with --native yet "
                     "(the native ingest path has no per-stream event hook)")
        from .native_server import NativeStreamServer

        srv = NativeStreamServer(model, batch_per_group=args.batch,
                                 mem_budget=args.mem_budget)
        port = srv.start(args.host, args.port, args.unix)
        if args.prewarm:  # early connects just queue until serve_forever
            print("prewarming tick variants...", file=sys.stderr)
            srv.engine.prewarm()
        print(f"listening on {args.unix or f'{args.host}:{port}'} (native)",
              file=sys.stderr)
        srv.serve_forever()
        return 0

    srv = StreamServer(model, batch_per_group=args.batch,
                       mem_budget=args.mem_budget,
                       diarize_params=diarize_params)
    if args.prewarm:
        print("prewarming tick variants...", file=sys.stderr)
        srv.engine.prewarm()
    asyncio.run(srv.serve(args.host, args.port, args.unix))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
