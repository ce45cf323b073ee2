"""Streaming server with the native (GIL-free) ingest path.

Same wire protocol and observable behavior as serving/server.py (byte-
compatible with the reference src/nemo-server.cpp), different runtime shape:

  serving/server.py      asyncio readers + engine thread. The TPU client
                         holds the GIL for the whole device round-trip, so
                         protocol ingest freezes while the engine talks to
                         the device — measured ~95% tunnel I/O with ingest
                         lagging a full step.
  this module            ONE Python thread (control + engine tick); all
                         socket I/O, framing, PCM staging, ACKs and the
                         admission budget live in a C++ epoll thread
                         (native/ingest_server.cpp) that never takes the
                         GIL. Audio enters Python exactly once per tick, as
                         the already-packed [B, k*shift] int16 block.

Reference scale mechanism matched: one worker, FIFO, blocking-reader
backpressure (nemo-server.cpp:192-271, 116-126).
"""

from __future__ import annotations

import json
import sys
import time

from ..streaming.engine import BatchedEngine
from . import protocol as P
from .ingest import EV_DROP, EV_END, EV_SET_LANG, EV_START, NativeIngest


class NativeStreamServer:
    def __init__(self, model, batch_per_group: int = 32,
                 mem_budget: int = P.DEFAULT_MEM_BUDGET):
        self.model = model
        self.batch = batch_per_group
        self.mem_budget = mem_budget
        self.ingest: NativeIngest | None = None
        self.engine: BatchedEngine | None = None
        self.conn_of: dict[int, int] = {}  # stream_id -> conn id
        self._stop = False

    # ------------------------------------------------------------------
    def start(self, host: str | None = None, port: int | None = None,
              unix_path: str | None = None) -> int:
        """Bind + start the native IO thread. Returns the bound TCP port."""
        self.ingest = NativeIngest(host=host or "127.0.0.1",
                                   port=port or 0, unix_path=unix_path,
                                   budget_bytes=self.mem_budget)
        self.engine = BatchedEngine(self.model, self.batch,
                                    source=self.ingest)
        return self.ingest.port

    def stop(self) -> None:
        self._stop = True

    def _handle_control(self) -> None:
        for typ, conn, sid, payload in self.ingest.poll_control():
            if typ == EV_START:
                cfg = {}
                if payload:
                    try:
                        cfg = json.loads(payload.decode("utf-8"))
                    except (ValueError, UnicodeDecodeError):
                        cfg = {}
                try:
                    new_sid = self.engine.start_stream(
                        right_context=int(cfg.get("right_context", 0)),
                        lang=cfg.get("lang"),
                    )
                except RuntimeError as e:
                    self.ingest.send(conn, P.OP_ERROR, 0, str(e))
                    continue
                # register BEFORE the STARTED reply: the client may PUSH the
                # moment it learns the id
                self.ingest.register_stream(conn, new_sid)
                self.conn_of[new_sid] = conn
                self.ingest.send(conn, P.OP_STARTED, new_sid,
                                 json.dumps({"id": new_sid}))
            elif typ == EV_END:
                if sid in self.conn_of:
                    self.engine.end_stream(sid)
            elif typ == EV_SET_LANG:
                lang = payload.decode("utf-8", errors="replace")
                if sid not in self.conn_of:
                    continue
                idx = self.engine.set_language(sid, lang)
                if idx is None:
                    self.ingest.send(conn, P.OP_ERROR, sid,
                                     f"unknown language '{lang}'")
                else:
                    self.ingest.send(
                        conn, P.OP_LANG_SET, sid,
                        json.dumps({"id": sid, "lang": lang, "index": idx}))
            elif typ == EV_DROP:
                # connection died (or vanished mid-claim): reclaim the slot;
                # the native layer already freed the ring + budget
                if sid in self.conn_of:
                    self.engine.drop_stream(sid)
                    self.conn_of.pop(sid, None)

    def _deliver(self, events) -> None:
        for ev in events:
            conn = self.conn_of.get(ev.stream_id)
            if ev.kind == "text":
                if conn is not None and ev.text:
                    self.ingest.send(conn, P.OP_TEXT, ev.stream_id, ev.text)
            elif ev.kind == "ended":
                if conn is not None:
                    self.ingest.send(conn, P.OP_ENDED, ev.stream_id, ev.text)
                self.conn_of.pop(ev.stream_id, None)
                self.ingest.drop_stream(ev.stream_id)

    def serve_forever(self) -> None:
        """Control + tick loop on the calling thread (the process's only
        Python thread — holding the GIL during device I/O starves no one)."""
        assert self.ingest is not None, "call start() first"
        last_stats = time.monotonic()
        t_wait = t_ctl = t_tick = t_deliver = 0.0
        try:
            while not self._stop:
                t0 = time.perf_counter()
                self.ingest.wait(50)  # GIL-free sleep until work or timeout
                t1 = time.perf_counter()
                t_wait += t1 - t0
                self._handle_control()
                t_ctl += time.perf_counter() - t1
                more = True
                while more and not self._stop:
                    t2 = time.perf_counter()
                    events, more = self.engine.tick()
                    t3 = time.perf_counter()
                    t_tick += t3 - t2
                    self._deliver(events)
                    t4 = time.perf_counter()
                    t_deliver += t4 - t3
                    # keep control latency low during back-to-back ticks
                    self._handle_control()
                    t_ctl += time.perf_counter() - t4
                if time.monotonic() - last_stats > 10.0:
                    last_stats = time.monotonic()
                    print(f"[stats] {json.dumps(self.engine.stats())} "
                          f"loop wait={t_wait:.1f} ctl={t_ctl:.1f} "
                          f"tick={t_tick:.1f} deliver={t_deliver:.1f}",
                          file=sys.stderr)
        finally:
            self.ingest.stop()
