"""Native (C++ epoll ingest) server E2E: byte-identical protocol behavior and
transcript parity with StreamSession, through real TCP sockets against the
GIL-free ingest path (native/ingest_server.cpp + serving/native_server.py).

The C++ layer is a process-wide singleton, so each test runs its own server
start/stop cycle; tests are skipped when no g++ is available to build it.
"""

import asyncio
import json
import socket
import struct
import threading
import time

import numpy as np
import pytest

from helpers import tiny_model

from nemotron_tpu.api import ASRModel
from nemotron_tpu.serving import protocol as P
from nemotron_tpu.serving.client import transcribe_file
from nemotron_tpu.serving.ingest import have_native_ingest
from nemotron_tpu.streaming.session import StreamSession

pytestmark = pytest.mark.skipif(not have_native_ingest(),
                                reason="native ingest library unavailable")


def make_audio(n, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    sig = 0.4 * np.sin(2 * np.pi * 260 * t) + 0.2 * rng.standard_normal(n)
    return (np.clip(sig, -1, 1) * 32767).astype(np.int16)


def build_model(seed=0):
    hp, params = tiny_model(seed=seed)
    vocab = [("▁w%d" % i) if i % 2 == 0 else ("p%d" % i)
             for i in range(hp.vocab_size - 1)]
    return ASRModel(hp, params, vocab)


class running_server:
    """Context manager: NativeStreamServer on a background thread."""

    def __init__(self, model, batch=4, mem_budget=P.DEFAULT_MEM_BUDGET):
        from nemotron_tpu.serving.native_server import NativeStreamServer

        self.srv = NativeStreamServer(model, batch_per_group=batch,
                                      mem_budget=mem_budget)

    def __enter__(self):
        self.port = self.srv.start("127.0.0.1", 0)
        self.thread = threading.Thread(target=self.srv.serve_forever,
                                       daemon=True)
        self.thread.start()
        return self

    def __exit__(self, *exc):
        self.srv.stop()
        self.thread.join(timeout=30)
        return False


HDR = struct.Struct("<BII")


class RawClient:
    """Minimal blocking-socket protocol client for frame-level assertions."""

    def __init__(self, port):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=30)

    def send(self, op, sid, payload=b""):
        if isinstance(payload, str):
            payload = payload.encode()
        self.sock.sendall(HDR.pack(op, sid, len(payload)) + payload)

    def recv(self):
        hdr = b""
        while len(hdr) < HDR.size:
            got = self.sock.recv(HDR.size - len(hdr))
            if not got:
                raise ConnectionError("closed")
            hdr += got
        op, sid, ln = HDR.unpack(hdr)
        payload = b""
        while len(payload) < ln:
            payload += self.sock.recv(ln - len(payload))
        return op, sid, payload

    def close(self):
        self.sock.close()


def test_native_server_matches_session():
    model = build_model()
    audio = make_audio(9600, seed=1)

    sess = StreamSession(model, 0)
    sess.process_incremental(audio)
    sess.finalize()
    want = sess.get_transcript()

    with running_server(model) as rs:
        got = asyncio.run(asyncio.wait_for(
            transcribe_file(audio, host="127.0.0.1", port=rs.port,
                            chunk_ms=100),
            timeout=120))
    assert got == want


def test_native_server_two_streams_one_connection():
    model = build_model()
    a0, a1 = make_audio(8000, seed=2), make_audio(8000, seed=3)
    want = {}
    for key, audio in (("a", a0), ("b", a1)):
        s = StreamSession(model, 0)
        s.process_incremental(audio)
        s.finalize()
        want[key] = s.get_transcript()

    with running_server(model) as rs:
        c = RawClient(rs.port)
        c.send(P.OP_STREAM_START, 0, b"{}")
        op, _, pl = c.recv()
        assert op == P.OP_STARTED
        sid0 = json.loads(pl)["id"]
        c.send(P.OP_STREAM_START, 0, b"{}")
        # interleave: the STARTED for stream 1 may arrive among ACKs
        sid1 = None
        texts = {0: "", 1: ""}
        ended = set()
        for off in range(0, 8000, 1600):
            c.send(P.OP_PUSH, sid0, a0[off : off + 1600].tobytes())
        deadline = time.time() + 120
        c.send(P.OP_STREAM_END, sid0)
        pushed1 = False
        while len(ended) < 2 and time.time() < deadline:
            op, sid, pl = c.recv()
            if op == P.OP_STARTED:
                sid1 = json.loads(pl)["id"]
                for off in range(0, 8000, 1600):
                    c.send(P.OP_PUSH, sid1, a1[off : off + 1600].tobytes())
                c.send(P.OP_STREAM_END, sid1)
                pushed1 = True
            elif op == P.OP_TEXT:
                texts[0 if sid == sid0 else 1] += pl.decode()
            elif op == P.OP_ENDED:
                texts[0 if sid == sid0 else 1] += pl.decode()
                ended.add(sid)
        c.close()
        assert pushed1 and len(ended) == 2
        assert texts[0] == want["a"]
        assert texts[1] == want["b"]


def test_native_server_ack_error_and_abrupt_disconnect():
    model = build_model()
    with running_server(model, batch=2) as rs:
        # bad opcode -> OP_ERROR straight from the C++ layer
        c = RawClient(rs.port)
        c.send(0x77, 5, b"")
        op, sid, pl = c.recv()
        assert op == P.OP_ERROR and b"bad opcode" in pl

        # START + PUSH -> ACK with queued_samples
        c.send(P.OP_STREAM_START, 0, b"{}")
        op, _, pl = c.recv()
        assert op == P.OP_STARTED
        sid = json.loads(pl)["id"]
        c.send(P.OP_PUSH, sid, make_audio(1600, seed=4).tobytes())
        op, rsid, pl = c.recv()
        assert op == P.OP_ACK and rsid == sid
        assert json.loads(pl)["queued_samples"] <= 1600  # engine may consume

        # stale-session DATA (unknown sid) is silently ignored
        c.send(P.OP_PUSH, 9999, b"\x00\x00" * 100)

        # abrupt disconnect mid-stream: the slot must be reclaimed
        c.close()
        deadline = time.time() + 30
        while time.time() < deadline:
            groups = rs.srv.engine.groups
            if groups and all(g.n_active_streams == 0
                              for g in groups.values()):
                break
            time.sleep(0.05)
        assert all(g.n_active_streams == 0
                   for g in rs.srv.engine.groups.values())

        # the server keeps serving new connections afterwards
        c2 = RawClient(rs.port)
        c2.send(P.OP_STREAM_START, 0, b"{}")
        op, _, pl = c2.recv()
        assert op == P.OP_STARTED
        c2.close()


def test_native_server_budget_backpressure():
    """With a tiny admission budget the C++ layer parks the reader instead of
    consuming PUSH frames; the engine's take releases budget and everything
    still transcribes to the exact session transcript."""
    model = build_model()
    audio = make_audio(12800, seed=5)
    sess = StreamSession(model, 0)
    sess.process_incremental(audio)
    sess.finalize()
    want = sess.get_transcript()

    # budget = 4000 samples' worth of bytes — far less than the 12800 pushed
    with running_server(model, mem_budget=8000) as rs:
        got = asyncio.run(asyncio.wait_for(
            transcribe_file(audio, host="127.0.0.1", port=rs.port,
                            chunk_ms=100),
            timeout=180))
    assert got == want
