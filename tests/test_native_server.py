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


def _drive_control(ing, deadline=30.0):
    """Poll the ingest layer until control events arrive; return them."""
    end = time.time() + deadline
    while time.time() < end:
        evs = ing.poll_control()
        if evs:
            return evs
        ing.wait(50)
    raise TimeoutError("no control event")


def _start_stream(ing, client, sid):
    """Drive the Python half of START by hand (no server loop)."""
    client.send(P.OP_STREAM_START, 0, b"{}")
    (typ, conn, _, _), = _drive_control(ing)
    from nemotron_tpu.serving.ingest import EV_START

    assert typ == EV_START
    ing.register_stream(conn, sid)
    ing.send(conn, P.OP_STARTED, sid, json.dumps({"id": sid}))
    op, _, pl = client.recv()
    assert op == P.OP_STARTED and json.loads(pl)["id"] == sid
    return conn


def test_ingest_budget_unparks_on_disconnect():
    """A parked connection must wake when a DEAD connection's budget is
    freed (close_conn releases the dead conn's staged bytes natively; nothing
    else would ever retrigger the parked reader)."""
    from nemotron_tpu.serving.ingest import EV_DROP, NativeIngest

    ing = NativeIngest(host="127.0.0.1", port=0, budget_bytes=4000)
    try:
        a = RawClient(ing.port)
        _start_stream(ing, a, 1)
        a.send(P.OP_PUSH, 1, b"\x00\x00" * 2000)  # exactly fills the budget
        op, _, _ = a.recv()
        assert op == P.OP_ACK

        b = RawClient(ing.port)
        _start_stream(ing, b, 2)
        b.send(P.OP_PUSH, 2, b"\x00\x00" * 100)  # over budget -> parked
        b.sock.settimeout(1.0)
        with pytest.raises(TimeoutError):
            b.recv()

        a.close()  # frees the whole budget: b must unpark and get its ACK
        evs = _drive_control(ing)
        assert any(e[0] == EV_DROP for e in evs)
        b.sock.settimeout(20.0)
        op, rsid, _ = b.recv()
        assert op == P.OP_ACK and rsid == 2
        b.close()
    finally:
        ing.stop()


def test_ingest_push_larger_than_budget_streams_through():
    """A single PUSH larger than the WHOLE admission budget must not wedge
    the connection: partial admission stages what fits, parks, and resumes
    the SAME frame as the engine's takes free budget. (All-or-nothing
    admission deadlocks here — the engine holds sub-chunk tails in the rings,
    so used_bytes never returns to zero.)"""
    from nemotron_tpu.serving.ingest import NativeIngest

    ing = NativeIngest(host="127.0.0.1", port=0, budget_bytes=4000)
    try:
        a = RawClient(ing.port)
        _start_stream(ing, a, 1)
        a.send(P.OP_PUSH, 1, b"\x00" * 8000)  # 4000 samples; budget fits 2000
        a.sock.settimeout(0.5)
        with pytest.raises(TimeoutError):  # parked mid-frame, no ACK yet
            a.recv()
        out = np.zeros((1, 1000), np.int16)
        sids = np.array([1], np.uint32)
        take = np.array([1000], np.int32)
        got_ack = None
        a.sock.settimeout(0.5)
        for _ in range(20):
            ing.take_block(sids, take, out)  # frees budget -> unparks
            try:
                got_ack = a.recv()
                break
            except TimeoutError:
                continue
        assert got_ack is not None and got_ack[0] == P.OP_ACK
        staged, pushed = ing.status(sids)
        assert int(pushed[0]) == 4000  # the WHOLE frame landed, in pieces
        a.close()
    finally:
        ing.stop()


def test_ingest_control_payload_clamped():
    """An oversized START config must not wedge the control queue (payloads
    are clamped at enqueue so the queue head always fits the poll buffer)."""
    from nemotron_tpu.serving.ingest import EV_START, NativeIngest

    ing = NativeIngest(host="127.0.0.1", port=0)
    try:
        a = RawClient(ing.port)
        a.send(P.OP_STREAM_START, 0, b"x" * (2 << 20))  # 2 MB of config
        evs = _drive_control(ing)
        assert evs[0][0] == EV_START and len(evs[0][3]) <= (64 << 10)
        # the queue keeps draining: a later START still comes through
        a.send(P.OP_STREAM_START, 0, b"{}")
        evs = _drive_control(ing)
        assert evs[0][0] == EV_START and evs[0][3] == b"{}"
        a.close()
    finally:
        ing.stop()


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


def test_native_server_on_dp_mesh_matches_session():
    """GIL-free C++ ingest + dp-mesh-sharded model together (--native --dp):
    transcript identical to a single-device session."""
    import jax

    from nemotron_tpu.parallel.mesh import make_mesh

    devs = jax.devices("cpu")
    if len(devs) < 4:
        pytest.skip("need 4 cpu devices")
    audio = make_audio(8000, seed=30)

    plain = build_model(seed=4)
    sess = StreamSession(plain, 0)
    sess.process_incremental(audio)
    sess.finalize()
    want = sess.get_transcript()

    sharded = build_model(seed=4).shard(make_mesh(4, 1, devices=devs[:4]))
    with running_server(sharded) as rs:
        got = asyncio.run(asyncio.wait_for(
            transcribe_file(audio, host="127.0.0.1", port=rs.port,
                            chunk_ms=100),
            timeout=180))
    assert got == want
