"""Server E2E over a real TCP socket: protocol framing, multi-stream
multiplexing on one connection, ACK/STARTED/TEXT/ENDED flow, language errors,
and transcript parity with a direct StreamSession."""

import asyncio
import json

import numpy as np
import pytest

from helpers import tiny_model

from nemotron_tpu.api import ASRModel
from nemotron_tpu.serving import protocol as P
from nemotron_tpu.serving.client import StreamClient, transcribe_file
from nemotron_tpu.serving.server import StreamServer
from nemotron_tpu.streaming.session import StreamSession


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


@pytest.fixture()
def model():
    return build_model()


async def start_test_server(model):
    srv = StreamServer(model, batch_per_group=4)
    srv._engine_task = asyncio.create_task(srv.engine_loop())
    server = await asyncio.start_server(srv.handle_conn, "127.0.0.1", 0)
    port = server.sockets[0].getsockname()[1]
    return srv, server, port


def test_server_single_stream_matches_session(model):
    audio = make_audio(9600, seed=1)

    sess = StreamSession(model, 0)
    sess.process_incremental(audio)
    sess.finalize()
    want = sess.get_transcript()

    async def run():
        srv, server, port = await start_test_server(model)
        try:
            text = await asyncio.wait_for(
                transcribe_file(audio, host="127.0.0.1", port=port,
                                chunk_ms=100),
                timeout=60,
            )
            return text
        finally:
            server.close()

    got = asyncio.run(run())
    assert got == want


def test_server_two_streams_one_connection(model):
    a0 = make_audio(6400, seed=2)
    a1 = make_audio(6400, seed=3)

    def solo(audio):
        s = StreamSession(model, 0)
        s.process_incremental(audio)
        s.finalize()
        return s.get_transcript()

    async def run():
        srv, server, port = await start_test_server(model)
        try:
            c = await StreamClient.connect("127.0.0.1", port)
            sid0 = await c.start_stream(0)
            sid1 = await c.start_stream(0)
            assert sid0 != sid1
            texts = {sid0: "", sid1: ""}
            ended = set()

            async def pump():
                while len(ended) < 2:
                    opcode, sid, payload = await c.recv()
                    if opcode == P.OP_TEXT:
                        texts[sid] += payload.decode()
                    elif opcode == P.OP_ENDED:
                        texts[sid] += payload.decode()
                        ended.add(sid)

            reader = asyncio.create_task(pump())
            for off in range(0, 6400, 1600):
                await c.push(sid0, a0[off : off + 1600])
                await c.push(sid1, a1[off : off + 1600])
            await c.send(P.OP_STREAM_END, sid0)
            await c.send(P.OP_STREAM_END, sid1)
            await asyncio.wait_for(reader, timeout=60)
            c.close()
            return texts[sid0], texts[sid1]
        finally:
            server.close()

    t0, t1 = asyncio.run(run())
    assert t0 == solo(a0)
    assert t1 == solo(a1)


def test_server_budget_released_as_audio_consumed(model):
    """Long-lived streams must not exhaust the admission budget: the budget is
    released as the engine consumes queued PCM (reference semantics,
    nemo-server.cpp:116-126), not only on stream end. Regression: with
    release-on-end only, cumulative pushes > budget stalled every PUSH
    handler forever."""
    budget = 64 * 1024  # 64 KB => 32768 samples; we push 4x that, never ending

    async def run():
        srv = StreamServer(model, batch_per_group=4, mem_budget=budget)
        srv._engine_task = asyncio.create_task(srv.engine_loop())
        server = await asyncio.start_server(srv.handle_conn, "127.0.0.1", 0)
        port = server.sockets[0].getsockname()[1]
        try:
            c = await StreamClient.connect("127.0.0.1", port)
            sids = [await c.start_stream(0) for _ in range(4)]

            acked = 0

            async def pump():
                nonlocal acked
                while True:
                    opcode, sid, payload = await c.recv()
                    if opcode == P.OP_ACK:
                        acked += 1

            reader = asyncio.create_task(pump())
            # 4 streams x 8 pushes x 8000 samples = 512 KB total, 8x budget.
            # Admission happens server-side, so every ACK past the first
            # round proves budget was released by consumption. The generous
            # wait covers per-phase jit compiles on CPU; a release-on-end-only
            # server stalls at 4 ACKs forever no matter how long we wait.
            for _ in range(8):
                for sid in sids:
                    await c.push(sid, make_audio(8000, seed=5))
                await asyncio.sleep(0.05)  # let the engine consume
            # generous: per-phase jit compiles on a loaded 1-core CI box can
            # starve the engine thread for minutes (seen at load ~3); a
            # release-on-end-only server still fails — it stalls at 4 ACKs
            # forever no matter how long we wait
            for _ in range(4800):
                if acked >= 32:
                    break
                await asyncio.sleep(0.05)
            reader.cancel()
            c.close()
            assert acked >= 32, f"only {acked}/32 pushes acked (budget stall)"
            assert srv.mem_used <= budget
        finally:
            server.close()

    asyncio.run(asyncio.wait_for(run(), timeout=360))


def test_server_ack_and_error_frames(model):
    async def run():
        srv, server, port = await start_test_server(model)
        try:
            c = await StreamClient.connect("127.0.0.1", port)
            sid = await c.start_stream(0)
            await c.push(sid, make_audio(1600, seed=4))
            opcode, rsid, payload = await c.recv()
            assert opcode == P.OP_ACK and rsid == sid
            assert json.loads(payload)["queued_samples"] == 1600
            # SET_LANG on a monolingual model -> ERROR
            await c.send(P.OP_SET_LANG, sid, "ru-RU")
            while True:
                opcode, rsid, payload = await c.recv()
                if opcode in (P.OP_ERROR, P.OP_LANG_SET):
                    break
            assert opcode == P.OP_ERROR
            c.close()
        finally:
            server.close()

    asyncio.run(asyncio.wait_for(run(), timeout=60))


def test_server_stream_ownership_and_config_validation(model):
    """A connection can only act on ITS OWN streams (ids are small
    sequential ints — a stray/malicious END, PUSH or SET_LANG aimed at
    another client's sid must be ignored/refused), and a client-supplied
    right_context outside the supported presets is a protocol error, not a
    fresh device-state allocation."""
    audio = make_audio(9600, seed=1)

    sess = StreamSession(model, 0)
    sess.process_incremental(audio)
    sess.finalize()
    want = sess.get_transcript()

    async def run():
        srv, server, port = await start_test_server(model)
        try:
            a = await StreamClient.connect("127.0.0.1", port)
            sid = await a.start_stream(0)

            b = await StreamClient.connect("127.0.0.1", port)
            # bad right_context values -> OP_ERROR, no stream started
            for bad in (-1, 7, "x"):
                await b.send(P.OP_STREAM_START, 0,
                             json.dumps({"right_context": bad}))
                opcode, _, payload = await b.recv()
                assert opcode == P.OP_ERROR, (bad, payload)
                assert b"right_context" in payload
            # cross-connection attacks on A's stream: silently ignored END
            # and PUSH, explicit error for SET_LANG
            await b.send(P.OP_STREAM_END, sid)
            await b.send(P.OP_PUSH, sid, make_audio(1600, seed=9).tobytes())
            await b.send(P.OP_SET_LANG, sid, "en-US")
            opcode, rsid, payload = await b.recv()
            assert opcode == P.OP_ERROR and rsid == sid
            assert b"unknown stream" in payload
            b.close()

            # A's stream is unperturbed: same transcript as a session
            texts = []
            await a.push(sid, audio)
            await a.send(P.OP_STREAM_END, sid)
            while True:
                opcode, rsid, payload = await a.recv()
                if opcode == P.OP_TEXT:
                    texts.append(payload.decode())
                elif opcode == P.OP_ENDED:
                    texts.append(payload.decode())
                    break
            a.close()
            return "".join(texts)
        finally:
            server.close()

    got = asyncio.run(asyncio.wait_for(run(), timeout=120))
    assert got == want


@pytest.mark.filterwarnings(
    "ignore::pytest.PytestUnhandledThreadExceptionWarning")
def test_server_engine_failure_fail_stop(model):
    """A dead engine thread must take the server down (sentinel through
    out_q), not leave it silently accepting PCM with no transcription."""

    async def run():
        srv = StreamServer(model, batch_per_group=2)

        def boom():
            raise RuntimeError("injected engine failure")

        srv.engine.tick = boom
        task = asyncio.create_task(srv.engine_loop())
        with pytest.raises(RuntimeError, match="engine thread died"):
            await asyncio.wait_for(task, timeout=15)

    asyncio.run(run())


def test_server_on_dp_mesh_matches_session():
    """The asyncio server with a dp-mesh-sharded model (server --dp wiring:
    ASRModel.shard) must transcribe identically to a single-device session."""
    import jax

    from nemotron_tpu.parallel.mesh import make_mesh

    devs = jax.devices("cpu")
    if len(devs) < 4:
        pytest.skip("need 4 cpu devices")
    audio = make_audio(8000, seed=9)

    plain = build_model(seed=2)
    sess = StreamSession(plain, 0)
    sess.process_incremental(audio)
    sess.finalize()
    want = sess.get_transcript()

    sharded = build_model(seed=2).shard(make_mesh(4, 1, devices=devs[:4]))

    async def run():
        srv, server, port = await start_test_server(sharded)
        try:
            return await asyncio.wait_for(
                transcribe_file(audio, host="127.0.0.1", port=port,
                                chunk_ms=100),
                timeout=120)
        finally:
            server.close()
            srv._engine_task.cancel()

    assert asyncio.run(run()) == want
