"""Diarization over the serving protocol (VERDICT round-3 item 9 — a
beyond-reference capability: the reference exposes diarization only via CLI).

A stream that STARTs with {"diarize": true} on a --diarize server receives
OP_DIARIZE word JSONL frames as words decode and one final
{"type":"result","speaker_text":...,"rttm":...} frame BEFORE its OP_ENDED;
plain streams and diarize streams multiplex on the same engine; requesting
diarization on a server without a diarize model is a protocol error."""

import asyncio
import json

import numpy as np
import pytest

from helpers import tiny_model
from scripts_support import export_random_diarize_checkpoint

from nemotron_tpu.api import ASRModel
from nemotron_tpu.serving import protocol as P
from nemotron_tpu.serving.client import StreamClient, transcribe_file
from nemotron_tpu.serving.server import StreamServer
from nemotron_tpu.streaming.session import StreamSession


def make_audio(n, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 260 * t) + 0.2 * rng.standard_normal(n)
    return (np.clip(sig, -1, 1) * 32767).astype(np.int16)


def build_model(seed=0):
    hp, params = tiny_model(seed=seed)
    vocab = [("▁w%d" % i) if i % 2 == 0 else ("p%d" % i)
             for i in range(hp.vocab_size - 1)]
    return ASRModel(hp, params, vocab)


@pytest.fixture(scope="module")
def diarize_params(tmp_path_factory):
    from nemotron_tpu.diarize.params import load_diarize_model

    path = tmp_path_factory.mktemp("dz") / "diarize.gguf"
    export_random_diarize_checkpoint(str(path), seed=7)
    return load_diarize_model(str(path))


async def start_test_server(model, diarize_params):
    srv = StreamServer(model, batch_per_group=4, diarize_params=diarize_params)
    srv._engine_task = asyncio.create_task(srv.engine_loop())
    server = await asyncio.start_server(srv.handle_conn, "127.0.0.1", 0)
    port = server.sockets[0].getsockname()[1]
    return srv, server, port


def test_diarize_stream_gets_word_and_result_frames(diarize_params):
    model = build_model()
    audio = make_audio(3 * 16000, seed=2)  # 3 s: enough for VAD sub-segments

    sess = StreamSession(model, 0)
    sess.process_incremental(audio)
    sess.finalize()
    want_text = sess.get_transcript()

    async def run():
        srv, server, port = await start_test_server(model, diarize_params)
        lines: list[str] = []
        try:
            text = await asyncio.wait_for(
                transcribe_file(audio, host="127.0.0.1", port=port,
                                chunk_ms=100, diarize=True,
                                on_diarize=lines.append),
                timeout=300,
            )
            return text, lines
        finally:
            server.close()

    got, lines = asyncio.run(run())
    assert got == want_text  # diarization must not perturb the transcript

    objs = [json.loads(x) for x in lines]
    results = [o for o in objs if o.get("type") == "result"]
    words = [o for o in objs if "word" in o]
    assert len(results) == 1, f"want exactly one result frame, got {objs}"
    assert results[0]["n_speakers"] >= 1
    assert "speaker_text" in results[0] and "rttm" in results[0]
    # the result frame arrives LAST (engine_loop orders it before OP_ENDED)
    assert objs[-1]["type"] == "result"
    # every transcript word surfaced as an incremental frame with a timestamp
    assert len(words) == len(want_text.split())
    assert all(w["at"] >= 0 for w in words)
    # words are stamped at the DECODE position, not the staged-audio
    # position: this client pushes far ahead of real time, so staging-based
    # stamps would pin every word near the 3.0 s file end (wrong speaker
    # attribution); decode-position stamps spread across the stream
    ats = [w["at"] for w in words]
    assert ats == sorted(ats)
    assert ats[0] < 1.5, f"first word stamped at file end: {ats}"
    assert all(a <= 3.5 for a in ats)


def test_plain_and_diarize_streams_multiplex(diarize_params):
    model = build_model()
    a_plain = make_audio(9600, seed=3)
    a_diar = make_audio(16000, seed=4)

    async def run():
        srv, server, port = await start_test_server(model, diarize_params)
        try:
            client = await StreamClient.connect("127.0.0.1", port)
            sid_p = await client.start_stream()
            sid_d = await client.start_stream(diarize=True)
            for off in range(0, 16000, 1600):
                await client.push(sid_p, a_plain[off:off + 1600])
                await client.push(sid_d, a_diar[off:off + 1600])
            await client.send(P.OP_STREAM_END, sid_p)
            await client.send(P.OP_STREAM_END, sid_d)

            ended, diar_frames, texts = set(), [], {sid_p: "", sid_d: ""}
            while len(ended) < 2:
                opcode, rsid, payload = await asyncio.wait_for(
                    client.recv(), timeout=120)
                if opcode == P.OP_TEXT or opcode == P.OP_ENDED:
                    texts[rsid] += payload.decode("utf-8", errors="replace")
                    if opcode == P.OP_ENDED:
                        ended.add(rsid)
                elif opcode == P.OP_DIARIZE:
                    diar_frames.append((rsid, payload.decode()))
            client.close()
            return texts, diar_frames, sid_p, sid_d
        finally:
            server.close()

    texts, diar_frames, sid_p, sid_d = asyncio.run(run())
    assert texts[sid_p] and texts[sid_d]
    assert diar_frames, "diarize stream produced no frames"
    # only the diarize stream gets OP_DIARIZE
    assert {sid for sid, _ in diar_frames} == {sid_d}


def test_slow_finalize_does_not_stall_other_streams(diarize_params,
                                                    monkeypatch):
    """NME-SC finalize runs off the engine thread (VERDICT r4 item 3): a
    diarized stream ending must not freeze other streams' ticks while it
    clusters (the real sweep takes 1+ s at N=512). Simulated with an
    artificially slow finalize_cluster; a concurrently-paced plain stream's
    text events must keep arriving during the stall window, and the result
    frame must still precede the diarized stream's OP_ENDED."""
    import time

    from nemotron_tpu.diarize.pipeline import DiarizePipeline

    model = build_model()
    a_diar = make_audio(16000, seed=5)
    a_live = make_audio(16000, seed=6)  # cycled by the pusher

    cluster_sleep = 2.0
    marks = {"cluster_start": None}
    orig = DiarizePipeline.finalize_cluster

    def slow(self):
        marks["cluster_start"] = time.monotonic()
        time.sleep(cluster_sleep)
        return orig(self)

    monkeypatch.setattr(DiarizePipeline, "finalize_cluster", slow)

    async def run():
        srv, server, port = await start_test_server(model, diarize_params)
        try:
            client = await StreamClient.connect("127.0.0.1", port)
            sid_d = await client.start_stream(diarize=True)
            sid_l = await client.start_stream()
            await client.push(sid_d, a_diar)

            arrivals = {"result": None, "ended_d": None}
            group = srv.engine.groups[0]
            samples: list[tuple[float, int]] = []  # (t, engine steps)

            async def sampler():
                while arrivals["ended_d"] is None:
                    samples.append((time.monotonic(), group.total_steps))
                    await asyncio.sleep(0.03)

            async def end_diar():
                # end the diarized stream only after every per-phase tick
                # variant has compiled (>= n_phases masked steps + the wrap
                # compaction) — a compile stall inside the clustering window
                # would otherwise fail the liveness assertion spuriously
                while group.total_steps < 12:
                    await asyncio.sleep(0.05)
                await client.send(P.OP_STREAM_END, sid_d)

            async def pusher():
                # keep the live stream fed until the diarize result lands,
                # so engine ticks have work across the clustering window
                off = 0
                deadline = time.monotonic() + 110
                while (arrivals["result"] is None
                       and time.monotonic() < deadline):
                    await client.push(sid_l, a_live[off : off + 1600])
                    off = (off + 1600) % len(a_live)
                    await asyncio.sleep(0.05)
                await client.send(P.OP_STREAM_END, sid_l)

            async def receiver():
                ended = set()
                while len(ended) < 2:
                    opcode, rsid, payload = await asyncio.wait_for(
                        client.recv(), timeout=120)
                    now = time.monotonic()
                    if opcode == P.OP_DIARIZE:
                        if json.loads(payload).get("type") == "result":
                            arrivals["result"] = now
                    elif opcode == P.OP_ENDED:
                        ended.add(rsid)
                        if rsid == sid_d:
                            arrivals["ended_d"] = now

            task = asyncio.ensure_future(sampler())
            await asyncio.gather(end_diar(), pusher(), receiver())
            task.cancel()
            client.close()
            return arrivals, samples
        finally:
            server.close()

    arrivals, samples = asyncio.run(run())
    assert arrivals["result"] is not None and arrivals["ended_d"] is not None
    # ordering: the diarize result frame precedes the stream's OP_ENDED
    assert arrivals["result"] <= arrivals["ended_d"]
    # liveness: the engine kept STEPPING the live stream inside the
    # clustering window (the old on-thread finalize froze ticks for the
    # whole cluster duration — steps would be flat until the result)
    t0 = marks["cluster_start"]
    assert t0 is not None
    window = [s for t, s in samples
              if t0 + 0.2 <= t <= t0 + cluster_sleep - 0.1]
    assert len(window) >= 10, f"sampler starved: {len(window)} samples"
    advanced = max(window) - min(window)
    assert advanced >= 2, (
        f"engine advanced only {advanced} steps during the "
        f"{cluster_sleep}s clustering window — finalize stalled ticks")


def test_diarize_without_server_model_is_an_error():
    model = build_model()

    async def run():
        srv, server, port = await start_test_server(model, None)
        try:
            client = await StreamClient.connect("127.0.0.1", port)
            with pytest.raises(RuntimeError, match="diarization not enabled"):
                await client.start_stream(diarize=True)
            # the connection stays usable for plain streams
            sid = await client.start_stream()
            assert sid >= 0
            client.close()
        finally:
            server.close()

    asyncio.run(run())
