"""Server-side hot model swap under live streams (VERDICT r4 item 6).

The migration primitives (engine export/import snapshots) become
load-bearing: StreamServer.hot_swap drains the old engine, exports every
in-flight stream, imports each into a fresh BatchedEngine on the new model
KEEPING its wire stream id, and swaps engines — while clients keep pushing.
With identical weights the transcripts must be identical to never swapping;
with different weights the streams must continue and end cleanly."""

import asyncio

import numpy as np
import pytest

from helpers import tiny_model

from nemotron_tpu.api import ASRModel
from nemotron_tpu.serving import protocol as P
from nemotron_tpu.serving.client import StreamClient
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


async def start_test_server(model):
    srv = StreamServer(model, batch_per_group=4)
    srv._engine_task = asyncio.create_task(srv.engine_loop())
    server = await asyncio.start_server(srv.handle_conn, "127.0.0.1", 0)
    port = server.sockets[0].getsockname()[1]
    return srv, server, port


def drive_with_swap(model_a, model_b, audios):
    """Push half of each stream, hot-swap, push the rest; return transcripts
    keyed by client index plus the number of migrated streams."""

    async def run():
        srv, server, port = await start_test_server(model_a)
        try:
            client = await StreamClient.connect("127.0.0.1", port)
            sids = [await client.start_stream() for _ in audios]
            half = {i: len(a) // 2 // 1600 * 1600 for i, a in
                    enumerate(audios)}
            for i, a in enumerate(audios):
                for off in range(0, half[i], 1600):
                    await client.push(sids[i], a[off : off + 1600])

            texts = {sid: "" for sid in sids}
            ended = set()

            async def receiver():
                while len(ended) < len(sids):
                    opcode, rsid, payload = await asyncio.wait_for(
                        client.recv(), timeout=300)
                    if opcode in (P.OP_TEXT, P.OP_ENDED):
                        texts[rsid] += payload.decode("utf-8",
                                                      errors="replace")
                        if opcode == P.OP_ENDED:
                            ended.add(rsid)
                    elif opcode == P.OP_ERROR:
                        raise RuntimeError(payload.decode())

            recv_task = asyncio.ensure_future(receiver())
            # let the first half actually process on engine A
            await asyncio.sleep(1.0)

            n = await asyncio.wait_for(srv.hot_swap(model_b), timeout=240)
            assert srv.engine.model is model_b

            for i, a in enumerate(audios):
                for off in range(half[i], len(a), 1600):
                    await client.push(sids[i], a[off : off + 1600])
                await client.send(P.OP_STREAM_END, sids[i])
            await recv_task
            client.close()
            return {i: texts[sids[i]] for i in range(len(audios))}, n
        finally:
            server.close()

    return asyncio.run(run())


def test_hot_swap_same_weights_is_transcript_identical():
    model_a = build_model(seed=0)
    hp, params = tiny_model(seed=0)  # same weights, distinct instance
    model_b = ASRModel(hp, params, model_a.tokenizer.vocab)

    audios = [make_audio(12800, seed=20 + i) for i in range(2)]
    want = {}
    for i, a in enumerate(audios):
        s = StreamSession(model_a, 0)
        s.process_incremental(a)
        s.finalize()
        want[i] = s.get_transcript()

    texts, n = drive_with_swap(model_a, model_b, audios)
    assert n == 2, f"expected 2 migrated streams, got {n}"
    for i in range(len(audios)):
        assert texts[i] == want[i], (
            f"stream {i} transcript changed across the swap:\n"
            f"  got  {texts[i]!r}\n  want {want[i]!r}")


def test_hot_swap_new_weights_streams_continue():
    """Swapping to genuinely different weights (the real use case): streams
    keep their ids, keep decoding, and end cleanly — no transcript-identity
    claim (the carried caches were computed by the old model)."""
    model_a = build_model(seed=0)
    model_b = build_model(seed=9)

    audios = [make_audio(9600, seed=30)]
    texts, n = drive_with_swap(model_a, model_b, audios)
    assert n == 1
    # the stream survived the swap end-to-end (text content model-dependent)
    assert isinstance(texts[0], str)


def test_hot_swap_rejected_while_in_progress():
    model_a = build_model(seed=0)
    model_b = build_model(seed=1)

    async def run():
        srv, server, port = await start_test_server(model_a)
        try:
            t1 = asyncio.ensure_future(srv.hot_swap(model_b))
            await asyncio.sleep(0)  # let it set the gate
            with pytest.raises(RuntimeError, match="already in progress"):
                await srv.hot_swap(model_b)
            await asyncio.wait_for(t1, timeout=120)
        finally:
            server.close()

    asyncio.run(run())
