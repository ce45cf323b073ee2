"""Scale-out routing: RoutedClient across two live server replicas must
balance streams and stay transcript-identical to single-stream sessions;
ReplicaSet lifecycle (ready-wait, shutdown) is exercised against stub
subprocesses so the test stays CPU-only."""

import asyncio
import sys

import numpy as np

from helpers import tiny_model

from nemotron_tpu.api import ASRModel
from nemotron_tpu.serving.replicas import ReplicaSet, RoutedClient
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


def test_routed_client_balances_and_matches_sessions():
    model = build_model()
    audios = {i: make_audio(8000, seed=10 + i) for i in range(4)}
    want = {}
    for i, audio in audios.items():
        s = StreamSession(model, 0)
        s.process_incremental(audio)
        s.finalize()
        want[i] = s.get_transcript()

    async def run():
        servers = []
        addrs = []
        srvs = []
        for _ in range(2):  # two replicas sharing one model (CPU test)
            srv = StreamServer(model, batch_per_group=4)
            srv._engine_task = asyncio.create_task(srv.engine_loop())
            server = await asyncio.start_server(srv.handle_conn,
                                                "127.0.0.1", 0)
            servers.append(server)
            srvs.append(srv)
            addrs.append(("127.0.0.1", server.sockets[0].getsockname()[1]))
        try:
            rc = await RoutedClient.connect(addrs)
            handles = {}
            for i in audios:
                handles[i] = await rc.start_stream(0)
            # least-loaded routing must split 4 streams 2/2
            assert rc.live == [2, 2], rc.live
            reps = {h >> RoutedClient._REP_SHIFT for h in handles.values()}
            assert reps == {0, 1}
            got = await asyncio.gather(*(
                rc.transcribe(handles[i], audios[i], chunk_ms=100)
                for i in audios))
            rc.close()
            for i, text in zip(audios, got):
                assert text == want[i], (i, text, want[i])
            assert rc.live == [0, 0]
        finally:
            for server in servers:
                server.close()

    asyncio.run(asyncio.wait_for(run(), timeout=300))


def test_replica_set_lifecycle(tmp_path, monkeypatch):
    """ReplicaSet spawn / ready-wait / close against stub server processes
    (a real model load would drag the TPU plugin into a CPU-only test)."""
    stub = tmp_path / "stub_server.py"
    stub.write_text(
        "import sys, time\n"
        "print('listening on stub', file=sys.stderr, flush=True)\n"
        "time.sleep(300)\n"
    )

    import nemotron_tpu.serving.replicas as R

    real_popen = R.subprocess.Popen

    def stub_popen(cmd, **kw):
        return real_popen([sys.executable, str(stub)], **kw)

    monkeypatch.setattr(R.subprocess, "Popen", stub_popen)
    rs = ReplicaSet("unused.gguf", n_replicas=3, port_base=18200)
    try:
        rs.wait_ready(timeout=60)
        assert len(rs.addrs) == 3
        assert all(p.poll() is None for p in rs.procs)
    finally:
        rs.close()
    assert all(p.poll() is not None for p in rs.procs)


def test_routed_handle_packs_full_u32_sid():
    """Stream ids are u32 on the wire; the handle packing must not alias a
    replica's high sids into the replica index (regression: 24-bit shift)."""
    from nemotron_tpu.serving.replicas import RoutedClient

    rc = RoutedClient.__new__(RoutedClient)
    big_sid = (1 << 24) + 7
    h = (3 << RoutedClient._REP_SHIFT) | big_sid
    assert rc._route(h) == (3, big_sid)
    assert rc._route(big_sid) == (0, big_sid)


def test_wait_ready_times_out_on_silent_replica(tmp_path, monkeypatch):
    """A replica that hangs before printing anything must trip wait_ready's
    timeout instead of blocking forever on readline."""
    import sys

    import pytest

    from nemotron_tpu.serving.replicas import ReplicaSet

    stub = tmp_path / "silent.py"
    stub.write_text("import time\ntime.sleep(300)\n")

    import nemotron_tpu.serving.replicas as R

    real_popen = R.subprocess.Popen

    def stub_popen(cmd, **kw):
        return real_popen([sys.executable, str(stub)], **kw)

    monkeypatch.setattr(R.subprocess, "Popen", stub_popen)
    rs = ReplicaSet("unused.gguf", n_replicas=1, port_base=18300)
    try:
        with pytest.raises(TimeoutError):
            rs.wait_ready(timeout=3.0)
    finally:
        rs.close()
