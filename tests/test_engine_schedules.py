"""Randomized engine schedules: arbitrary interleavings of joins, pauses,
ragged push sizes, ends and slot reuse must stay token-identical to
independent per-stream sessions. The hand-picked engine tests cover known
scenarios; this sweeps schedule space (seeded, deterministic) to guard the
phase/slot_phase/realign bookkeeping (models/encoder.realign_cache,
engine.tick) against interleavings nobody thought of."""

import numpy as np

from helpers import tiny_model

from nemotron_tpu.api import ASRModel
from nemotron_tpu.streaming.engine import BatchedEngine
from nemotron_tpu.streaming.session import StreamSession


def make_audio(n, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    f = 180 + 60 * (seed % 7)
    sig = 0.4 * np.sin(2 * np.pi * f * t) + 0.2 * rng.standard_normal(n)
    return (np.clip(sig, -1, 1) * 32767).astype(np.int16)


def build_model(seed=0):
    hp, params = tiny_model(seed=seed)
    vocab = [("▁w%d" % i) if i % 2 == 0 else ("p%d" % i)
             for i in range(hp.vocab_size - 1)]
    return ASRModel(hp, params, vocab)


def random_schedule(rng, n_streams):
    """Per stream: audio, join round, pause rounds, per-round push sizes."""
    streams = []
    for k in range(n_streams):
        n = int(rng.integers(4000, 12001))
        audio = make_audio(n, seed=100 + k)
        join = int(rng.integers(0, 4))
        n_pauses = int(rng.integers(0, 3))
        pauses = set(int(rng.integers(join + 1, join + 8))
                     for _ in range(n_pauses))
        streams.append({"audio": audio, "join": join, "pauses": pauses})
    return streams


def drive(model, streams, batch):
    engine = BatchedEngine(model, batch_per_group=batch)
    rng = np.random.default_rng(7)
    sid = {}
    offs = {k: 0 for k in range(len(streams))}
    texts = {k: "" for k in range(len(streams))}
    ended_sent = set()
    finals = set()
    key_of = {}
    r = 0
    while len(finals) < len(streams) and r < 400:
        for k, st in enumerate(streams):
            if r < st["join"] or k in ended_sent:
                continue
            if k not in sid:
                sid[k] = engine.start_stream(0)
                key_of[sid[k]] = k
            if r in st["pauses"]:
                continue
            a = st["audio"]
            if offs[k] < len(a):
                step = int(rng.integers(800, 3201))
                engine.push_audio(sid[k], a[offs[k] : offs[k] + step])
                offs[k] += step
            else:
                engine.end_stream(sid[k])
                ended_sent.add(k)
        for e in engine.tick()[0]:
            texts[key_of[e.stream_id]] += e.text
            if e.kind == "ended":
                finals.add(key_of[e.stream_id])
        r += 1
    assert len(finals) == len(streams), f"{len(finals)}/{len(streams)} ended"
    return texts


def test_engine_random_schedules():
    model = build_model(seed=6)
    for case in range(2):
        rng = np.random.default_rng(42 + case)
        # 5 streams through 3 slots: forces queuing-free slot reuse by
        # staggering joins past earlier streams' ends
        n_streams = 4 if case == 0 else 3
        batch = 3
        streams = random_schedule(rng, n_streams)
        if n_streams > batch:
            # delay the overflow streams until the earliest ones can finish
            for k in range(batch, n_streams):
                streams[k]["join"] = 40 + 10 * k
        want = {}
        for k, st in enumerate(streams):
            s = StreamSession(model, 0)
            s.process_incremental(st["audio"])
            s.finalize()
            want[k] = s.get_transcript()
        got = drive(model, streams, batch)
        assert got == want, f"case {case}"
