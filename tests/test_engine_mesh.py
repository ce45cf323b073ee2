"""Mesh-sharded serving engine: a BatchedEngine whose model is sharded over a
dp (or dp x tp) device mesh must produce transcripts identical to the
single-device engine for the same push schedule — including staggered joins,
pauses (masked fast ticks + realign-on-resume), and finalize.

This is the serving-path counterpart of test_parallel.py (which shards the
raw stream_step): one engine ticking N chips over ICI, SURVEY.md §2.9's
"shard the stream batch across chips with pjit". The reference is strictly
single-device (nemo-server.cpp:192)."""

import jax
import numpy as np
import pytest

from helpers import tiny_model

from nemotron_tpu.api import ASRModel
from nemotron_tpu.parallel.mesh import make_mesh
from nemotron_tpu.streaming.engine import BatchedEngine

CHUNK = 1600


def cpu_devices(n):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} cpu devices, have {len(devs)}")
    return devs[:n]


def make_audio(n, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    f = 200 + 50 * (seed % 5)
    sig = 0.4 * np.sin(2 * np.pi * f * t) + 0.2 * rng.standard_normal(n)
    return (np.clip(sig, -1, 1) * 32767).astype(np.int16)


def build_model(seed=0):
    hp, params = tiny_model(seed=seed)
    vocab = [("▁w%d" % i) if i % 2 == 0 else ("p%d" % i)
             for i in range(hp.vocab_size - 1)]
    return ASRModel(hp, params, vocab)


def make_schedule(audios, joins=None, pauses=None):
    """Per-round actions: (key, 'start'), (key, pcm array), or (key, 'end').
    `joins[k]` delays k's start to that round; `pauses[k]` is a set of rounds
    where k pushes nothing (its slot goes inactive -> masked ticks)."""
    joins = joins or {}
    pauses = pauses or {}
    offs = {k: 0 for k in audios}
    started, ended = set(), set()
    rounds, r = [], 0
    while len(ended) < len(audios):
        acts = []
        for k, a in audios.items():
            if r < joins.get(k, 0) or k in ended:
                continue
            if k not in started:
                acts.append((k, "start"))
                started.add(k)
            if r in pauses.get(k, ()):
                continue
            if offs[k] < len(a):
                acts.append((k, a[offs[k] : offs[k] + CHUNK]))
                offs[k] += CHUNK
            else:
                acts.append((k, "end"))
                ended.add(k)
        rounds.append(acts)
        r += 1
        assert r < 500, "schedule did not converge"
    return rounds


def drive(model, rounds, batch=8):
    engine = BatchedEngine(model, batch_per_group=batch)
    sid, texts, finals = {}, {}, {}
    key_of = {}
    for acts in rounds:
        for k, act in acts:
            if isinstance(act, str) and act == "start":
                sid[k] = engine.start_stream(0)
                key_of[sid[k]] = k
                texts[k] = ""
            elif isinstance(act, str):
                engine.end_stream(sid[k])
            else:
                engine.push_audio(sid[k], act)
        for e in engine.tick()[0]:
            texts[key_of[e.stream_id]] += e.text
            if e.kind == "ended":
                finals[key_of[e.stream_id]] = True
    for _ in range(100):
        ev, more = engine.tick()
        for e in ev:
            texts[key_of[e.stream_id]] += e.text
            if e.kind == "ended":
                finals[key_of[e.stream_id]] = True
        if len(finals) == len(texts) and not more:
            break
    assert len(finals) == len(texts), "streams did not all finalize"
    return texts


@pytest.mark.parametrize("n_dp,n_tp", [(4, 1), (4, 2)])
def test_mesh_engine_matches_plain(n_dp, n_tp):
    audios = {i: make_audio(8000 + 1600 * i, seed=20 + i) for i in range(3)}
    # staggered join + a pause window: exercises masked fast ticks, the
    # realign-on-resume path, and the wrap compaction under sharding
    joins = {2: 2}
    pauses = {1: {3, 4}}
    rounds = make_schedule(audios, joins, pauses)

    want = drive(build_model(seed=3), rounds)

    mesh = make_mesh(n_dp, n_tp, devices=cpu_devices(n_dp * n_tp))
    model = build_model(seed=3).shard(mesh)
    got = drive(model, rounds)

    assert got == want


def test_put_batch_and_state_are_dp_sharded():
    mesh = make_mesh(4, 1, devices=cpu_devices(4))
    model = build_model(seed=0).shard(mesh)
    x = model.put_batch(np.zeros((8, 5), np.int16))
    assert x.sharding.spec == jax.sharding.PartitionSpec("dp", None)
    state = model.init_stream_state(8, model.cache_config(0))
    # caches are [L, B, ...]: batch axis (1) sharded
    assert state.k_cache.sharding.spec[1] == "dp"
    with pytest.raises(ValueError):
        model.init_stream_state(6, model.cache_config(0))
