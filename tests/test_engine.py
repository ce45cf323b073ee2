"""Batched engine correctness: N concurrent streams stepped together must be
token-identical to N independent single-stream sessions, across staggered
joins, different languages... and slot reuse."""

import numpy as np

from helpers import tiny_cfg, tiny_model

from nemotron_tpu.api import ASRModel
from nemotron_tpu.streaming.engine import BatchedEngine
from nemotron_tpu.streaming.session import StreamSession


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
    return ASRModel(hp, params, vocab), hp


def run_engine_to_end(engine, ids):
    finals = {}
    for _ in range(200):
        events, more = engine.tick()
        for e in events:
            if e.kind == "ended":
                finals[e.stream_id] = e.text
        if all(i in finals for i in ids) and not more:
            break
    return finals


def test_engine_matches_sessions():
    model, hp = build_model()
    audios = {i: make_audio(9600, seed=i) for i in range(3)}

    # golden: independent sessions
    want = {}
    for i, audio in audios.items():
        s = StreamSession(model, 0)
        s.process_incremental(audio)
        s.finalize()
        want[i] = (s.get_tokens(), s.get_transcript())

    engine2 = BatchedEngine(model, batch_per_group=4)
    texts = {i: "" for i in audios}
    sids = {engine2.start_stream(0): i for i in audios}
    for off in range(0, 9600, 1600):
        for sid, i in sids.items():
            engine2.push_audio(sid, audios[i][off : off + 1600])
        ev, _ = engine2.tick()
        for e in ev:
            texts[sids[e.stream_id]] += e.text
    for sid in sids:
        engine2.end_stream(sid)
    for _ in range(50):
        ev, more = engine2.tick()
        for e in ev:
            texts[sids[e.stream_id]] += e.text
        if not more:
            break
    for i in audios:
        assert texts[i] == want[i][1], f"stream {i}"


def test_engine_staggered_join_and_slot_reuse():
    model, hp = build_model(seed=1)
    a0 = make_audio(6400, seed=10)
    a1 = make_audio(6400, seed=11)

    def solo(audio):
        s = StreamSession(model, 0)
        s.process_incremental(audio)
        s.finalize()
        return s.get_transcript()

    engine = BatchedEngine(model, batch_per_group=1)  # force slot reuse
    texts = {}

    sid0 = engine.start_stream(0)
    texts[sid0] = ""
    engine.push_audio(sid0, a0)
    engine.end_stream(sid0)
    for _ in range(60):
        ev, more = engine.tick()
        for e in ev:
            texts[e.stream_id] += e.text
        if not more:
            break

    # slot is now free; second stream reuses it and must start from clean state
    sid1 = engine.start_stream(0)
    texts[sid1] = ""
    engine.push_audio(sid1, a1)
    engine.end_stream(sid1)
    for _ in range(60):
        ev, more = engine.tick()
        for e in ev:
            texts[e.stream_id] += e.text
        if not more:
            break

    assert texts[sid0] == solo(a0)
    assert texts[sid1] == solo(a1)


def test_engine_drop_stream_frees_slot():
    model, hp = build_model(seed=2)
    engine = BatchedEngine(model, batch_per_group=1)
    sid = engine.start_stream(0)
    engine.push_audio(sid, make_audio(3200, seed=12))
    engine.tick()
    engine.drop_stream(sid)
    # the release is applied by the TICK thread (drop_stream may be called
    # from the event loop while a tick is staging self.slots — an immediate
    # release would None a slot under the tick's feet); one tick later the
    # slot is free again
    engine.tick()
    sid2 = engine.start_stream(0)
    assert sid2 != sid


def test_engine_all_active_then_starve():
    """A full group runs all-active (fast phased path) for several ticks, then
    one stream starves mid-phase-cycle -> the engine must compact the live
    window (phase-aware), not the buffer tail. Regression: the old compaction
    copied [s-lc, s) regardless of phase, installing stale K/V for every
    stream in the group (encoder error jumped ~1e-6 -> ~1.8)."""
    model, hp = build_model(seed=4)
    a0 = make_audio(19200, seed=30)  # 1.2 s
    a1 = make_audio(8000, seed=31)   # 0.5 s: exhausts first -> starves

    def solo(audio):
        s = StreamSession(model, 0)
        s.process_incremental(audio)
        s.finalize()
        return s.get_transcript()

    engine = BatchedEngine(model, batch_per_group=2)  # full group
    sid0 = engine.start_stream(0)
    sid1 = engine.start_stream(0)
    texts = {sid0: "", sid1: ""}
    # equal pacing while both have audio (all-active ticks advance the phase),
    # then a0 continues alone (gated ticks)
    for off in range(0, 19200, 1600):
        engine.push_audio(sid0, a0[off : off + 1600])
        if off < 8000:
            engine.push_audio(sid1, a1[off : off + 1600])
        ev, _ = engine.tick()
        for e in ev:
            texts[e.stream_id] += e.text
    engine.end_stream(sid0)
    engine.end_stream(sid1)
    for _ in range(60):
        ev, more = engine.tick()
        for e in ev:
            texts[e.stream_id] += e.text
        if not more:
            break
    assert texts[sid0] == solo(a0)
    assert texts[sid1] == solo(a1)


def test_engine_finalize_with_valid_tail_rc1():
    """Finalize with a tail chunk that yields nv>0 (possible at rc>=1) must
    emit exactly one 'ended' and not crash. Regression: the slot re-entered
    the ending branch the tick after the finalize chunk was dispatched and
    was double-released (AttributeError on slots[i].stream_id)."""
    model, hp = build_model(seed=5)
    audio = make_audio(7000, seed=40)  # leaves >=8 real mel frames at the end

    s = StreamSession(model, 1)
    s.process_incremental(audio)
    s.finalize()
    want = s.get_transcript()

    engine = BatchedEngine(model, batch_per_group=2)
    sid = engine.start_stream(right_context=1)
    engine.push_audio(sid, audio)
    engine.end_stream(sid)
    text = ""
    ended = 0
    for _ in range(60):
        ev, more = engine.tick()
        for e in ev:
            text += e.text
            if e.kind == "ended":
                ended += 1
        if not more:
            break
    assert ended == 1
    assert text == want


def test_engine_slot_reuse_discards_inflight_tokens():
    """Tokens dispatched for stream A must not be attributed to stream B if B
    reclaims A's slot between dispatch and readback (pending entries record
    the stream id at dispatch time)."""
    model, hp = build_model(seed=6)
    engine = BatchedEngine(model, batch_per_group=1)
    sid_a = engine.start_stream(0)
    engine.push_audio(sid_a, make_audio(6400, seed=50))
    engine.tick()  # dispatch mel
    engine.tick()  # dispatch step; tokens now in flight
    engine.drop_stream(sid_a)
    engine.tick()  # applies the queued release (tick thread owns slots)
    sid_b = engine.start_stream(0)
    ev, _ = engine.tick()  # reads back A's tokens -> must be discarded
    assert all(e.stream_id != sid_b for e in ev)
    assert engine.transcript(sid_b) == ""
    # B still works end-to-end afterwards
    audio_b = make_audio(6400, seed=51)
    s = StreamSession(model, 0)
    s.process_incremental(audio_b)
    s.finalize()
    engine.push_audio(sid_b, audio_b)
    engine.end_stream(sid_b)
    text = ""
    for _ in range(60):
        ev, more = engine.tick()
        text += "".join(e.text for e in ev if e.stream_id == sid_b)
        if not more:
            break
    assert text == s.get_transcript()


def test_engine_mixed_latency_groups():
    """Streams with different right_context live in separate groups and both
    produce correct transcripts."""
    model, hp = build_model(seed=3)
    a0 = make_audio(8000, seed=20)
    a1 = make_audio(8000, seed=21)

    def solo(audio, rc):
        s = StreamSession(model, rc)
        s.process_incremental(audio)
        s.finalize()
        return s.get_transcript()

    engine = BatchedEngine(model, batch_per_group=2)
    sid0 = engine.start_stream(right_context=0)
    sid1 = engine.start_stream(right_context=1)
    assert set(engine.groups.keys()) == {0, 1}
    texts = {sid0: "", sid1: ""}
    for off in range(0, 8000, 1600):
        engine.push_audio(sid0, a0[off : off + 1600])
        engine.push_audio(sid1, a1[off : off + 1600])
        ev, _ = engine.tick()
        for e in ev:
            texts[e.stream_id] += e.text
    engine.end_stream(sid0)
    engine.end_stream(sid1)
    for _ in range(50):
        ev, more = engine.tick()
        for e in ev:
            texts[e.stream_id] += e.text
        if not more:
            break
    assert texts[sid0] == solo(a0, 0)
    assert texts[sid1] == solo(a1, 1)


def test_engine_phase_timers(monkeypatch):
    """NEMOTRON_TPU_PHASE_TIMERS=1: the tick runs as two timed device programs
    and stats report the encoder/decoder split (nemo-stream.h:237-244 parity)
    with identical tokens."""
    import nemotron_tpu.streaming.engine as eng

    model, hp = build_model(seed=7)
    audio = make_audio(6400, seed=70)

    s = StreamSession(model, 0)
    s.process_incremental(audio)
    s.finalize()

    monkeypatch.setattr(eng, "PHASE_TIMERS", True)
    engine = BatchedEngine(model, batch_per_group=2)
    sid = engine.start_stream(0)
    engine.push_audio(sid, audio)
    engine.end_stream(sid)
    text = ""
    for _ in range(60):
        ev, more = engine.tick()
        text += "".join(e.text for e in ev)
        if not more:
            break
    assert text == s.get_transcript()
    g = engine.groups[0]
    assert g.total_encoder_seconds > 0
    assert g.total_decoder_seconds > 0
    stats = engine.stats()
    assert "encoder_seconds" in stats["groups"][0]


def test_engine_end_on_chunk_boundary_keeps_final_text():
    """A stream whose audio is an exact multiple of shift_samples has no
    finalize chunk: its 'ended' event must ride the readback FIFO behind the
    last steady chunk's tokens (a direct 'ended' used to release the slot
    while the final text was still in flight, dropping it)."""
    model, hp = build_model()
    cfg = model.cache_config(0)
    # exact multiple of the per-chunk consumption, plus the priming samples
    from nemotron_tpu.streaming.engine import PRIME_SAMPLES

    n = PRIME_SAMPLES + 6 * cfg.shift_samples
    audio = make_audio(n, seed=3)

    want_session = StreamSession(model, 0)
    want_session.process_incremental(audio)
    want = want_session.transcript  # no finalize: steady chunks only

    engine = BatchedEngine(model, batch_per_group=2)
    sid = engine.start_stream(0)
    engine.push_audio(sid, audio)
    engine.end_stream(sid)

    events = []
    for _ in range(100):
        ev, more = engine.tick()
        events.extend(ev)
        if not more and any(e.kind == "ended" for e in events):
            break
    kinds = [e.kind for e in events]
    assert "ended" in kinds
    # every text event precedes the ended event
    assert kinds.index("ended") == len(kinds) - 1
    got = "".join(e.text for e in events)
    assert got == want


def test_engine_backlog_multichunk_matches_sessions():
    """With every slot occupied and deeply backlogged, the engine dispatches
    multi-chunk ticks (MAX_TICK_CHUNKS); transcripts must stay identical to
    independent single-stream sessions."""
    import nemotron_tpu.streaming.engine as eng

    assert eng.MAX_TICK_CHUNKS > 1  # default 4; env can disable
    model, hp = build_model()
    audios = {i: make_audio(16000, seed=20 + i) for i in range(2)}

    want = {}
    for i, audio in audios.items():
        s = StreamSession(model, 0)
        s.process_incremental(audio)
        s.finalize()
        want[i] = s.transcript

    engine = BatchedEngine(model, batch_per_group=2)  # both slots occupied
    sids = {}
    for i, audio in audios.items():
        sid = engine.start_stream(0)
        sids[i] = sid
        engine.push_audio(sid, audio)  # entire second of audio at once
        engine.end_stream(sid)

    texts = {sid: "" for sid in sids.values()}
    done = set()
    for _ in range(200):
        events, more = engine.tick()
        for e in events:
            texts[e.stream_id] += e.text
            if e.kind == "ended":
                done.add(e.stream_id)
        if len(done) == len(sids) and not more:
            break
    multi = engine.groups[0].total_chunks > engine.groups[0].total_steps * 1.5
    assert multi, "backlog did not engage multi-chunk ticks"
    for i, sid in sids.items():
        assert texts[sid] == want[i], f"stream {i}: {texts[sid]!r} != {want[i]!r}"


def test_scan_multichunk_matches_sequential_ticks():
    """The chunk-loop (lax.scan) k-chunk program must be numerically
    identical to k sequential single ticks, including a mid-cycle start
    (phase=n_phases-k) where the slack-buffer wrap lands after the last
    chunk and compaction runs post-scan."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from nemotron_tpu.models import asr as asr_mod
    from nemotron_tpu.models.encoder import compact_cache

    model, hp = build_model()
    cfg = model.cache_config(0)
    B, shift = 2, cfg.shift_samples
    n_valid = jnp.full((B,), cfg.valid_out_len, jnp.int32)
    rng = np.random.default_rng(0)

    for k, phase0 in [(4, 0), (4, cfg.n_phases - 4), (cfg.n_phases, 0)]:
        audio = (rng.standard_normal((B, k * shift)) * 3000).astype(np.int16)
        state0 = model.init_stream_state(B, cfg)

        seq_state, p = state0, phase0
        toks_seq = []
        for i in range(k):
            seq_state, t = asr_mod.fused_serve_tick(
                model.params, seq_state,
                jnp.asarray(audio[:, i * shift : (i + 1) * shift]),
                n_valid, None, None, hp=hp, cfg=cfg, phase=p)
            toks_seq.append(np.asarray(t))
            p += 1
            if p == cfg.n_phases:
                k2, v2 = compact_cache(cfg, hp, seq_state.k_cache,
                                       seq_state.v_cache)
                seq_state = dataclasses.replace(seq_state, k_cache=k2,
                                                v_cache=v2)
                p = 0

        scan_state, toks = asr_mod.fused_serve_tick_scan(
            model.params, model.init_stream_state(B, cfg),
            jnp.asarray(audio), n_valid, None, hp=hp, cfg=cfg, k=k,
            phase=phase0)

        np.testing.assert_array_equal(
            np.asarray(toks), np.concatenate(toks_seq, axis=1),
            err_msg=f"tokens diverge at k={k} phase0={phase0}")
        for a, b in zip(jax.tree.leaves(scan_state),
                        jax.tree.leaves(seq_state)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=1e-5)


def test_engine_new_group_during_tick_iteration():
    """start_stream (event-loop thread) may insert a new latency group while
    the engine thread iterates groups in tick(); iterating the live dict
    raises RuntimeError and kills the engine thread. Reproduced here
    single-threaded: a group's tick triggers a first-seen right_context."""
    model, hp = build_model()
    engine = BatchedEngine(model, batch_per_group=2)
    sid = engine.start_stream(0)
    engine.push_audio(sid, make_audio(4000, seed=1))

    group = engine.groups[0]
    orig_tick = group.tick
    injected = []

    def tick_and_join():
        if not injected:
            injected.append(engine.start_stream(right_context=1))
        return orig_tick()

    group.tick = tick_and_join
    events, more = engine.tick()  # raised RuntimeError before the snapshot fix
    assert injected and 1 in engine.groups


def test_engine_max_safe_tick_chunks_cap(monkeypatch):
    """Scan mode (default): no batch clamp, k clamped to the largest divisor
    of n_phases. Legacy unrolled mode: the k-chunk program OOMs at compile
    time for k=4 at B>=512 (16.4 GB), so the depth is capped by batch."""
    import nemotron_tpu.streaming.engine as eng

    assert eng.MAX_TICK_CHUNKS == 8  # default under test
    assert eng.max_safe_tick_chunks(768, n_phases=8) == 8
    assert eng.max_safe_tick_chunks(64, n_phases=8) == 8
    assert eng.max_safe_tick_chunks(768, n_phases=6) == 6
    assert eng.max_safe_tick_chunks(768, n_phases=5) == 5

    monkeypatch.setenv("NEMOTRON_TPU_MULTI_SCAN", "0")
    assert eng.max_safe_tick_chunks(64) == 8
    assert eng.max_safe_tick_chunks(256) == 4
    assert eng.max_safe_tick_chunks(512) == 2
    assert eng.max_safe_tick_chunks(768) == 2
    assert eng.max_safe_tick_chunks(1024) == 2


def test_engine_backlog_respects_batch_cap(monkeypatch):
    """A fully-backlogged group must dispatch at most max_safe_tick_chunks(B)
    chunks per step, not MAX_TICK_CHUNKS. (Simulates the legacy B>=512 clamp
    on a tiny batch by forcing the cap to 2.)"""
    import nemotron_tpu.streaming.engine as eng

    monkeypatch.setattr(eng, "max_safe_tick_chunks", lambda b, n_phases=8: 2)
    model, hp = build_model()
    audios = {i: make_audio(16000, seed=40 + i) for i in range(2)}

    want = {}
    for i, audio in audios.items():
        s = StreamSession(model, 0)
        s.process_incremental(audio)
        s.finalize()
        want[i] = s.transcript

    engine = BatchedEngine(model, batch_per_group=2)
    sids = {}
    for i, audio in audios.items():
        sid = engine.start_stream(0)
        sids[i] = sid
        engine.push_audio(sid, audio)
        engine.end_stream(sid)

    texts = {sid: "" for sid in sids.values()}
    done = set()
    group = engine.groups[0]
    max_k = 0
    prev_chunks = prev_steps = 0
    for _ in range(300):
        events, more = engine.tick()
        if group.total_steps > prev_steps:
            max_k = max(max_k,
                        (group.total_chunks - prev_chunks)
                        // (group.total_steps - prev_steps) // 2)
            prev_chunks, prev_steps = group.total_chunks, group.total_steps
        for e in events:
            texts[e.stream_id] += e.text
            if e.kind == "ended":
                done.add(e.stream_id)
        if len(done) == len(sids) and not more:
            break
    assert max_k <= 2, f"dispatched k={max_k} > capped 2"
    assert max_k == 2, "backlog never engaged the capped micro-batching"
    for i, sid in sids.items():
        assert texts[sid] == want[i]


def test_engine_prewarm_then_serve():
    """prewarm() compiles every tick variant on garbage state; streams
    claimed afterwards must still be token-identical to sessions (slot
    resets + phase bookkeeping must fully erase the prewarm)."""
    model, hp = build_model()
    engine = BatchedEngine(model, batch_per_group=2)
    engine.prewarm(right_contexts=(0,))

    audio = make_audio(8000, seed=9)
    s = StreamSession(model, 0)
    s.process_incremental(audio)
    s.finalize()
    want = s.transcript

    sid = engine.start_stream(0)
    engine.push_audio(sid, audio)
    engine.end_stream(sid)
    texts = ""
    done = False
    for _ in range(200):
        events, more = engine.tick()
        for e in events:
            texts += e.text
            if e.kind == "ended":
                done = True
        if done and not more:
            break
    assert done
    assert texts == want
