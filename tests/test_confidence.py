"""Per-token confidence (beyond reference, NEMOTRON_TPU_CONFIDENCE=1):
each emitted token carries a 7-bit quantized softmax probability packed into
the same int32 emission tensor (no extra device fetch). Transcripts must be
bit-identical to the flag-off path; confidences surface through the session
(token_confs / timed_words_conf), engine events, and diarize word JSONL."""

import json

import numpy as np
import pytest

from helpers import tiny_model

from nemotron_tpu.api import ASRModel
from nemotron_tpu.streaming.engine import BatchedEngine
from nemotron_tpu.streaming.session import StreamSession


def make_audio(n, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 260 * t) + 0.2 * rng.standard_normal(n)
    return (np.clip(sig, -1, 1) * 32767).astype(np.int16)


def build_model():
    hp, params = tiny_model(seed=0)
    vocab = [("▁w%d" % i) if i % 2 == 0 else ("p%d" % i)
             for i in range(hp.vocab_size - 1)]
    return ASRModel(hp, params, vocab)


def test_session_confidence_identical_transcript(monkeypatch):
    audio = make_audio(12800, seed=1)

    model = build_model()
    s0 = StreamSession(model, 0)
    s0.process_incremental(audio)
    s0.finalize()
    want_tokens, want_text = s0.get_tokens(), s0.get_transcript()
    assert want_tokens, "test audio produced no tokens"

    monkeypatch.setenv("NEMOTRON_TPU_CONFIDENCE", "1")
    model2 = build_model()  # fresh jits trace under the flag
    s1 = StreamSession(model2, 0)
    s1.process_incremental(audio)
    s1.finalize()

    assert s1.get_tokens() == want_tokens
    assert s1.get_transcript() == want_text
    assert len(s1.token_confs) == len(s1.get_tokens())
    assert all(0.0 <= c <= 1.0 for c in s1.token_confs)
    # argmax probability over V classes is at least 1/V
    assert all(c >= 1.0 / model2.hp.vocab_size - 1e-6
               for c in s1.token_confs)

    words_plain = s1.timed_words()
    words_conf = s1.timed_words_conf()
    assert [(w, t) for w, t, _ in words_conf] == words_plain
    assert all(0.0 <= c <= 1.0 for _, _, c in words_conf)


def test_timed_words_conf_requires_flag():
    model = build_model()
    s = StreamSession(model, 0)
    s.process_incremental(make_audio(6400, seed=2))
    s.finalize()
    if s.get_tokens():
        with pytest.raises(RuntimeError, match="confidence"):
            s.timed_words_conf()


def test_engine_events_carry_confidence(monkeypatch):
    monkeypatch.setenv("NEMOTRON_TPU_CONFIDENCE", "1")
    model = build_model()
    audio = make_audio(12800, seed=3)

    want = StreamSession(model, 0)
    want.process_incremental(audio)
    want.finalize()

    engine = BatchedEngine(model, batch_per_group=2)
    sid = engine.start_stream(0)
    engine.push_audio(sid, audio)
    engine.end_stream(sid)
    text = ""
    confs = []
    for _ in range(100):
        events, more = engine.tick()
        for e in events:
            text += e.text
            if e.text:
                confs.append(e.conf)
        if not more:
            break
    assert text == want.get_transcript()
    assert confs and all(0.0 <= c <= 1.0 for c in confs)


def test_offline_transcribe_unchanged_under_flag(monkeypatch):
    audio = make_audio(19200, seed=4)
    model = build_model()
    want = model.transcribe_audio(audio)

    monkeypatch.setenv("NEMOTRON_TPU_CONFIDENCE", "1")
    model2 = build_model()
    assert model2.transcribe_audio(audio) == want
    got = model2.transcribe_audios([audio, audio])
    assert got == [want, want]


def test_diarize_word_jsonl_conf_field():
    from nemotron_tpu.diarize.pipeline import DiarizePipeline

    p = DiarizePipeline.__new__(DiarizePipeline)  # word assembly only
    p.words, p.json_drained = [], 0
    p.word_pending, p.word_pending_at, p.word_pending_conf = "", 0.0, -1.0
    p.push_text(" hel", 1.0, conf=0.9)
    p.push_text("lo ", 1.2, conf=0.4)  # word conf = min over fragments
    p.push_text("world ", 1.5)         # no conf recorded for this word
    lines = [json.loads(x) for x in p.drain_json()]
    assert lines[0]["word"] == "hello" and lines[0]["conf"] == 0.4
    assert lines[1]["word"] == "world" and "conf" not in lines[1]
