"""End-to-end streaming session test: PCM in -> delta text out, token-exact
against the full golden pipeline (numpy preprocessor + numpy streaming encoder
+ numpy greedy decode), including irregular push sizes and the finalize tail
flush. This is the TPU analogue of test_streaming.cpp:732-860 but with exact
token comparison."""

import numpy as np

from helpers import tiny_cfg, tiny_model
from ref import numpy_ref as R

from nemotron_tpu.api import ASRModel
from nemotron_tpu.streaming.session import StreamSession


def make_audio(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    sig = 0.4 * np.sin(2 * np.pi * 330 * t) + 0.2 * rng.standard_normal(n)
    return (np.clip(sig, -1, 1) * 32767).astype(np.int16)


def golden_stream(audio, np_model, hp, cfg, pushes):
    """Replicates nemo_stream_process_incremental + finalize in numpy."""
    pp = R.PreprocessorRef(
        np.asarray(np_model["preproc_fb"]), np.asarray(np_model["preproc_win"])
    )
    enc = R.StreamingEncoderRef(np_model, hp, cfg)
    mel_buffer = np.zeros((cfg.pre_encode_cache_size, hp.n_mels), np.float32)
    h = np.zeros((2, hp.decoder_dim), np.float32)
    c = np.zeros((2, hp.decoder_dim), np.float32)
    prev = hp.blank_id
    tokens = []
    i = 0
    for n in pushes:
        mel = pp.process(audio[i : i + n])
        i += n
        if mel.size:
            mel_buffer = np.concatenate([mel_buffer, mel], axis=0)
        while mel_buffer.shape[0] >= cfg.chunk_mel_frames:
            enc_out = enc.step(mel_buffer[: cfg.chunk_mel_frames])
            toks, _f, h, c, prev = R.greedy_decode(
                enc_out, np_model["decoder"], np_model["joint"], hp.blank_id,
                h=h, c=c, prev_token=prev)
            tokens.extend(toks)
            mel_buffer = mel_buffer[cfg.shift_mel_frames :]
    # finalize
    total = mel_buffer.shape[0]
    if total > cfg.pre_encode_cache_size:
        n_valid = (total - cfg.pre_encode_cache_size) // cfg.subsampling_factor
        if n_valid > 0:
            chunk = np.zeros((cfg.chunk_mel_frames, hp.n_mels), np.float32)
            chunk[:total] = mel_buffer[: cfg.chunk_mel_frames]
            enc_out = enc.step(chunk, valid_out_override=n_valid)
            toks, _f, h, c, prev = R.greedy_decode(
                enc_out, np_model["decoder"], np_model["joint"], hp.blank_id,
                h=h, c=c, prev_token=prev)
            tokens.extend(toks)
    return tokens


def build_model(seed=0, right=0):
    hp, params = tiny_model(seed=seed)
    cfg = tiny_cfg(hp, right_context=right)
    np_model = R.model_to_numpy(params, hp)
    np_model["preproc_fb"] = np.asarray(params.preproc.filterbank)
    np_model["preproc_win"] = np.asarray(params.preproc.window)
    vocab = [("▁w%d" % i) if i % 2 == 0 else ("p%d" % i)
             for i in range(hp.vocab_size - 1)]
    model = ASRModel(hp, params, vocab)
    return model, np_model, hp, cfg


def test_session_token_exact_e2e():
    model, np_model, hp, cfg = build_model()
    audio = make_audio(16000, seed=11)
    pushes = [1280] * (len(audio) // 1280)

    sess = StreamSession(model, cfg)
    deltas = []
    i = 0
    for n in pushes:
        deltas.append(sess.process_incremental(audio[i : i + n]))
        i += n
    deltas.append(sess.finalize())

    want_tokens = golden_stream(audio, np_model, hp, cfg, pushes)
    assert sess.get_tokens() == want_tokens
    # delta concatenation == transcript == decoded tokens
    assert "".join(deltas) == sess.get_transcript()
    assert sess.get_transcript() == model.tokenizer.decode(want_tokens)


def test_session_irregular_pushes_match_regular():
    model, np_model, hp, cfg = build_model(seed=1)
    audio = make_audio(12000, seed=12)

    s1 = StreamSession(model, cfg)
    s1.process_incremental(audio)
    s1.finalize()

    s2 = StreamSession(model, cfg)
    rng = np.random.default_rng(5)
    i = 0
    while i < len(audio):
        n = int(rng.integers(37, 3000))
        s2.process_incremental(audio[i : i + n])
        i += n
    s2.finalize()

    assert s1.get_tokens() == s2.get_tokens()
    assert s1.get_transcript() == s2.get_transcript()


def test_session_reset():
    model, np_model, hp, cfg = build_model(seed=2)
    audio = make_audio(8000, seed=13)
    sess = StreamSession(model, cfg)
    sess.process_incremental(audio)
    t1 = sess.get_tokens()
    sess.finalize()
    sess.reset()
    assert sess.get_transcript() == ""
    sess.process_incremental(audio)
    assert sess.get_tokens() == t1  # deterministic replay after reset


def test_batch_transcribe_matches_golden():
    """Offline path: mel -> batch encoder -> greedy, vs numpy golden."""
    model, np_model, hp, cfg = build_model(seed=3)
    audio = make_audio(9600, seed=14)
    from nemotron_tpu.audio.frontend import mel_full

    mel = mel_full(audio, np_model["preproc_fb"], np_model["preproc_win"])
    token_ids, frames = model.transcribe_mel(mel)

    enc = R.encoder_batch(mel, np_model, hp)
    want_tokens, want_frames, *_ = R.greedy_decode(
        enc, np_model["decoder"], np_model["joint"], hp.blank_id
    )
    assert token_ids == want_tokens
    assert frames == want_frames


def test_batch_bucketing_invariance():
    """Padded/bucketed batch encode must equal exact-length results."""
    model, np_model, hp, cfg = build_model(seed=4)
    audio = make_audio(7000, seed=15)
    from nemotron_tpu.audio.frontend import mel_full

    mel = mel_full(audio, np_model["preproc_fb"], np_model["preproc_win"])
    ids1, _ = model.transcribe_mel(mel)
    # shrink bucket so padding takes a different code path
    import nemotron_tpu.api as api

    old = api.MEL_BUCKET
    try:
        api.MEL_BUCKET = 64
        model2, *_ = (model, None)
        ids2, _ = model.transcribe_mel(mel)
    finally:
        api.MEL_BUCKET = old
    assert ids1 == ids2


def test_session_checkpoint_resume(tmp_path):
    """Save mid-stream, resume in a fresh session, outputs must be identical
    to an uninterrupted run (capability the reference lacks: SURVEY §5.4)."""
    model, np_model, hp, cfg = build_model(seed=5)
    audio = make_audio(16000, seed=21)

    ref = StreamSession(model, cfg)
    ref.process_incremental(audio)
    ref.finalize()

    s1 = StreamSession(model, cfg)
    s1.process_incremental(audio[:7000])
    path = str(tmp_path / "stream_state.npz")
    s1.save_state(path)

    s2 = StreamSession(model, cfg)
    s2.restore_state(path)
    s2.process_incremental(audio[7000:])
    s2.finalize()

    assert s2.get_tokens() == ref.get_tokens()
    assert s2.get_transcript() == ref.get_transcript()
    assert s2.rtf() > 0.0


def test_multilingual_language_switch_mid_stream():
    """Per-chunk prompt switching (reference: nemo-stream.cpp:236-242 one-hot
    refilled per chunk). Changing the language must change decoding output
    from the next chunk on, and resolve_language must follow the prompt dict."""
    from helpers import tiny_hparams
    from nemotron_tpu.params import random_params

    hp = tiny_hparams(num_prompts=4)
    params = random_params(hp, seed=6)
    vocab = [("▁w%d" % i) if i % 2 == 0 else ("p%d" % i)
             for i in range(hp.vocab_size - 1)]
    model = ASRModel(hp, params, vocab,
                     prompt_dict={"en-US": 0, "ru-RU": 2, "auto": 3})
    model.default_prompt_index = 3
    audio = make_audio(9600, seed=31)

    s_en = StreamSession(model, 0, lang="en-US")
    s_ru = StreamSession(model, 0, lang="ru-RU")
    t_en = s_en.process_incremental(audio) + s_en.finalize()
    t_ru = s_ru.process_incremental(audio) + s_ru.finalize()
    assert t_en != t_ru  # prompt index must affect the output

    # switching mid-stream takes effect on subsequent chunks
    s_sw = StreamSession(model, 0, lang="en-US")
    s_sw.process_incremental(audio[:4800])
    assert s_sw.set_language("ru-RU")
    s_sw.process_incremental(audio[4800:])
    s_sw.finalize()

    # unknown code rejected, monolingual models reject everything
    assert not s_sw.set_language("xx-XX")
    mono = ASRModel(tiny_hparams(), random_params(tiny_hparams(), seed=1), vocab)
    assert mono.resolve_language("en-US") is None


def test_session_timestamp_words():
    """--timestamps parity: {%.2f} after each word start, 80 ms frame units
    (reference: tokens_to_text, nemo-ggml.cpp:1556-1583)."""
    import re

    model, np_model, hp, cfg = build_model(seed=4)
    audio = make_audio(12800, seed=44)

    plain = StreamSession(model, cfg)
    plain.process_incremental(audio)
    plain.finalize()

    timed = StreamSession(model, cfg, timestamp_words=True)
    timed.process_incremental(audio)
    timed.finalize()

    stamped = timed.get_transcript()
    if not plain.get_transcript():
        assert stamped == ""
        return
    # stripping the {t} stamps recovers the plain transcript
    assert re.sub(r"\{\d+\.\d\d\}", "", stamped) == plain.get_transcript()
    # stamps are frame_idx * 0.08 s for each word-start token
    want = [fr * 1280 / 16000
            for tid, fr in zip(timed.tokens, timed.token_frames)
            if model.tokenizer.piece(tid).startswith("▁")]
    got = [float(m) for m in re.findall(r"\{(\d+\.\d\d)\}", stamped)]
    assert got == [float(f"{w:.2f}") for w in want]


def test_transcribe_audios_batched_matches_per_file():
    """Batched multi-utterance offline transcription (one padded device
    program per segment, ragged lengths via the key mask) must equal the
    per-file path exactly — including files long enough to segment at the
    pos-table cap with decoder-state carry."""
    model, np_model, hp, cfg = build_model(seed=5)
    # max_pos_len=64 -> segment cap ~512 mel frames ~ 82k samples; the long
    # file exceeds it so the batched path also exercises the segment carry
    audios = [
        make_audio(7000, seed=21),
        make_audio(96000, seed=22),
        make_audio(12800, seed=23),
    ]
    want = [model.transcribe_audio(a, timestamp_words=True) for a in audios]
    got = model.transcribe_audios(audios, timestamp_words=True)
    assert got == want
