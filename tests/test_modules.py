"""Module-by-module parity: JAX implementation vs the NumPy golden reference.

Mirrors the unit-test ladder of the reference's tests/test_compute.cpp
(linear -> layer_norm -> ffn -> rel_shift -> mha -> conv -> layer -> encoder ->
decoder -> joint -> greedy), with tolerances in the same regime the reference
reports (encoder max-abs ~5e-5, docs/STATUS.md:241-260).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import tiny_cfg, tiny_model, rand
from ref import numpy_ref as R

from nemotron_tpu.models.decoder import (
    greedy_decode,
    init_decode_state,
    joint_step,
)
from nemotron_tpu.models.encoder import (
    conformer_layer,
    encode_batch,
    pos_emb_slice,
)
from nemotron_tpu.ops.basic import ffn, layer_norm
from nemotron_tpu.ops.conv import conv_subsampling, depthwise_causal_conv1d
from nemotron_tpu.ops.lstm import lstm2_step
from nemotron_tpu.ops.rel_attention import rel_pos_mha, rel_shift_gather
from nemotron_tpu.params import layer_slice


HP, PARAMS = tiny_model(seed=0)
NP_MODEL = R.model_to_numpy(PARAMS, HP)


def mx(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def test_layer_norm():
    x = rand(3, 7, 64, seed=1)
    w, b = rand(64, seed=2), rand(64, seed=3)
    got = layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    want = R.layer_norm(x, w, b)
    assert mx(got, want) < 1e-5


def test_ffn():
    x = rand(2, 5, 64, seed=4)
    lp = NP_MODEL["layers"][0]
    got = ffn(jnp.asarray(x), jnp.asarray(lp["ffn1_w1"]), jnp.asarray(lp["ffn1_w2"]))
    want = np.stack([R.ffn(x[i], lp["ffn1_w1"], lp["ffn1_w2"]) for i in range(2)])
    assert mx(got, want) < 1e-5


def test_lstm2():
    dec = NP_MODEL["decoder"]
    x = rand(3, HP.decoder_dim, seed=5)
    h = rand(3, 2, HP.decoder_dim, seed=6, scale=0.5)
    c = rand(3, 2, HP.decoder_dim, seed=7, scale=0.5)
    out, h2, c2 = lstm2_step(PARAMS.decoder, jnp.asarray(x), jnp.asarray(h), jnp.asarray(c))
    for i in range(3):
        want_out, want_h, want_c = R.decoder_step(dec, x[i], h[i], c[i])
        assert mx(out[i], want_out) < 1e-5
        assert mx(h2[i], want_h) < 1e-5
        assert mx(c2[i], want_c) < 1e-5


@pytest.mark.parametrize("qlen,klen", [(4, 4), (1, 9), (3, 11), (7, 7)])
def test_rel_shift(qlen, klen):
    """The static-gather rel-shift must equal the C++ pad/reshape/slice trick."""
    raw = rand(qlen, 2 * klen - 1, seed=8)
    want = R.rel_shift(raw, klen)
    got = rel_shift_gather(jnp.asarray(raw)[None, None], klen)[0, 0]
    assert mx(got, want) < 1e-6


def test_mha_batch():
    lp_np = NP_MODEL["layers"][0]
    lp = layer_slice(PARAMS.layers, 0)
    T = 6
    x = rand(2, T, HP.d_model, seed=9)
    pe = np.asarray(R.pos_emb_slice(NP_MODEL["pos_emb"], 2 * T - 1))
    got = rel_pos_mha(
        jnp.asarray(x), jnp.asarray(pe),
        lp.attn_q_w, lp.attn_k_w, lp.attn_v_w, lp.attn_pos_w, lp.attn_out_w,
        lp.pos_bias_u, lp.pos_bias_v, HP.n_heads, HP.d_head,
    )
    for i in range(2):
        want = R.rel_pos_mha(x[i], pe, lp_np, HP.n_heads, HP.d_head)
        assert mx(got[i], want) < 2e-5


def test_mha_cached_with_mask():
    lp_np = NP_MODEL["layers"][0]
    lp = layer_slice(PARAMS.layers, 0)
    T, C = 3, HP.att_left_context
    x = rand(2, T, HP.d_model, seed=10)
    kc = rand(2, C, HP.d_model, seed=11, scale=0.5)
    vc = rand(2, C, HP.d_model, seed=12, scale=0.5)
    kv_len = C + T
    pe = np.asarray(R.pos_emb_slice(NP_MODEL["pos_emb"], 2 * kv_len - 1))
    # stream 0 has 2 valid cache frames, stream 1 has full cache
    masks = []
    for valid in (2, C):
        offset = C - valid
        masks.append(np.where(np.arange(kv_len) < offset, -1e9, 0.0))
    mask = np.stack(masks).astype(np.float32)
    got, k_out, v_out = rel_pos_mha(
        jnp.asarray(x), jnp.asarray(pe),
        lp.attn_q_w, lp.attn_k_w, lp.attn_v_w, lp.attn_pos_w, lp.attn_out_w,
        lp.pos_bias_u, lp.pos_bias_v, HP.n_heads, HP.d_head,
        k_cache=jnp.asarray(kc), v_cache=jnp.asarray(vc),
        attn_mask=jnp.asarray(mask), left_context=C,
    )
    for i in range(2):
        want, wk, wv = R.rel_pos_mha(
            x[i], pe, lp_np, HP.n_heads, HP.d_head,
            k_cache=kc[i], v_cache=vc[i], attn_mask=mask[i], left_context=C,
        )
        assert mx(got[i], want) < 2e-5
        assert mx(k_out[i], wk) < 1e-5
        assert mx(v_out[i], wv) < 1e-5


def test_depthwise_conv1d_cached():
    lp_np = NP_MODEL["layers"][0]
    dw = lp_np["conv_dw_w"]
    K = dw.shape[0]
    x = rand(2, 5, HP.d_model, seed=13)
    cache = rand(2, K - 1, HP.d_model, seed=14)
    got, new_cache = depthwise_causal_conv1d(
        jnp.asarray(x), jnp.asarray(dw), jnp.asarray(cache)
    )
    for i in range(2):
        want, want_cache = R.depthwise_causal_conv1d(x[i], dw, cache[i])
        assert mx(got[i], want) < 1e-5
        assert mx(new_cache[i], want_cache) < 1e-6


def test_conformer_layer_batch():
    lp_np = NP_MODEL["layers"][0]
    lp = layer_slice(PARAMS.layers, 0)
    T = 5
    x = rand(2, T, HP.d_model, seed=15)
    pe = np.asarray(R.pos_emb_slice(NP_MODEL["pos_emb"], 2 * T - 1))
    got = conformer_layer(jnp.asarray(x), jnp.asarray(pe), lp, HP)
    for i in range(2):
        want = R.conformer_layer(x[i], pe, lp_np, HP.n_heads, HP.d_head)
        assert mx(got[i], want) < 5e-5


def test_conformer_layer_cached():
    lp_np = NP_MODEL["layers"][0]
    lp = layer_slice(PARAMS.layers, 0)
    T, C, K = 3, HP.att_left_context, HP.kernel_size
    x = rand(1, T, HP.d_model, seed=16)
    kc = rand(1, C, HP.d_model, seed=17, scale=0.3)
    vc = rand(1, C, HP.d_model, seed=18, scale=0.3)
    cc = rand(1, K - 1, HP.d_model, seed=19, scale=0.3)
    kv_len = C + T
    pe = np.asarray(R.pos_emb_slice(NP_MODEL["pos_emb"], 2 * kv_len - 1))
    mask = np.zeros((1, kv_len), np.float32)
    got, gk, gv, gc = conformer_layer(
        jnp.asarray(x), jnp.asarray(pe), lp, HP,
        k_cache=jnp.asarray(kc), v_cache=jnp.asarray(vc), conv_cache=jnp.asarray(cc),
        attn_mask=jnp.asarray(mask), left_context=C,
    )
    want, wk, wv, wc = R.conformer_layer(
        x[0], pe, lp_np, HP.n_heads, HP.d_head,
        k_cache=kc[0], v_cache=vc[0], conv_cache=cc[0],
        attn_mask=mask[0], left_context=C,
    )
    assert mx(got[0], want) < 5e-5
    assert mx(gk[0], wk) < 1e-5
    assert mx(gv[0], wv) < 1e-5
    assert mx(gc[0], wc) < 1e-5


def test_conv_subsampling():
    T = 17
    mel = rand(2, T, HP.n_mels, seed=20)
    got = conv_subsampling(PARAMS.subsampling, jnp.asarray(mel))
    assert got.shape[1] == HP.subsampled_len(T)
    for i in range(2):
        want = R.conv_subsampling(mel[i], NP_MODEL["subsampling"])
        assert mx(got[i], want) < 2e-5


def test_encoder_batch():
    T = 24
    mel = rand(1, T, HP.n_mels, seed=21)
    got = encode_batch(PARAMS, HP, jnp.asarray(mel))
    want = R.encoder_batch(mel[0], NP_MODEL, HP)
    assert got.shape == (1, HP.subsampled_len(T), HP.d_model)
    assert mx(got[0], want) < 1e-4


def test_joint():
    enc = rand(3, HP.d_model, seed=22)
    dec = rand(3, HP.decoder_dim, seed=23)
    got = joint_step(PARAMS.joint, jnp.asarray(enc), jnp.asarray(dec))
    for i in range(3):
        want = R.joint(NP_MODEL["joint"], enc[i], dec[i])
        assert mx(got[i], want) < 1e-5


def test_greedy_decode_exact_tokens():
    """Token-for-token parity with the golden loop, including the
    'state advances only on non-blank' subtlety."""
    T = 12
    enc = rand(2, T, HP.d_model, seed=24, scale=2.0)
    state = init_decode_state(2, HP)
    new_state, tokens = greedy_decode(PARAMS, HP, jnp.asarray(enc), state)
    from nemotron_tpu.models.asr import tokens_to_list

    got = tokens_to_list(tokens)
    for i in range(2):
        want_tokens, want_frames, h, c, prev = R.greedy_decode(
            enc[i], NP_MODEL["decoder"], NP_MODEL["joint"], HP.blank_id
        )
        got_tokens = [tk for tk, _ in got[i]]
        got_frames = [fr for _, fr in got[i]]
        assert got_tokens == want_tokens
        assert got_frames == want_frames
        assert int(new_state.prev_token[i]) == prev
        assert mx(new_state.h[i], h) < 1e-4
        assert mx(new_state.c[i], c) < 1e-4
    assert int(new_state.frame_offset[0]) == T


def test_greedy_decode_respects_n_valid():
    T = 8
    enc = rand(1, T, HP.d_model, seed=25, scale=2.0)
    state = init_decode_state(1, HP)
    n_valid = jnp.asarray([3], dtype=jnp.int32)
    st2, tokens = greedy_decode(PARAMS, HP, jnp.asarray(enc), state, n_valid=n_valid)
    want_tokens, want_frames, h, c, prev = R.greedy_decode(
        enc[0, :3], NP_MODEL["decoder"], NP_MODEL["joint"], HP.blank_id
    )
    from nemotron_tpu.models.asr import tokens_to_list

    got = tokens_to_list(tokens)[0]
    assert [tk for tk, _ in got] == want_tokens
    assert np.all(np.asarray(tokens)[0, 3:] == -1)
    assert int(st2.frame_offset[0]) == 3
    assert int(st2.prev_token[0]) == prev


def test_prompt_fusion():
    hp2, params2 = tiny_model(seed=1, num_prompts=4)
    np2 = R.model_to_numpy(params2, hp2)
    T = 16
    mel = rand(1, T, hp2.n_mels, seed=26)
    onehot = np.zeros((1, 4), np.float32)
    onehot[0, 2] = 1.0
    got = encode_batch(params2, hp2, jnp.asarray(mel), prompt_onehot=jnp.asarray(onehot))
    base = R.encoder_batch(mel[0], np2, hp2)
    t_out = base.shape[0]
    oh_t = np.broadcast_to(onehot[0], (t_out, 4))
    want = R.prompt_fusion(base, oh_t, np2["prompt"])
    assert mx(got[0], want) < 1e-4


def test_detokenizer_timestamps_and_lang_markers():
    from nemotron_tpu.text.tokenizer import Tokenizer

    tok = Tokenizer(["▁hello", "wor", "ld", "▁<en-US>", "▁two"])
    assert tok.decode([0, 1, 2]) == " helloworld"
    # word timestamps: {%.2f} after each word start, frames * 1280/16000 s
    got = tok.decode([0, 1, 2, 4], timestamp_words=True,
                     frames=[0, 0, 0, 25])
    assert got == " {0.00}helloworld {2.00}two"
    # inline language markers pass through
    assert tok.decode([3]) == " <en-US>"
    # out-of-range ids are dropped
    assert tok.decode([99, 0]) == " hello"


@pytest.mark.parametrize("qlen,klen", [(40, 40), (33, 64), (64, 70)])
def test_rel_shift_large_qlen(qlen, klen):
    """The large-qlen reshape-trick path must also equal the golden trick."""
    raw = rand(2, qlen, 2 * klen - 1, seed=30)
    got = rel_shift_gather(jnp.asarray(raw), klen)
    for b in range(2):
        want = R.rel_shift(raw[b], klen)
        assert mx(got[b], want) < 1e-6


def test_pallas_t1_attention_core_parity():
    """Fused Pallas T=1 attention core == the XLA multiply-reduce path
    (interpret mode on CPU)."""
    import jax.numpy as jnp
    from nemotron_tpu.ops.attn_pallas import t1_attention_core
    from nemotron_tpu.ops import rel_attention as RA

    rng = np.random.default_rng(0)
    B, H, Dh, S = 4, 2, 8, 11
    q = rng.standard_normal((B, H, 1, Dh)).astype(np.float32)
    kn = rng.standard_normal((B, H, 1, Dh)).astype(np.float32)
    vn = rng.standard_normal((B, H, 1, Dh)).astype(np.float32)
    kb = rng.standard_normal((B, H, S, Dh)).astype(np.float32)
    vb = rng.standard_normal((B, H, S, Dh)).astype(np.float32)
    pos_sc = rng.standard_normal((B, H, 1, S + 1)).astype(np.float32)
    mask = np.where(rng.uniform(size=(B, S + 1)) < 0.2, -1e9, 0.0
                    ).astype(np.float32)
    scale = 1.0 / np.sqrt(Dh)

    # XLA reference path
    content = RA._t1_scores(jnp.asarray(q), jnp.asarray(kb), jnp.asarray(kn))
    scores = (content + pos_sc) * scale + mask[:, None, None, :]
    import jax.nn as jnn
    w = jnn.softmax(scores.astype(jnp.float32), axis=-1)
    want = RA._t1_context(w, jnp.asarray(vb), jnp.asarray(vn))

    pm = pos_sc[:, :, 0, :] * scale + mask[:, None, :]
    got = t1_attention_core(
        jnp.asarray(q[:, :, 0]), jnp.asarray(kn[:, :, 0]),
        jnp.asarray(vn[:, :, 0]), jnp.asarray(pm),
        jnp.asarray(kb), jnp.asarray(vb), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want[:, :, 0]),
                               atol=2e-5)


def test_pallas_t1_attention_in_stream_encoder(monkeypatch):
    """Full streaming encoder with the Pallas attention core == default."""
    from nemotron_tpu.models.encoder import stream_encode_step
    from nemotron_tpu.ops import rel_attention as RA
    from nemotron_tpu.streaming.state import init_stream_state

    from helpers import tiny_cfg

    CFG = tiny_cfg(HP)
    B = 2
    state = init_stream_state(B, HP, CFG)
    rng = np.random.default_rng(5)
    mel = rng.standard_normal(
        (B, CFG.chunk_mel_frames, HP.n_mels)).astype(np.float32)

    outs = {}
    for use_pallas in (False, True):
        monkeypatch.setattr(RA, "PALLAS_T1_ATTN", use_pallas)
        k, v, c, valid = (state.k_cache, state.v_cache, state.conv_cache,
                          state.cache_valid)
        e, k2, v2, c2, valid2 = stream_encode_step(
            PARAMS, HP, CFG, jnp.asarray(mel), k, v, c, valid, phase=1)
        outs[use_pallas] = (np.asarray(e), np.asarray(k2), np.asarray(v2))
    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_allclose(a, b, atol=5e-5)


def test_pallas_attn_block_in_stream_encoder(monkeypatch):
    """Full streaming encoder with the fused Pallas attention BLOCK
    (LN + QKV + T=1 attention + out-proj + residual in one kernel,
    ops/attn_block_pallas.py) == default fast path, on the same phased
    slack-buffer state."""
    from nemotron_tpu.models import encoder as ENC
    from nemotron_tpu.streaming.state import init_stream_state

    from helpers import tiny_cfg

    CFG = tiny_cfg(HP)
    B = 4

    outs = {}
    for use_block in (False, True):
        monkeypatch.setattr(ENC, "PALLAS_ATTN_BLOCK", use_block)
        state = init_stream_state(B, HP, CFG)
        k, v, c, valid = (state.k_cache, state.v_cache, state.conv_cache,
                          state.cache_valid)
        es = []
        for step, phase in enumerate((0, 1, 2)):
            rng2 = np.random.default_rng(80 + step)  # same mel both runs
            mel = rng2.standard_normal(
                (B, CFG.chunk_mel_frames, HP.n_mels)).astype(np.float32)
            e, k, v, c, valid = ENC.stream_encode_step(
                PARAMS, HP, CFG, jnp.asarray(mel), k, v, c, valid,
                phase=phase)
            es.append(np.asarray(e))
        outs[use_block] = (np.concatenate(es), np.asarray(k), np.asarray(v))
    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_allclose(a, b, atol=5e-5)


def test_greedy_decode_loop_labels_matches_nested(monkeypatch):
    """The loop-labels batched greedy decode (one while_loop, per-stream
    frame pointers — the reference's per-stream emission bound in SPMD form)
    must be token- and state-identical to the frame-scan x symbol-while
    formulation, across ragged n_valid and multi-symbol frames."""
    from nemotron_tpu.models import decoder as DEC

    rng = np.random.default_rng(11)
    b, t = 5, 7
    enc = rng.standard_normal((b, t, HP.d_model)).astype(np.float32) * 2.0
    n_valid = np.array([t, 0, 3, t, 1], dtype=np.int32)

    outs = {}
    for use_ll in (False, True):
        monkeypatch.setattr(DEC, "LOOP_LABELS", use_ll)
        st = init_decode_state(b, HP)
        st2, toks = greedy_decode(PARAMS, HP, jnp.asarray(enc), st,
                                  n_valid=jnp.asarray(n_valid))
        outs[use_ll] = (np.asarray(toks), np.asarray(st2.h),
                        np.asarray(st2.c), np.asarray(st2.prev_token),
                        np.asarray(st2.frame_offset))
    for a, b2 in zip(outs[False], outs[True]):
        np.testing.assert_array_equal(a, b2)
