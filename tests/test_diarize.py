"""Diarization subsystem tests: logmel/VAD/TitaNet parity vs the NumPy golden,
NME-SC clustering behavior, and the streaming pipeline state machine E2E.

Mirrors the reference's tests/diarize/* fixture suite structure (per-stage
comparisons + a drip-fed pipeline test, test_diarize_pipeline.cpp:58-78) with
synthetic weights standing in for the real checkpoints."""

import numpy as np
import pytest

from ref import numpy_diarize as RD

from nemotron_tpu.diarize import audio as daudio
from nemotron_tpu.diarize.cluster import NmescConfig, nmesc_cluster
from nemotron_tpu.diarize.nets import spk_embed, vad_probs
from nemotron_tpu.diarize.params import (
    SPK_TOPOLOGY,
    VAD_TOPOLOGY,
    load_diarize_model,
)
from nemotron_tpu.diarize.pipeline import DiarizePipeline, VadPostConfig
from scripts_support import export_random_diarize_checkpoint

import jax.numpy as jnp


@pytest.fixture(scope="module")
def diarize_model(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("diar") / "diarize.gguf")
    export_random_diarize_checkpoint(path, seed=7)
    return load_diarize_model(path)


def make_audio(n, seed=0, freq=300.0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    sig = 0.4 * np.sin(2 * np.pi * freq * t) + 0.1 * rng.standard_normal(n)
    return np.clip(sig, -1, 1).astype(np.float32)


def params_to_np_blocks(blocks, topology):
    out = []
    for block, topo in zip(blocks, topology):
        subs = []
        for s in block.subs:
            subs.append({
                "dw": None if s.dw is None else np.asarray(s.dw),
                "pw": np.asarray(s.pw),
                "bn_scale": np.asarray(s.bn_scale),
                "bn_bias": np.asarray(s.bn_bias),
                "dilation": topo[1],
            })
        b = {"subs": subs, "residual": None, "se": None}
        if block.res is not None:
            b["residual"] = {
                "dw": None, "pw": np.asarray(block.res.pw),
                "bn_scale": np.asarray(block.res.bn_scale),
                "bn_bias": np.asarray(block.res.bn_bias), "dilation": 1,
            }
        if block.se_fc1 is not None:
            b["se"] = (np.asarray(block.se_fc1), np.asarray(block.se_fc2))
        out.append(b)
    return out


# ---------------------------------------------------------------------------


def test_logmel_parity_vad(diarize_model):
    fb = np.asarray(diarize_model.vad.fb)
    win = np.asarray(diarize_model.vad.window)
    audio = make_audio(daudio.VAD_WINDOW_SAMPLES, seed=1)
    want, t_valid = RD.logmel(audio, fb, win, per_feature_norm=False)
    got = np.asarray(daudio.logmel(
        jnp.asarray(audio[None]), jnp.asarray(fb), jnp.asarray(win),
        per_feature_norm=False))[0]
    assert t_valid == daudio.VAD_MEL_VALID
    assert got.shape == (daudio.VAD_MEL_PADDED, 80) == want.shape
    assert np.max(np.abs(got - want)) < 2e-4


def test_logmel_parity_spk_normalized(diarize_model):
    fb = np.asarray(diarize_model.spk.fb)
    win = np.asarray(diarize_model.spk.window)
    audio = make_audio(daudio.SPK_WINDOW_SAMPLES, seed=2)
    # include a zero-padded tail (short segment case)
    audio[20000:] = 0.0
    want, t_valid = RD.logmel(audio, fb, win, per_feature_norm=True)
    got = np.asarray(daudio.logmel(
        jnp.asarray(audio[None]), jnp.asarray(fb), jnp.asarray(win),
        per_feature_norm=True))[0]
    assert t_valid == daudio.SPK_MEL_VALID
    assert got.shape == (daudio.SPK_MEL_PADDED, 80) == want.shape
    assert np.max(np.abs(got - want)) < 5e-4


@pytest.mark.parametrize("lens_samples", [10080, 5000])
def test_vad_forward_parity(diarize_model, lens_samples):
    fb = np.asarray(diarize_model.vad.fb)
    win = np.asarray(diarize_model.vad.window)
    audio = make_audio(daudio.VAD_WINDOW_SAMPLES, seed=3)
    if lens_samples < daudio.VAD_WINDOW_SAMPLES:
        audio[lens_samples:] = 0.0

    got = float(np.asarray(vad_probs(
        diarize_model.vad, jnp.asarray(audio[None]),
        jnp.asarray([lens_samples], jnp.int32)))[0])

    mel, _ = RD.logmel(audio, fb, win, per_feature_norm=False)
    lens_mel = min(lens_samples // 160, daudio.VAD_MEL_VALID)
    blocks = params_to_np_blocks(diarize_model.vad.blocks, VAD_TOPOLOGY)
    want = RD.vad_forward(mel, lens_mel, blocks,
                          np.asarray(diarize_model.vad.dec_w),
                          np.asarray(diarize_model.vad.dec_b))
    assert abs(got - want) < 1e-4


@pytest.mark.parametrize("lens_samples", [24000, 9000])
def test_spk_forward_parity(diarize_model, lens_samples):
    fb = np.asarray(diarize_model.spk.fb)
    win = np.asarray(diarize_model.spk.window)
    audio = make_audio(daudio.SPK_WINDOW_SAMPLES, seed=4)
    if lens_samples < daudio.SPK_WINDOW_SAMPLES:
        audio[lens_samples:] = 0.0

    got = np.asarray(spk_embed(
        diarize_model.spk, jnp.asarray(audio[None]),
        jnp.asarray([lens_samples], jnp.int32)))[0]

    mel, _ = RD.logmel(audio, fb, win, per_feature_norm=True)
    lens_mel = max(1, min(lens_samples // 160, daudio.SPK_MEL_VALID))
    blocks = params_to_np_blocks(diarize_model.spk.blocks, SPK_TOPOLOGY)
    d = diarize_model.spk.dec
    dec = {
        "attn1_w": np.asarray(d.attn1_w), "attn1_b": np.asarray(d.attn1_b),
        "attn_bn_scale": np.asarray(d.attn_bn_scale),
        "attn_bn_bias": np.asarray(d.attn_bn_bias),
        "attn2_w": np.asarray(d.attn2_w), "attn2_b": np.asarray(d.attn2_b),
        "emb_bn_scale": np.asarray(d.emb_bn_scale),
        "emb_bn_bias": np.asarray(d.emb_bn_bias),
        "emb_w": np.asarray(d.emb_w), "emb_b": np.asarray(d.emb_b),
    }
    want = RD.spk_forward(mel, lens_mel, blocks, dec)
    assert got.shape == want.shape == (192,)
    scale = max(1.0, np.abs(want).max())
    assert np.max(np.abs(got - want)) / scale < 5e-4


# ---------------------------------------------------------------------------


def _perm_invariant_accuracy(labels, truth, k):
    import itertools

    best = 0.0
    for perm in itertools.permutations(range(k)):
        mapped = np.asarray([perm[t] for t in truth])
        best = max(best, float((mapped == labels).mean()))
    return best


def test_nmesc_cluster_recovers_speakers():
    rng = np.random.default_rng(0)
    k, per = 3, 40
    centers = rng.standard_normal((k, 192))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    embs, truth = [], []
    for i in range(k):
        pts = centers[i] + 0.05 * rng.standard_normal((per, 192))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        embs.append(pts)
        truth += [i] * per
    embs = np.concatenate(embs)

    res = nmesc_cluster(embs, NmescConfig(kmeans_seed=3))
    assert res.est_num_speakers == k
    assert _perm_invariant_accuracy(res.labels, truth, k) > 0.99


def test_nmesc_oracle_num_speakers():
    rng = np.random.default_rng(1)
    embs = rng.standard_normal((30, 192)).astype(np.float32)
    res = nmesc_cluster(embs, NmescConfig(oracle_num_speakers=2))
    assert res.est_num_speakers == 2
    assert set(np.unique(res.labels)) <= {0, 1}


def test_nmesc_small_n_fallback():
    rng = np.random.default_rng(2)
    embs = rng.standard_normal((4, 192)).astype(np.float32)
    res = nmesc_cluster(embs, NmescConfig())
    assert res.est_num_speakers == 1
    assert np.all(res.labels == 0)


def test_batched_eig_sweep_matches_sequential():
    """The batched-JAX sweep must agree with a sequential f64 NumPy sweep on
    the selected p and estimated speaker count. g_p values are compared only
    where the eigengap is non-degenerate (gap ~ 0 puts g_p at ~1/eps where
    f32-vs-f64 noise dominates but never wins the argmin)."""
    from nemotron_tpu.diarize.cluster import (
        _batched_eig_sweep, binarize_topk, cosine_affinity, laplacian)

    rng = np.random.default_rng(3)
    # clusterable embeddings so the sweep has a meaningful optimum
    centers = rng.standard_normal((3, 16))
    emb = np.concatenate(
        [c + 0.1 * rng.standard_normal((15, 16)) for c in centers])
    aff = cosine_affinity(emb)
    n = aff.shape[0]
    p_list = [2, 5, 9, 11]
    g_p, est = _batched_eig_sweep(aff, p_list, 8)

    want_g, want_est = [], []
    for p in p_list:
        lam = np.linalg.eigvalsh(laplacian(binarize_topk(aff, p)))
        gaps = lam[1:] - lam[:-1]
        kbest = int(np.argmax(gaps[:8]))
        max_gap = gaps[kbest] / (lam.max() + 1e-10)
        want_g.append((p / n) / (max_gap + 1e-10))
        want_est.append(kbest + 1)

    assert int(np.argmin(g_p)) == int(np.argmin(want_g))
    assert est[int(np.argmin(g_p))] == want_est[int(np.argmin(want_g))]
    for i, p in enumerate(p_list):
        lam = np.linalg.eigvalsh(laplacian(binarize_topk(aff, p)))
        gaps = lam[1:] - lam[:-1]
        if gaps[: 8].max() / (lam.max() + 1e-10) > 1e-2:
            assert abs(g_p[i] - want_g[i]) / want_g[i] < 1e-3


# ---------------------------------------------------------------------------


def synthetic_pipeline(num_speakers=-1):
    """Pipeline with injected energy-VAD and frequency-fingerprint embeddings
    to exercise the state machine deterministically."""

    def vad_fn(wins, lens):
        rms = np.sqrt((wins ** 2).mean(axis=1))
        return (rms > 0.05).astype(np.float32) * 0.99

    def spk_fn(wins, lens):
        # embed = spectrum energy fingerprint (stable per frequency)
        spec = np.abs(np.fft.rfft(wins, axis=1))[:, :192]
        return spec / (np.linalg.norm(spec, axis=1, keepdims=True) + 1e-8)

    return DiarizePipeline(
        model_params=None, num_speakers=num_speakers,
        vad_post=VadPostConfig(onset=0.9, offset=0.5, min_duration_off=0.6),
        vad_fn=vad_fn, spk_fn=spk_fn,
    )


def two_speaker_audio():
    """5 s speaker A tone, 1 s silence, 5 s speaker B tone."""
    a = make_audio(5 * 16000, seed=5, freq=200.0)
    gap = np.zeros(16000, np.float32)
    b = make_audio(5 * 16000, seed=6, freq=1200.0)
    return np.concatenate([a, gap, b])


def test_pipeline_segments_and_rttm():
    audio = two_speaker_audio()
    p = synthetic_pipeline(num_speakers=2)
    # drip-feed in 0.5 s chunks like the reference pipeline test
    for off in range(0, len(audio), 8000):
        p.push_audio(audio[off : off + 8000])
    # words: one per second, timestamped
    for i in range(11):
        p.push_text(f"w{i} ", at_sec=i + 0.5)
    res = p.finalize()

    assert p.n_segments >= 1 or len(res.timeline) > 0
    assert p.n_embeddings >= 8  # ~10 s speech / 0.75 s shift
    assert res.n_speakers == 2
    # words in the first 5 s get one speaker; after 6 s the other
    spk_a = {w.speaker for w in res.words if w.at_sec < 4.5}
    spk_b = {w.speaker for w in res.words if 6.5 < w.at_sec < 10.5}
    assert len(spk_a) == 1 and len(spk_b) == 1
    assert spk_a != spk_b
    assert "SPEAKER session 1" in res.rttm
    assert "[spk_" in res.speaker_text


def test_pipeline_incremental_equals_bulk():
    audio = two_speaker_audio()
    p1 = synthetic_pipeline(2)
    p1.push_audio(audio)
    r1 = p1.finalize()

    p2 = synthetic_pipeline(2)
    rng = np.random.default_rng(4)
    i = 0
    while i < len(audio):
        n = int(rng.integers(800, 20000))
        p2.push_audio(audio[i : i + n])
        i += n
    r2 = p2.finalize()

    assert p1.n_embeddings == p2.n_embeddings
    assert [(round(s.start_sec, 3), round(s.end_sec, 3)) for s in r1.timeline] == \
           [(round(s.start_sec, 3), round(s.end_sec, 3)) for s in r2.timeline]


def test_pipeline_json_drain():
    p = synthetic_pipeline()
    p.push_text("hello wor", 1.0)
    p.push_text("ld again ", 2.0)
    lines = p.drain_json()
    assert len(lines) == 3
    import json

    objs = [json.loads(x) for x in lines]
    assert objs[0] == {"word": "hello", "at": 1.0}
    # split word "world" gets the time of its LAST fragment
    assert objs[1] == {"word": "world", "at": 2.0}
    assert objs[2] == {"word": "again", "at": 2.0}
    assert p.drain_json() == []


def test_vad_extract_segments():
    from nemotron_tpu.diarize.pipeline import vad_extract_segments

    probs = [0.1] * 10 + [0.9] * 50 + [0.1] * 30 + [0.9] * 20 + [0.1] * 5
    segs = vad_extract_segments(probs, onset=0.5, offset=0.5)
    assert len(segs) == 2
    assert abs(segs[0].start_sec - 0.10) < 1e-6
    assert abs(segs[0].end_sec - 0.60) < 1e-6
    assert abs(segs[1].start_sec - 0.90) < 1e-6
    # merge with min_duration_off bridging the 0.3 s gap
    merged = vad_extract_segments(probs, onset=0.5, offset=0.5,
                                  min_duration_off=0.4)
    assert len(merged) == 1
    assert abs(merged[0].end_sec - 1.10) < 1e-6
    # trailing open segment closes at the end
    segs2 = vad_extract_segments([0.9] * 30)
    assert len(segs2) == 1 and abs(segs2[0].end_sec - 0.30) < 1e-6
