"""Independent-oracle parity for the diarization nets (torch-composed).

Closes the diarize leg of VERDICT round-3 verification debt: MarbleNet VAD
and TitaNet-L were previously validated only against tests/ref/numpy_diarize
(self-authored). Here the full audio -> P(speech) and audio -> embedding
pipelines are checked against tests/torch_diarize_oracle.py, whose tensor ops
are torch.stft / torch.nn.Conv1d / torch.nn.BatchNorm1d / torch.nn.Linear,
consuming the RAW GGUF tensors — so the GGUF loader, the load-time BN folding
(enc eps 1e-3 / dec eps 1e-5), and the net semantics are all cross-checked
against an implementation not authored alongside the JAX one.

Reference counterpart: tests/test_diarize_vad.cpp / test_diarize_spk.cpp
(NeMo-recorded per-block fixtures — unavailable here without real weights)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nemotron_tpu.diarize import audio as daudio
from nemotron_tpu.diarize.nets import spk_embed, vad_probs
from nemotron_tpu.diarize.params import load_diarize_model
from nemotron_tpu.gguf.reader import read_gguf
from scripts_support import export_random_diarize_checkpoint
from torch_diarize_oracle import TorchSpkOracle, TorchVadOracle, torch_diar_mel


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("diar_oracle") / "diarize.gguf")
    export_random_diarize_checkpoint(path, seed=11)
    raw = read_gguf(path).load_all()
    return load_diarize_model(path), raw


def make_audio(n, seed=0, freq=300.0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000.0
    sig = 0.4 * np.sin(2 * np.pi * freq * t) + 0.1 * rng.standard_normal(n)
    return np.clip(sig, -1, 1).astype(np.float32)


@pytest.mark.parametrize("per_feature_norm,n", [
    (False, daudio.VAD_WINDOW_SAMPLES),
    (True, daudio.SPK_WINDOW_SAMPLES),
])
def test_mel_parity_vs_torch_stft(checkpoint, per_feature_norm, n):
    """Localizes frontend drift before the net-level comparisons: the repo's
    DFT-as-matmul framing vs torch.stft with identical conventions."""
    model, raw = checkpoint
    ns = "spk" if per_feature_norm else "vad"
    fb = np.asarray(raw[f"{ns}.preprocessor.featurizer.fb"])
    win = np.asarray(raw[f"{ns}.preprocessor.featurizer.window"]).reshape(-1)
    audio = make_audio(n, seed=1)

    want = torch_diar_mel(audio, fb, win, per_feature_norm).numpy()
    got = np.asarray(daudio.logmel(
        jnp.asarray(audio[None]), jnp.asarray(fb), jnp.asarray(win),
        per_feature_norm=per_feature_norm))[0]
    assert got.shape == want.shape
    assert np.max(np.abs(got - want)) < 5e-4


def test_vad_probs_match_torch_oracle(checkpoint):
    model, raw = checkpoint
    oracle = TorchVadOracle(raw)
    n = daudio.VAD_WINDOW_SAMPLES
    windows = np.stack([
        make_audio(n, seed=2, freq=220.0),
        make_audio(n, seed=3, freq=800.0),
        make_audio(n, seed=4, freq=1500.0),
    ])
    lens = np.asarray([n, 5000, n], np.int32)
    windows[1, 5000:] = 0.0  # short window: padded region must be ignored

    want = oracle(windows, lens)
    got = np.asarray(vad_probs(model.vad, jnp.asarray(windows),
                               jnp.asarray(lens)))
    assert got.shape == want.shape == (3,)
    assert np.all((got >= 0) & (got <= 1))
    assert np.max(np.abs(got - want)) < 1e-3


def test_spk_embeddings_match_torch_oracle(checkpoint):
    model, raw = checkpoint
    oracle = TorchSpkOracle(raw)
    n = daudio.SPK_WINDOW_SAMPLES
    windows = np.stack([
        make_audio(n, seed=5, freq=200.0),
        make_audio(n, seed=6, freq=1200.0),
    ])
    lens = np.asarray([n, 9000], np.int32)
    windows[1, 9000:] = 0.0  # tail sub-segment case (short, zero-padded)

    want = oracle(windows, lens)
    got = np.asarray(spk_embed(model.spk, jnp.asarray(windows),
                               jnp.asarray(lens)))
    assert got.shape == want.shape == (2, 192)
    scale = np.abs(want).max(axis=1, keepdims=True)
    assert np.max(np.abs(got - want) / scale) < 2e-3
    # directional agreement (what clustering actually consumes)
    for i in range(2):
        cos = (got[i] @ want[i]) / (
            np.linalg.norm(got[i]) * np.linalg.norm(want[i]))
        assert cos > 0.999999
