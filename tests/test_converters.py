"""End-to-end converter tests: synthetic .nemo tarballs -> GGUF -> model.

VERDICT round-3 item 3: the converter scripts were never executed by any
test (tests synthesized GGUFs via the writer directly), so the first real
use would exercise untested tar-extraction / name-mapping / reshape code.
These tests build .nemo tarballs with the RAW torch layouts a real NeMo
checkpoint carries (3D conv weights, [1, n_mels, n_bins] filterbank, './'
archive prefixes, dropped training-only tensors), run the EXACT converter
commands as subprocesses, and load + run the results.

Reference analogue: scripts/convert_to_gguf.py:343-413 was validated by
running it on real checkpoints; this is the synthetic stand-in until
real weights are available (see scripts/wer_readiness.py).
"""

from __future__ import annotations

import io
import subprocess
import sys
import tarfile
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
yaml = pytest.importorskip("yaml")

from helpers import tiny_hparams
from scripts_support import (
    export_random_checkpoint,
    export_random_diarize_checkpoint,
)

REPO = Path(__file__).resolve().parent.parent
HP = tiny_hparams(d_ff=128)  # ff_expansion_factor must be integral (= 2)


def make_nemo_tarball(path: Path, state: dict[str, np.ndarray], config: dict):
    """Write a .nemo-style tar: ./model_config.yaml + ./model_weights.ckpt
    (the './' prefix exercises the converters' basename matching)."""
    ckpt = {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in state.items()}
    buf = io.BytesIO()
    torch.save(ckpt, buf)
    wblob = buf.getvalue()
    yblob = yaml.safe_dump(config).encode()
    with tarfile.open(path, "w") as tar:
        for name, blob in (("./model_config.yaml", yblob),
                           ("./model_weights.ckpt", wblob)):
            info = tarfile.TarInfo(name)
            info.size = len(blob)
            tar.addfile(info, io.BytesIO(blob))


def run_converter(script: str, *args: str):
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / script), *map(str, args)],
        capture_output=True, text=True, timeout=600,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/tmp", "PYTHONPATH": str(REPO)},
    )
    assert r.returncode == 0, f"{script} failed:\n{r.stdout}\n{r.stderr}"
    return r


# --------------------------------------------------------------------------
# ASR converter
# --------------------------------------------------------------------------
def asr_raw_state(gguf_layout: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Invert the GGUF 2D reshapes back to the raw torch layouts a real .nemo
    carries: depthwise (k, ch) -> (ch, 1, k), pointwise (out, in) ->
    (out, in, 1), filterbank -> [1, n_mels, n_bins]."""
    out = {}
    for name, arr in gguf_layout.items():
        if name.endswith("conv.depthwise_conv.weight"):
            arr = np.ascontiguousarray(arr.T[:, None, :])
        elif (name.endswith("conv.pointwise_conv1.weight")
              or name.endswith("conv.pointwise_conv2.weight")):
            arr = arr[:, :, None]
        elif name == "preprocessor.featurizer.fb":
            arr = arr[None]
        out[name] = arr
    # training-only entries a real checkpoint carries; must be ignored
    out["preprocessor.featurizer.num_batches_tracked"] = np.zeros((), np.int64)
    return out


def asr_config(hp) -> dict:
    vocab = [f"▁tok{i}" if i % 3 == 0 else f"tok{i}"
             for i in range(hp.vocab_size - 1)]
    return {
        "encoder": {
            "feat_in": hp.n_mels,
            "d_model": hp.d_model,
            "n_heads": hp.n_heads,
            "ff_expansion_factor": hp.d_ff // hp.d_model,
            "n_layers": hp.n_layers,
            "conv_kernel_size": hp.kernel_size,
            "subsampling_factor": hp.subsampling_factor,
            "att_context_size": [[hp.att_left_context, 0]],
        },
        "decoder": {"prednet": {"pred_hidden": hp.decoder_dim}},
        "joint": {
            "vocabulary": vocab,
            "num_classes": hp.vocab_size - 1,
            "jointnet": {"joint_hidden": hp.joint_dim},
        },
    }


@pytest.fixture(scope="module")
def asr_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("conv_asr")
    ref_gguf = tmp / "ref.gguf"
    t = export_random_checkpoint(HP, str(ref_gguf), seed=11)
    nemo = tmp / "model.nemo"
    make_nemo_tarball(nemo, asr_raw_state(t), asr_config(HP))
    rng = np.random.default_rng(0)
    tt = np.arange(12800) / 16000.0
    sig = 0.4 * np.sin(2 * np.pi * 300 * tt) + 0.2 * rng.standard_normal(12800)
    pcm = (np.clip(sig, -1, 1) * 32767).astype(np.int16)
    return tmp, ref_gguf, nemo, pcm


def test_asr_converter_f32_transcribes_identically(asr_setup):
    from nemotron_tpu.api import ASRModel

    tmp, ref_gguf, nemo, pcm = asr_setup
    out = tmp / "conv_f32.gguf"
    run_converter("convert_nemo_to_gguf.py", nemo, out)

    ref = ASRModel.from_gguf(str(ref_gguf))
    got = ASRModel.from_gguf(str(out))
    assert got.hp == ref.hp
    assert got.tokenizer.vocab == ref.tokenizer.vocab
    # every weight bit-identical through tar -> state-dict -> reshape -> GGUF
    import jax

    for a, b in zip(jax.tree.leaves(ref.params), jax.tree.leaves(got.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    text_ref = ref.transcribe_audio(pcm)
    text_got = got.transcribe_audio(pcm)
    assert text_got == text_ref
    assert len(text_got) > 0


@pytest.mark.parametrize("quant,rel_tol", [("q8_0", 0.02), ("q4_0", 0.2)])
def test_asr_converter_quantized(asr_setup, quant, rel_tol):
    """-q q8_0 / q4_0: encoder layer matrices quantized per the reference's
    default pattern; loader dequantizes (and keep_quantized works for q8/q4);
    the model still transcribes."""
    from nemotron_tpu.api import ASRModel
    from nemotron_tpu.gguf.reader import read_gguf

    tmp, ref_gguf, nemo, pcm = asr_setup
    out = tmp / f"conv_{quant}.gguf"
    run_converter("convert_nemo_to_gguf.py", nemo, out, "-q", quant)

    g = read_gguf(str(out))
    qtypes = {n: t.ggml_type for n, t in g.tensors.items() if t.ggml_type != 0}
    assert "encoder.layers.0.feed_forward1.linear1.weight" in qtypes
    assert "encoder.layers.0.conv.depthwise_conv.weight" not in qtypes
    assert "decoder.prediction.embed.weight" not in qtypes

    ref = ASRModel.from_gguf(str(ref_gguf))
    got = ASRModel.from_gguf(str(out))
    a = np.asarray(ref.params.layers.ffn1_w1)
    b = np.asarray(got.params.layers.ffn1_w1)
    rel = np.abs(a - b).max() / np.abs(a).max()
    assert rel < rel_tol, f"dequantized weights off by {rel}"
    assert len(got.transcribe_audio(pcm)) > 0

    kq = ASRModel.from_gguf(str(out), keep_quantized=True)
    assert len(kq.transcribe_audio(pcm)) > 0


# --------------------------------------------------------------------------
# diarize converter
# --------------------------------------------------------------------------
def diarize_raw_states(t: dict[str, np.ndarray]):
    """Split the combined vad.*/spk.* GGUF-layout dict into two raw .nemo
    state dicts with torch conv layouts re-expanded (the inverse of the
    converter's reshape()), plus training-only tensors it must drop."""
    from nemotron_tpu.diarize.params import SPK_TOPOLOGY, VAD_TOPOLOGY

    def expand(ns, topology, state):
        for b, (k, _dil, repeat, cin, cout, residual, separable, has_se) in \
                enumerate(topology):
            prefix = f"{ns}.encoder.encoder.{b}"
            for s in range(repeat):
                base = 5 * s
                if separable:
                    dw = t[f"{prefix}.mconv.{base}.conv.weight"]  # (k, c_in)
                    state[f"encoder.encoder.{b}.mconv.{base}.conv.weight"] = (
                        np.ascontiguousarray(dw.T[:, None, :]))
                    pw = t[f"{prefix}.mconv.{base + 1}.conv.weight"]
                    state[f"encoder.encoder.{b}.mconv.{base + 1}.conv.weight"] = (
                        pw[:, :, None])
                    bn = f"encoder.encoder.{b}.mconv.{base + 2}"
                else:
                    pw = t[f"{prefix}.mconv.0.conv.weight"]
                    state[f"encoder.encoder.{b}.mconv.0.conv.weight"] = (
                        pw[:, :, None])
                    bn = f"encoder.encoder.{b}.mconv.1"
                for part in ("weight", "bias", "running_mean", "running_var"):
                    src = f"{ns}.{bn}.{part}"
                    state[bn + "." + part] = t[src]
                state[bn + ".num_batches_tracked"] = np.int64(100)
            if residual:
                state[f"encoder.encoder.{b}.res.0.0.conv.weight"] = (
                    t[f"{prefix}.res.0.0.conv.weight"][:, :, None])
                for part in ("weight", "bias", "running_mean", "running_var"):
                    state[f"encoder.encoder.{b}.res.0.1.{part}"] = (
                        t[f"{prefix}.res.0.1.{part}"])
            if has_se:
                se_idx = 5 * (repeat - 1) + 3
                for fc in ("fc.0.weight", "fc.2.weight"):
                    state[f"encoder.encoder.{b}.mconv.{se_idx}.{fc}"] = (
                        t[f"{prefix}.mconv.{se_idx}.{fc}"])

    vad: dict[str, np.ndarray] = {}
    expand("vad", VAD_TOPOLOGY, vad)
    vad["decoder.decoder_layers.0.weight"] = (
        t["vad.decoder.decoder_layers.0.weight"][:, :, None])
    vad["decoder.decoder_layers.0.bias"] = t["vad.decoder.decoder_layers.0.bias"]
    vad["preprocessor.featurizer.fb"] = t["vad.preprocessor.featurizer.fb"][None]
    vad["preprocessor.featurizer.window"] = t["vad.preprocessor.featurizer.window"]

    spk: dict[str, np.ndarray] = {}
    expand("spk", SPK_TOPOLOGY, spk)
    dp = "decoder"
    spk[f"{dp}._pooling.attention_layer.0.conv_layer.weight"] = (
        t[f"spk.{dp}._pooling.attention_layer.0.conv_layer.weight"][:, :, None])
    for name in (f"{dp}._pooling.attention_layer.0.conv_layer.bias",
                 f"{dp}._pooling.attention_layer.2.weight",
                 f"{dp}._pooling.attention_layer.2.bias",
                 f"{dp}.emb_layers.0.1.weight",
                 f"{dp}.emb_layers.0.1.bias"):
        spk[name] = t[f"spk.{name}"]
    for part in ("weight", "bias", "running_mean", "running_var"):
        spk[f"{dp}._pooling.attention_layer.0.bn.{part}"] = (
            t[f"spk.{dp}._pooling.attention_layer.0.bn.{part}"])
        spk[f"{dp}.emb_layers.0.0.{part}"] = t[f"spk.{dp}.emb_layers.0.0.{part}"]
    spk["preprocessor.featurizer.fb"] = t["spk.preprocessor.featurizer.fb"][None]
    spk["preprocessor.featurizer.window"] = t["spk.preprocessor.featurizer.window"]
    # TitaNet's 16681-class training classifier: converter must drop it
    spk["final.weight"] = np.zeros((10, 192), np.float32)
    return vad, spk


def pp_config(normalize: str) -> dict:
    return {"preprocessor": {
        "sample_rate": 16000, "features": 80, "n_fft": 512,
        "window_size": 0.025, "window_stride": 0.01,
        "normalize": normalize, "window": "hann", "dither": 0.0,
    }}


def test_diarize_converter_end_to_end(tmp_path):
    from nemotron_tpu.diarize.nets import spk_embed, vad_probs
    from nemotron_tpu.diarize.params import load_diarize_model

    ref_gguf = tmp_path / "ref_diarize.gguf"
    t = export_random_diarize_checkpoint(str(ref_gguf), seed=7)
    vad_state, spk_state = diarize_raw_states(t)
    vad_nemo = tmp_path / "vad.nemo"
    spk_nemo = tmp_path / "titanet.nemo"
    make_nemo_tarball(vad_nemo, vad_state, pp_config("None"))
    make_nemo_tarball(spk_nemo, spk_state, pp_config("per_feature"))

    out = tmp_path / "diarize.gguf"
    run_converter("convert_diarize_nemo_to_gguf.py", vad_nemo, spk_nemo, out)

    ref = load_diarize_model(str(ref_gguf))
    got = load_diarize_model(str(out))
    assert "spk.final.weight" not in {  # training head dropped
        n for n in __import__("nemotron_tpu.gguf.reader", fromlist=["read_gguf"])
        .read_gguf(str(out)).tensors}

    # identical forward passes on a random window through BOTH models
    rng = np.random.default_rng(1)
    win = (rng.uniform(-0.3, 0.3, (2, 6400)) * 32767).astype(np.int16)
    lens = np.asarray([6400, 5000], np.int32)
    p_ref = np.asarray(vad_probs(ref.vad, win, lens))
    p_got = np.asarray(vad_probs(got.vad, win, lens))
    np.testing.assert_array_equal(p_ref, p_got)
    e_ref = np.asarray(spk_embed(ref.spk, win, lens))
    e_got = np.asarray(spk_embed(got.spk, win, lens))
    np.testing.assert_array_equal(e_ref, e_got)


# --------------------------------------------------------------------------
# WER-readiness drill (VERDICT round-3 item 7)
# --------------------------------------------------------------------------
def test_wer_readiness_drill_synthetic(tmp_path):
    """The exact command that will validate the real checkpoint, rehearsed
    end-to-end on synthetic weights: .nemo -> convert -> batch/stream parity
    -> oracle pytest suite -> WER (expected 0.0 against own output)."""
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "wer_readiness.py"),
         "--synthetic", "--workdir", str(tmp_path)],
        capture_output=True, text=True, timeout=1200,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/tmp", "PYTHONPATH": str(REPO),
             "PYTEST_DISABLE_PLUGIN_AUTOLOAD": "1"},
    )
    assert r.returncode == 0, f"drill failed:\n{r.stdout[-3000:]}\n{r.stderr[-2000:]}"
    last = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    import json

    summary = json.loads(last)
    assert summary["wer"] == 0.0
    assert summary["scored"] == 2
