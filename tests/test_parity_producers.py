"""The NeMo-side parity producers (scripts/nemo_dump_streaming.py,
scripts/export_diarize_fixture_refs.py) dry-run without NeMo: the hook
machinery works on any torch module tree and writes dumps readable by
utils.dump/compare_tensors; the cluster fixture exporter round-trips through
the same loader tests/test_reference_fixtures.py uses on the reference's
checked-in fixture."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

torch = pytest.importorskip("torch")


def test_install_dump_hooks_on_torch_tree(tmp_path):
    from nemo_dump_streaming import install_dump_hooks

    from nemotron_tpu.utils import dump

    dump.reset()

    class Toy(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = torch.nn.Sequential(
                torch.nn.Linear(8, 8), torch.nn.ReLU(), torch.nn.Linear(8, 4)
            )

        def forward(self, x):
            return self.encoder(x)

    m = Toy()
    spec = {"encoder.0": "lin0", "encoder.2": "lin2", "bogus.path": "nope"}
    handles = install_dump_hooks(m, spec, str(tmp_path))
    assert len(handles) == 2  # bogus path skipped, not fatal

    x = torch.randn(3, 8)
    with torch.inference_mode():
        y = m(x)
        m(torch.randn(3, 8))  # second step appends

    got_in = dump.read_dump(str(tmp_path / "nemo_lin0_in.bin"))
    got_out = dump.read_dump(str(tmp_path / "nemo_lin2_out.bin"))
    assert got_in.shape == (2, 3, 8)
    assert got_out.shape == (2, 3, 4)
    np.testing.assert_allclose(got_in[0], x.numpy(), rtol=1e-6)
    np.testing.assert_allclose(got_out[0], y.numpy(), rtol=1e-6)
    for h in handles:
        h.remove()


def test_cluster_fixture_exporter_roundtrip(tmp_path):
    """Exporter output is loadable by the exact code path that consumes the
    reference's checked-in cluster_ref fixture."""
    from export_diarize_fixture_refs import main as exporter_main

    out = tmp_path / "cluster_ref"
    assert exporter_main(["cluster", "--out", str(out), "--seed", "3"]) == 0

    meta = json.loads((out / "cluster_meta.json").read_text())
    n, d = meta["N"], meta["D"]
    embs = np.fromfile(out / "embeddings.f32", dtype="<f4").reshape(n, d)
    aff = np.fromfile(out / "affinity.f32", dtype="<f4").reshape(n, n)
    labels = np.fromfile(out / "labels.i32", dtype="<i4")
    assert labels.shape == (n,)
    assert np.allclose(np.diag(aff), 1.0)

    from nemotron_tpu.diarize.cluster import NmescConfig, nmesc_cluster

    res = nmesc_cluster(embs, NmescConfig())
    assert res.est_num_speakers == meta["est_num_spk"] == 2

    from test_reference_fixtures import perm_invariant_accuracy

    assert perm_invariant_accuracy(res.labels, labels) >= 0.95


def test_dump_activations_all_taps(tmp_path, monkeypatch):
    """Our side of the dump-and-diff loop covers every tap the reference's
    ad-hoc scripts hardwired (gen_mel / compare_subsampling / compare_layers /
    compare_outputs): one run dumps mel, per-chunk mel, subsampling, per-layer
    and per-chunk encoder outs, batch encoder out and the transcript."""
    from scripts_support import export_random_checkpoint

    from helpers import tiny_hparams
    from nemotron_tpu.utils import dump

    hp = tiny_hparams()
    gguf = tmp_path / "tiny.gguf"
    export_random_checkpoint(hp, str(gguf), seed=7)
    rng = np.random.default_rng(0)
    audio = tmp_path / "a.pcm"
    (rng.standard_normal(16000) * 1000).astype("<i2").tofile(audio)

    import dump_activations

    dump.reset()
    out = tmp_path / "dumps"
    monkeypatch.setattr(sys, "argv", [
        "dump_activations.py", str(gguf), str(audio), str(out),
        "--batch", "--per-layer"])
    assert dump_activations.main() == 0

    layers = dump.read_dump(str(out / "layers_batch.bin"))
    assert layers.shape[0] == hp.n_layers + 1  # subsampling + every layer
    for name in ("mel_full.bin", "mel_chunks.bin", "subsampled_chunks.bin",
                 "encoder_out_chunks.bin", "encoder_out_batch.bin"):
        assert dump.read_dump(str(out / name)).size > 0
    assert (out / "transcript.txt").exists()


def test_nemo_driver_exits_cleanly_without_nemo(tmp_path):
    """main() is import-guarded: without NeMo it reports and returns 2."""
    from nemo_dump_streaming import main

    rc = main(["--model", "x.nemo", "--audio", "y.wav",
               "--out", str(tmp_path)])
    assert rc == 2
