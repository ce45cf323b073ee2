"""Multi-chip sharding tests on the 8-device virtual CPU mesh: the sharded
streaming step must produce bit-identical results to the single-device step,
for pure stream-dp and for dp x tp meshes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import tiny_cfg, tiny_model, rand

from nemotron_tpu.models.asr import stream_step
from nemotron_tpu.parallel.mesh import make_mesh, place, shard_inputs
from nemotron_tpu.streaming.state import init_stream_state


def cpu_devices(n):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} cpu devices, have {len(devs)}")
    return devs[:n]


@pytest.mark.parametrize("n_dp,n_tp", [(8, 1), (4, 2)])
def test_sharded_stream_step_matches_single_device(n_dp, n_tp):
    hp, params = tiny_model(seed=0)
    cfg = tiny_cfg(hp)
    B = 8
    mel = jnp.asarray(rand(B, cfg.chunk_mel_frames, hp.n_mels, seed=1))
    n_valid = jnp.full((B,), cfg.valid_out_len, jnp.int32)
    active = jnp.ones((B,), bool)

    # single device
    state0 = init_stream_state(B, hp, cfg)
    ref_state, ref_tokens = jax.jit(
        lambda p, s, m: stream_step(p, s, m, n_valid, active, hp=hp, cfg=cfg)
    )(params, state0, mel)

    mesh = make_mesh(n_dp, n_tp, devices=cpu_devices(n_dp * n_tp))
    p_sh, s_sh = place(params, init_stream_state(B, hp, cfg), mesh)
    mel_s, nv_s, act_s = shard_inputs(mesh, mel, n_valid, active)

    step = jax.jit(lambda p, s, m, nv, a: stream_step(p, s, m, nv, a,
                                                      hp=hp, cfg=cfg))
    out_state, out_tokens = step(p_sh, s_sh, mel_s, nv_s, act_s)

    np.testing.assert_array_equal(np.asarray(out_tokens), np.asarray(ref_tokens))
    np.testing.assert_allclose(
        np.asarray(out_state.k_cache), np.asarray(ref_state.k_cache),
        atol=2e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_state.decode.h), np.asarray(ref_state.decode.h),
        atol=2e-5, rtol=1e-5,
    )

    # second chunk keeps shardings stable (no resharding churn)
    out_state2, _ = step(p_sh, out_state, mel_s, nv_s, act_s)
    ref_state2, _ = jax.jit(
        lambda p, s, m: stream_step(p, s, m, n_valid, active, hp=hp, cfg=cfg)
    )(params, ref_state, mel)
    np.testing.assert_allclose(
        np.asarray(out_state2.v_cache), np.asarray(ref_state2.v_cache),
        atol=5e-5, rtol=1e-5,
    )


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
