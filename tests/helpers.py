"""Shared tiny-model fixtures for parity tests (fast on CPU)."""

from __future__ import annotations

import numpy as np

from nemotron_tpu.config import CacheConfig, Hparams
from nemotron_tpu.params import random_params


def tiny_hparams(**overrides) -> Hparams:
    kw = dict(
        n_mels=32,
        d_model=64,
        n_heads=4,
        d_head=16,
        d_ff=96,
        n_layers=2,
        kernel_size=5,
        vocab_size=33,
        decoder_dim=32,
        joint_dim=32,
        subsampling_factor=8,
        subsampling_channels=16,
        att_left_context=8,
        num_prompts=0,
        max_pos_len=64,
    )
    kw.update(overrides)
    return Hparams(**kw)


def tiny_cfg(hp: Hparams, right_context: int = 0) -> CacheConfig:
    return CacheConfig(
        att_right_context=right_context,
        att_left_context=hp.att_left_context,
        conv_kernel_size=hp.kernel_size,
        n_mels=hp.n_mels,
        subsampling_factor=hp.subsampling_factor,
    )


def tiny_model(seed: int = 0, **overrides):
    hp = tiny_hparams(**overrides)
    params = random_params(hp, seed=seed)
    return hp, params


def rand(*shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32) * scale
