"""LSTM prediction-network step (PyTorch gate order [i, f, g, o]).

Reference: src/nemo-ggml.cpp:580-619 (cell) and :1137-1176 (2-layer step).
Batched over streams; both layers computed inside one call so the RNNT decode
loop is a single fused step per symbol.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lstm_cell(x, h, c, w_ih, w_hh, b_ih, b_hh):
    """x: [B, I]; h, c: [B, H]; weights (4H, I)/(4H, H)."""
    gates = x @ w_ih.T + h @ w_hh.T + (b_ih + b_hh)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm2_step(dec, x, h, c):
    """Two stacked LSTM layers. h, c: [B, 2, H]. Returns (out, h', c')."""
    h0, c0 = lstm_cell(x, h[:, 0], c[:, 0], dec.w_ih[0], dec.w_hh[0],
                       dec.b_ih[0], dec.b_hh[0])
    h1, c1 = lstm_cell(h0, h[:, 1], c[:, 1], dec.w_ih[1], dec.w_hh[1],
                       dec.b_ih[1], dec.b_hh[1])
    return h1, jnp.stack([h0, h1], axis=1), jnp.stack([c0, c1], axis=1)
