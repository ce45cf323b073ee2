"""Elementwise / normalization / FFN primitives.

Semantics follow the reference graph builders (src/nemo-ggml.cpp:547-577):
layer_norm uses population variance with eps inside the sqrt; the FFN is
Linear -> SiLU -> Linear with no biases. XLA fuses all of this into the
surrounding matmuls, so no Pallas is needed here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x, w, b, eps: float = 1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def linear(x, w, b=None):
    """x @ w.T (+ b). w in PyTorch (out, in) orientation, either a dense
    array or a QuantizedTensor (weight-only int8, dequantized in-matmul)."""
    if hasattr(w, "w_i8"):
        from .quant import linear_q8

        y = linear_q8(x, w)
    elif hasattr(w, "w_packed"):
        from .quant import linear_q4

        y = linear_q4(x, w)
    else:
        y = jnp.einsum("...i,oi->...o", x, w)
    if b is not None:
        y = y + b
    return y


def ffn(x, w1, w2):
    return linear(jax.nn.silu(linear(x, w1)), w2)


def glu(x):
    """Gated linear unit over the last axis (first half * sigmoid(second half))."""
    a, b = jnp.split(x, 2, axis=-1)
    return a * jax.nn.sigmoid(b)
