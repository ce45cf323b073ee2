"""Int8-quantized attention K/V cache (weight-only quantization's analogue
for the streaming state).

At serving batch sizes the streaming step is bound by HBM reads of the K/V
cache windows (B=768: ~5.9 GB/step of bf16 cache traffic ≈ 7 ms of the 30 ms
step on v5e). Storing the cache as int8 + one f32 scale per (layer, stream,
head, frame) halves that traffic: the attention contractions read the int8
buffer straight from HBM, convert on the VPU, and fold the scale AFTER the
Dh-reduction (scale is constant across Dh), so per-element work is unchanged
and no dequantized copy is ever materialized.

Numerics: each cached frame is quantized per (head, frame) over its Dh=128
elements (max-abs / 127), giving ~0.4% relative error on K (scores) and V
(context) history reads; the current chunk's own K/V stay exact (they are
quantized only when written into the cache). Opt-in via
NEMOTRON_TPU_KV_INT8=1 — the golden parity suite runs the exact bf16/f32
cache by default.

Reference scope note: the reference keeps f32 caches (src/nemo-stream.h:
140-174) and has no cache quantization; this is a TPU-side capacity/bandwidth
lever (cache memory also halves: ~7.2 -> ~3.7 MB/stream), same spirit as its
Q8_0 weight quantization.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp

from ..params import _ptree


def kv_int8_enabled() -> bool:
    """Read the flag at call time (state allocation), not import time, so
    tests and bench variants can toggle it per-process."""
    return os.environ.get("NEMOTRON_TPU_KV_INT8", "0") == "1"


@_ptree
class QuantKV:
    """One K or V cache buffer, int8-quantized per (…, frame) over Dh.

    q: int8 [..., S, Dh]; s: f32 [..., S] (dequantized value = q * s)."""

    q: Any
    s: Any


def is_quant(buf) -> bool:
    return isinstance(buf, QuantKV)


def quantize_kv(x) -> QuantKV:
    """[..., S, Dh] float -> QuantKV (per-frame max-abs scales over Dh)."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1)
    s = amax / 127.0
    safe = jnp.where(s > 0, s, 1.0)
    q = jnp.clip(jnp.round(x32 / safe[..., None]), -127, 127).astype(jnp.int8)
    return QuantKV(q=q, s=s)


def dequantize_kv(buf: QuantKV, dtype=jnp.float32):
    return (buf.q.astype(jnp.float32) * buf.s[..., None].astype(jnp.float32)
            ).astype(dtype)


def kv_zeros(shape, _dtype=None) -> QuantKV:
    """Zero-initialized quantized buffer for [..., S, Dh] `shape`."""
    return QuantKV(q=jnp.zeros(shape, jnp.int8),
                   s=jnp.zeros(shape[:-1], jnp.float32))


# ---- structural ops on cache buffers (work on both dense arrays and -------
# ---- QuantKV; `axis` always names an axis of the underlying q tensor) -----

def kv_seq_len(buf, axis: int) -> int:
    return (buf.q if is_quant(buf) else buf).shape[axis]


def kv_layer(buf, i: int):
    """Static leading-axis view (per-layer slice of the stacked cache)."""
    if is_quant(buf):
        return QuantKV(q=buf.q[i], s=buf.s[i])
    return buf[i]


def kv_slice(buf, lo: int, hi: int, axis: int):
    if is_quant(buf):
        return QuantKV(q=jax.lax.slice_in_dim(buf.q, lo, hi, axis=axis),
                       s=jax.lax.slice_in_dim(buf.s, lo, hi, axis=axis))
    return jax.lax.slice_in_dim(buf, lo, hi, axis=axis)


def kv_update_slice(buf, new, start_indices):
    """dynamic_update_slice; `start_indices` indexes the q tensor (the scale
    update drops the trailing Dh index)."""
    if is_quant(buf):
        return QuantKV(
            q=jax.lax.dynamic_update_slice(buf.q, new.q, start_indices),
            s=jax.lax.dynamic_update_slice(buf.s, new.s, start_indices[:-1]),
        )
    return jax.lax.dynamic_update_slice(buf, new, start_indices)


def kv_concat(bufs, axis: int):
    if is_quant(bufs[0]):
        return QuantKV(q=jnp.concatenate([b.q for b in bufs], axis=axis),
                       s=jnp.concatenate([b.s for b in bufs], axis=axis))
    return jnp.concatenate(bufs, axis=axis)


def kv_roll(buf, shift: int, axis: int):
    if is_quant(buf):
        return QuantKV(q=jnp.roll(buf.q, shift, axis=axis),
                       s=jnp.roll(buf.s, shift, axis=axis))
    return jnp.roll(buf, shift, axis=axis)


def kv_where(mask, new, old, batch_axis: int):
    """Per-slot select: `mask` is [B]; broadcast per leaf at `batch_axis`."""

    def g(n, o):
        mm = mask.reshape((1,) * batch_axis + (mask.shape[0],)
                          + (1,) * (n.ndim - batch_axis - 1))
        return jnp.where(mm, n, o)

    if is_quant(new):
        return QuantKV(q=g(new.q, old.q), s=g(new.s, old.s))
    return g(new, old)
