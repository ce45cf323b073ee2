"""Weight-only int8 quantization: Q8_0 blocks kept quantized in HBM.

The GGUF Q8_0 format stores per-32-element scales along the input dimension
(reference quantizer: scripts/convert_to_gguf.py:118-157). Here a quantized
linear weight is (w_i8 [out, in] int8, scales [out, in/32] f32); dequantization
happens inside the matmul:

  - `linear_q8_xla`: w_bf16 = w_i8 * repeat(scales) folded into the dot by XLA
  - `linear_q8_pallas`: a Pallas TPU kernel that tiles the weight, dequantizes
    the int8 block in VMEM, and feeds the MXU — the weight is only ever read
    from HBM at 1 byte/element (vs 2 for bf16), halving weight bandwidth and
    model memory.

Select with NEMOTRON_TPU_Q8_KERNEL=pallas|xla (default xla).
"""

from __future__ import annotations

import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..params import _ptree

QBLOCK = 32


@_ptree
class QuantizedTensor:
    w_i8: Any    # [out, in] int8
    scales: Any  # [out, in // 32] f32

    @property
    def shape(self):
        return self.w_i8.shape

    @property
    def dtype(self):
        return jnp.bfloat16


def quantize_q8(w, dtype=jnp.float32) -> QuantizedTensor:
    """Quantize a (out, in) matrix to Q8_0 blocks (amax/127 per 32 inputs)."""
    w = np.asarray(w, np.float32)
    out, inp = w.shape
    assert inp % QBLOCK == 0, (out, inp)
    blocks = w.reshape(out, inp // QBLOCK, QBLOCK)
    amax = np.abs(blocks).max(axis=2)
    scales = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(blocks / scales[..., None]), -127, 127).astype(np.int8)
    return QuantizedTensor(
        w_i8=jnp.asarray(q.reshape(out, inp)),
        scales=jnp.asarray(scales),
    )


def from_gguf_q8(raw: bytes, out: int, inp: int) -> QuantizedTensor:
    """Build a QuantizedTensor directly from a raw GGUF Q8_0 payload."""
    n_blocks = out * inp // QBLOCK
    block = np.dtype([("scale", np.float16), ("q", np.int8, QBLOCK)])
    arr = np.frombuffer(raw, dtype=block, count=n_blocks)
    q = arr["q"].reshape(out, inp)
    scales = arr["scale"].astype(np.float32).reshape(out, inp // QBLOCK)
    return QuantizedTensor(w_i8=jnp.asarray(q), scales=jnp.asarray(scales))


def dequantize(qt: QuantizedTensor, dtype=jnp.float32):
    scales = jnp.repeat(qt.scales, QBLOCK, axis=1)
    return (qt.w_i8.astype(jnp.float32) * scales).astype(dtype)


# ---------------------------------------------------------------------------
# XLA path: dequant fused into the matmul by the compiler
# ---------------------------------------------------------------------------

def linear_q8_xla(x, qt: QuantizedTensor):
    w = dequantize(qt, dtype=x.dtype)
    return jnp.einsum("...i,oi->...o", x, w)


# ---------------------------------------------------------------------------
# Pallas path: int8 tiles dequantized in VMEM, MXU matmul
# ---------------------------------------------------------------------------

def _q8_matmul_kernel(x_ref, w_ref, s_ref, o_ref):
    """Grid (M/TM, N/TN); full K per block. x [TM, K], w [TN, K] int8,
    s [TN, K/32].

    Dequantization avoids interleaved repeat (unsupported shape-cast in
    Mosaic): each 32-wide block is scaled by a [TN, 1] lane-broadcast and the
    blocks are concatenated back along lanes — all indices static."""
    w_i8 = w_ref[:]                        # [TN, K] int8
    n_blk = w_i8.shape[1] // QBLOCK
    parts = [
        w_i8[:, b * QBLOCK : (b + 1) * QBLOCK].astype(jnp.float32)
        * s_ref[:, b : b + 1]
        for b in range(n_blk)
    ]
    w_deq = jnp.concatenate(parts, axis=1)  # [TN, K]
    o_ref[:] = jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16),
        w_deq.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


try:  # pallas import kept optional so CPU-only environments still work
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


@functools.partial(jax.jit, static_argnames=("tm", "tn", "interpret"))
def _q8_matmul_pallas(x2d, w_i8, scales, tm=256, tn=256, interpret=False):
    m, kdim = x2d.shape
    n = w_i8.shape[0]
    grid = (max(1, m // tm), n // tn)
    return pl.pallas_call(
        _q8_matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, kdim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, kdim), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, kdim // QBLOCK), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        interpret=interpret,
    )(x2d, w_i8, scales)


def linear_q8_pallas(x, qt: QuantizedTensor, interpret: bool = False):
    out, inp = qt.w_i8.shape
    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    x2d = x.reshape(m, inp)
    tm = 256
    if m % tm != 0:  # pad rows to the tile size
        pad = (-m) % tm
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    tn = 256 if out % 256 == 0 else 128
    if out % tn or inp % 128 or inp % QBLOCK:
        return linear_q8_xla(x, qt)  # shapes the kernel doesn't tile
    y = _q8_matmul_pallas(x2d, qt.w_i8, qt.scales, tm=tm, tn=tn,
                          interpret=interpret)
    y = y[:m].reshape(*lead, out)
    return y.astype(x.dtype)


_IMPL = os.environ.get("NEMOTRON_TPU_Q8_KERNEL", "xla")


def linear_q8(x, qt: QuantizedTensor):
    if _IMPL == "pallas" and HAVE_PALLAS:
        return linear_q8_pallas(x, qt)
    return linear_q8_xla(x, qt)


# ===========================================================================
# Weight-only int4 (Q4_0): 0.5 B/element weights, dequantized in-matmul.
#
# GGUF Q4_0 packs each 32-block's elements 0..15 in the low nibbles of 16
# bytes and 16..31 in the high nibbles (reference quantizer:
# convert_to_gguf.py:159-204; our writer.quantize_q4_0). That interleaved
# order is hostile to Mosaic's lane tiling, so at load we REPACK to a
# half-split layout: packed column j holds original column j in its low
# nibble and original column j + in/2 in its high nibble. Dequantization is
# then pure 32-wide static lane slices — the same pattern the Q8 kernel
# lowers with.
# ===========================================================================


@_ptree
class QuantizedTensor4:
    w_packed: Any  # [out, in // 2] uint8, half-split nibble layout (above)
    scales: Any    # [out, in // 32] f32, per-32 ORIGINAL-order blocks

    @property
    def shape(self):  # rank-generic: stacked layer fields are [L, out, in/2]
        return (*self.w_packed.shape[:-1], self.w_packed.shape[-1] * 2)

    @property
    def dtype(self):
        return jnp.bfloat16


def _pack_half_split(qu: np.ndarray) -> np.ndarray:
    """[out, in] uint8 nibble values (0..15) -> half-split packed bytes."""
    half = qu.shape[1] // 2
    return ((qu[:, :half] & 0x0F) | (qu[:, half:] << 4)).astype(np.uint8)


def quantize_q4(w) -> QuantizedTensor4:
    """Quantize a (out, in) matrix to Q4_0 semantics (amax/7 per 32-block,
    values in [-8, 7] stored as nibble+8 — writer.quantize_q4_0's math)."""
    w = np.asarray(w, np.float32)
    out, inp = w.shape
    assert inp % 64 == 0, (out, inp)  # half-split needs 32 | in/2
    blocks = w.reshape(out, inp // QBLOCK, QBLOCK)
    amax = np.abs(blocks).max(axis=2)
    scales = np.where(amax > 0, amax / 7.0, 1.0).astype(np.float32)
    q = np.clip(np.round(blocks / scales[..., None]), -8, 7).astype(np.int8)
    qu = (q + 8).astype(np.uint8).reshape(out, inp)
    return QuantizedTensor4(
        w_packed=jnp.asarray(_pack_half_split(qu)),
        scales=jnp.asarray(scales),
    )


def from_gguf_q4(raw: bytes, out: int, inp: int) -> QuantizedTensor4:
    """Build a QuantizedTensor4 from a raw GGUF Q4_0 payload (repacked)."""
    n_blocks = out * inp // QBLOCK
    block = np.dtype([("scale", np.float16), ("q", np.uint8, QBLOCK // 2)])
    arr = np.frombuffer(raw, dtype=block, count=n_blocks)
    lo = arr["q"] & 0x0F                      # block elements 0..15
    hi = arr["q"] >> 4                        # block elements 16..31
    qu = np.concatenate([lo, hi], axis=1).reshape(out, inp)
    scales = arr["scale"].astype(np.float32).reshape(out, inp // QBLOCK)
    return QuantizedTensor4(
        w_packed=jnp.asarray(_pack_half_split(qu)),
        scales=jnp.asarray(scales),
    )


def dequantize_q4(qt: QuantizedTensor4, dtype=jnp.float32):
    w32 = qt.w_packed.astype(jnp.int32)
    lo = (w32 & 0x0F) - 8                     # original columns [0, in/2)
    hi = (w32 >> 4) - 8                       # original columns [in/2, in)
    vals = jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)
    scales = jnp.repeat(qt.scales, QBLOCK, axis=-1)
    return (vals * scales).astype(dtype)


def linear_q4_xla(x, qt: QuantizedTensor4):
    w = dequantize_q4(qt, dtype=x.dtype)
    return jnp.einsum("...i,oi->...o", x, w)


def _q4_matmul_kernel(x_ref, w_ref, s_ref, o_ref):
    """Grid (M/TM, N/TN); full K per block. x [TM, K], w [TN, K/2] uint8
    half-split packed, s [TN, K/32]. Static 32-wide lane slices only (the
    Mosaic pattern proven by the Q8 kernel)."""
    w32 = w_ref[:].astype(jnp.int32)          # [TN, K/2]
    half = w32.shape[1]                       # packed cols = K/2
    n_blk = half * 2 // QBLOCK
    parts = []
    for b in range(n_blk):
        c = b * QBLOCK
        if c < half:
            seg = (w32[:, c : c + QBLOCK] & 0x0F) - 8
        else:
            seg = (w32[:, c - half : c - half + QBLOCK] >> 4) - 8
        parts.append(seg.astype(jnp.float32) * s_ref[:, b : b + 1])
    w_deq = jnp.concatenate(parts, axis=1)    # [TN, K] original order
    o_ref[:] = jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16),
        w_deq.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "interpret"))
def _q4_matmul_pallas(x2d, w_packed, scales, tm=256, tn=256, interpret=False):
    m, kdim = x2d.shape
    n = w_packed.shape[0]
    grid = (max(1, m // tm), n // tn)
    return pl.pallas_call(
        _q4_matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, kdim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, kdim // 2), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, kdim // QBLOCK), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        interpret=interpret,
    )(x2d, w_packed, scales)


def linear_q4_pallas(x, qt: QuantizedTensor4, interpret: bool = False):
    out = qt.w_packed.shape[0]
    inp = qt.w_packed.shape[1] * 2
    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    x2d = x.reshape(m, inp)
    tm = 256
    if m % tm != 0:  # pad rows to the tile size
        pad = (-m) % tm
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    tn = 256 if out % 256 == 0 else 128
    # packed width in/2 must tile 128 lanes => in % 256 == 0
    if out % tn or inp % 256:
        return linear_q4_xla(x, qt)  # shapes the kernel doesn't tile
    y = _q4_matmul_pallas(x2d, qt.w_packed, qt.scales, tm=tm, tn=tn,
                          interpret=interpret)
    y = y[:m].reshape(*lead, out)
    return y.astype(x.dtype)


_IMPL4 = os.environ.get("NEMOTRON_TPU_Q4_KERNEL", "xla")


def linear_q4(x, qt: QuantizedTensor4):
    if _IMPL4 == "pallas" and HAVE_PALLAS:
        return linear_q4_pallas(x, qt)
    return linear_q4_xla(x, qt)
