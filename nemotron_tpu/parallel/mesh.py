"""Device-mesh sharding for multi-chip serving.

The model (0.6 B) fits one chip, so the primary scale axis is **data parallel
over concurrent streams** ('dp'): stream state shards on the batch axis and
each chip steps its own slice — no collectives on the hot path, ICI untouched.
An optional 'tp' axis additionally shards the big matmuls (FFN hidden, heads)
for latency-bound deployments; XLA/GSPMD inserts the psum/all-gathers from the
shardings alone.

(The reference has no distributed support at all — SURVEY.md §2.9. Its closest
analogue is the single-worker multi-session server, nemo-server.cpp:192.)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..params import ModelParams
from ..streaming.state import StreamState


def make_mesh(n_dp: int | None = None, n_tp: int = 1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_dp is None:
        n_dp = len(devices) // n_tp
    devices = np.asarray(devices[: n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(devices, axis_names=("dp", "tp"))


def param_shardings(params: ModelParams, mesh: Mesh) -> ModelParams:
    """PartitionSpecs for the parameter pytree: replicated over 'dp', the large
    per-layer matrices sharded over 'tp'.

    tp layout (Megatron-style, per conformer layer):
      - FFN: w1 (L, d_ff, D) shards d_ff; w2 (L, D, d_ff) shards d_ff (axis 2)
      - attention: q/k/v/pos (L, D_out, D) shard the head (output) axis;
        out_w (L, D, D_in) shards the input axis; biases shard the head axis
      - conv pw1 (L, 2D, D): replicated (GLU halves straddle the split axis)
      - everything else replicated
    """
    tp = P(None, "tp", None)          # (L, sharded_out, in)
    tp_in = P(None, None, "tp")       # (L, out, sharded_in)

    def rep(x):
        return P()

    specs = jax.tree.map(rep, params)
    lay = specs.layers
    lay = type(lay)(**{
        **{f: getattr(lay, f) for f in lay.__dataclass_fields__},
        "ffn1_w1": tp, "ffn1_w2": tp_in,
        "ffn2_w1": tp, "ffn2_w2": tp_in,
        "attn_q_w": tp, "attn_k_w": tp, "attn_v_w": tp, "attn_pos_w": tp,
        "attn_out_w": tp_in,
        "pos_bias_u": P(None, "tp", None), "pos_bias_v": P(None, "tp", None),
    })
    specs = type(specs)(**{
        **{f: getattr(specs, f) for f in specs.__dataclass_fields__},
        "layers": lay,
    })
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def state_shardings(state: StreamState, mesh: Mesh) -> StreamState:
    """Stream state shards over 'dp' on the batch axis (axis 1 for the [L, B,
    ...] caches, axis 0 for decode state and counters)."""

    def spec(path, x):
        name = jax.tree_util.keystr(path)
        if "cache" in name and x.ndim >= 3:
            return NamedSharding(mesh, P(None, "dp"))
        return NamedSharding(mesh, P("dp"))

    return jax.tree_util.tree_map_with_path(spec, state)


def shard_inputs(mesh: Mesh, mel_chunk, n_valid, active, prompt_idx=None):
    dp = NamedSharding(mesh, P("dp"))
    out = [jax.device_put(mel_chunk, dp), jax.device_put(n_valid, dp),
           jax.device_put(active, dp)]
    if prompt_idx is not None:
        out.append(jax.device_put(prompt_idx, dp))
    return out


def place(params: ModelParams, state: StreamState, mesh: Mesh):
    """device_put params/state with their shardings; jit then infers the rest."""
    p_sh = param_shardings(params, mesh)
    s_sh = state_shardings(state, mesh)
    return jax.device_put(params, p_sh), jax.device_put(state, s_sh)
