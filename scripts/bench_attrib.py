"""Attribution microbench: where does the B=256 fused serving tick spend time?

jax.profiler does not work through the axon tunnel (PERF.md), so attribution
is done the reference's way (nemo-stream.h:237-244: manual phase timers) plus
ablation: time program variants that isolate one stage each. Each variant is
chained across steps with never-repeated inputs (axon memoizes identical
executions) and closed by ONE data fetch (only a fetch syncs remote work).

Variants:
  full      - fused_serve_tick (the bench.py program)
  encoder   - fused_encode_tick only (mel + subsampling + 24 layers + cache)
  decode    - greedy_decode only, fixed-size enc input chained via state
  front     - mel frontend + subsampling conv only (no conformer layers)
  layersN   - encoder with N conformer layers (slope => per-layer cost,
              intercept => front + fixed overhead)

Run:  python scripts/bench_attrib.py [--steps 20] [--batch 256]
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass


def chain_time(step_fn, state, inputs, steps, fetch):
    """Time `steps` chained calls closed by one fetch. step_fn(state, x) -> state."""
    # warmup: compile + run, syncing each
    for i in range(3):
        state = step_fn(state, inputs[i])
        np.asarray(fetch(state))
    t0 = time.time()
    for i in range(3, 3 + steps):
        state = step_fn(state, inputs[i])
    np.asarray(fetch(state))
    return (time.time() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--variants", type=str,
                    default="full,encoder,decode,front,layers1,layers6")
    args = ap.parse_args()

    from nemotron_tpu.config import CacheConfig, Hparams, LatencyMode
    from nemotron_tpu.models.asr import fused_encode_tick, fused_serve_tick
    from nemotron_tpu.models.decoder import greedy_decode
    from nemotron_tpu.params import random_params
    from nemotron_tpu.streaming.state import init_stream_state

    B = args.batch
    dtype = jnp.bfloat16
    hp = Hparams()
    cfg = CacheConfig.for_mode(LatencyMode.PURE_CAUSAL, hp)
    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform} B={B}", file=sys.stderr)

    params = random_params(hp, seed=0, dtype=dtype)
    out_b = params.joint.out_b.at[hp.blank_id].add(2.4)
    params = dataclasses.replace(
        params, joint=dataclasses.replace(params.joint, out_b=out_b))

    rng = np.random.default_rng(1)
    n_blocks = args.steps + 8
    blocks = [
        jnp.asarray((rng.uniform(-0.3, 0.3, (B, cfg.shift_samples))
                     * 32767).astype(np.int16))
        for _ in range(n_blocks)
    ]
    n_valid = jnp.full((B,), cfg.valid_out_len, jnp.int32)
    results = {}
    want = set(args.variants.split(","))

    if "noop" in want:
        # Pure per-dispatch overhead: a chained step whose device work is one
        # elementwise op on the tiniest state leaf. Anything this measures is
        # runtime/tunnel dispatch cost, not kernel time.
        fn = jax.jit(lambda s, a: dataclasses.replace(
            s, pp_last=s.pp_last + a[:, 0].astype(jnp.float32)),
            donate_argnums=(0,))

        def stepn(st, a):
            return (fn(st[0], a), None)

        state = (init_stream_state(B, hp, cfg, dtype=dtype), None)
        t = chain_time(stepn, state, blocks, args.steps,
                       lambda st: st[0].pp_last[:1])
        results["noop"] = t

    if "full" in want:
        fn = jax.jit(functools.partial(
            lambda p, s, a, nv: fused_serve_tick(p, s, a, nv, None,
                                                 hp=hp, cfg=cfg, phase=0)),
            donate_argnums=(1,))

        def step(st, a):
            s, tok = fn(params, st, a, n_valid)
            return (s, tok)

        state = (init_stream_state(B, hp, cfg, dtype=dtype), None)
        t = chain_time(lambda st, a: step(st[0], a), state, blocks,
                       args.steps, lambda st: st[1])
        results["full"] = t

    if "gated" in want:
        # masked fast tick (fast_gated / realign path, half the slots
        # active): gated-tick cost vs the all-active fast path. Before the
        # round-3 realign work any inactive slot forced a full 70-frame
        # window rewrite; now it rides the same phased program with masked
        # appends (VERDICT item 5's done-criterion: gated ~= fast).
        act = jnp.asarray(np.arange(B) % 2 == 0)
        fn = jax.jit(functools.partial(
            lambda p, s, a, nv, m: fused_serve_tick(
                p, s, a, nv, m, hp=hp, cfg=cfg, phase=0, fast_gated=True)),
            donate_argnums=(1,))

        def stepg(st, a):
            s, tok = fn(params, st, a, n_valid, act)
            return (s, tok)

        state = (init_stream_state(B, hp, cfg, dtype=dtype), None)
        t = chain_time(lambda st, a: stepg(st[0], a), state, blocks,
                       args.steps, lambda st: st[1])
        results["gated"] = t

    # Intra-layer ablations: monkeypatch one module of the conformer layer to
    # identity (the layer body resolves these names from the encoder module's
    # globals at trace time). Cost of module X ~= encoder - noX.
    import nemotron_tpu.models.encoder as enc_mod

    def _noattn(x, *a, **k):
        b, t, _ = x.shape
        xh = x.reshape(b, t, hp.n_heads, hp.d_head).transpose(0, 2, 1, 3)
        return x, xh, xh  # head-major new frames, as rel_pos_mha returns

    def _nosub(sub, mel):
        # stand-in with the right [B, T', d_model] shape, data-dependent so it
        # can't constant-fold; isolates the subsampling stack's cost
        t_out = hp.subsampled_len(mel.shape[1])
        reps = hp.d_model // mel.shape[2]
        return jnp.tile(mel[:, :t_out, :], (1, 1, reps)).astype(jnp.bfloat16)

    ablations = {
        "noattn": ("rel_pos_mha", _noattn),
        "nosub": ("conv_subsampling", _nosub),
        # frontend with the subsampling stack stubbed AND 0 conformer layers:
        # isolates mel kernel + tick bookkeeping (front - this = subsampling)
        "frontnosub": ("conv_subsampling", _nosub),
        "noffn": ("ffn", lambda x, w1, w2: x),
        "noconv": ("depthwise_causal_conv1d",
                   lambda x, w, cache=None: (x, cache)),
    }
    for name, (attr, repl) in ablations.items():
        if name not in want:
            continue
        hp_v, params_v = hp, params
        if name == "frontnosub":
            hp_v = dataclasses.replace(hp, n_layers=0)
            params_v = dataclasses.replace(
                params, layers=jax.tree.map(lambda x: x[:0], params.layers))
        orig = getattr(enc_mod, attr)
        setattr(enc_mod, attr, repl)
        try:
            fn = jax.jit(functools.partial(
                lambda p, s, a, _h=hp_v: fused_encode_tick(
                    p, s, a, None, hp=_h, cfg=cfg, phase=0)),
                donate_argnums=(1,))

            def stepa(st, a, fn=fn, pv=params_v):
                s, enc = fn(pv, st[0], a)
                return (s, enc)

            state = (init_stream_state(B, hp_v, cfg, dtype=dtype), None)
            t = chain_time(stepa, state, blocks, args.steps,
                           lambda st: st[1][:1, :1, :8])
            results[name] = t
        finally:
            setattr(enc_mod, attr, orig)

    if "encoder" in want:
        fn = jax.jit(functools.partial(
            lambda p, s, a: fused_encode_tick(p, s, a, None,
                                              hp=hp, cfg=cfg, phase=0)),
            donate_argnums=(1,))

        def stepe(st, a):
            s, enc = fn(params, st, a)
            return (s, enc)

        state = (init_stream_state(B, hp, cfg, dtype=dtype), None)
        t = chain_time(lambda st, a: stepe(st[0], a), state, blocks,
                       args.steps, lambda st: st[1][:1, :1, :8])
        results["encoder"] = t

    if "decode" in want:
        chunk_len = cfg.chunk_len(hp)
        # enc input must vary per step; chain decode state
        encs = [jnp.asarray(rng.standard_normal(
            (B, chunk_len, hp.d_model)).astype(np.float32)).astype(dtype)
            for _ in range(n_blocks)]
        fn = jax.jit(functools.partial(
            lambda p, ds, e, nv: greedy_decode(p, hp, e, ds, n_valid=nv)),
            donate_argnums=(1,))
        st0 = init_stream_state(B, hp, cfg, dtype=dtype).decode

        def stepd(st, i):
            ds, tok = fn(params, st[0], encs[i], n_valid)
            return (ds, tok)

        idx = list(range(n_blocks))
        t = chain_time(lambda st, i: stepd(st, i), (st0, None), idx,
                       args.steps, lambda st: st[1])
        results["decode"] = t

    for name in sorted(want):
        if not name.startswith("layers") and name != "front":
            continue
        nl = 0 if name == "front" else int(name[len("layers"):])
        hp_n = dataclasses.replace(hp, n_layers=nl)
        params_n = dataclasses.replace(
            params, layers=jax.tree.map(lambda x: x[:nl], params.layers))
        fn = jax.jit(functools.partial(
            lambda p, s, a: fused_encode_tick(p, s, a, None,
                                              hp=hp_n, cfg=cfg, phase=0)),
            donate_argnums=(1,))

        def stepl(st, a, fn=fn, pn=params_n):
            s, enc = fn(pn, st[0], a)
            return (s, enc)

        state = (init_stream_state(B, hp_n, cfg, dtype=dtype), None)
        t = chain_time(stepl, state, blocks, args.steps,
                       lambda st: st[1][:1, :1, :8])
        results[name] = t

    for k, v in results.items():
        print(f"{k:10s} {v * 1e3:8.2f} ms", file=sys.stderr)
    if "layers1" in results and "layers6" in results:
        slope = (results["layers6"] - results["layers1"]) / 5
        print(f"per-layer    {slope * 1e3:8.3f} ms  "
              f"(24 layers => {slope * 24 * 1e3:.2f} ms)  "
              f"intercept {(results['layers1'] - slope) * 1e3:.2f} ms",
              file=sys.stderr)
    print({k: round(v * 1e3, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
