"""Benchmark: concurrent real-time 80 ms streams per chip.

Measures the full steady-state serving hot path for one chunk across a batch of
B concurrent streams: batched mel frontend (DFT matmuls) + cache-aware encoder
chunk + on-device greedy RNNT decode. A batch of B streams is real-time when
one batched 80 ms chunk step takes <= 80 ms, so

    concurrent_realtime_streams = B * 0.080 / step_time

Baseline: the reference's single-stream streaming RTF of 0.064 on an RTX 4080
(docs/STREAMING_ANALYSIS.md:210-213) is equivalent to 1/0.064 ~= 15.6
real-time streams per device. vs_baseline = ours / 15.6.

Prints ONE JSON line. Extra diagnostics go to stderr.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

BASELINE_STREAMS = 1.0 / 0.064

_PROBE_CODE = """
import jax
try:
    # throwaway cache dir: a probe killed on timeout mid-write must never
    # leave a truncated entry in the real .jax_cache (truncated zstd entries
    # SEGFAULT the next reader — see CLAUDE.md / tests/conftest.py)
    jax.config.update("jax_compilation_cache_dir", "/tmp/.probe_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass
import jax.numpy as jnp
x = jnp.ones((64, 64), jnp.bfloat16)
(x @ x).block_until_ready()
print("probe-ok")
"""


def probe_device(timeout_s: float) -> bool:
    """Run a tiny jit in a SUBPROCESS first: during tunnel outages `import
    jax` hangs forever at axon backend init (CLAUDE.md), which would hang the
    whole bench harness — the subprocess hangs instead and we fail with a
    structured JSON. A healthy first-time probe may legitimately take minutes
    through the remote compiler (cached in .jax_cache after)."""
    import subprocess

    try:
        r = subprocess.run([sys.executable, "-c", _PROBE_CODE],
                           timeout=timeout_s, capture_output=True)
        return r.returncode == 0 and b"probe-ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def _setup_jax():
    import jax

    try:  # persistent cache: first bench run pays, later runs don't
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    return jax


def run(batch_sizes=(256, 384, 512, 768), dtype=None, steps=20,
        int8: bool = False, int4: bool = False, right_context: int = 0):
    jax = _setup_jax()
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.bfloat16
    from nemotron_tpu.config import CacheConfig, Hparams
    from nemotron_tpu.models.asr import fused_serve_tick
    from nemotron_tpu.params import quantize_encoder_layers, random_params
    from nemotron_tpu.streaming.state import init_stream_state

    hp = Hparams()
    cfg = CacheConfig.for_mode(right_context, hp)
    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform}", file=sys.stderr)

    params = random_params(hp, seed=0, dtype=dtype)
    # Bias the joint toward blank so greedy-decode emission statistics match
    # real speech (~0.3-1 tokens per 80 ms frame) instead of random-weight
    # behavior (~10 symbols/frame, which no checkpoint exhibits). The decode
    # while_loop's early exit then measures realistically.
    import dataclasses as _dc

    # +2.4 gives ~2.4 tokens per 80 ms frame on bf16 random weights under the
    # real phased state evolution — denser than real speech (~0.3-1), so the
    # decode + text cost is over- not under-stated. The cliff to zero
    # emissions sits at ~2.6; +6.0 (the old value) silenced decode entirely.
    out_b = params.joint.out_b.at[hp.blank_id].add(2.4)
    params = _dc.replace(params, joint=_dc.replace(params.joint, out_b=out_b))
    if int4:  # weight-only Q4_0 serving variant (--int4)
        params = quantize_encoder_layers(params, bits=4)
    elif int8:  # weight-only Q8_0 serving variant (--int8)
        params = quantize_encoder_layers(params)

    shift_samples = cfg.shift_samples  # 1280 new samples per 80 ms chunk

    best = None
    for B in batch_sizes:
        try:
            state = init_stream_state(B, hp, cfg, dtype=dtype)
            # the exact program the serving engine dispatches per tick:
            # raw PCM block in -> tokens out (mel frontend on device)
            n_valid = jnp.full((B,), cfg.valid_out_len, jnp.int32)

            steps_fns = [
                jax.jit(
                    functools.partial(
                        lambda params, state, audio, n_valid, *, phase:
                        fused_serve_tick(params, state, audio, n_valid, None,
                                         hp=hp, cfg=cfg, phase=phase),
                        phase=p,
                    ),
                    donate_argnums=(1,),
                )
                for p in range(cfg.n_phases)
            ]
            from nemotron_tpu.models.encoder import compact_cache
            import dataclasses as _dcs

            compact = jax.jit(
                lambda k, v: compact_cache(cfg, hp, k, v),
                donate_argnums=(0, 1))

            # axon memoizes executions with identical inputs, and the donated
            # in-place state buffer does not break the memo key — every step
            # must see a NEVER-REPEATED audio block or the timing is fiction
            rng = np.random.default_rng(1)
            n_blocks = steps + cfg.n_phases + 6
            blocks = [
                jnp.asarray((rng.uniform(-0.3, 0.3, (B, shift_samples))
                             * 32767).astype(np.int16))
                for _ in range(n_blocks)
            ]
            phase = 0
            n_step = [0]

            def one(state, phase):
                audio = blocks[n_step[0]]
                n_step[0] += 1
                state, tokens = steps_fns[phase](params, state, audio, n_valid)
                phase += 1
                if phase >= cfg.n_phases:
                    k, v = compact(state.k_cache, state.v_cache)
                    state = _dcs.replace(state, k_cache=k, v_cache=v)
                    phase = 0
                return state, tokens, phase

            # axon's block_until_ready does NOT wait for remote execution —
            # only a data fetch syncs. Fetch tokens after every warmup step
            # (forces each phase variant to compile AND run), then time N
            # chained steps closed by ONE final fetch: the state chain makes
            # the last tokens depend on every step, so the fetch waits for
            # all of them; its own ~25 ms tunnel round-trip amortizes over N.
            t0 = time.time()
            state, tokens, phase = one(state, phase)
            np.asarray(tokens)
            compile_s = time.time() - t0

            # warm every phase variant + compaction before timing
            for _ in range(cfg.n_phases + 3):
                state, tokens, phase = one(state, phase)
                np.asarray(tokens)

            t0 = time.time()
            for _ in range(steps):
                state, tokens, phase = one(state, phase)
            np.asarray(tokens)
            step_time = (time.time() - t0) / steps

            audio_s = cfg.shift_samples / cfg.sample_rate  # 0.080*(1+R)
            streams = B * audio_s / step_time
            rtf = step_time / (B * audio_s)
            print(
                f"B={B}: step={step_time * 1e3:.2f} ms  compile={compile_s:.1f}s  "
                f"per-stream RTF={rtf:.5f}  -> {streams:.0f} rt streams",
                file=sys.stderr,
            )
            if best is None or streams > best["streams"]:
                best = {"B": B, "step_time": step_time, "streams": streams}
        except Exception as e:  # OOM at large B etc.
            msg = str(e)
            print(f"B={B}: failed: {type(e).__name__}: "
                  f"{msg[:300]}{'...' if len(msg) > 300 else ''}",
                  file=sys.stderr)
            continue  # a smaller B later in the list may still fit
    return best


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--int4", action="store_true",
                    help="weight-only Q4_0 encoder (quarter weight memory; "
                         "variant line like --int8)")
    ap.add_argument("--int8", action="store_true",
                    help="weight-only Q8_0 encoder (variant line, stderr "
                         "PERF.md numbers; the driver metric stays bf16)")
    ap.add_argument("--kv-int8", action="store_true",
                    help="int8-quantized attention K/V caches (halves the "
                         "dominant HBM traffic of the streaming step; "
                         "variant line like --int8)")
    ap.add_argument("--right-context", type=int, default=0,
                    help="latency mode (R frames of lookahead; 0 = 80 ms)")
    ap.add_argument("--sweep", action="store_true",
                    help="also measure R in {1, 6, 13} at the best R=0 batch "
                         "(stderr rows; the driver JSON metric stays R=0)")
    ap.add_argument("--batches", default=None,
                    help="comma-separated batch sizes (default 256,384,512,768)")
    ap.add_argument("--no-kv-int8-alt", action="store_true",
                    help="skip the automatic kv-int8 alternate measurement "
                         "after the bf16 sweep (saves one compile+measure "
                         "pass; the headline is then whatever bf16 gave)")
    ap.add_argument("--probe-timeout", type=float, default=1200.0,
                    help="seconds to wait for the subprocess device probe "
                         "before declaring the device unreachable (0 = skip "
                         "the probe)")
    args = ap.parse_args()
    batches = (tuple(int(x) for x in args.batches.split(","))
               if args.batches else (256, 384, 512, 768))
    if args.int8 and args.int4:
        ap.error("--int8 and --int4 are mutually exclusive")
    if args.kv_int8 and (args.int8 or args.int4):
        # composable in principle, but the JSON `config` field names ONE
        # configuration — refuse rather than mislabel the measurement
        ap.error("--kv-int8 cannot be combined with --int8/--int4 "
                 "(the config label would be ambiguous)")
    if args.kv_int8:
        # must be set before nemotron_tpu modules allocate state
        import os

        os.environ["NEMOTRON_TPU_KV_INT8"] = "1"
    if args.probe_timeout > 0 and not probe_device(args.probe_timeout):
        print("device probe failed: tunnel down or compile service "
              "unresponsive", file=sys.stderr)
        print(json.dumps({"metric": "concurrent_realtime_streams_80ms",
                          "value": 0, "unit": "streams/chip",
                          "vs_baseline": 0.0,
                          "error": "device unreachable (probe timed out)"}))
        return 1
    best = run(batch_sizes=batches, int8=args.int8, int4=args.int4,
               right_context=args.right_context)
    config = ("kv_int8" if args.kv_int8 else
              "int4" if args.int4 else "int8" if args.int8 else "bf16")
    if best is not None and config == "bf16" and not args.no_kv_int8_alt:
        # Also measure the int8-K/V serving configuration at the winning
        # batch and report whichever is faster. It is the same serving
        # program (weights/activations stay bf16) with the attention cache
        # HISTORY stored int8 + per-frame scales — engine transcripts are
        # test-equal to sessions under it (tests/test_kv_int8.py) and cache
        # reads carry ~0.4% relative error (ops/kvquant.py docstring). The
        # chosen configuration is named in the JSON for honest attribution.
        import os

        os.environ["NEMOTRON_TPU_KV_INT8"] = "1"
        try:
            alt = run(batch_sizes=(best["B"],),
                      right_context=args.right_context)
        finally:
            os.environ.pop("NEMOTRON_TPU_KV_INT8", None)
        if alt is not None and alt["streams"] > best["streams"]:
            print(f"[kv-int8] wins at B={alt['B']}: "
                  f"{alt['streams']:.0f} vs bf16 {best['streams']:.0f}",
                  file=sys.stderr)
            best, config = alt, "kv_int8"
    if best is not None and args.sweep:
        # larger R = longer K/V buffers: the best R=0 batch can exceed HBM
        # (B=768 at R=6 needs 20+ GB to compile), so fall back to smaller
        # batches until one fits
        import os

        candidates = [b for b in (best["B"], 512, 384, 256)
                      if b <= best["B"]]
        candidates = list(dict.fromkeys(candidates))
        if config == "kv_int8":
            # measure the sweep rows under the SAME configuration the
            # headline reports, or the table would be inconsistent
            os.environ["NEMOTRON_TPU_KV_INT8"] = "1"
        try:
            for rc in (1, 6, 13):
                for b in candidates:
                    r = run(batch_sizes=(b,), int8=args.int8, int4=args.int4,
                            right_context=rc)
                    if r:
                        print(f"[sweep] R={rc}: B={r['B']} "
                              f"step={r['step_time'] * 1e3:.2f} ms -> "
                              f"{r['streams']:.0f} rt streams "
                              f"({config})", file=sys.stderr)
                        break
        finally:
            if config == "kv_int8" and not args.kv_int8:
                os.environ.pop("NEMOTRON_TPU_KV_INT8", None)
    if best is None:
        print(json.dumps({"metric": "concurrent_realtime_streams_80ms",
                          "value": 0, "unit": "streams/chip", "vs_baseline": 0.0}))
        return 1
    value = round(best["streams"], 1)
    print(json.dumps({
        "metric": "concurrent_realtime_streams_80ms",
        "value": value,
        "unit": "streams/chip",
        "vs_baseline": round(value / BASELINE_STREAMS, 2),
        "config": config,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
