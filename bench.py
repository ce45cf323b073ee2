"""Benchmark: concurrent real-time 80 ms streams per chip.

Measures the full steady-state serving hot path for one chunk across a batch
of B concurrent streams: batched mel frontend (DFT matmuls) + cache-aware
encoder chunk + on-device greedy RNNT decode. A batch of B streams is
real-time when one batched 80 ms chunk step takes <= 80 ms, so

    concurrent_realtime_streams = B * 0.080 / step_time

Baseline: the reference's single-stream streaming RTF of 0.064 on an RTX 4080
(docs/STREAMING_ANALYSIS.md:210-213) is equivalent to 1/0.064 ~= 15.6
real-time streams per device. vs_baseline = ours / 15.6.

Prints ONE JSON line. Extra diagnostics go to stderr.

Robustness contract (the round-4 artifact was lost to a 408 s remote compile
starving the driver's timeout — BENCH_r04.json rc:124):

- A lightweight PARENT process (no jax import — `import jax` hangs outright
  during tunnel outages) supervises a measurement CHILD and always prints the
  one JSON line: on child completion, on SIGTERM/SIGINT (the driver's
  `timeout`), or on its own --budget-s alarm. If the child dies or stalls
  mid-pass the best measurement so far is still reported, tagged
  `"partial": true`.
- The child measures the expected WINNER first (kv-int8 at B=768, the
  standing headline config — PERF.md) so one successful pass suffices for a
  valid headline; comparison rows (bf16, smaller batches) run only while the
  time budget allows.
"""

from __future__ import annotations

import functools
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

BASELINE_STREAMS = 1.0 / 0.064
METRIC = "concurrent_realtime_streams_80ms"

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


# ---------------------------------------------------------------------------
# Child: runs the measurement passes in priority order, printing one
# machine-readable `RESULT {json}` line per successful pass (flushed
# immediately, so the parent harvests a headline even if a later pass dies).
# ---------------------------------------------------------------------------

def _emit_result(best, config: str):
    print("RESULT " + json.dumps({
        "B": best["B"], "step_time": best["step_time"],
        "streams": best["streams"], "config": config}), flush=True)


def _plan_passes(args) -> list[tuple[str, int]]:
    """Priority-ordered (config, batch) passes. The expected winner leads:
    kv-int8 at the largest batch (the standing headline — PERF.md round-3/4:
    B=768 kv-int8 ~2241 rt streams), so the FIRST successful pass already
    yields a valid headline. Later passes only refine/attribute."""
    if args.int4:
        named = "int4"
    elif args.int8:
        named = "int8"
    elif args.kv_int8:
        named = "kv_int8"
    else:
        named = None

    if args.batches:
        batches = tuple(int(x) for x in args.batches.split(","))
    else:
        batches = (768, 512, 384, 256)  # descending: winner-first
    if named is not None:
        return [(named, b) for b in batches]
    if args.no_kv_int8_alt:
        return [("bf16", b) for b in batches]
    passes = [("kv_int8", b) for b in batches]
    # bf16 comparison rows (honest attribution of the kv-int8 win) after
    # every kv-int8 batch: lower priority than getting the headline right
    passes += [("bf16", b) for b in batches]
    return passes


def child_main(args) -> int:
    t0 = args.t0 or time.time()
    budget = args.budget_s

    def elapsed():
        return time.time() - t0

    if os.environ.get("NEMOTRON_TPU_BENCH_FAKE") == "1":
        # test hook: synthetic results without a device (tests/test_bench_contract.py)
        for i, (config, b) in enumerate(_plan_passes(args)):
            time.sleep(float(os.environ.get("NEMOTRON_TPU_BENCH_FAKE_DELAY",
                                            "0.2")))
            _emit_result({"B": b, "step_time": 0.03,
                          "streams": 2000.0 + 10 * i}, config)
        print("DONE", flush=True)
        return 0

    probe_timeout = min(args.probe_timeout, max(120.0, budget * 0.4))
    if args.probe_timeout > 0 and not probe_device(probe_timeout):
        print("device probe failed: tunnel down or compile service "
              "unresponsive", file=sys.stderr)
        print("PROBEFAIL", flush=True)
        return 1

    have_result = False
    measured: set[tuple[str, int]] = set()
    for config, b in _plan_passes(args):
        if (config, b) in measured:
            continue
        if have_result and elapsed() > budget * 0.5:
            print(f"[budget] {elapsed():.0f}s of {budget:.0f}s spent — "
                  f"skipping remaining comparison passes", file=sys.stderr)
            break
        if config == "kv_int8":
            os.environ["NEMOTRON_TPU_KV_INT8"] = "1"
        else:
            os.environ.pop("NEMOTRON_TPU_KV_INT8", None)
        r = run(batch_sizes=(b,), int8=(config == "int8"),
                int4=(config == "int4"), right_context=args.right_context)
        measured.add((config, b))
        if r is not None:
            have_result = True
            _emit_result(r, config)
        # a failed pass (OOM/crash at this shape) just falls through to the
        # next (config, batch) in priority order

    if args.sweep and have_result and elapsed() < budget * 0.5:
        # latency-mode rows (stderr only; the driver JSON metric stays R=0).
        # Measured under the headline config; larger R = longer K/V buffers,
        # so fall back to smaller batches until one fits.
        os.environ["NEMOTRON_TPU_KV_INT8"] = (
            "0" if (args.int8 or args.int4 or args.no_kv_int8_alt) else "1")
        config = ("int8" if args.int8 else "int4" if args.int4 else
                  "bf16" if args.no_kv_int8_alt else "kv_int8")
        for rc in (1, 6, 13):
            if elapsed() > budget * 0.7:
                print("[budget] skipping remaining sweep rows",
                      file=sys.stderr)
                break
            for b in (768, 512, 384, 256):
                r = run(batch_sizes=(b,), int8=args.int8, int4=args.int4,
                        right_context=rc)
                if r:
                    print(f"[sweep] R={rc}: B={r['B']} "
                          f"step={r['step_time'] * 1e3:.2f} ms -> "
                          f"{r['streams']:.0f} rt streams ({config})",
                          file=sys.stderr)
                    break
    print("DONE", flush=True)
    return 0


# ---------------------------------------------------------------------------
# Parent: jax-free supervisor. Always prints the one JSON line.
# ---------------------------------------------------------------------------

class _Supervisor:
    def __init__(self):
        self.best: dict | None = None
        self.config: str | None = None
        self.done = False          # child printed DONE (clean completion)
        self.probe_failed = False
        self.child: subprocess.Popen | None = None
        self.emitted = False

    def note_result(self, rec: dict):
        if self.best is None or rec["streams"] > self.best["streams"]:
            self.best = rec
            self.config = rec.get("config", "bf16")

    def emit_and_exit(self, partial: bool, error: str | None = None):
        """Print the single JSON contract line exactly once and hard-exit.
        Called from signal handlers, so it must not allocate heavily or
        re-enter python finalizers (os._exit)."""
        if self.emitted:
            os._exit(0)
        self.emitted = True
        if self.child is not None and self.child.poll() is None:
            try:
                self.child.kill()
            except Exception:
                pass
        if self.best is None:
            rec = {"metric": METRIC, "value": 0, "unit": "streams/chip",
                   "vs_baseline": 0.0,
                   "error": error or "no measurement completed"}
            sys.stdout.write(json.dumps(rec) + "\n")
            sys.stdout.flush()
            os._exit(1)
        value = round(self.best["streams"], 1)
        rec = {"metric": METRIC, "value": value, "unit": "streams/chip",
               "vs_baseline": round(value / BASELINE_STREAMS, 2),
               "config": self.config}
        if partial:
            rec["partial"] = True
        sys.stdout.write(json.dumps(rec) + "\n")
        sys.stdout.flush()
        os._exit(0)


def parent_main(args) -> int:
    sup = _Supervisor()
    t0 = time.time()
    budget = args.budget_s

    def on_signal(signum, frame):
        # the driver's timeout (SIGTERM) / ^C: report the best so far NOW
        print(f"[bench] signal {signum} — emitting best-so-far",
              file=sys.stderr)
        sup.emit_and_exit(partial=not sup.done,
                          error=f"terminated by signal {signum} before any "
                                f"measurement completed")

    def on_alarm(signum, frame):
        if sup.best is not None or sup.probe_failed:
            print(f"[bench] budget {budget:.0f}s exhausted — emitting "
                  f"best-so-far", file=sys.stderr)
            sup.emit_and_exit(partial=not sup.done)
        # no result yet (one slow remote compile can exceed any budget —
        # r04 saw 408 s for a single shape): grant grace slices up to
        # 2x budget waiting for the FIRST result, then give up
        if time.time() - t0 > 2 * budget:
            sup.emit_and_exit(partial=True,
                              error=f"no measurement within {2 * budget:.0f}s")
        print("[bench] budget spent but no result yet — waiting for the "
              "first measurement (grace up to 2x budget)", file=sys.stderr)
        signal.alarm(60)

    signal.signal(signal.SIGTERM, on_signal)
    signal.signal(signal.SIGINT, on_signal)
    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(max(1, int(budget)))

    child_argv = [sys.executable, os.path.abspath(__file__), "--child",
                  "--t0", repr(t0)] + args.forward_argv
    sup.child = subprocess.Popen(child_argv, stdout=subprocess.PIPE,
                                 text=True, bufsize=1)
    assert sup.child.stdout is not None
    for line in sup.child.stdout:
        line = line.rstrip("\n")
        if line.startswith("RESULT "):
            try:
                sup.note_result(json.loads(line[len("RESULT "):]))
            except (json.JSONDecodeError, KeyError) as e:
                print(f"[bench] bad RESULT line: {e}", file=sys.stderr)
        elif line == "DONE":
            sup.done = True
        elif line == "PROBEFAIL":
            sup.probe_failed = True
        elif line:
            print(line, file=sys.stderr)
    rc = sup.child.wait()
    signal.alarm(0)
    if sup.probe_failed and sup.best is None:
        sup.emit_and_exit(partial=False,
                          error="device unreachable (probe timed out)")
    if rc != 0 and sup.best is None:
        sup.emit_and_exit(partial=False,
                          error=f"measurement child exited rc={rc} with no "
                                f"result")
    sup.emit_and_exit(partial=not sup.done)
    return 0  # unreachable (emit_and_exit os._exits)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--t0", type=float, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--int4", action="store_true",
                    help="weight-only Q4_0 encoder (quarter weight memory; "
                         "headline measured under this config)")
    ap.add_argument("--int8", action="store_true",
                    help="weight-only Q8_0 encoder")
    ap.add_argument("--kv-int8", action="store_true",
                    help="int8-quantized attention K/V caches only (skip "
                         "the bf16 comparison rows)")
    ap.add_argument("--right-context", type=int, default=0,
                    help="latency mode (R frames of lookahead; 0 = 80 ms)")
    ap.add_argument("--sweep", action="store_true",
                    help="also measure R in {1, 6, 13} (stderr rows; the "
                         "driver JSON metric stays R=0)")
    ap.add_argument("--batches", default=None,
                    help="comma-separated batch sizes in measurement order "
                         "(default 768,512,384,256 — winner first)")
    ap.add_argument("--no-kv-int8-alt", action="store_true",
                    help="measure bf16 only (skip the kv-int8 headline "
                         "passes)")
    ap.add_argument("--probe-timeout", type=float, default=1200.0,
                    help="seconds to wait for the subprocess device probe "
                         "(0 = skip the probe); capped at 40%% of the "
                         "budget")
    ap.add_argument("--budget-s", type=float,
                    default=float(os.environ.get(
                        "NEMOTRON_TPU_BENCH_BUDGET_S", "1500")),
                    help="soft wall-clock budget: comparison passes are "
                         "skipped once half is spent, and at the full "
                         "budget the best-so-far JSON is emitted (grace up "
                         "to 2x waiting for a first result)")
    args = ap.parse_args()
    if args.int8 and args.int4:
        ap.error("--int8 and --int4 are mutually exclusive")
    if args.kv_int8 and (args.int8 or args.int4):
        # composable in principle, but the JSON `config` field names ONE
        # configuration — refuse rather than mislabel the measurement
        ap.error("--kv-int8 cannot be combined with --int8/--int4 "
                 "(the config label would be ambiguous)")
    if args.child:
        return child_main(args)
    # forward everything except --child/--t0 to the child verbatim
    args.forward_argv = [a for a in sys.argv[1:]]
    return parent_main(args)


if __name__ == "__main__":
    raise SystemExit(main())
