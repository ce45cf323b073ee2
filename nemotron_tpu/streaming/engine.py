"""Batched multi-stream engine: N concurrent sessions stepped in one jitted call.

The reference serializes every session through a single compute worker
(nemo-server.cpp:192-271, one chunk at a time). Here all sessions sharing a
latency mode live in one device-resident state batch; each tick uploads one
raw-PCM block per ready slot and dispatches ONE fused device program (mel
frontend + cache-aware encoder chunk + on-device greedy RNNT) — mel never
returns to the host, so the only per-tick transfers are the audio upload and a
pipelined token readback. Stream join/leave is a per-slot state reset — no
allocation.

Threading contract: `tick()` may run on a worker thread while the server's
event loop calls claim/release/push_audio/end_stream. All device-state
mutations are owned by tick — claim only *queues* a slot reset (applied at the
top of the next tick), push_audio appends to a queue that tick drains with an
atomic list swap, and release is a host-only slot clear under `_lock`.

Host-side per-stream work (sample bookkeeping, token -> text) stays in numpy.
"""

from __future__ import annotations

import collections
import concurrent.futures
import dataclasses
import itertools
import os
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

# Two-program tick with blocking encoder/decoder timers (reference phase
# attribution, nemo-stream.h:237-244). Costs an extra dispatch + two syncs per
# tick — profiling only.
PHASE_TIMERS = os.environ.get("NEMOTRON_TPU_PHASE_TIMERS", "") == "1"

# Token readbacks lag dispatch by up to this many ticks: each fetch through a
# tunneled TPU costs a ~25 ms round-trip, so the engine keeps a queue of
# in-flight token buffers and only blocks on one when it is this old (text
# latency grows by depth*tick_interval; throughput stops being RTT-bound).
READBACK_DEPTH = max(1, int(os.environ.get("NEMOTRON_TPU_READBACK_DEPTH", "2")))

# Backlog micro-batching: when every slot is occupied, steady, and has this
# many chunks staged, one dispatch advances all streams by this many chunks
# (amortizes the per-tick tunnel round-trips). 1 disables. Real-time-paced
# clients never stage more than one chunk, so live latency is unaffected.
MAX_TICK_CHUNKS = max(1, int(os.environ.get("NEMOTRON_TPU_MAX_TICK_CHUNKS",
                                            "8")))


def _multi_scan_enabled() -> bool:
    """Chunk-loop (lax.scan) k-chunk program — see asr.fused_serve_tick_scan.
    Read at call time so tests/bench variants can toggle per-process."""
    return os.environ.get("NEMOTRON_TPU_MULTI_SCAN", "1") == "1"


def max_safe_tick_chunks(batch: int, n_phases: int = 8) -> int:
    """Clamp the backlog micro-batch depth to what actually compiles.

    Default (chunk-loop scan program): the tick body compiles ONCE regardless
    of k, so no batch clamp applies — k is only clamped to the largest
    divisor of n_phases (the scan's phase-trigger contract: k-chunk ticks
    dispatch at phases where phase % k == 0, so the slack-buffer wrap always
    lands after the last chunk and compaction stays static).

    Legacy unrolled program (NEMOTRON_TPU_MULTI_SCAN=0): the compile-time HBM
    footprint grows with k*B (XLA materializes per-chunk copies of the K/V
    slack buffers inside the multi-chunk program): measured k=4 at B=512
    needs 16.4 GB and OOMs a v5e at compile time, while k=2 fits up to
    B=768. A server at --batch 512 with backlogged clients must not dispatch
    a program that cannot compile."""
    k = MAX_TICK_CHUNKS
    if _multi_scan_enabled():
        k = min(k, n_phases)
        while n_phases % k:
            k -= 1
        return max(1, k)
    if batch >= 512:
        k = min(k, 2)
    elif batch >= 256:
        k = min(k, 4)
    return max(1, k)

# First-class gated ticks: a batch with paused/starved slots rides the SAME
# phased fast path as an all-active batch (masked K/V appends), and a paused
# slot's window is realigned to the group's current phase once, on resume
# (models/encoder.realign_cache). 0 restores the round-2 behavior — any
# inactive slot forced a mid-cycle compaction plus a full 70-frame window
# rewrite (reference-style gated tick) on EVERY tick until all-active again.
GATED_REALIGN = os.environ.get("NEMOTRON_TPU_GATED_REALIGN", "1") == "1"

# The axon tunnel's runtime is NOT safe under concurrent device calls from
# multiple threads: a fetch racing a dispatch/upload can hang forever
# (observed as a reader-thread np.asarray stuck >90 s while the tick thread
# dispatched). Every device interaction in the engine takes this lock; host
# work (staging, token scatter, event assembly) still overlaps.
DEVICE_LOCK = threading.RLock()

from ..config import CacheConfig
from ..streaming.state import (PP_TAIL_LEN, extract_slot, install_slot,
                               reset_slots)

# Samples folded into the frontend carry at stream start: the carry becomes
# [256 center-pad zeros || preemph(first 96 samples)], after which every
# shift_samples block yields exactly shift_mel_frames frames (fixed shapes).
PRIME_SAMPLES = PP_TAIL_LEN - 256  # 96
PREEMPH = 0.97


@dataclasses.dataclass
class _Pending:
    """One entry of the FIFO readback queue.

    kind "tokens": a dispatched step's token buffer, fetched and scattered on
    the tick thread after a newer step has been dispatched (the fetch is then
    a pure tunnel round-trip — see _drain_pending). Scatter and event
    emission stay on the tick thread, so ordering is deterministic.

    kind "ended": an end-of-stream sentinel. A stream that ends exactly on a
    chunk boundary has no finalize chunk, but its last steady chunk's tokens
    may still be in flight — the sentinel rides the same FIFO so its "ended"
    event (and the slot release) can never overtake the final text.
    """

    kind: str
    tokens_dev: object = None
    result: object = None
    error: bool = False
    active: object = None
    n_valid: object = None
    finalizing: object = None
    frame_base: object = None
    stream_ids: object = None
    slot_idx: int = -1
    stream_id: int = -1
    t_dispatch: float = 0.0  # perf_counter at dispatch (latency histogram)
    k: int = 1               # chunks this step advanced (latency per chunk)


@dataclasses.dataclass
class Event:
    stream_id: int
    kind: str  # "text" | "ended"
    text: str
    # Decode position of the emitting step, in stream-audio seconds (the end
    # of the subsampled frame window the text was decoded from) — the same
    # clock the CLI stamps diarization words with (sess.total_audio_seconds).
    # -1.0 when unknown (sentinel/failed-step "ended" events with no text).
    at_sec: float = -1.0
    # Minimum per-token softmax confidence over this event's tokens
    # (NEMOTRON_TPU_CONFIDENCE=1 only; -1.0 = not recorded).
    conf: float = -1.0


def _to_f32(audio: np.ndarray) -> np.ndarray:
    if np.issubdtype(audio.dtype, np.integer):
        return audio.astype(np.float32) / 32768.0
    return audio.astype(np.float32)


class _Slot:
    __slots__ = (
        "stream_id", "tokens", "token_frames", "transcript", "prompt_index",
        "ending", "finalize_sent", "audio_queue", "stage", "staged",
        "primed", "total_pushed", "steps",
    )

    def __init__(self, stream_id: int, prompt_index: int):
        self.stream_id = stream_id
        self.tokens: list[int] = []
        self.token_frames: list[int] = []
        self.transcript = ""
        self.prompt_index = prompt_index
        self.ending = False
        self.finalize_sent = False
        self.audio_queue: list[np.ndarray] = []  # filled cross-thread
        self.stage: list[np.ndarray] = []        # tick-owned sample buffer
        self.staged = 0
        self.primed = False
        self.total_pushed = 0   # samples ever staged (frontend frame math)
        self.steps = 0          # steady chunks dispatched

    def take(self, n: int) -> np.ndarray:
        """Pop up to n samples from the stage (i16), zero-padded to n."""
        out = np.zeros(n, dtype=np.int16)
        got = 0
        while self.stage and got < n:
            a = self.stage[0]
            k = min(len(a), n - got)
            out[got : got + k] = a[:k]
            got += k
            if k == len(a):
                self.stage.pop(0)
            else:
                self.stage[0] = a[k:]
        self.staged -= got
        return out


class EngineGroup:
    """All streams of one latency mode, stepped as one batch.

    `source` (optional) is a native ingest backend (serving/ingest.py): PCM
    then stages in C++ rings instead of per-slot Python lists, and the tick
    pulls it with ONE batched take_block call. The admission budget is
    released natively at take time, so consumed_samples stays empty."""

    def __init__(self, model, cfg: CacheConfig, batch: int, source=None):
        self.model = model
        self.cfg = cfg
        self.batch = batch
        self.source = source
        self.hp = model.hp
        # group creation can happen on the event-loop thread (first stream of
        # a new latency mode) while the tick thread talks to the device — the
        # init is itself a device call, so it must honor the device lock
        with DEVICE_LOCK:
            self.state = model.init_stream_state(batch, cfg)
        self.slots: list[_Slot | None] = [None] * batch
        self.n_active_streams = 0
        # host mirror of decode.frame_offset (avoids a device sync per tick)
        self.frame_offsets = np.zeros(batch, dtype=np.int64)
        self.phase = 0  # slack-buffer phase; advances on all-active ticks
        # per-slot window alignment: the phase each slot's K/V window content
        # sits at (paused slots fall behind; realigned on resume)
        self.slot_phase = np.zeros(batch, dtype=np.int64)
        # pipelined token readbacks: FIFO of _Pending entries, fetched and
        # scattered on the tick thread AFTER the next step's dispatch (see
        # _drain_pending). On axon, is_ready()/copy_to_host_async are
        # unavailable, every fetch costs a full ~25 ms round-trip, and
        # concurrent device calls from multiple threads can hang — so fetches
        # stay on the tick thread, ordered dispatch-first.
        self._pending_q: collections.deque[_Pending] = collections.deque()
        self._pending_cond = threading.Condition()
        # single-worker pool for the per-tick packed input upload (overlapped
        # with readback scatter; see tick)
        self._uploader = concurrent.futures.ThreadPoolExecutor(
            max_workers=1,
            thread_name_prefix=f"engine-upload-rc{cfg.att_right_context}")
        # cross-thread mutation queue (see module docstring)
        self._lock = threading.Lock()
        self._pending_resets: list[int] = []
        # disconnect releases queued from the event-loop thread; applied at
        # the top of the next tick. tick() re-indexes self.slots throughout
        # staging/dispatch, so a release landing mid-tick from another
        # thread would None out a slot under its feet (AttributeError ->
        # engine fail-stop). Finalize releases stay direct — they run on the
        # tick thread itself (_process_pending).
        self._pending_drops: list[tuple[int, int]] = []
        # live-stream migration requests (event-loop thread -> tick thread):
        # exports are (stream_id, Future[snapshot dict]); imports are
        # (snapshot, new stream_id, Future[slot idx]). Fulfilled at the top
        # of the next tick, which owns all device mutations.
        self._pending_exports: list[tuple[int, concurrent.futures.Future]] = []
        self._pending_imports: list[
            tuple[dict, int, concurrent.futures.Future]] = []
        # samples moved from the push queue into the stage, per stream —
        # the admission-budget release signal (reference releases as the
        # worker consumes PCM, nemo-server.cpp:116-126)
        self.consumed_samples: dict[int, int] = {}
        # observability (the reference's phase timers, nemo-stream.h:237-244)
        self.total_ticks = 0
        self.total_steps = 0
        self.total_step_seconds = 0.0
        self.total_transfer_seconds = 0.0  # blocked on device readbacks
        self.total_upload_seconds = 0.0    # host->device input staging
        self.total_tick_seconds = 0.0      # whole tick() incl. staging
        self.total_dispatch_seconds = 0.0  # jitted-call dispatch (async)
        self.total_pack_seconds = 0.0      # host input packing (numpy)
        self.total_scatter_seconds = 0.0   # token scatter + text decode
        self.total_encoder_seconds = 0.0   # PHASE_TIMERS mode only
        self.total_decoder_seconds = 0.0   # PHASE_TIMERS mode only
        self.total_audio_seconds = 0.0
        self.total_chunks = 0
        # per-step emit latency: dispatch -> token scatter (device execution
        # + pipelined readback lag + tunnel RTT) — the engine half of the
        # BASELINE "p50 per-chunk latency" metric (the client half is
        # scripts/bench_serving.py --realtime). Bounded ring; stats()
        # reports p50/p90/p99 in ms.
        self.emit_latencies: collections.deque[float] = collections.deque(
            maxlen=4096)

    def prewarm(self) -> None:
        """Compile every tick variant before serving (the reference pre-builds
        all graphs at startup, nemo-stream.cpp; through a remote compiler a
        first-occurrence variant mid-serving would stall the whole group).

        Covers: the all-active fast tick at every phase, the masked fast tick
        at every phase (or the legacy gated tick), every realign delta, the
        masked + unmasked wrap compactions, the k-chunk micro-batch programs,
        and the frontend prime. Runs on garbage state — every slot is reset
        when claimed, and phase bookkeeping is restored afterwards."""
        import sys as _sys
        import time as _time

        b = self.batch
        cfg = self.cfg
        use_realign = GATED_REALIGN and not PHASE_TIMERS
        k_cap = max_safe_tick_chunks(b, cfg.n_phases)
        mask_half = np.zeros(b, dtype=bool)
        mask_half[: max(1, b // 2)] = True
        _t0 = _time.time()

        def _mark(what: str) -> None:
            # one line per variant: keeps remote-compile progress observable
            # (and any parent reading our stderr from starving on a quiet pipe)
            print(f"[prewarm +{_time.time() - _t0:6.1f}s] {what}",
                  file=_sys.stderr, flush=True)

        with DEVICE_LOCK:
            # frontend prime
            self.state = self.model.prime_frontend(
                self.state, mask_half, np.zeros((b, PP_TAIL_LEN), np.float32),
                np.zeros(b, np.float32))
            _mark("prime")
            if PHASE_TIMERS:
                # profiling mode dispatches fused_tick_profiled (two-program
                # encoder/decoder split), never the packed programs
                block = self.model.put_batch(
                    np.zeros((b, cfg.shift_samples), np.int16))
                nv = self.model.put_batch(np.full(b, cfg.valid_out_len,
                                                  np.int32))
                prompt = self.model.put_batch(np.zeros(b, np.int32))
                for phase in range(cfg.n_phases):
                    self.state, tokens, _, _ = self.model.fused_tick_profiled(
                        cfg, self.state, block, nv, None, prompt, phase=phase)
                    _mark(f"profiled tick phase={phase} all-active")
                # gated ticks run phase-stationary at 0 in this mode
                self.state, tokens, _, _ = self.model.fused_tick_profiled(
                    cfg, self.state, block, nv, self.model.put_batch(mask_half),
                    prompt, phase=0)
                _mark("profiled tick phase=0 masked")
            else:
                for k in {1, k_cap}:
                    # k-chunk scan ticks dispatch only at phases where
                    # phase % k == 0 (see max_safe_tick_chunks) — prewarm
                    # exactly those variants (n_phases/k programs, not
                    # n_phases)
                    phases = (range(0, cfg.n_phases, k)
                              if k > 1 and _multi_scan_enabled()
                              else range(cfg.n_phases))
                    for phase in phases:
                        packed = self.model.pack_tick_inputs(
                            np.zeros((b, k * cfg.shift_samples), np.int16),
                            np.full(b, cfg.valid_out_len, np.int16),
                            np.zeros(b, np.int16), None)
                        packed_dev = self.model.put_batch(packed)
                        self.state, tokens = self.model.fused_tick_packed(
                            cfg, self.state, packed_dev, True, phase=phase,
                            k=k)
                        _mark(f"tick k={k} phase={phase} all-active")
                        # masked ticks: every phase on the realign fast path;
                        # phase-0 only in the legacy gated flow (the engine
                        # compacts to phase 0 before any gated tick there)
                        if k == 1 and (use_realign or phase == 0):
                            packed = self.model.pack_tick_inputs(
                                np.zeros((b, cfg.shift_samples), np.int16),
                                np.full(b, cfg.valid_out_len, np.int16),
                                np.zeros(b, np.int16), mask_half)
                            packed_dev = self.model.put_batch(packed)
                            self.state, tokens = self.model.fused_tick_packed(
                                cfg, self.state, packed_dev, False,
                                phase=phase, k=1, fast_gated=use_realign)
                            _mark(f"tick k=1 phase={phase} masked")
                np.asarray(tokens)  # force execution of the chain so far
            if use_realign:
                for delta in range(-(cfg.n_phases - 1), cfg.n_phases):
                    if delta:
                        self.state = self.model.realign_state(
                            cfg, self.state, delta, mask_half)
                        _mark(f"realign delta={delta}")
                self.state = self.model.compact_state(cfg, self.state,
                                                      mask=mask_half)
                _mark("compact masked")
            else:
                # legacy gated flow: a pause mid-cycle compacts from the
                # CURRENT phase back to 0 — one variant per phase
                for p in range(1, cfg.n_phases):
                    self.state = self.model.compact_state(cfg, self.state,
                                                          phase=p)
                    _mark(f"compact phase={p}")
            self.state = self.model.compact_state(cfg, self.state)
            _mark("compact")
            # clear the garbage the prewarm chain left behind
            self.state = reset_slots(
                self.state, self.model.put_batch(np.ones(b, dtype=bool)),
                self.hp)
            jax.block_until_ready(jax.tree.leaves(self.state)[0])
        self.phase = 0
        self.slot_phase[:] = 0
        self.frame_offsets[:] = 0

    def has_free_slot(self) -> bool:
        return self.n_active_streams < self.batch

    def claim(self, stream_id: int, prompt_index: int) -> int | None:
        """Assign a slot (host bookkeeping only). The device-state reset is
        queued and applied at the top of the next tick, which owns all device
        mutations — claiming from the event loop cannot race a running step."""
        with self._lock:
            for i, s in enumerate(self.slots):
                if s is None:
                    self.slots[i] = _Slot(stream_id, prompt_index)
                    self._pending_resets.append(i)
                    self.n_active_streams += 1
                    return i
        return None

    def release(self, idx: int) -> None:
        with self._lock:
            if self.slots[idx] is not None:
                self.slots[idx] = None
                self.n_active_streams -= 1

    def drop(self, idx: int, stream_id: int) -> None:
        """Queue a disconnect release (event-loop thread); the tick thread
        applies it at the top of its next tick (see _pending_drops)."""
        with self._lock:
            self._pending_drops.append((idx, stream_id))

    def _apply_pending_drops(self) -> None:
        with self._lock:
            if not self._pending_drops:
                return
            drops, self._pending_drops = self._pending_drops, []
            for idx, sid in drops:
                s = self.slots[idx]
                if s is not None and s.stream_id == sid:
                    self.slots[idx] = None
                    self.n_active_streams -= 1

    def find(self, stream_id: int) -> int | None:
        for i, s in enumerate(self.slots):
            if s is not None and s.stream_id == stream_id:
                return i
        return None

    # --- live-stream migration (beyond reference: SURVEY §5.4 notes the ---
    # --- reference never serializes a live stream — a drop loses context) --
    def queue_export(self, stream_id: int) -> concurrent.futures.Future:
        fut: concurrent.futures.Future = concurrent.futures.Future()
        with self._lock:
            self._pending_exports.append((stream_id, fut))
        return fut

    def queue_import(self, snapshot: dict, stream_id: int,
                     trust_model: bool = False) -> concurrent.futures.Future:
        fut: concurrent.futures.Future = concurrent.futures.Future()
        with self._lock:
            self._pending_imports.append((snapshot, stream_id, trust_model,
                                          fut))
        return fut

    def _apply_pending_migrations(self) -> list[Event]:
        """Fulfil queued export/import requests (tick thread).

        Exports first drain every in-flight readback so the slot's token
        accounting is complete and no dispatched program still references the
        exported stream; the drained text events are returned to the tick."""
        with self._lock:
            if not (self._pending_exports or self._pending_imports):
                return []
            exports, self._pending_exports = self._pending_exports, []
            imports, self._pending_imports = self._pending_imports, []
        if self.source is not None:
            # the native ingest stages PCM in C++ connection rings with no
            # injection API — a migrated tail would have nowhere to go.
            # Clients of a native server migrate by reconnect + replay.
            err = NotImplementedError(
                "live-stream migration is not supported on native-ingest "
                "engines")
            for _sid, fut in exports:
                fut.set_exception(err)
            for _snap, _sid, _trust, fut in imports:
                fut.set_exception(err)
            return []
        events: list[Event] = []
        if exports:
            events.extend(self._drain_pending(force_all=True))
            self._drain_queues()
        for sid, fut in exports:
            try:
                fut.set_result(self._export_slot(sid))
            except Exception as e:  # noqa: BLE001 — surfaced via the Future
                fut.set_exception(e)
        for snap, sid, trust, fut in imports:
            try:
                fut.set_result(self._import_slot(snap, sid, trust))
            except Exception as e:  # noqa: BLE001
                fut.set_exception(e)
        return events

    def _export_slot(self, stream_id: int) -> dict:
        """Snapshot one live slot (device state + host bookkeeping + staged
        audio tail) and release it. The caller must have stopped pushing
        audio for this stream — a push racing the export may be lost."""
        idx = self.find(stream_id)
        slot = self.slots[idx] if idx is not None else None
        if slot is None:
            raise KeyError(stream_id)
        if slot.finalize_sent:
            raise RuntimeError(
                f"stream {stream_id} is finalizing; too late to export")
        from ..ops.kvquant import is_quant

        stage = (np.concatenate(slot.stage).astype(np.int16)
                 if slot.stage else np.zeros(0, np.int16))
        with DEVICE_LOCK:
            snap_state = extract_slot(self.state, idx)
        snap = {
            "version": 1,
            "right_context": int(self.cfg.att_right_context),
            "n_phases": int(self.cfg.n_phases),
            "kv_int8": bool(is_quant(snap_state.k_cache)),
            "model_fp": self.model.weights_fingerprint,
            "phase": int(self.slot_phase[idx]),
            "frame_offset": int(self.frame_offsets[idx]),
            "state": snap_state,
            "stage": stage,
            "tokens": list(slot.tokens),
            "token_frames": list(slot.token_frames),
            "transcript": slot.transcript,
            "prompt_index": int(slot.prompt_index),
            "total_pushed": int(slot.total_pushed),
            "steps": int(slot.steps),
            "primed": bool(slot.primed),
            "ending": bool(slot.ending),
        }
        self.release(idx)
        return snap

    def _import_slot(self, snap: dict, stream_id: int,
                     trust_model: bool = False) -> int:
        """Install a snapshot into a free slot; returns the slot index.

        The slot's K/V window is realigned from the snapshot's slack-buffer
        phase to this group's current phase at install time (the same
        realign-on-resume op paused slots use), so engines at different
        points of their compaction cycle interoperate."""
        from ..ops.kvquant import is_quant

        if snap.get("version") != 1:
            raise ValueError(f"unknown snapshot version {snap.get('version')}")
        if int(snap["right_context"]) != int(self.cfg.att_right_context):
            raise ValueError("snapshot latency mode differs from this group")
        if int(snap["n_phases"]) != int(self.cfg.n_phases):
            raise ValueError("snapshot n_phases differs from this group")
        if bool(snap["kv_int8"]) != bool(is_quant(self.state.k_cache)):
            raise ValueError("snapshot kv-int8 mode differs from this group")
        fp = snap.get("model_fp")
        if (not trust_model and fp is not None
                and fp != self.model.weights_fingerprint):
            raise ValueError(
                "snapshot model fingerprint differs from this engine's "
                "weights (same shapes, different checkpoint/vocab — "
                "installing it would silently produce garbage transcripts)")
        with self._lock:
            idx = next((i for i, s in enumerate(self.slots) if s is None),
                       None)
            if idx is None:
                raise RuntimeError("no free stream slots")
            slot = _Slot(stream_id, int(snap["prompt_index"]))
            self.slots[idx] = slot
            self.n_active_streams += 1
        # Realign the snapshot's K/V window from the exporter's slack-buffer
        # phase to this group's phase BEFORE install, as a host-side numpy
        # roll of the batch-1 snapshot (same semantics as the device
        # realign_cache roll). On device this would be a realign_state jit —
        # a variant the legacy gated flow never prewarms, so a nonzero-delta
        # import there would stall serving on a remote compile (ADVICE r4).
        snap_state = snap["state"]
        delta = self.phase - int(snap["phase"])
        if delta:
            shift = delta * self.cfg.chunk_len(self.model.hp)

            def _roll(buf):
                return jax.tree.map(
                    lambda a: np.roll(np.asarray(a), shift, axis=3), buf)

            import dataclasses as _dc

            snap_state = _dc.replace(
                snap_state,
                k_cache=_roll(snap_state.k_cache),
                v_cache=_roll(snap_state.v_cache))
        try:
            with DEVICE_LOCK:
                self.state = install_slot(self.state, idx, snap_state)
        except Exception:
            # e.g. a shape mismatch from foreign Hparams: state is untouched
            # (functional update failed at trace time) — don't leak the slot
            self.release(idx)
            raise
        self.slot_phase[idx] = self.phase
        self.frame_offsets[idx] = int(snap["frame_offset"])
        slot.tokens = list(snap["tokens"])
        slot.token_frames = list(snap["token_frames"])
        slot.transcript = snap["transcript"]
        slot.total_pushed = int(snap["total_pushed"])
        slot.steps = int(snap["steps"])
        slot.primed = bool(snap["primed"])
        slot.ending = bool(snap["ending"])
        st = np.asarray(snap["stage"], np.int16)
        if st.size:
            slot.stage.append(st)
            slot.staged = int(st.size)
        return idx

    # ------------------------------------------------------------------
    def push_audio(self, idx: int, audio: np.ndarray) -> None:
        slot = self.slots[idx]
        if slot is not None:
            slot.audio_queue.append(audio)

    def end_stream(self, idx: int) -> None:
        slot = self.slots[idx]
        if slot is not None:
            slot.ending = True

    # ------------------------------------------------------------------
    def _apply_pending_resets(self) -> None:
        with self._lock:
            if not self._pending_resets:
                return
            resets = self._pending_resets
            self._pending_resets = []
        mask = np.zeros(self.batch, dtype=bool)
        mask[resets] = True
        with DEVICE_LOCK:
            self.state = reset_slots(self.state, self.model.put_batch(mask),
                                     self.hp)
        self.frame_offsets[resets] = 0
        # a fresh slot has no valid cache frames — trivially aligned to the
        # group's current phase
        self.slot_phase[resets] = self.phase

    def _drain_queues(self) -> None:
        """Move pushed audio into the tick-owned stages (consumption point
        for the admission budget)."""
        consumed: dict[int, int] = {}
        for s in self.slots:
            if s is None or not s.audio_queue:
                continue
            # atomic swap: concurrent push_audio appends land either in the
            # captured list (staged below) or the fresh one (next tick)
            q, s.audio_queue = s.audio_queue, []
            for a in q:
                a = np.asarray(a)
                if not np.issubdtype(a.dtype, np.integer):
                    a = np.clip(a * 32768.0, -32768, 32767)
                s.stage.append(a.astype(np.int16))
                s.staged += len(a)
                s.total_pushed += len(a)
                consumed[s.stream_id] = consumed.get(s.stream_id, 0) + len(a)
        if consumed:
            with self._lock:
                for sid, n in consumed.items():
                    self.consumed_samples[sid] = (
                        self.consumed_samples.get(sid, 0) + n
                    )

    def _refresh_native(self) -> None:
        """Pull per-slot staging status from the native ingest layer — one
        batched call replaces _drain_queues (PCM never crosses into Python
        until the tick block is filled)."""
        idxs = [i for i, s in enumerate(self.slots)
                if s is not None and not s.finalize_sent]
        if not idxs:
            return
        sids = np.array([self.slots[i].stream_id for i in idxs], np.uint32)
        staged, pushed = self.source.status(sids)
        for j, i in enumerate(idxs):
            if staged[j] >= 0:  # -1 = stream dropped natively; event pending
                self.slots[i].staged = int(staged[j])
                self.slots[i].total_pushed = int(pushed[j])

    def _prime_new_slots(self) -> None:
        """Fold each new stream's first 96 samples into its device-side
        frontend carry (one batched prime op, dispatched only on join ticks)."""
        rows = [i for i, s in enumerate(self.slots)
                if s is not None and not s.primed
                and s.staged >= PRIME_SAMPLES]
        if not rows:
            return
        raw = np.zeros((len(rows), PRIME_SAMPLES), np.int16)
        if self.source is not None:
            sids = np.array([self.slots[i].stream_id for i in rows],
                            np.uint32)
            take_n = np.full(len(rows), PRIME_SAMPLES, np.int32)
            self.source.take_block(sids, take_n, raw)
            for i in rows:
                self.slots[i].staged -= PRIME_SAMPLES
        else:
            for j, i in enumerate(rows):
                raw[j] = self.slots[i].take(PRIME_SAMPLES)
        from .. import native

        mask = np.zeros(self.batch, dtype=bool)
        tails = np.zeros((self.batch, PP_TAIL_LEN), np.float32)
        lasts = np.zeros(self.batch, np.float32)
        for j, i in enumerate(rows):
            # pre-emphasis with zero carry EXCEPT sample 0 passes through
            # (preprocessor.cpp:344-356 start-of-stream semantics)
            emph, last = native.pcm_to_f32_preemph(
                raw[j], PREEMPH, float(raw[j, 0]) / 32768.0)
            emph[0] = raw[j, 0] / 32768.0
            tails[i, PP_TAIL_LEN - PRIME_SAMPLES :] = emph
            lasts[i] = last
            mask[i] = True
            self.slots[i].primed = True
        with DEVICE_LOCK:
            self.state = self.model.prime_frontend(self.state, mask, tails,
                                                   lasts)

    def drain_consumed(self) -> dict[int, int]:
        """Pop the per-stream consumed-sample counters (budget release)."""
        with self._lock:
            out = self.consumed_samples
            self.consumed_samples = {}
        return out

    def _frames_total(self, slot: _Slot) -> int:
        """Mel frames the stream's samples yield (preprocessor.cpp:330-395:
        center pad 256, frame 512, hop 160)."""
        avail = 256 + slot.total_pushed
        if avail < 512:
            return 0
        return (avail - 512 + 160) // 160

    def _enqueue_pending(self, entry: _Pending) -> None:
        with self._pending_cond:
            self._pending_q.append(entry)
            self._pending_cond.notify_all()

    def _drain_pending(self, force_all: bool) -> list[Event]:
        """Process queued readbacks FIFO on the tick thread.

        A "tokens" entry is fetched once a NEWER step has been dispatched
        (its execution then finished before the successor started, so the
        fetch costs one pure tunnel round-trip and never waits on device
        work), or when it is READBACK_DEPTH ticks old / force_all (idle
        ticks). Fetch-after-dispatch ordering keeps the device queue full.
        All fetches happen HERE: the axon runtime hangs under concurrent
        device calls from multiple threads (see DEVICE_LOCK)."""
        events: list[Event] = []
        while True:
            with self._pending_cond:
                if not self._pending_q:
                    break
                head = self._pending_q[0]
                if (head.kind == "tokens" and head.result is None
                        and not head.error):
                    has_newer = any(e.kind == "tokens"
                                    for e in list(self._pending_q)[1:])
                    over_depth = len(self._pending_q) > READBACK_DEPTH
                    if not (force_all or over_depth or has_newer):
                        break
                self._pending_q.popleft()
            if head.kind == "ended":
                slot = self.slots[head.slot_idx]
                events.append(Event(head.stream_id, "ended", ""))
                if slot is not None and slot.stream_id == head.stream_id:
                    self.release(head.slot_idx)
                continue
            if head.result is None and not head.error:
                t0 = time.perf_counter()
                try:
                    with DEVICE_LOCK:
                        head.result = np.asarray(head.tokens_dev)
                except Exception:
                    # a failed execution must not kill the engine; surface
                    # the error and drop the step
                    import traceback

                    traceback.print_exc()
                    head.error = True
                head.tokens_dev = None
                self.total_transfer_seconds += time.perf_counter() - t0
            t_sc = time.perf_counter()
            events.extend(self._process_pending(head))
            now = time.perf_counter()
            self.total_scatter_seconds += now - t_sc
            if head.t_dispatch:
                self.emit_latencies.append(now - head.t_dispatch)
        return events

    def _process_pending(self, pending: _Pending) -> list[Event]:
        """Scatter one step's tokens (host array produced by the reader)."""
        if pending is None:
            return []
        if pending.result is None:  # failed execution, dropped by the reader
            import sys

            print("[engine] WARNING: dropped a failed step's tokens",
                  file=sys.stderr)
            events = []
            for i in (pending.finalizing or ()):
                slot = self.slots[i]
                if slot is not None and slot.stream_id == pending.stream_ids[i]:
                    events.append(Event(slot.stream_id, "ended", ""))
                    self.release(i)
            return events
        active = pending.active
        n_valid = pending.n_valid
        finalizing = pending.finalizing
        frame_base = pending.frame_base
        stream_ids = pending.stream_ids
        tok_np = pending.result
        events: list[Event] = []
        for i in np.nonzero(active)[0]:
            slot = self.slots[i]
            if slot is None or slot.stream_id != stream_ids[i]:
                continue  # slot dropped/reused since dispatch — discard
            emitted = tok_np[i]  # [T, S]
            mask = emitted >= 0
            # decode position: end of this step's VALID subsampled-frame
            # window, in stream seconds (80 ms frames — session.timed_words
            # uses the same fr * 1280/16000 clock). n_valid, not the token
            # buffer width: a finalize row decodes only its nv leftover
            # frames, and the buffer width would overstate the position past
            # the end of the audio (diarize would stamp closing words into
            # no-speaker territory).
            at = float(frame_base[i] + n_valid[i]) \
                * self.cfg.subsampling_factor * 160.0 / 16000.0
            conf = -1.0
            if mask.any():
                from ..models.decoder import unpack_tokens

                raw = emitted[mask]
                ids, confs = unpack_tokens(raw, self.hp.vocab_size)
                ids = ids.tolist()  # row-major: frame-major order
                frames = (frame_base[i] + np.nonzero(mask)[0]).tolist()
                slot.tokens.extend(ids)
                slot.token_frames.extend(frames)
                if confs is not None:
                    conf = float(confs.min())
                text = self.model.tokenizer.decode(ids)
                slot.transcript += text
            else:
                text = ""
            if i in finalizing:
                events.append(Event(slot.stream_id, "ended", text, at, conf))
                self.release(i)
            elif text:
                events.append(Event(slot.stream_id, "text", text, at, conf))
        return events

    def tick(self) -> tuple[list[Event], bool]:
        """One batched round: process the previous step's results, dispatch
        the next fused step. Returns (events, more_work_pending)."""
        t_tick = time.perf_counter()
        cfg, hp = self.cfg, self.hp
        shift = cfg.shift_samples
        b = self.batch
        self.total_ticks += 1
        events: list[Event] = []

        self._apply_pending_drops()
        self._apply_pending_resets()
        events.extend(self._apply_pending_migrations())
        if self.source is None:
            self._drain_queues()
        else:
            self._refresh_native()
        self._prime_new_slots()

        n_valid = np.zeros(b, dtype=np.int32)
        active = np.zeros(b, dtype=bool)
        prompt_idx = np.zeros(b, dtype=np.int32)
        ready = np.zeros(b, dtype=bool)
        finalizing: set[int] = set()
        fin_nv: dict[int, int] = {}
        ended_now: list[tuple[int, int]] = []  # (slot idx, stream_id)

        for i, slot in enumerate(self.slots):
            if slot is None or slot.finalize_sent:
                continue
            prompt_idx[i] = max(slot.prompt_index, 0)
            if slot.primed and slot.staged >= shift:
                ready[i] = True
            elif slot.ending and not slot.audio_queue:
                # (audio still in the cross-thread queue drains next tick)
                # leftover frames beyond the steady chunks already dispatched
                left = (self._frames_total(slot)
                        - cfg.shift_mel_frames * slot.steps)
                nv = left // cfg.subsampling_factor if left > 0 else 0
                if nv > 0:
                    fin_nv[i] = nv
                else:
                    slot.finalize_sent = True
                    ended_now.append((i, slot.stream_id))

        # backlog micro-batching: when EVERY slot is occupied, steady and has
        # >= MAX_TICK_CHUNKS chunks staged (clients ahead of real time /
        # catch-up), one dispatch advances everyone by k chunks — k x the
        # audio per tunnel round-trip. Paced real-time clients never trigger
        # this (they stage exactly one chunk per interval).
        k = 1
        k_cap = max_safe_tick_chunks(b, cfg.n_phases)
        if (k_cap > 1 and not PHASE_TIMERS and not fin_nv
                and not ended_now and bool(ready.all())
                # scan-program trigger contract: k-chunk ticks start only at
                # phases divisible by k (the wrap then lands after the last
                # chunk; also bounds prewarm to n_phases/k variants). At most
                # k-1 single ticks before a backlogged group locks onto the
                # k-path, which keeps phase % k == 0 thereafter.
                and (not _multi_scan_enabled() or self.phase % k_cap == 0)):
            min_chunks = min(s.staged // shift for s in self.slots)
            if min_chunks >= k_cap:
                k = k_cap

        block = np.zeros((b, k * shift), dtype=np.int16)
        if self.source is not None and (bool(ready.any()) or fin_nv):
            # ONE native call fills every active row straight from the C++
            # staging rings (zero-padded partial finalize rows included)
            take_sids = np.zeros(b, np.uint32)
            take_n = np.zeros(b, np.int32)
            for i in np.nonzero(ready)[0]:
                take_sids[i] = self.slots[i].stream_id
                take_n[i] = k * shift
            for i in fin_nv:
                take_sids[i] = self.slots[i].stream_id
                take_n[i] = shift
            self.source.take_block(take_sids, take_n, block)
        for i in np.nonzero(ready)[0]:
            slot = self.slots[i]
            if self.source is None:
                block[i] = slot.take(k * shift)
            else:
                slot.staged = max(0, slot.staged - k * shift)
            n_valid[i] = cfg.valid_out_len
            active[i] = True
            slot.steps += k
        for i, nv in fin_nv.items():
            slot = self.slots[i]
            if self.source is None:
                block[i, :shift] = slot.take(shift)  # zero-padded partial
            else:
                slot.staged = max(0, slot.staged - shift)
            n_valid[i] = nv
            active[i] = True
            finalizing.add(i)
            # mark dispatched so this slot cannot re-enter the ending
            # branch next tick (it would double-release via ended_now)
            slot.finalize_sent = True

        if active.any():
            t0 = time.perf_counter()
            self.total_steps += 1
            n_act = int(active.sum())
            self.total_chunks += n_act * k
            self.total_audio_seconds += n_act * k * shift / cfg.sample_rate
            frame_base = self.frame_offsets.copy()
            all_active = bool(active.all())
            use_realign = GATED_REALIGN and not PHASE_TIMERS
            if use_realign:
                # per-slot realign-on-resume: slots whose window fell behind
                # the group phase (paused while others advanced) get ONE
                # masked roll each distinct delta; every tick — mixed or
                # all-active — then rides the phased fast path
                deltas: dict[int, list[int]] = {}
                for i in np.nonzero(active)[0]:
                    d = self.phase - int(self.slot_phase[i])
                    if d:
                        deltas.setdefault(d, []).append(i)
                for d, idxs in deltas.items():
                    m = np.zeros(b, dtype=bool)
                    m[idxs] = True
                    with DEVICE_LOCK:
                        self.state = self.model.realign_state(
                            self.cfg, self.state, d, m)
                    self.slot_phase[idxs] = self.phase
            elif not all_active and self.phase != 0:
                # legacy gated flow: ticks run at phase 0 only — move the
                # live window (currently at self.phase) back to phase 0 so
                # paused slots stay aligned; one gated variant compiles
                with DEVICE_LOCK:
                    self.state = self.model.compact_state(
                        self.cfg, self.state, phase=self.phase
                    )
                self.phase = 0
            with DEVICE_LOCK:
                active_arg = (None if all_active
                              else self.model.put_batch(active))
            # snapshot per-slot stream ids at dispatch time: tokens read back
            # next tick are attributed only if the slot still holds the same
            # stream (drop + reuse between dispatch and readback otherwise
            # leaks tokens into the new stream)
            stream_ids = np.full(b, -1, dtype=np.int64)
            for i in np.nonzero(active)[0]:
                s = self.slots[i]
                if s is not None:
                    stream_ids[i] = s.stream_id
            if PHASE_TIMERS:
                t_up = time.perf_counter()
                with DEVICE_LOCK:
                    block_dev = self.model.put_batch(block)
                    n_valid_dev = self.model.put_batch(n_valid)
                    prompt_dev = self.model.put_batch(prompt_idx)
                self.total_upload_seconds += time.perf_counter() - t_up
                t_disp = time.perf_counter()
                self.state, tokens, t_enc, t_dec = self.model.fused_tick_profiled(
                    self.cfg, self.state, block_dev,
                    n_valid_dev, active_arg,
                    prompt_dev, phase=self.phase,
                )
                self.total_encoder_seconds += t_enc
                self.total_decoder_seconds += t_dec
                self.total_dispatch_seconds += time.perf_counter() - t_disp
            else:
                # ONE packed upload (audio | n_valid | prompt | active) on a
                # helper thread, overlapped with scattering older readbacks —
                # through the tunnel each upload costs a full round-trip
                t_pack = time.perf_counter()
                packed = self.model.pack_tick_inputs(
                    block, n_valid, prompt_idx,
                    None if all_active else active)
                self.total_pack_seconds += time.perf_counter() - t_pack
                t_up = time.perf_counter()

                def _upload(arr=packed):
                    with DEVICE_LOCK:
                        return self.model.put_batch(arr)

                fut = self._uploader.submit(_upload)
                events.extend(self._drain_pending(force_all=False))
                packed_dev = fut.result()
                self.total_upload_seconds += time.perf_counter() - t_up
                t_disp = time.perf_counter()
                with DEVICE_LOCK:
                    self.state, tokens = self.model.fused_tick_packed(
                        self.cfg, self.state, packed_dev, all_active,
                        phase=self.phase, k=k, fast_gated=use_realign,
                    )
                self.total_dispatch_seconds += time.perf_counter() - t_disp
            try:  # start the device->host copy now; collected next tick
                tokens.copy_to_host_async()
            except AttributeError:
                pass
            if all_active or use_realign:
                # fast path appended at the phase offset (masked appends for
                # inactive slots under use_realign; legacy gated ticks are
                # phase-stationary so paused slots stay aligned)
                if k > 1:
                    # wrap compaction already ran inside the k-chunk program
                    # (all-active only, so every slot moved together)
                    self.phase = (self.phase + k) % self.cfg.n_phases
                    self.slot_phase[:] = self.phase
                else:
                    self.slot_phase[active] = self.phase + 1
                    self.phase += 1
                    if self.phase >= self.cfg.n_phases:
                        aligned = self.slot_phase == self.cfg.n_phases
                        with DEVICE_LOCK:
                            # paused slots' windows sit mid-buffer; the wrap
                            # must not clobber them (masked compaction)
                            self.state = self.model.compact_state(
                                self.cfg, self.state,
                                mask=None if bool(aligned.all()) else aligned)
                        self.slot_phase[aligned] = 0
                        self.phase = 0
            self.frame_offsets[active] += k * n_valid[active]
            self._enqueue_pending(_Pending(
                kind="tokens", tokens_dev=tokens, active=active,
                n_valid=n_valid, finalizing=finalizing,
                frame_base=frame_base, stream_ids=stream_ids,
                t_dispatch=time.perf_counter(), k=k,
            ))
            for i, sid in ended_now:
                # FIFO sentinel: "ended" (and the slot release) must not
                # overtake this stream's final in-flight token readback
                self._enqueue_pending(_Pending(
                    kind="ended", slot_idx=i, stream_id=sid))
            # scatter older steps' landed tokens while this one runs
            events.extend(self._drain_pending(force_all=False))
            self.total_step_seconds += time.perf_counter() - t0
        else:
            for i, sid in ended_now:
                self._enqueue_pending(_Pending(
                    kind="ended", slot_idx=i, stream_id=sid))
            events.extend(self._drain_pending(force_all=True))

        with self._pending_cond:
            # unfetched tails drain on idle ticks (force_all) — keep ticking
            # while anything is pending
            pending_more = bool(self._pending_q)
        with self._lock:
            migrations_queued = bool(self._pending_exports
                                     or self._pending_imports)
        more = (
            pending_more
            or migrations_queued
            or any(
                s is not None and not s.finalize_sent
                and ((s.primed and s.staged >= shift) or s.audio_queue
                     or s.ending)
                for s in self.slots
            )
        )
        self.total_tick_seconds += time.perf_counter() - t_tick
        return events, more


class BatchedEngine:
    """Multi-latency-mode engine; owns one EngineGroup per right_context."""

    def __init__(self, model, batch_per_group: int = 32, source=None):
        self.model = model
        self.batch = batch_per_group
        self.source = source  # optional native ingest backend (see EngineGroup)
        self.groups: dict[int, EngineGroup] = {}
        self._groups_lock = threading.Lock()
        self._ids = itertools.count(1)
        self._route: dict[int, tuple[int, int]] = {}  # stream_id -> (rc, slot)

    def prewarm(self, right_contexts=(0,)) -> None:
        """Create the groups for these latency modes and compile every tick
        variant up front (see EngineGroup.prewarm)."""
        for rc in right_contexts:
            rc = int(rc)
            with self._groups_lock:
                if rc not in self.groups:
                    self.groups[rc] = EngineGroup(
                        self.model, self.model.cache_config(rc), self.batch,
                        source=self.source)
            self.groups[rc].prewarm()

    def start_stream(self, right_context: int = 0, lang: str | None = None) -> int:
        rc = int(right_context)
        group = self.groups.get(rc)
        if group is None:
            # first stream of a new latency mode: create the group under a
            # lock (tick() iterates a snapshot, so the dict insert is safe
            # against the engine thread)
            with self._groups_lock:
                group = self.groups.get(rc)
                if group is None:
                    group = EngineGroup(
                        self.model, self.model.cache_config(rc), self.batch,
                        source=self.source,
                    )
                    self.groups[rc] = group
        prompt_index = self.model.default_prompt_index
        if lang:
            idx = self.model.resolve_language(lang)
            if idx is not None:
                prompt_index = idx
        stream_id = next(self._ids)
        slot = group.claim(stream_id, prompt_index)
        if slot is None:
            raise RuntimeError("no free stream slots")
        self._route[stream_id] = (rc, slot)
        return stream_id

    def set_language(self, stream_id: int, lang: str) -> int | None:
        """Returns the prompt index, None for an unknown language. Raises
        KeyError for an unknown/just-ended stream (the engine thread pops
        _route when it emits 'ended' — callers must expect the window)."""
        idx = self.model.resolve_language(lang)
        if idx is None:
            return None
        rc, slot = self._route[stream_id]
        s = self.groups[rc].slots[slot]
        if s is None or s.stream_id != stream_id:
            raise KeyError(stream_id)
        s.prompt_index = idx
        return idx

    def push_audio(self, stream_id: int, audio_i16: np.ndarray) -> None:
        route = self._route.get(stream_id)
        if route is None:
            return  # ended/dropped concurrently — stale DATA ignored
        rc, slot = route
        self.groups[rc].push_audio(slot, audio_i16)

    def end_stream(self, stream_id: int) -> None:
        route = self._route.get(stream_id)
        if route is None:
            return  # already ended/dropped
        rc, slot = route
        self.groups[rc].end_stream(slot)

    def drop_stream(self, stream_id: int) -> None:
        """Disconnect without finalize (reader CLOSE path). The release is
        queued to the tick thread — see EngineGroup.drop."""
        route = self._route.pop(stream_id, None)
        if route:
            rc, slot = route
            self.groups[rc].drop(slot, stream_id)

    def drain_consumed(self) -> dict[int, int]:
        """Per-stream samples consumed since the last drain (budget release)."""
        out: dict[int, int] = {}
        for g in list(self.groups.values()):
            for sid, n in g.drain_consumed().items():
                out[sid] = out.get(sid, 0) + n
        return out

    # --- live-stream migration -----------------------------------------
    def request_export(self, stream_id: int) -> concurrent.futures.Future:
        """Queue a live-stream export. The returned Future resolves (on the
        tick thread, at the top of its next tick) to a portable snapshot
        dict: device caches + decoder state + staged audio tail + transcript
        bookkeeping. The stream leaves this engine on success. The caller
        must stop pushing audio for the stream before exporting.

        Beyond reference: the reference cannot serialize a live stream
        (SURVEY §5.4) — a server drain/restart there loses every in-flight
        transcript context. Use snapshot_to_bytes / snapshot_from_bytes to
        carry the snapshot across processes."""
        route = self._route.get(stream_id)
        if route is None:
            raise KeyError(stream_id)
        rc, _slot = route
        fut = self.groups[rc].queue_export(stream_id)

        def _done(f: concurrent.futures.Future) -> None:
            if not f.cancelled() and f.exception() is None:
                self._route.pop(stream_id, None)

        fut.add_done_callback(_done)
        return fut

    def request_import(self, snapshot: dict, stream_id: int | None = None,
                       trust_model: bool = False) -> concurrent.futures.Future:
        """Queue a snapshot for adoption. The returned Future resolves to the
        stream id once the tick thread has installed the slot (the K/V
        window is realigned to this engine's slack-buffer phase, so the two
        engines need not be at the same point of their compaction cycle).

        stream_id: keep this id instead of allocating a fresh one (hot model
        swap — the wire protocol pins ids, so a migrated stream must keep
        its id on the replacement engine). The id counter skips past it.
        trust_model: skip the snapshot's model-fingerprint check — ONLY for
        deliberate operator actions (hot swap to a new checkpoint installs
        old-model caches under new weights by design)."""
        rc = int(snapshot["right_context"])
        group = self.groups.get(rc)
        if group is None:
            with self._groups_lock:
                group = self.groups.get(rc)
                if group is None:
                    group = EngineGroup(
                        self.model, self.model.cache_config(rc), self.batch,
                        source=self.source)
                    self.groups[rc] = group
        if stream_id is None:
            stream_id = next(self._ids)
        else:
            if stream_id in self._route:
                raise ValueError(
                    f"stream id {stream_id} is already live on this engine")
            nxt = next(self._ids)
            if stream_id >= nxt:
                self._ids = itertools.count(stream_id + 1)
        slot_fut = group.queue_import(snapshot, stream_id, trust_model)
        out: concurrent.futures.Future = concurrent.futures.Future()

        def _done(f: concurrent.futures.Future) -> None:
            e = f.exception() if not f.cancelled() else None
            if f.cancelled():
                out.cancel()
            elif e is not None:
                out.set_exception(e)
            else:
                self._route[stream_id] = (rc, f.result())
                out.set_result(stream_id)

        slot_fut.add_done_callback(_done)
        return out

    def transcript(self, stream_id: int) -> str:
        rc, slot = self._route[stream_id]
        s = self.groups[rc].slots[slot]
        return s.transcript if s else ""

    def stats(self) -> dict:
        """Aggregate engine observability counters (per latency group)."""
        out = {"streams": len(self._route), "groups": {}}
        for rc, g in list(self.groups.items()):
            rtf = (g.total_step_seconds / g.total_audio_seconds
                   if g.total_audio_seconds else 0.0)
            out["groups"][rc] = {
                "active_slots": g.n_active_streams,
                "ticks": g.total_ticks,
                "steps": g.total_steps,
                "chunks": g.total_chunks,
                "audio_seconds": round(g.total_audio_seconds, 2),
                "step_seconds": round(g.total_step_seconds, 3),
                "transfer_seconds": round(g.total_transfer_seconds, 3),
                "upload_seconds": round(g.total_upload_seconds, 3),
                "tick_seconds": round(g.total_tick_seconds, 3),
                "pack_seconds": round(g.total_pack_seconds, 3),
                "scatter_seconds": round(g.total_scatter_seconds, 3),
                "dispatch_seconds": round(g.total_dispatch_seconds, 3),
                "rtf": round(rtf, 5),
            }
            if g.emit_latencies:
                try:
                    snap = list(g.emit_latencies)
                except RuntimeError:  # tick thread appended mid-iteration
                    snap = list(g.emit_latencies)
                lat = np.asarray(snap) * 1e3
                p50, p90, p99 = np.percentile(lat, (50, 90, 99))
                out["groups"][rc]["emit_latency_ms"] = {
                    "p50": round(float(p50), 1), "p90": round(float(p90), 1),
                    "p99": round(float(p99), 1), "n": int(lat.size),
                }
            if PHASE_TIMERS:
                out["groups"][rc]["encoder_seconds"] = round(
                    g.total_encoder_seconds, 3)
                out["groups"][rc]["decoder_seconds"] = round(
                    g.total_decoder_seconds, 3)
        return out

    def tick(self) -> tuple[list[Event], bool]:
        events: list[Event] = []
        more = False
        # snapshot: start_stream (event-loop thread) may insert a new latency
        # group mid-iteration; iterating the live dict would raise and kill
        # the engine thread
        for group in list(self.groups.values()):
            ev, m = group.tick()
            events.extend(ev)
            more = more or m
        for e in events:
            if e.kind == "ended":
                self._route.pop(e.stream_id, None)
        return events, more


def snapshot_to_bytes(snap: dict) -> bytes:
    """Serialize a live-stream snapshot (from BatchedEngine.request_export)
    for cross-process migration. Inverse: snapshot_from_bytes.

    Leaf dtypes are recorded by name and extended dtypes (bfloat16 — the
    TPU-native serving mode) are stored as their raw bit patterns:
    np.savez would otherwise round-trip ml_dtypes arrays as opaque void
    records that install_slot cannot cast back."""
    import io
    import json

    leaves = [np.asarray(x) for x in jax.tree.leaves(snap["state"])]
    meta = {k: v for k, v in snap.items()
            if k not in ("state", "stage", "tokens", "token_frames")}
    meta["leaf_dtypes"] = [str(x.dtype) for x in leaves]
    buf = io.BytesIO()
    np.savez(
        buf,
        meta=np.frombuffer(json.dumps(meta).encode("utf-8"), np.uint8),
        stage=np.asarray(snap["stage"], np.int16),
        tokens=np.asarray(snap["tokens"], np.int64),
        token_frames=np.asarray(snap["token_frames"], np.int64),
        n_leaves=len(leaves),
        **{f"leaf_{i}": (x.view(np.uint16)
                         if x.dtype == jnp.bfloat16 else x)
           for i, x in enumerate(leaves)},
    )
    return buf.getvalue()


def snapshot_from_bytes(data: bytes, model) -> dict:
    """Rebuild a snapshot dict from bytes. `model` supplies the cache config
    and state pytree structure; the process-level kv-int8 mode must match the
    exporting process (checked — the cache treedef depends on it)."""
    import io
    import json

    from ..ops.kvquant import kv_int8_enabled
    from ..streaming.state import init_stream_state

    z = np.load(io.BytesIO(data))
    meta = json.loads(bytes(z["meta"]).decode("utf-8"))
    if bool(meta["kv_int8"]) != kv_int8_enabled():
        raise ValueError(
            "snapshot kv-int8 mode differs from this process "
            "(set NEMOTRON_TPU_KV_INT8 to match the exporter)")
    cfg = model.cache_config(int(meta["right_context"]))
    template = init_stream_state(1, model.hp, cfg,
                                 dtype=model.params.pos_emb.dtype)
    treedef = jax.tree.structure(template)
    n = int(z["n_leaves"])
    dtypes = meta.pop("leaf_dtypes", None) or [None] * n

    def _leaf(i: int) -> np.ndarray:
        a = z[f"leaf_{i}"]
        name = dtypes[i]
        if name is not None and name != str(a.dtype):
            # extended dtype stored as its bit pattern (bfloat16 as uint16)
            try:
                dt = np.dtype(name)
            except TypeError:
                import ml_dtypes

                dt = np.dtype(getattr(ml_dtypes, name))
            a = a.view(dt)
        return a

    state = jax.tree.unflatten(treedef, [_leaf(i) for i in range(n)])
    snap = dict(meta)
    snap["state"] = state
    snap["stage"] = z["stage"]
    snap["tokens"] = [int(t) for t in z["tokens"]]
    snap["token_frames"] = [int(t) for t in z["token_frames"]]
    return snap
