"""Batched multi-stream engine: N concurrent sessions stepped in one jitted call.

The reference serializes every session through a single compute worker
(nemo-server.cpp:192-271, one chunk at a time). Here all sessions sharing a
latency mode live in one device-resident state batch; each tick gathers one
chunk of mel per ready slot, steps them together (inactive slots are gated and
keep their state bit-for-bit), and scatters the emitted tokens back to the
sessions. Stream join/leave is a per-slot state reset — no allocation.

Threading contract: `tick()` may run on a worker thread while the server's
event loop calls claim/release/push_audio/end_stream. All device-state
mutations are owned by tick — claim only *queues* a slot reset (applied at the
top of the next tick), push_audio appends to a queue that tick drains with an
atomic list swap, and release is a host-only slot clear under `_lock`.

Host-side per-stream work (preprocessor bookkeeping, token -> text) stays in
numpy; all model compute is the one batched stream_step.
"""

from __future__ import annotations

import dataclasses
import itertools
import threading
import time

import jax.numpy as jnp
import numpy as np

from ..audio.frontend import StreamPreprocessor
from ..config import CacheConfig
from ..streaming.state import reset_slots


@dataclasses.dataclass
class Event:
    stream_id: int
    kind: str  # "text" | "ended"
    text: str


class _Slot:
    __slots__ = (
        "stream_id", "preproc", "mel_buf", "tokens", "token_frames",
        "transcript", "prompt_index", "ending", "finalize_sent", "audio_queue",
    )

    def __init__(self, stream_id: int, preproc: StreamPreprocessor,
                 n_mels: int, overlap: int, prompt_index: int):
        self.stream_id = stream_id
        self.preproc = preproc
        self.mel_buf = np.zeros((overlap, n_mels), dtype=np.float32)
        self.tokens: list[int] = []
        self.token_frames: list[int] = []
        self.transcript = ""
        self.prompt_index = prompt_index
        self.ending = False
        self.finalize_sent = False
        self.audio_queue: list[np.ndarray] = []


class EngineGroup:
    """All streams of one latency mode, stepped as one batch."""

    def __init__(self, model, cfg: CacheConfig, batch: int):
        self.model = model
        self.cfg = cfg
        self.batch = batch
        self.hp = model.hp
        self.state = model.init_stream_state(batch, cfg)
        self.slots: list[_Slot | None] = [None] * batch
        self.n_active_streams = 0
        # host mirror of decode.frame_offset (avoids a device sync per tick)
        self.frame_offsets = np.zeros(batch, dtype=np.int64)
        self.phase = 0  # slack-buffer phase; advances on all-active ticks
        # pipelined token readback: results of the previous step, processed
        # while the next step runs on device (hides the transfer round-trip)
        # (tokens_dev, active, n_valid, finalizing, frame_base, stream_ids)
        self._pending = None
        # pipelined mel batch: dispatched this tick, appended next tick
        self._pending_mel = None  # (handle, [slot indices])
        # cross-thread mutation queue (see module docstring)
        self._lock = threading.Lock()
        self._pending_resets: list[int] = []
        # samples moved from the push queue into the frontend, per stream —
        # the admission-budget release signal (reference releases as the
        # worker consumes PCM, nemo-server.cpp:116-126)
        self.consumed_samples: dict[int, int] = {}
        # observability (the reference's phase timers, nemo-stream.h:237-244)
        self.total_ticks = 0
        self.total_steps = 0
        self.total_step_seconds = 0.0
        self.total_transfer_seconds = 0.0  # blocked on device readbacks
        self.total_audio_seconds = 0.0
        self.total_chunks = 0

    def has_free_slot(self) -> bool:
        return self.n_active_streams < self.batch

    def claim(self, stream_id: int, prompt_index: int) -> int | None:
        """Assign a slot (host bookkeeping only). The device-state reset is
        queued and applied at the top of the next tick, which owns all device
        mutations — claiming from the event loop cannot race a running step."""
        with self._lock:
            for i, s in enumerate(self.slots):
                if s is None:
                    pp = StreamPreprocessor(
                        self.model.params.preproc.filterbank,
                        self.model.params.preproc.window,
                    )
                    self.slots[i] = _Slot(
                        stream_id, pp, self.hp.n_mels,
                        self.cfg.pre_encode_cache_size, prompt_index,
                    )
                    self._pending_resets.append(i)
                    self.n_active_streams += 1
                    return i
        return None

    def release(self, idx: int) -> None:
        with self._lock:
            if self.slots[idx] is not None:
                self.slots[idx] = None
                self.n_active_streams -= 1

    def find(self, stream_id: int) -> int | None:
        for i, s in enumerate(self.slots):
            if s is not None and s.stream_id == stream_id:
                return i
        return None

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
        self.state = reset_slots(self.state, jnp.asarray(mask), self.hp)
        self.frame_offsets[resets] = 0

    def _dispatch_mel(self) -> None:
        """Dispatch the batched frontend for queued audio (async)."""
        from ..audio.frontend import process_many_start

        pending = []
        for i, s in enumerate(self.slots):
            if s is None or not s.audio_queue:
                continue
            # atomic swap: concurrent push_audio appends land either in the
            # captured list (concatenated below) or the fresh one (next tick)
            q, s.audio_queue = s.audio_queue, []
            if q:
                pending.append((i, s, np.concatenate(q)))
        if not pending:
            return
        with self._lock:
            for _, s, audio in pending:
                self.consumed_samples[s.stream_id] = (
                    self.consumed_samples.get(s.stream_id, 0) + len(audio)
                )
        handle = process_many_start(
            [s.preproc for _, s, _ in pending],
            [audio for _, _, audio in pending],
        )
        if handle is not None:
            self._pending_mel = (handle, [i for i, _, _ in pending])

    def drain_consumed(self) -> dict[int, int]:
        """Pop the per-stream consumed-sample counters (budget release)."""
        with self._lock:
            out = self.consumed_samples
            self.consumed_samples = {}
        return out

    def _collect_mel(self, pending) -> None:
        """Block on a previously dispatched mel batch and append per slot."""
        from ..audio.frontend import process_many_finish

        if pending is None:
            return
        handle, idxs = pending
        t0 = time.perf_counter()
        mels = process_many_finish(handle)
        self.total_transfer_seconds += time.perf_counter() - t0
        for i, mel in zip(idxs, mels):
            s = self.slots[i]
            if s is not None and mel.shape[0]:
                s.mel_buf = np.concatenate([s.mel_buf, mel], axis=0)

    def _process_pending(self, pending) -> list[Event]:
        """Read back and scatter one step's tokens (the device has usually
        moved on to the next step by now, hiding the transfer latency)."""
        if pending is None:
            return []
        tokens_dev, active, n_valid, finalizing, frame_base, stream_ids = pending
        t0 = time.perf_counter()
        tok_np = np.asarray(tokens_dev)
        self.total_transfer_seconds += time.perf_counter() - t0
        events: list[Event] = []
        for i in np.nonzero(active)[0]:
            slot = self.slots[i]
            if slot is None or slot.stream_id != stream_ids[i]:
                continue  # slot dropped/reused since dispatch — discard
            emitted = tok_np[i]  # [T, S]
            mask = emitted >= 0
            if mask.any():
                ids = emitted[mask].tolist()  # row-major: frame-major order
                frames = (frame_base[i] + np.nonzero(mask)[0]).tolist()
                slot.tokens.extend(ids)
                slot.token_frames.extend(frames)
                text = self.model.tokenizer.decode(ids)
                slot.transcript += text
            else:
                text = ""
            if i in finalizing:
                events.append(Event(slot.stream_id, "ended", text))
                self.release(i)
            elif text:
                events.append(Event(slot.stream_id, "text", text))
        return events

    def tick(self) -> tuple[list[Event], bool]:
        """One batched round: process the previous step's results, dispatch
        the next step. Returns (events, more_work_pending)."""
        cfg, hp = self.cfg, self.hp
        chunk_mel = cfg.chunk_mel_frames
        b = self.batch
        self.total_ticks += 1
        events: list[Event] = []

        self._apply_pending_resets()

        mel = np.zeros((b, chunk_mel, hp.n_mels), dtype=np.float32)
        n_valid = np.zeros(b, dtype=np.int32)
        active = np.zeros(b, dtype=bool)
        prompt_idx = np.zeros(b, dtype=np.int32)
        finalizing: set[int] = set()
        ended_now: list[tuple[int, int]] = []  # (slot idx, stream_id)

        # Pipeline the frontend: dispatch this tick's mel batch (async), then
        # block on the PREVIOUS tick's batch while the new one runs. Chunk
        # detection lags one tick; both transfer round-trips hide behind
        # device work.
        prev_mel = self._pending_mel
        self._pending_mel = None
        self._dispatch_mel()
        self._collect_mel(prev_mel)
        for i, slot in enumerate(self.slots):
            if slot is None or slot.finalize_sent:
                continue
            prompt_idx[i] = max(slot.prompt_index, 0)
            mel_inflight = (self._pending_mel is not None
                            and i in self._pending_mel[1])
            if slot.mel_buf.shape[0] >= chunk_mel:
                mel[i] = slot.mel_buf[:chunk_mel]
                slot.mel_buf = slot.mel_buf[cfg.shift_mel_frames :]
                n_valid[i] = cfg.valid_out_len
                active[i] = True
            elif slot.ending and not mel_inflight and not slot.audio_queue:
                total = slot.mel_buf.shape[0]
                real_new = total - cfg.pre_encode_cache_size
                nv = real_new // cfg.subsampling_factor if real_new > 0 else 0
                if nv > 0:
                    mel[i, :total] = slot.mel_buf
                    slot.mel_buf = slot.mel_buf[:0]
                    n_valid[i] = nv
                    active[i] = True
                    finalizing.add(i)
                    # mark dispatched so this slot cannot re-enter the ending
                    # branch next tick (it would double-release via ended_now)
                    slot.finalize_sent = True
                else:
                    slot.finalize_sent = True
                    ended_now.append((i, slot.stream_id))

        if active.any():
            t0 = time.perf_counter()
            self.total_steps += 1
            n_act = int(active.sum())
            self.total_chunks += n_act
            self.total_audio_seconds += (
                n_act * cfg.shift_mel_frames * cfg.hop_length / cfg.sample_rate
            )
            frame_base = self.frame_offsets.copy()
            all_active = bool(active.all())
            if not all_active and self.phase != 0:
                # gated ticks run at phase 0 only: move the live window
                # (currently at self.phase) back to phase 0 so paused slots
                # stay aligned and only one gated variant compiles
                self.state = self.model.compact_state(
                    self.cfg, self.state, phase=self.phase
                )
                self.phase = 0
            active_arg = None if all_active else jnp.asarray(active)
            # snapshot per-slot stream ids at dispatch time: tokens read back
            # next tick are attributed only if the slot still holds the same
            # stream (drop + reuse between dispatch and readback otherwise
            # leaks tokens into the new stream)
            stream_ids = np.full(b, -1, dtype=np.int64)
            for i in np.nonzero(active)[0]:
                s = self.slots[i]
                if s is not None:
                    stream_ids[i] = s.stream_id
            prev = self._pending
            self._pending = None
            self.state, tokens = self.model.stream_step(
                self.cfg,
                self.state,
                jnp.asarray(mel),
                jnp.asarray(n_valid),
                active_arg,
                jnp.asarray(prompt_idx),
                phase=self.phase,
            )
            if all_active:
                # fast path appended at the phase offset; gated ticks are
                # phase-stationary so paused slots stay aligned
                self.phase += 1
                if self.phase >= self.cfg.n_phases:
                    self.state = self.model.compact_state(self.cfg, self.state)
                    self.phase = 0
            self.frame_offsets[active] += n_valid[active]
            # read back the PREVIOUS step's tokens while this one runs
            events.extend(self._process_pending(prev))
            self._pending = (tokens, active, n_valid, finalizing, frame_base,
                             stream_ids)
            self.total_step_seconds += time.perf_counter() - t0
        else:
            events.extend(self._process_pending(self._pending))
            self._pending = None

        for i, sid in ended_now:
            events.append(Event(sid, "ended", ""))
            slot = self.slots[i]
            if slot is not None and slot.stream_id == sid:
                self.release(i)

        more = (
            self._pending is not None
            or self._pending_mel is not None
            or any(
                s is not None and not s.finalize_sent
                and (s.mel_buf.shape[0] >= chunk_mel or s.audio_queue
                     or s.ending)
                for s in self.slots
            )
        )
        return events, more


class BatchedEngine:
    """Multi-latency-mode engine; owns one EngineGroup per right_context."""

    def __init__(self, model, batch_per_group: int = 32):
        self.model = model
        self.batch = batch_per_group
        self.groups: dict[int, EngineGroup] = {}
        self._ids = itertools.count(1)
        self._route: dict[int, tuple[int, int]] = {}  # stream_id -> (rc, slot)

    def start_stream(self, right_context: int = 0, lang: str | None = None) -> int:
        rc = int(right_context)
        if rc not in self.groups:
            self.groups[rc] = EngineGroup(
                self.model, self.model.cache_config(rc), self.batch
            )
        group = self.groups[rc]
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
        idx = self.model.resolve_language(lang)
        if idx is None:
            return None
        rc, slot = self._route[stream_id]
        self.groups[rc].slots[slot].prompt_index = idx
        return idx

    def push_audio(self, stream_id: int, audio_i16: np.ndarray) -> None:
        rc, slot = self._route[stream_id]
        self.groups[rc].push_audio(slot, audio_i16)

    def end_stream(self, stream_id: int) -> None:
        rc, slot = self._route[stream_id]
        self.groups[rc].end_stream(slot)

    def drop_stream(self, stream_id: int) -> None:
        """Disconnect without finalize (reader CLOSE path)."""
        route = self._route.pop(stream_id, None)
        if route:
            rc, slot = route
            group = self.groups[rc]
            s = group.slots[slot]
            if s is not None and s.stream_id == stream_id:
                group.release(slot)

    def drain_consumed(self) -> dict[int, int]:
        """Per-stream samples consumed since the last drain (budget release)."""
        out: dict[int, int] = {}
        for g in self.groups.values():
            for sid, n in g.drain_consumed().items():
                out[sid] = out.get(sid, 0) + n
        return out

    def transcript(self, stream_id: int) -> str:
        rc, slot = self._route[stream_id]
        s = self.groups[rc].slots[slot]
        return s.transcript if s else ""

    def stats(self) -> dict:
        """Aggregate engine observability counters (per latency group)."""
        out = {"streams": len(self._route), "groups": {}}
        for rc, g in self.groups.items():
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
                "rtf": round(rtf, 5),
            }
        return out

    def tick(self) -> tuple[list[Event], bool]:
        events: list[Event] = []
        more = False
        for group in self.groups.values():
            ev, m = group.tick()
            events.extend(ev)
            more = more or m
        for e in events:
            if e.kind == "ended":
                self._route.pop(e.stream_id, None)
        return events, more
