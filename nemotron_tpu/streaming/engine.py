"""Batched multi-stream engine: N concurrent sessions stepped in one jitted call.

The reference serializes every session through a single compute worker
(nemo-server.cpp:192-271, one chunk at a time). Here all sessions sharing a
latency mode live in one device-resident state batch; each tick gathers one
chunk of mel per ready slot, steps them together (inactive slots are gated and
keep their state bit-for-bit), and scatters the emitted tokens back to the
sessions. Stream join/leave is a per-slot state reset — no allocation.

Host-side per-stream work (preprocessor bookkeeping, token -> text) stays in
numpy; all model compute is the one batched stream_step.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Callable

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
        "transcript", "prompt_index", "ending", "audio_queue",
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
        self._pending = None  # (tokens_dev, active, n_valid, finalizing, frame_base)
        # pipelined mel batch: dispatched this tick, appended next tick
        self._pending_mel = None  # (handle, [slot indices])
        # observability (the reference's phase timers, nemo-stream.h:237-244)
        self.total_ticks = 0
        self.total_steps = 0
        self.total_step_seconds = 0.0
        self.total_audio_seconds = 0.0
        self.total_chunks = 0

    def has_free_slot(self) -> bool:
        return self.n_active_streams < self.batch

    def claim(self, stream_id: int, prompt_index: int) -> int | None:
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
                mask = np.zeros(self.batch, dtype=bool)
                mask[i] = True
                self.state = reset_slots(self.state, jnp.asarray(mask), self.hp)
                self.frame_offsets[i] = 0
                self.n_active_streams += 1
                return i
        return None

    def release(self, idx: int) -> None:
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
        self.slots[idx].audio_queue.append(audio)

    def end_stream(self, idx: int) -> None:
        self.slots[idx].ending = True

    # ------------------------------------------------------------------
    def _dispatch_mel(self) -> None:
        """Dispatch the batched frontend for queued audio (async)."""
        from ..audio.frontend import process_many_start

        pending = [
            (i, s) for i, s in enumerate(self.slots)
            if s is not None and s.audio_queue
        ]
        if not pending:
            return
        pps = [s.preproc for _, s in pending]
        audios = [np.concatenate(s.audio_queue) for _, s in pending]
        for _, s in pending:
            s.audio_queue.clear()
        handle = process_many_start(pps, audios)
        if handle is not None:
            self._pending_mel = (handle, [i for i, _ in pending])

    def _collect_mel(self, pending) -> None:
        """Block on a previously dispatched mel batch and append per slot."""
        from ..audio.frontend import process_many_finish

        if pending is None:
            return
        handle, idxs = pending
        mels = process_many_finish(handle)
        for i, mel in zip(idxs, mels):
            s = self.slots[i]
            if s is not None and mel.shape[0]:
                s.mel_buf = np.concatenate([s.mel_buf, mel], axis=0)

    def _process_pending(self) -> list[Event]:
        """Read back and scatter the PREVIOUS step's tokens (device likely has
        moved on to the next step by now, hiding the transfer latency)."""
        if self._pending is None:
            return []
        tokens_dev, active, n_valid, finalizing, frame_base = self._pending
        self._pending = None
        tok_np = np.asarray(tokens_dev)
        self.total_step_seconds += 0.0
        events: list[Event] = []
        for i in np.nonzero(active)[0]:
            slot = self.slots[i]
            if slot is None:
                continue
            ids = []
            for t in range(tok_np.shape[1]):
                for sym in range(tok_np.shape[2]):
                    tk = int(tok_np[i, t, sym])
                    if tk >= 0:
                        ids.append(tk)
                        slot.token_frames.append(int(frame_base[i]) + t)
            if ids:
                slot.tokens.extend(ids)
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

        mel = np.zeros((b, chunk_mel, hp.n_mels), dtype=np.float32)
        n_valid = np.zeros(b, dtype=np.int32)
        active = np.zeros(b, dtype=bool)
        prompt_idx = np.zeros(b, dtype=np.int32)
        finalizing: set[int] = set()
        ended_now: list[int] = []

        # Pipeline the frontend: dispatch this tick's mel batch (async), then
        # block on the PREVIOUS tick's batch while the new one runs. Chunk
        # detection lags one tick; both transfer round-trips hide behind
        # device work.
        prev_mel = self._pending_mel
        self._pending_mel = None
        self._dispatch_mel()
        self._collect_mel(prev_mel)
        for i, slot in enumerate(self.slots):
            if slot is None:
                continue
            prompt_idx[i] = max(slot.prompt_index, 0)
            mel_inflight = (self._pending_mel is not None
                            and i in self._pending_mel[1])
            if slot.mel_buf.shape[0] >= chunk_mel:
                mel[i] = slot.mel_buf[:chunk_mel]
                slot.mel_buf = slot.mel_buf[cfg.shift_mel_frames :]
                n_valid[i] = cfg.valid_out_len
                active[i] = True
            elif slot.ending and not mel_inflight:
                total = slot.mel_buf.shape[0]
                real_new = total - cfg.pre_encode_cache_size
                nv = real_new // cfg.subsampling_factor if real_new > 0 else 0
                if nv > 0:
                    mel[i, :total] = slot.mel_buf
                    slot.mel_buf = slot.mel_buf[:0]
                    n_valid[i] = nv
                    active[i] = True
                    finalizing.add(i)
                else:
                    ended_now.append(i)

        if active.any():
            import time as _time

            t0 = _time.perf_counter()
            self.total_steps += 1
            n_act = int(active.sum())
            self.total_chunks += n_act
            self.total_audio_seconds += (
                n_act * cfg.shift_mel_frames * cfg.hop_length / cfg.sample_rate
            )
            frame_base = self.frame_offsets.copy()
            all_active = bool(active.all())
            if not all_active and self.phase != 0:
                # gated ticks run at phase 0 only: compact first so paused
                # slots stay aligned and only one gated variant compiles
                self.state = self.model.compact_state(self.cfg, self.state)
                self.phase = 0
            active_arg = None if all_active else jnp.asarray(active)
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
            prev = self._pending
            self._pending = (tokens, active, n_valid, finalizing, frame_base)
            # read back the PREVIOUS step's tokens while this one runs
            if prev is not None:
                self._pending, keep = prev, self._pending
                events.extend(self._process_pending())
                self._pending = keep
            self.total_step_seconds += _time.perf_counter() - t0
        else:
            events.extend(self._process_pending())

        for i in ended_now:
            events.append(Event(self.slots[i].stream_id, "ended", ""))
            self.release(i)

        more = (
            self._pending is not None
            or self._pending_mel is not None
            or any(
                s is not None
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
            self.groups[rc].release(slot)

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
