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
    def _drain_audio_all(self) -> None:
        """Batched frontend: every slot with queued audio advances through ONE
        device mel call (audio/frontend.process_many)."""
        from ..audio.frontend import process_many

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
        mels = process_many(pps, audios)
        for (_, s), mel in zip(pending, mels):
            if mel.shape[0]:
                s.mel_buf = np.concatenate([s.mel_buf, mel], axis=0)

    def tick(self) -> tuple[list[Event], bool]:
        """One batched round. Returns (events, more_work_pending)."""
        cfg, hp = self.cfg, self.hp
        chunk_mel = cfg.chunk_mel_frames
        b = self.batch

        mel = np.zeros((b, chunk_mel, hp.n_mels), dtype=np.float32)
        n_valid = np.zeros(b, dtype=np.int32)
        active = np.zeros(b, dtype=bool)
        prompt_idx = np.zeros(b, dtype=np.int32)
        finalizing: list[int] = []
        ended_now: list[int] = []

        self._drain_audio_all()
        for i, slot in enumerate(self.slots):
            if slot is None:
                continue
            prompt_idx[i] = max(slot.prompt_index, 0)
            if slot.mel_buf.shape[0] >= chunk_mel:
                mel[i] = slot.mel_buf[:chunk_mel]
                slot.mel_buf = slot.mel_buf[cfg.shift_mel_frames :]
                n_valid[i] = cfg.valid_out_len
                active[i] = True
            elif slot.ending:
                total = slot.mel_buf.shape[0]
                real_new = total - cfg.pre_encode_cache_size
                nv = real_new // cfg.subsampling_factor if real_new > 0 else 0
                if nv > 0:
                    mel[i, :total] = slot.mel_buf
                    slot.mel_buf = slot.mel_buf[:0]
                    n_valid[i] = nv
                    active[i] = True
                    finalizing.append(i)
                else:
                    ended_now.append(i)

        self.total_ticks += 1
        events: list[Event] = []
        if active.any():
            import time as _time

            t0 = _time.perf_counter()
            self.total_steps += 1
            n_act = int(active.sum())
            self.total_chunks += n_act
            self.total_audio_seconds += (
                n_act * cfg.shift_mel_frames * cfg.hop_length / cfg.sample_rate
            )
            frame_base = np.asarray(self.state.decode.frame_offset)
            # all slots live with full chunks -> static fast path (no per-slot
            # state gating selects over the caches)
            active_arg = None if bool(active.all()) else jnp.asarray(active)
            self.state, tokens = self.model.stream_step(
                self.cfg,
                self.state,
                jnp.asarray(mel),
                jnp.asarray(n_valid),
                active_arg,
                jnp.asarray(prompt_idx),
            )
            tok_np = np.asarray(tokens)
            self.total_step_seconds += _time.perf_counter() - t0
            for i in np.nonzero(active)[0]:
                slot = self.slots[i]
                ids = []
                for t in range(tok_np.shape[1]):
                    for s in range(tok_np.shape[2]):
                        tk = int(tok_np[i, t, s])
                        if tk >= 0:
                            ids.append(tk)
                            slot.token_frames.append(int(frame_base[i]) + t)
                if ids:
                    slot.tokens.extend(ids)
                    text = self.model.tokenizer.decode(ids)
                    slot.transcript += text
                    kind = "text" if i not in finalizing else "ended"
                    if kind == "text":
                        events.append(Event(slot.stream_id, "text", text))
                    else:
                        events.append(Event(slot.stream_id, "ended", text))
                elif i in finalizing:
                    events.append(Event(slot.stream_id, "ended", ""))
            for i in finalizing:
                self.release(i)

        for i in ended_now:
            events.append(Event(self.slots[i].stream_id, "ended", ""))
            self.release(i)

        more = any(
            s is not None
            and (s.mel_buf.shape[0] >= chunk_mel or s.audio_queue or s.ending)
            for s in self.slots
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
