"""Single-stream host session: incremental audio in, delta text out.

Mirrors the nemo_stream_* API surface and exact buffering semantics
(src/nemo-stream.cpp:1145-1293):
  - mel buffer primed with pre_encode_cache_size zero frames
  - process chunks while buffer >= chunk_mel_frames, advance by shift frames
  - finalize zero-pads the tail to the fixed chunk width and keeps
    floor(real_new/subsampling) output frames
  - process_incremental returns only the *delta* text; finalize returns only
    the suffix produced during finalization.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..audio.frontend import StreamPreprocessor
from ..config import CacheConfig, LatencyMode
from ..models.asr import tokens_to_list


class StreamSession:
    def __init__(self, model, cfg: CacheConfig | LatencyMode | int | None = None,
                 lang: str | None = None, timestamp_words: bool = False):
        from ..api import ASRModel  # noqa: F401 (typing only)

        self.model = model
        # emit {%.2f} inline word timestamps in the incremental text
        # (reference: tokens_to_text, nemo-ggml.cpp:1556-1583)
        self.timestamp_words = timestamp_words
        if cfg is None:
            cfg = model.cache_config(LatencyMode.PURE_CAUSAL)
        elif not isinstance(cfg, CacheConfig):
            cfg = model.cache_config(cfg)
        self.cfg = cfg
        self.hp = model.hp
        self.preprocessor = StreamPreprocessor(
            model.params.preproc.filterbank, model.params.preproc.window
        )
        self.prompt_index = model.default_prompt_index
        if lang is not None:
            self.set_language(lang)

        self.state = model.init_stream_state(1, cfg)
        self.phase = 0  # slack-buffer phase (see models/encoder.py)
        # mel buffer primed with the 9-frame overlap of zeros
        self.mel_buffer = np.zeros(
            (cfg.pre_encode_cache_size, self.hp.n_mels), dtype=np.float32
        )
        self.tokens: list[int] = []
        self.token_frames: list[int] = []
        self.token_confs: list[float] = []  # NEMOTRON_TPU_CONFIDENCE=1 only
        self.transcript = ""
        self.total_audio_seconds = 0.0
        self.total_compute_seconds = 0.0
        self.total_chunks = 0
        self._finalized = False

    # ------------------------------------------------------------------
    def set_language(self, lang: str) -> bool:
        idx = self.model.resolve_language(lang)
        if idx is None:
            return False
        self.prompt_index = idx
        return True

    def reset(self) -> None:
        self.preprocessor.reset()
        self.state = self.model.init_stream_state(1, self.cfg)
        self.phase = 0
        self.mel_buffer = np.zeros(
            (self.cfg.pre_encode_cache_size, self.hp.n_mels), dtype=np.float32
        )
        self.tokens.clear()
        self.token_frames.clear()
        self.token_confs.clear()
        self.transcript = ""
        self.total_audio_seconds = 0.0
        self.total_compute_seconds = 0.0
        self.total_chunks = 0
        self._finalized = False

    # ------------------------------------------------------------------
    def _run_chunk(self, mel_chunk: np.ndarray, n_valid: int) -> str:
        import time

        t0 = time.perf_counter()
        frame_base = int(self.state.decode.frame_offset[0])
        # single stream is always active -> phased fast path + compaction
        self.state, tokens = self.model.stream_step(
            self.cfg,
            self.state,
            jnp.asarray(mel_chunk[None]),
            jnp.asarray([n_valid], dtype=jnp.int32),
            None,
            jnp.asarray([max(self.prompt_index, 0)], dtype=jnp.int32),
            phase=self.phase,
        )
        self.phase += 1
        if self.phase >= self.cfg.n_phases:
            self.state = self.model.compact_state(self.cfg, self.state)
            self.phase = 0
        self.total_chunks += 1
        import jax

        jax.block_until_ready(tokens)
        self.total_compute_seconds += time.perf_counter() - t0
        new = tokens_to_list(tokens, vocab_size=self.hp.vocab_size,
                             with_conf=True)[0]
        if not new:
            return ""
        ids = [tk for tk, _, _ in new]
        frames = [frame_base + fr for _, fr, _ in new]
        self.tokens.extend(ids)
        self.token_frames.extend(frames)
        if new and new[0][2] is not None:
            self.token_confs.extend(cf for _, _, cf in new)
        text = self.model.tokenizer.decode(
            ids, timestamp_words=self.timestamp_words, frames=frames
        )
        self.transcript += text
        return text

    def process_incremental(self, audio_i16) -> str:
        """Feed PCM samples; returns newly decoded text (may be empty)."""
        if self._finalized:
            raise RuntimeError("session already finalized; call reset()")
        audio = np.asarray(audio_i16)
        if audio.size == 0:
            return ""
        self.total_audio_seconds += audio.shape[-1] / self.cfg.sample_rate
        mel = self.preprocessor.process(audio)
        if mel.shape[0]:
            self.mel_buffer = np.concatenate([self.mel_buffer, mel], axis=0)

        chunk_mel = self.cfg.chunk_mel_frames
        shift = self.cfg.shift_mel_frames
        out = []
        while self.mel_buffer.shape[0] >= chunk_mel:
            out.append(self._run_chunk(self.mel_buffer[:chunk_mel],
                                        self.cfg.valid_out_len))
            self.mel_buffer = self.mel_buffer[shift:]
        return "".join(out)

    def finalize(self) -> str:
        """Flush the final partial chunk (zero-padded to the fixed graph width,
        keeping floor(real_new/subsampling) frames). Returns only the text
        produced during finalization."""
        if self._finalized:
            return ""
        self._finalized = True
        cfg = self.cfg
        overlap = cfg.pre_encode_cache_size
        total = self.mel_buffer.shape[0]
        if total <= overlap:
            return ""
        real_new = total - overlap
        n_valid = real_new // cfg.subsampling_factor
        if n_valid <= 0:
            return ""
        chunk = np.zeros((cfg.chunk_mel_frames, self.hp.n_mels), dtype=np.float32)
        chunk[:total] = self.mel_buffer[: cfg.chunk_mel_frames]
        return self._run_chunk(chunk, n_valid)

    # ------------------------------------------------------------------
    def get_transcript(self) -> str:
        return self.transcript

    def get_tokens(self) -> list[int]:
        return list(self.tokens)

    def rtf(self) -> float:
        """Real-time factor: compute time / audio time (nemo-stream.h:259-261)."""
        if self.total_audio_seconds <= 0:
            return 0.0
        return self.total_compute_seconds / self.total_audio_seconds

    def save_state(self, path: str) -> None:
        """Checkpoint the full streaming context (device caches + decoder
        state + host mel/audio buffers + transcript) so a dropped stream can
        resume exactly where it left off. The reference cannot do this
        (SURVEY §5.4: 'a dropped stream loses its context')."""
        import jax

        leaves, treedef = jax.tree.flatten(self.state)
        np.savez(
            path,
            n_leaves=len(leaves),
            **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
            mel_buffer=self.mel_buffer,
            pp_buf=self.preprocessor.buf,
            pp_last=np.float32(self.preprocessor.last_sample),
            tokens=np.asarray(self.tokens, dtype=np.int64),
            token_frames=np.asarray(self.token_frames, dtype=np.int64),
            transcript=np.frombuffer(self.transcript.encode("utf-8"), np.uint8),
            prompt_index=np.int64(self.prompt_index),
            total_audio_seconds=np.float64(self.total_audio_seconds),
            total_chunks=np.int64(self.total_chunks),
            phase=np.int64(self.phase),
        )

    def restore_state(self, path: str) -> None:
        import jax
        import jax.numpy as jnp

        z = np.load(path)
        n = int(z["n_leaves"])
        _, treedef = jax.tree.flatten(self.state)
        leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n)]
        self.state = jax.tree.unflatten(treedef, leaves)
        self.mel_buffer = z["mel_buffer"]
        self.preprocessor.buf = z["pp_buf"]
        self.preprocessor.last_sample = float(z["pp_last"])
        self.tokens = [int(x) for x in z["tokens"]]
        self.token_frames = [int(x) for x in z["token_frames"]]
        self.transcript = bytes(z["transcript"]).decode("utf-8")
        self.prompt_index = int(z["prompt_index"])
        self.total_audio_seconds = float(z["total_audio_seconds"])
        self.total_chunks = int(z["total_chunks"])
        self.phase = int(z["phase"]) if "phase" in z else 0
        self._finalized = False

    def timed_words(self) -> list[tuple[str, float]]:
        """(word, start_seconds) pairs from emitted tokens (80 ms frames)."""
        words: list[tuple[str, float]] = []
        cur = ""
        cur_t = 0.0
        for tid, fr in zip(self.tokens, self.token_frames):
            piece = self.model.tokenizer.piece(tid)
            if piece.startswith("▁"):
                if cur:
                    words.append((cur, cur_t))
                cur = piece[1:]
                cur_t = fr * 1280 / 16000
            else:
                cur += piece
        if cur:
            words.append((cur, cur_t))
        return words

    def timed_words_conf(self) -> list[tuple[str, float, float]]:
        """(word, start_seconds, confidence) — confidence is the MINIMUM
        packed per-token softmax probability over the word's tokens (the
        weakest piece bounds trust in the word). Requires
        NEMOTRON_TPU_CONFIDENCE=1; raises otherwise."""
        if len(self.token_confs) != len(self.tokens):
            raise RuntimeError(
                "per-token confidence was not recorded "
                "(set NEMOTRON_TPU_CONFIDENCE=1 before building the model)")
        words: list[tuple[str, float, float]] = []
        cur = ""
        cur_t = 0.0
        cur_c = 1.0
        for tid, fr, cf in zip(self.tokens, self.token_frames,
                               self.token_confs):
            piece = self.model.tokenizer.piece(tid)
            if piece.startswith("\u2581"):
                if cur:
                    words.append((cur, cur_t, cur_c))
                cur = piece[1:]
                cur_t = fr * 1280 / 16000
                cur_c = cf
            else:
                cur += piece
                cur_c = min(cur_c, cf)
        if cur:
            words.append((cur, cur_t, cur_c))
        return words
