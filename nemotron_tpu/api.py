"""High-level model handle: load once, transcribe offline or stream.

`ASRModel` owns the parameter pytrees and a cache of compiled step functions —
one per (latency mode, stream-batch size) for streaming and one per mel-length
bucket for offline transcription. This replaces the reference's nemo_context /
graph-builder layer (src/nemo-ggml.cpp:444-540) with ahead-of-time jitted pure
functions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .audio.frontend import StreamPreprocessor
from .config import CacheConfig, Hparams, LatencyMode
from .models.asr import stream_step, transcribe_batch
from .models.decoder import init_decode_state
from .params import ModelParams, load_model, random_params
from .streaming.state import init_stream_state
from .text.tokenizer import Tokenizer

# Multilingual default prompt index 101 = "auto" (nemo-ggml.cpp:459-462).
DEFAULT_PROMPT_INDEX = 101

MEL_BUCKET = 1024  # offline mel-length bucket (frames) to bound compiles


class ASRModel:
    def __init__(
        self,
        hp: Hparams,
        params: ModelParams,
        vocab: list[str] | None = None,
        prompt_dict: dict[str, int] | None = None,
    ):
        self.hp = hp
        self.params = params
        self.tokenizer = Tokenizer(vocab or [])
        self.prompt_dict = prompt_dict or {}
        self.default_prompt_index = (
            DEFAULT_PROMPT_INDEX if hp.num_prompts > 0 else -1
        )
        if hp.num_prompts > 0 and self.default_prompt_index >= hp.num_prompts:
            self.default_prompt_index = 0
        # find the longest mel segment whose subsampled length fits the pos table
        t = 8 * hp.max_pos_len
        while hp.subsampled_len(t) > hp.max_pos_len:
            t -= 8
        self.max_seg_mel_frames = t
        # Per-INSTANCE cache of jitted step functions. Deliberately not
        # functools.lru_cache on the methods: a class-level cache keys on
        # `self` and pins every model ever built (plus all its compiled
        # executables) for the life of the process — under long test runs the
        # accumulated XLA:CPU JIT code eventually segfaulted the compiler.
        # Here the executables die with the model.
        self._fn_cache: dict = {}
        # Optional device mesh ('dp' over the stream batch, optional 'tp' over
        # the big matmuls — parallel/mesh.py). None = single-device.
        self.mesh = None
        self._weights_fp: str | None = None  # lazy; see weights_fingerprint

    # ------------------------------------------------------------------
    def shard(self, mesh) -> "ASRModel":
        """Serve over a multi-chip mesh: parameters replicated over 'dp' (and
        megatron-sharded over 'tp' if the mesh has one), every stream state
        created by init_stream_state dp-sharded on the batch axis, and every
        host input routed through put_batch dp-sharded the same way. One
        engine then ticks N chips over ICI — the SPMD form of SURVEY §2.9's
        "shard the stream batch across chips with pjit" (the reference is
        strictly single-device, nemo-server.cpp:192)."""
        from .parallel.mesh import param_shardings

        self.mesh = mesh
        self.params = jax.device_put(
            self.params, param_shardings(self.params, mesh)
        )
        self._fn_cache.clear()  # executables compiled for the old placement
        return self

    def put_batch(self, arr):
        """Host array -> device, axis 0 = the stream batch. On a mesh the
        array is laid out dp-sharded so jit never reshards inputs mid-tick;
        single-device it is a plain transfer."""
        if self.mesh is None:
            return jnp.asarray(arr)
        from jax.sharding import NamedSharding, PartitionSpec as P

        arr = np.asarray(arr)
        spec = P(*(("dp",) + (None,) * (arr.ndim - 1)))
        return jax.device_put(arr, NamedSharding(self.mesh, spec))

    def _memo(self, key, build):
        fn = self._fn_cache.get(key)
        if fn is None:
            fn = self._fn_cache[key] = build()
        return fn

    # ------------------------------------------------------------------
    @classmethod
    def from_gguf(cls, path: str, dtype=jnp.float32,
                  keep_quantized: bool = False) -> "ASRModel":
        hp, params, meta = load_model(path, dtype=dtype,
                                      keep_quantized=keep_quantized)
        return cls(hp, params, meta["vocab"], meta["prompt_dict"])

    @classmethod
    def random(cls, hp: Hparams | None = None, seed: int = 0, dtype=jnp.float32):
        hp = hp or Hparams()
        vocab = [("▁w%d" % i) if i % 2 == 0 else ("p%d" % i) for i in
                 range(hp.vocab_size - 1)]
        return cls(hp, random_params(hp, seed=seed, dtype=dtype), vocab)

    # ------------------------------------------------------------------
    def cache_config(self, mode: LatencyMode | int = LatencyMode.PURE_CAUSAL):
        return CacheConfig.for_mode(mode, self.hp)

    @property
    def backend_name(self) -> str:
        """Device the model computes on (nemo_get_backend_name parity)."""
        import jax

        try:
            dev = next(iter(jax.tree.leaves(self.params)[0].devices()))
            return f"{dev.platform}:{dev.id}"
        except Exception:
            return jax.default_backend()

    @property
    def weights_fingerprint(self) -> str:
        """Cheap content fingerprint of this model: hparams + vocab + prompt
        table + a deterministic sample of every weight leaf (first 64
        elements, upcast to f32 — exact for f32/bf16/int8). Stamped into
        live-stream snapshots and verified at import so a snapshot from a
        DIFFERENT checkpoint with identical shapes cannot silently install
        and produce garbage transcripts. One tiny jit + one device fetch,
        computed once per model instance."""
        if self._weights_fp is None:
            import hashlib

            h = hashlib.sha256()
            h.update(repr(self.hp).encode("utf-8"))
            h.update("\x00".join(self.tokenizer.vocab).encode("utf-8"))
            h.update(repr(sorted(self.prompt_dict.items())).encode("utf-8"))
            leaves = jax.tree.leaves(self.params)
            for x in leaves:
                h.update(f"{x.shape}:{x.dtype};".encode("utf-8"))

            def _sample(params):
                return jnp.concatenate([
                    jnp.ravel(leaf)[:64].astype(jnp.float32)
                    for leaf in jax.tree.leaves(params)
                ])

            h.update(np.asarray(jax.jit(_sample)(self.params)).tobytes())
            self._weights_fp = h.hexdigest()
        return self._weights_fp

    def resolve_language(self, lang: str) -> int | None:
        """Prompt code -> index (nemo_set_language, nemo-ggml.cpp:505-523)."""
        if self.hp.num_prompts <= 0:
            return None
        idx = self.prompt_dict.get(lang)
        return idx

    def _stream_step_fn(self, cfg: CacheConfig, batch: int, all_active: bool,
                        phase: int):
        hp = self.hp

        def build():
            @functools.partial(jax.jit, donate_argnums=(1,))
            def fn(params, state, mel_chunk, n_valid, active, prompt_idx):
                return stream_step(
                    params, state, mel_chunk, n_valid,
                    None if all_active else active,
                    prompt_idx if hp.num_prompts > 0 else None, hp=hp,
                    cfg=cfg, phase=phase,
                )

            return fn

        return self._memo(("stream_step", cfg, batch, all_active, phase),
                          build)

    def _compact_fn(self, cfg: CacheConfig, phase: int, masked: bool = False):
        from .models.encoder import compact_cache

        hp = self.hp

        def build():
            if masked:
                @functools.partial(jax.jit, donate_argnums=(0, 1))
                def fn(k, v, mask):
                    return compact_cache(cfg, hp, k, v, phase=phase,
                                         mask=mask)
            else:
                @functools.partial(jax.jit, donate_argnums=(0, 1))
                def fn(k, v):
                    return compact_cache(cfg, hp, k, v, phase=phase)

            return fn

        return self._memo(("compact", cfg, phase, masked), build)

    def _realign_fn(self, cfg: CacheConfig, delta: int):
        from .models.encoder import realign_cache

        hp = self.hp

        def build():
            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def fn(k, v, mask):
                return realign_cache(cfg, hp, k, v, delta, mask)

            return fn

        return self._memo(("realign", cfg, delta), build)

    def realign_state(self, cfg, state, delta: int, mask):
        """Move masked slots' K/V windows forward by `delta` phases (per-slot
        realign-on-resume; see models.encoder.realign_cache)."""
        k, v = self._realign_fn(cfg, delta)(
            state.k_cache, state.v_cache, self.put_batch(mask))
        import dataclasses

        return dataclasses.replace(state, k_cache=k, v_cache=v)

    def stream_step(self, cfg, state, mel_chunk, n_valid, active,
                    prompt_idx=None, phase: int = 0):
        """active may be an array or None (static all-active fast path; the
        caller then advances phase and calls compact_state at the wrap)."""
        b = mel_chunk.shape[0]
        if prompt_idx is None:
            prompt_idx = jnp.full((b,), max(self.default_prompt_index, 0),
                                  dtype=jnp.int32)
        all_active = active is None
        if all_active:
            active = jnp.ones((b,), dtype=bool)  # placeholder arg
        fn = self._stream_step_fn(cfg, b, all_active, phase)
        return fn(self.params, state, mel_chunk, n_valid, active, prompt_idx)

    def _fused_tick_packed_fn(self, cfg: CacheConfig, batch: int,
                              all_active: bool, phase: int, k: int,
                              fast_gated: bool = False):
        import os

        from .models.asr import (fused_serve_tick, fused_serve_tick_multi,
                                 fused_serve_tick_scan)

        hp = self.hp
        shift = cfg.shift_samples
        # chunk-loop (lax.scan) form of the k-chunk program: one compiled
        # tick body regardless of k (the unrolled form's compile footprint
        # grows with k*B and OOMed at k=4/B=512). 0 restores the unrolled
        # program (requires no phase/k divisibility).
        use_scan = os.environ.get("NEMOTRON_TPU_MULTI_SCAN", "1") == "1" \
            and k > 1 and cfg.n_phases % k == 0 and phase % k == 0

        def build():
            @functools.partial(jax.jit, donate_argnums=(1,))
            def fn(params, state, packed):
                # packed [B, k*shift+3] int16: audio | n_valid | prompt |
                # active — ONE host->device transfer per tick instead of four
                # (each upload through a tunneled TPU costs a full round-trip)
                audio = packed[:, : k * shift]
                n_valid = packed[:, k * shift].astype(jnp.int32)
                prompt = packed[:, k * shift + 1].astype(jnp.int32)
                act = packed[:, k * shift + 2] != 0
                prompt_arg = prompt if hp.num_prompts > 0 else None
                if k == 1:
                    return fused_serve_tick(
                        params, state, audio, n_valid,
                        None if all_active else act,
                        prompt_arg, hp=hp, cfg=cfg, phase=phase,
                        fast_gated=fast_gated,
                    )
                # backlog micro-batching: k chunks per dispatch (all-active)
                if use_scan:
                    return fused_serve_tick_scan(
                        params, state, audio, n_valid, prompt_arg,
                        hp=hp, cfg=cfg, k=k, phase=phase,
                    )
                return fused_serve_tick_multi(
                    params, state, audio, n_valid, prompt_arg,
                    hp=hp, cfg=cfg, k=k, phase=phase,
                )

            return fn

        return self._memo(
            ("tick_packed", cfg, batch, all_active, phase, k, fast_gated),
            build)

    @staticmethod
    def pack_tick_inputs(audio_block, n_valid, prompt_idx, active):
        """Host-side packing for fused_tick_packed: [B, k*shift+3] int16."""
        import numpy as np

        b = audio_block.shape[0]
        cols = np.empty((b, 3), dtype=np.int16)
        cols[:, 0] = n_valid
        cols[:, 1] = prompt_idx if prompt_idx is not None else 0
        cols[:, 2] = active if active is not None else 1
        return np.concatenate([audio_block, cols], axis=1)

    def fused_tick_packed(self, cfg, state, packed_dev, all_active: bool,
                          phase: int = 0, k: int = 1,
                          fast_gated: bool = False):
        """fused_tick consuming a pre-uploaded packed input (see
        pack_tick_inputs); lets the caller overlap the upload with other
        work. k > 1 (all-active only) advances every stream by k chunks in
        one program; the caller's phase then advances by k mod n_phases with
        wrap compaction already done on device. fast_gated runs a partially-
        active batch on the phased fast path with masked state updates (the
        engine realigns paused slots on resume)."""
        b = packed_dev.shape[0]
        if k > 1 and not all_active:
            raise ValueError("multi-chunk ticks are all-active only")
        fn = self._fused_tick_packed_fn(cfg, b, all_active, phase, k,
                                        fast_gated and not all_active)
        return fn(self.params, state, packed_dev)

    def _fused_encode_fn(self, cfg: CacheConfig, batch: int, all_active: bool,
                         phase: int):
        from .models.asr import fused_encode_tick

        hp = self.hp

        def build():
            @functools.partial(jax.jit, donate_argnums=(1,))
            def fn(params, state, audio_block, active, prompt_idx):
                return fused_encode_tick(
                    params, state, audio_block,
                    None if all_active else active,
                    prompt_idx if hp.num_prompts > 0 else None, hp=hp,
                    cfg=cfg, phase=phase,
                )

            return fn

        return self._memo(("fused_encode", cfg, batch, all_active, phase),
                          build)

    def _decode_fn(self, all_active: bool):
        from .models.asr import decode_tick

        hp = self.hp

        def build():
            @jax.jit
            def fn(params, state, enc, n_valid, active):
                return decode_tick(params, state, enc, n_valid,
                                   None if all_active else active, hp=hp)

            return fn

        return self._memo(("decode", all_active), build)

    def fused_tick_profiled(self, cfg, state, audio_block, n_valid, active,
                            prompt_idx=None, phase: int = 0):
        """Fused tick split into two device programs with blocking timers —
        the reference's encoder/decoder phase attribution
        (nemo-stream.h:237-244). Slower than fused_tick (two dispatches +
        syncs); enable via NEMOTRON_TPU_PHASE_TIMERS=1 when profiling.
        Returns (state, tokens, encoder_seconds, decoder_seconds)."""
        import time

        b = audio_block.shape[0]
        if prompt_idx is None:
            prompt_idx = jnp.full((b,), max(self.default_prompt_index, 0),
                                  dtype=jnp.int32)
        all_active = active is None
        if all_active:
            active = jnp.ones((b,), dtype=bool)  # placeholder arg
        t0 = time.perf_counter()
        state, enc = self._fused_encode_fn(cfg, b, all_active, phase)(
            self.params, state, audio_block, active, prompt_idx)
        jax.block_until_ready(enc)
        t1 = time.perf_counter()
        state, tokens = self._decode_fn(all_active)(
            self.params, state, enc, n_valid, active)
        jax.block_until_ready(tokens)
        t2 = time.perf_counter()
        return state, tokens, t1 - t0, t2 - t1

    def _prime_fn(self):
        from .streaming.state import prime_frontend

        def build():
            @functools.partial(jax.jit, donate_argnums=(0,))
            def fn(state, mask, tails, lasts):
                return prime_frontend(state, mask, tails, lasts)

            return fn

        return self._memo(("prime",), build)

    def prime_frontend(self, state, mask, tails, lasts):
        """Install frontend carries for newly joined slots (fused path)."""
        return self._prime_fn()(state, self.put_batch(mask),
                                self.put_batch(tails), self.put_batch(lasts))

    def compact_state(self, cfg, state, phase: int | None = None, mask=None):
        """Move the live K/V window back to phase 0. `phase` is the caller's
        CURRENT phase (live window at phase*chunk_len); defaults to the wrap
        (phase == n_phases). Mid-cycle callers must pass their phase.
        `mask` restricts compaction to those slots (per-slot realign flow:
        paused slots' windows must not be overwritten by the wrap)."""
        if phase is None:
            phase = cfg.n_phases
        if phase == 0:
            return state
        if mask is None:
            k, v = self._compact_fn(cfg, phase)(state.k_cache, state.v_cache)
        else:
            k, v = self._compact_fn(cfg, phase, masked=True)(
                state.k_cache, state.v_cache, self.put_batch(mask))
        import dataclasses

        return dataclasses.replace(state, k_cache=k, v_cache=v)

    def init_stream_state(self, batch: int, cfg: CacheConfig):
        dtype = self.params.pos_emb.dtype
        state = init_stream_state(batch, self.hp, cfg, dtype=dtype)
        if self.mesh is not None:
            from .parallel.mesh import state_shardings

            n_dp = self.mesh.shape["dp"]
            if batch % n_dp:
                raise ValueError(
                    f"stream batch {batch} must be divisible by the mesh's "
                    f"dp={n_dp}"
                )
            state = jax.device_put(state, state_shardings(state, self.mesh))
        return state

    # ------------------------------------------------------------------
    def _batch_fn(self, t_mel: int, batch: int):
        hp = self.hp

        def build():
            @jax.jit
            def fn(params, mel, n_frames, dec_state, prompt_idx, n_mel_frames):
                return transcribe_batch(
                    params, mel, hp=hp, n_frames=n_frames,
                    dec_state=dec_state,
                    prompt_idx=prompt_idx if hp.num_prompts > 0 else None,
                    n_mel_frames=n_mel_frames,
                )

            return fn

        return self._memo(("batch", t_mel, batch), build)

    def transcribe_mel(self, mel: np.ndarray, prompt_index: int | None = None):
        """Offline transcription of a full mel sequence [T, n_mels].

        Long audio is segmented at the pos-table cap with the decoder state
        carried across segments (nemo_transcribe_audio_with_state semantics).
        Returns (token_ids, frame_indices).
        """
        hp = self.hp
        if prompt_index is None:
            prompt_index = self.default_prompt_index
        pidx = jnp.asarray([max(prompt_index, 0)], dtype=jnp.int32)

        dec_state = init_decode_state(1, hp, dtype=self.params.pos_emb.dtype)
        token_ids: list[int] = []
        frames: list[int] = []
        offset = 0
        t_total = mel.shape[0]
        seg = self.max_seg_mel_frames
        for start in range(0, max(t_total, 1), seg):
            part = mel[start : start + seg]
            if part.shape[0] == 0:
                break
            t_real = part.shape[0]
            n_sub = hp.subsampled_len(t_real)
            t_pad = min(-(-t_real // MEL_BUCKET) * MEL_BUCKET, seg)
            padded = np.zeros((t_pad, hp.n_mels), dtype=np.float32)
            padded[:t_real] = part
            fn = self._batch_fn(t_pad, 1)
            tokens, dec_state = fn(
                self.params,
                jnp.asarray(padded[None]),
                jnp.asarray([n_sub], dtype=jnp.int32),
                dec_state,
                pidx,
                jnp.asarray([t_real], dtype=jnp.int32),
            )
            from .models.decoder import unpack_tokens

            arr, _conf = unpack_tokens(np.asarray(tokens[0]), hp.vocab_size)
            for t in range(n_sub):
                for s in range(arr.shape[1]):
                    tok = int(arr[t, s])
                    if tok >= 0:
                        token_ids.append(tok)
                        frames.append(offset + t)
            offset += n_sub
        return token_ids, frames

    def transcribe_audio(
        self,
        audio_i16,
        prompt_index: int | None = None,
        timestamp_words: bool = False,
    ) -> str:
        """PCM (s16le 16 kHz mono) -> text. Mirrors nemo_transcribe_audio."""
        pp = StreamPreprocessor(
            self.params.preproc.filterbank, self.params.preproc.window
        )
        mel = pp.process(audio_i16)
        token_ids, frames = self.transcribe_mel(mel, prompt_index)
        return self.tokenizer.decode(token_ids, timestamp_words, frames)

    def transcribe_audios(
        self,
        audios,
        prompt_index: int | None = None,
        timestamp_words: bool = False,
    ) -> list[str]:
        """Batched offline transcription: MANY utterances in one padded
        device program per segment window (ragged lengths via the n_frames
        key mask). The reference transcribes one exact-length sequence per
        graph (src/transcribe.cpp, nemo-ggml.cpp:1592-1668); batching is a
        TPU-native capability. Long files segment at the pos-table cap with
        per-utterance decoder-state carry, exactly like transcribe_mel."""
        if not audios:
            return []
        hp = self.hp
        pp_fb = self.params.preproc.filterbank
        pp_win = self.params.preproc.window
        mels = [StreamPreprocessor(pp_fb, pp_win).process(a) for a in audios]
        B = len(mels)
        if prompt_index is None:
            prompt_index = self.default_prompt_index
        pidx = jnp.full((B,), max(prompt_index, 0), dtype=jnp.int32)

        dec_state = init_decode_state(B, hp, dtype=self.params.pos_emb.dtype)
        token_ids: list[list[int]] = [[] for _ in range(B)]
        frames: list[list[int]] = [[] for _ in range(B)]
        offsets = [0] * B
        seg = self.max_seg_mel_frames
        max_t = max(m.shape[0] for m in mels)
        for start in range(0, max(max_t, 1), seg):
            parts = [m[start : start + seg] for m in mels]
            t_max = max(p.shape[0] for p in parts)
            if t_max == 0:
                break
            t_pad = min(-(-t_max // MEL_BUCKET) * MEL_BUCKET, seg)
            padded = np.zeros((B, t_pad, hp.n_mels), dtype=np.float32)
            n_sub = np.zeros((B,), dtype=np.int32)
            n_mel = np.zeros((B,), dtype=np.int32)
            for i, p in enumerate(parts):
                padded[i, : p.shape[0]] = p
                n_sub[i] = hp.subsampled_len(p.shape[0]) if p.shape[0] else 0
                n_mel[i] = p.shape[0]
            fn = self._batch_fn(t_pad, B)
            tokens, dec_state = fn(self.params, jnp.asarray(padded),
                                   jnp.asarray(n_sub), dec_state, pidx,
                                   jnp.asarray(n_mel))
            from .models.asr import tokens_to_list

            for i, seq in enumerate(
                    tokens_to_list(tokens, n_sub,
                                   vocab_size=hp.vocab_size)):
                for tok, t in seq:
                    token_ids[i].append(tok)
                    frames[i].append(offsets[i] + t)
                offsets[i] += int(n_sub[i])
        return [
            self.tokenizer.decode(token_ids[i], timestamp_words, frames[i])
            for i in range(B)
        ]
