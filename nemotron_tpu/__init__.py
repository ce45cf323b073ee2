"""nemotron_tpu — TPU-native streaming ASR stack.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
m1el/nemotron-asr.cpp: NVIDIA's nemotron-speech-streaming-0.6b cache-aware
FastConformer + RNNT, GGUF weights (F32/F16/Q8_0/Q4_0), 80 ms - 1.12 s latency
streaming, batched multi-stream serving, CLI + TCP server, and speaker
diarization.
"""

import os as _os

# Persistent compilation cache: the axon TPU remote compiler takes ~2 min per
# new shape; caching makes every CLI/server/bench start after the first fast.
if _os.environ.get("NEMOTRON_TPU_NO_COMPILE_CACHE") != "1":
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("NEMOTRON_TPU_CACHE_DIR",
                            _os.path.expanduser("~/.cache/nemotron_tpu_jax")),
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

from .config import CacheConfig, Hparams, LatencyMode  # noqa: F401

__version__ = "0.1.0"
