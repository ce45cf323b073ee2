"""nemotron_tpu — TPU-native streaming ASR stack.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
m1el/nemotron-asr.cpp: NVIDIA's nemotron-speech-streaming-0.6b cache-aware
FastConformer + RNNT, GGUF weights (F32/F16/Q8_0/Q4_0), 80 ms - 1.12 s latency
streaming, batched multi-stream serving, CLI + TCP server, and speaker
diarization.
"""

from .config import CacheConfig, Hparams, LatencyMode  # noqa: F401

__version__ = "0.1.0"
