"""Test harness config: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths are testable without TPU hardware. Must run before
any jax import."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# No persistent compilation cache in tests: CPU compiles are cheap, and many
# concurrent test/bench processes sharing the cache dir can leave truncated
# zstd entries that SEGFAULT the next reader (observed: jax
# compilation_cache.get_executable_and_time crashing mid-suite).
os.environ.setdefault("NEMOTRON_TPU_NO_COMPILE_CACHE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The axon TPU plugin registers itself from sitecustomize in every process and
# ignores JAX_PLATFORMS, so pin the default device to CPU explicitly: parity
# tests need f32 matmuls (TPU default matmul precision is bf16-based).
import jax  # noqa: E402

try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except Exception:
    pass
