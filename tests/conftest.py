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


# ---------------------------------------------------------------------------
# Fast subset: `pytest -m "not slow"` finishes in well under 10 minutes on
# the 1-core driver box; the full suite (~70 min there) stays the session-end
# gate. Centralized here (one list, measured from a full --durations run)
# instead of scattering markers across files. Names are nodeids without the
# parametrization suffix.
# ---------------------------------------------------------------------------
import pytest  # noqa: E402

SLOW_TESTS = {
    "tests/test_converters.py::test_wer_readiness_drill_synthetic",
    "tests/test_converters.py::test_diarize_converter_end_to_end",
    "tests/test_engine.py::test_engine_prewarm_then_serve",
    "tests/test_engine.py::test_engine_all_active_then_starve",
    "tests/test_engine.py::test_engine_backlog_respects_batch_cap",
    "tests/test_engine.py::test_engine_matches_sessions",
    "tests/test_engine.py::test_engine_mixed_latency_groups",
    "tests/test_engine.py::test_engine_staggered_join_and_slot_reuse",
    "tests/test_engine.py::test_engine_slot_reuse_discards_inflight_tokens",
    "tests/test_engine.py::test_engine_backlog_multichunk_matches_sessions",
    "tests/test_engine.py::test_scan_multichunk_matches_sequential_ticks",
    "tests/test_engine.py::test_engine_end_on_chunk_boundary_keeps_final_text",
    "tests/test_engine_mesh.py::test_mesh_engine_matches_plain",
    "tests/test_engine_migrate.py::test_stream_migrates_mid_flight",
    "tests/test_engine_migrate.py::test_migration_across_topologies",
    "tests/test_engine_migrate.py::test_migration_with_bf16_state",
    "tests/test_engine_migrate.py::test_migration_with_kv_int8_caches",
    "tests/test_engine_schedules.py::test_engine_random_schedules",
    "tests/test_kv_int8.py::test_int8_engine_matches_sessions",
    "tests/test_native_server.py::test_native_server_budget_backpressure",
    "tests/test_native_server.py::test_native_server_matches_session",
    "tests/test_native_server.py::test_native_server_on_dp_mesh_matches_session",
    "tests/test_native_server.py::test_native_server_two_streams_one_connection",
    "tests/test_parallel.py::test_dryrun_multichip_entrypoint",
    "tests/test_parity_producers.py::test_dump_activations_all_taps",
    "tests/test_replicas.py::test_routed_client_balances_and_matches_sessions",
    "tests/test_server.py::test_server_on_dp_mesh_matches_session",
    "tests/test_server.py::test_server_stream_ownership_and_config_validation",
    "tests/test_server.py::test_server_single_stream_matches_session",
    "tests/test_server.py::test_server_budget_released_as_audio_consumed",
    "tests/test_server_diarize.py::test_diarize_stream_gets_word_and_result_frames",
    "tests/test_server_diarize.py::test_slow_finalize_does_not_stall_other_streams",
    "tests/test_server_diarize.py::test_plain_and_diarize_streams_multiplex",
    "tests/test_server_hotswap.py::test_hot_swap_same_weights_is_transcript_identical",
    "tests/test_server_hotswap.py::test_hot_swap_new_weights_streams_continue",
    "tests/test_session.py::test_session_token_exact_e2e",
    "tests/test_session.py::test_session_irregular_pushes_match_regular",
    "tests/test_session.py::test_session_checkpoint_resume",
    "tests/test_session.py::test_session_timestamp_words",
    "tests/test_session.py::test_multilingual_language_switch_mid_stream",
    "tests/test_engine.py::test_engine_finalize_with_valid_tail_rc1",
    "tests/test_engine.py::test_engine_phase_timers",
    "tests/test_server.py::test_server_two_streams_one_connection",
    "tests/test_e2e_oracle.py::test_streaming_e2e_tokens_match_torch_oracle",
    "tests/test_converters.py::test_asr_converter_quantized",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.nodeid.split("[", 1)[0]
        if base in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
