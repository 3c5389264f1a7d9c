"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU PJRT plugin at
interpreter start and pins JAX_PLATFORMS=axon, so the env-var route is
already stale by the time pytest runs. `jax.config.update` before any
backend is initialized still wins — the standard JAX trick for testing
pjit/shard_map semantics without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses we spawn

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"

# ---------------------------------------------------------------- slow tier
# Tests measured >= ~9 s on the 2-vCPU dev box (pytest --durations of the
# r4 full run: 349 tests / 43:48 total; these account for ~2,330 s of it).
# `pytest -m "not slow"` is the <10-min smoke tier; the full suite stays
# the pre-commit gate. Regenerate after adding heavy tests with:
#   python -m pytest tests/ -q --durations=60  (then update this set)
SLOW_TESTS = {
    "tests/test_adam_bf16nu.py::test_trainer_wiring_and_state_shape",
    "tests/test_attention_pallas.py::test_dropout_determinism_and_rate",
    "tests/test_attention_pallas.py::test_encoder_integration_parity",
    "tests/test_cli.py::test_run_pipeline_cli",
    "tests/test_cli_train_baseline.py::test_train_baseline_cli",
    "tests/test_conv_ln_pallas.py::test_encoder_conv_ln_pallas_matches_xla",
    "tests/test_e2e.py::test_baseline_trainer",
    "tests/test_e2e.py::test_extract_encoder_features",
    "tests/test_e2e.py::test_full_two_stage_pipeline",
    "tests/test_e2e.py::test_stage1_finetune_and_device_rawboost",
    "tests/test_e2e.py::test_stage1_trains_and_checkpoints",
    "tests/test_grad_dtype.py::test_forward_identical_trajectory_bounded",
    "tests/test_graft_entry.py::test_dryrun_multichip_8",
    "tests/test_graft_entry.py::test_dryrun_multichip_odd",
    "tests/test_graft_entry.py::test_dryrun_multichip_respawns_when_backend_too_small",
    "tests/test_graft_entry.py::test_dryrun_multichip_under_driver_env",
    "tests/test_graft_entry.py::test_entry_traces",
    "tests/test_losses_property.py::test_supcon_matches_oracle_fuzz",
    "tests/test_multiprocess.py::test_matches_single_process",
    "tests/test_multiprocess.py::test_two_processes_agree",
    "tests/test_pipeline.py::test_gpipe_stack_toy_linear",
    "tests/test_pipeline.py::test_pp_bf16_forward_drift_bounded",
    "tests/test_pipeline.py::test_pp_bf16_frozen_train_step_runs",
    "tests/test_pipeline.py::test_pp_dropout_smoke",
    "tests/test_pipeline.py::test_pp_encoder_forward_matches_scan",
    "tests/test_pipeline.py::test_pp_encoder_forward_matches_scan_with_remat",
    "tests/test_pipeline.py::test_pp_encoder_grad_matches_scan",
    "tests/test_pipeline.py::test_pp_train_step_matches_replicated",
    "tests/test_preemption.py::test_baseline_mid_epoch_resume_bit_identical",
    "tests/test_preemption.py::test_cli_preemption_exits_75_and_resumes",
    "tests/test_quant.py::test_quantize_encoder_params_targets_only_transformer_denses",
    "tests/test_ref_convert.py::test_converted_checkpoints_drive_the_serving_stack",
    "tests/test_ref_convert.py::test_stage1_finetuned_pt_round_trip",
    "tests/test_quant.py::test_quantized_scorer_preserves_scoring",
    "tests/test_rawboost.py::test_device_batch_invariants",
    "tests/test_rawboost.py::test_fft_fir_matches_direct",
    "tests/test_serve_socket.py::test_socket_client_reset_mid_stream_never_wedges_shutdown",
    "tests/test_serve_socket.py::test_socket_server_corrupt_path_zero_fallback",
    "tests/test_serve_socket.py::test_socket_server_hostile_input",
    "tests/test_serve_socket.py::test_socket_server_interactive_client",
    "tests/test_serve_socket.py::test_socket_server_shutdown_drains_idle_client",
    "tests/test_serve_socket.py::test_socket_server_two_concurrent_clients",
    "tests/test_serve_socket.py::test_socket_server_windowed_matches_score_long",
    "tests/test_serving.py::test_bench_extract_smoke",
    "tests/test_serving.py::test_bench_serving_smoke",
    "tests/test_serving.py::test_put_waves_dp_sharding",
    "tests/test_serving.py::test_sp_trained_checkpoint_serves_and_quantizes",
    "tests/test_sharding.py::test_baseline_fsdp_layout",
    "tests/test_sharding.py::test_checkpoint_restores_across_mesh_shapes",
    "tests/test_sharding.py::test_dp_tp_train_step",
    "tests/test_sharding.py::test_fsdp_param_sharding_numerics",
    "tests/test_sharding.py::test_fsdp_shard_state_preserves_opt_values",
    "tests/test_sharding.py::test_sequence_parallel_composes_with_fsdp",
    "tests/test_sharding.py::test_sequence_parallel_train_step_numerics",
    "tests/test_train_variants.py::test_freeze_feature_extractor",
    "tests/test_trajectory_parity.py::test_baseline_trajectory_matches_reference",
    "tests/test_trajectory_parity.py::test_multiclass_trajectory_matches_reference",
    "tests/test_trajectory_parity.py::test_stage1_trajectory_matches_reference",
    "tests/test_wav2vec2_parity.py::test_attention_layout_bqhk_matches_bhqk",
    "tests/test_wav2vec2_parity.py::test_bf16_fast_math_knobs_stay_close",
    "tests/test_wav2vec2_parity.py::test_full_scale_xlsr300m_conversion_parity",
    "tests/test_wav2vec2_parity.py::test_remat_ffact_policies_match_dots",
    "tests/test_wire.py::test_train_step_bit_identical_on_pcm_input",
}


def pytest_collection_modifyitems(config, items):
    matched = set()
    collected_files = set()
    for item in items:
        base = item.nodeid.split("[")[0]
        collected_files.add(base.split("::")[0])
        if base in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
            matched.add(base)
    # staleness guard: an entry whose FILE was collected but whose test
    # wasn't must be a renamed/removed test — fail loudly so the smoke
    # tier can't silently absorb a multi-minute test. Enforced only for
    # directory-level invocations (the full gate / smoke tier): a
    # single-nodeid or -k run legitimately collects a file partially.
    if config.args and all(os.path.isdir(a) for a in config.args):
        stale = {t for t in SLOW_TESTS - matched
                 if t.split("::")[0] in collected_files}
        assert not stale, \
            f"stale SLOW_TESTS entries (renamed tests?): {stale}"


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference repo not mounted")
    return REFERENCE_DIR


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1337)
