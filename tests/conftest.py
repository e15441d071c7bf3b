"""Test harness: force an 8-device virtual CPU platform BEFORE jax imports.

This is the TPU answer to "test multi-chip without a cluster"
(SURVEY.md section 4): all sharding/mesh tests run against
``--xla_force_host_platform_device_count=8`` fakes.
"""

import os

os.environ.setdefault("JAX_ENABLE_X64", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# A site hook (e.g. a TPU-tunnel ``sitecustomize``) may have imported jax
# already with JAX_PLATFORMS pointed at hardware.  Backends are not
# initialised until first use, so flipping the *config* (not just the env
# var, which jax has already read) still wins — as long as no fixture
# touched a device yet, which is guaranteed at conftest import time.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "model"))


def has_torch() -> bool:
    try:
        import torch  # noqa: F401

        return True
    except Exception:
        return False


requires_reference = pytest.mark.skipif(
    not (has_reference() and has_torch()),
    reason="reference repo or torch unavailable",
)

requires_torch = pytest.mark.skipif(
    not has_torch(), reason="torch unavailable"
)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


# ---- quick/slow tiers (VERDICT r4 weak #6) ---------------------------
# `python -m pytest tests/ -q -m "not slow"` is the <15-min quick tier
# on the 1-core box; the FULL suite stays the green invariant. The list
# below is every test that measured >=18 s in the round-5 full run —
# regenerate with `python -m pytest tests/ -q --durations=60` and move
# names across the threshold as they change. Matched by originalname,
# so all parametrizations of a listed test are marked.
SLOW_TESTS = {
    "test_two_process_cli_da_e2e",
    "test_graft_entry_dryrun_hostile_env",
    "test_two_process_training_matches_single_process",
    "test_cli_sync_bn_false_per_replica",
    "test_cli_supervised_with_cache_matches_without",
    "test_two_process_cli_supervised_e2e",
    "test_cli_domain_adaptation_per_replica_bn",
    "test_da_step_all_discriminator_variants",
    "test_cli_domain_adaptation",
    "test_spatial_mesh_da_step_matches_unsharded",
    "test_augmented_da_train_losses_match_reference",
    "test_cli_spatial_mesh_supervised",
    "test_two_process_sharded_eval_bit_identical",
    "test_sharded_per_replica_da_step",
    "test_cli_supervised_iter_size",
    "test_cli_supervised_overfits_learnable_rule",
    "test_sharded_combined_da_step_matches_single_device",
    "test_cli_resume_continues_training",
    "test_preset_filters_partition_bisenet",
    "test_da_train_losses_match_reference_train_da",
    "test_cli_supervised_gtav_with_aug",
    "test_nni_trial_losses_match_reference_train_nni",
    "test_cli_supervised_cityscapes",
    "test_bench_functions_smoke",
    "test_bench_survives_int8_compile_stall",
    "test_bench_recovers_mark_from_killed_child",
    "test_iter_size_gradient_accumulation",
    "test_da_training_equivalence",
    "test_trial_main_runs_da",
    "test_sharded_sync_bn_step",
    "test_sharded_per_replica_ohem_step",
    "test_supervised_train_losses_match_reference_train",
    "test_da_step_full",
    "test_cli_export_devices_pod_artifact",
    "test_export_sharded_pod_artifact",
    "test_export_sharded_quantized",
    "test_da_step_out32_head",
    "test_da_seg_loss_interpret_kernels",
    "test_da_seg_loss_matches_unfused_call_path",
    "test_cli_domain_shift_eval_quantized_int8",
    "test_da_step_losses_bit_identical_host_vs_device_replay",
    "test_bisenet_int8_end_to_end",
    "test_da_loop_defers_per_step_tb_scalars",
    "test_cli_e2e_host_augment",
    "test_supervised_step_decreases_loss_and_updates",
    "test_bisenet_train_mode_golden_vs_reference",
    "test_supervised_training_equivalence",
    "test_discriminator_gradient_parity",
    "test_export_spatial_latency_artifact",
    "test_sharded_per_replica_bn_step",
    "test_entry_returns_jittable_forward",
    "test_multihost_dcn_mesh_train_step",
    "test_evaluate_scan_window_matches_per_batch",
    "test_ohem_step_runs",
    "test_cli_export_orientation_matches_faithful_eval",
    "test_export_roundtrip_symbolic_batch",
    "test_trainer_uses_fallback_on_cpu",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: >=18s on the 1-core box (DA-step compiles, subprocess "
        "e2e runs); excluded from the quick tier via -m 'not slow'")


def pytest_collection_modifyitems(config, items):
    seen = set()
    for item in items:
        name = getattr(item, "originalname", item.name)
        if name in SLOW_TESTS:
            seen.add(name)
            item.add_marker(pytest.mark.slow)
    # rot guard: on a FULL-suite collection, every listed name must
    # still exist — a renamed/deleted slow test would otherwise slide
    # silently into the quick tier. Only enforced when the invocation
    # plainly targets the whole tests dir (no --ignore/--deselect, no
    # file/nodeid positionals), so partial runs that legitimately omit
    # listed tests aren't aborted (round-5 review finding).
    unmatched = SLOW_TESTS - seen
    if unmatched and len(items) >= 200:
        inv = [str(a) for a in config.invocation_params.args]
        filtered = any(a.startswith(("--ignore", "--deselect"))
                       for a in inv)
        positionals = [a for a in inv if not a.startswith("-")]
        whole_dir = all(
            os.path.basename(os.path.normpath(a)) == "tests"
            for a in positionals) if positionals else True
        if not filtered and whole_dir:
            raise pytest.UsageError(
                f"tests/conftest.py SLOW_TESTS names no collected test: "
                f"{sorted(unmatched)} — renamed? Update the list (see "
                f"the regeneration note above it).")
