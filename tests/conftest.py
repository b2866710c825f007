import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (see SURVEY.md §4). The axon sitecustomize
# force-registers the TPU backend and overrides JAX_PLATFORMS, so we must
# override via jax.config *before* any backend is initialized.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Slow-subset split (round-4 VERDICT weak #7: the full suite is ~40 min and
# growing). Modules that execute real models end-to-end (interpret-mode
# Pallas kernels, HF-torch golden oracles, multi-minute engine tests) are
# auto-marked `slow`; everything else is the fast iteration subset:
#
#   python -m pytest tests/ -m "not slow" -q     # ~minutes
#   python -m pytest tests/ -q                   # full suite (the contract)
#
# The FULL suite remains the merge gate — the split exists for iteration.
_SLOW_MODULES = {
    "test_split_serving", "test_tp_serving", "test_decode_step",
    "test_eval_driver", "test_entry_points", "test_sp_train",
    "test_pp_train", "test_vla_golden_reference", "test_vla_zoe_golden",
    "test_vla_with_zoe", "test_zoe", "test_gemma2", "test_flash_attention",
    "test_ring_attention", "test_closed_loop", "test_export_hf",
    "test_trainer_resume", "test_serve_pipeline", "test_bench_serve",
    "test_bench_train", "test_distributed", "test_serving_checkpoint",
    "test_serving_front", "test_eval_quant", "test_reference_parity_harness",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: end-to-end model/engine tests (auto-marked by module)"
    )


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
