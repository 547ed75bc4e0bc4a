"""Test-session bootstrap.

Tests run on a virtual 8-device CPU mesh (the standard way to test
pjit/shard_map sharding without a TPU pod — SURVEY.md §4).

Note: this environment's site hook force-selects the `axon` TPU platform
programmatically (overriding the JAX_PLATFORMS env var), so we must also
override via jax.config before any backend is initialized.
"""

import os

if os.environ.get("TPUDENOISE_TPU_TESTS") == "1":
    # Opt-in real-accelerator run (tests/test_tpu_numerics.py): leave the
    # platform alone so the device-precision budgets are actually
    # exercised.  Usage:
    #   TPUDENOISE_TPU_TESTS=1 pytest tests/test_tpu_numerics.py -q
    import jax  # noqa: E402
else:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
