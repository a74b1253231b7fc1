import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (the driver separately dry-runs
# __graft_entry__.dryrun_multichip).
#
# NOTE: this environment pre-imports jax via a sitecustomize hook with
# JAX_PLATFORMS=axon (real TPU tunnel), so env vars alone are too late —
# the platform must be overridden through jax.config before first backend use.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU mesh"
assert len(jax.devices()) >= 8, "xla_force_host_platform_device_count failed"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running learnability/training tests")
