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
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache: the suite's dominant cost is jit compiles of the
# many env/algo variants (round-2 full suite: 34 min cold on one core);
# warm-cache reruns skip them.  Threshold lowered so the mid-size env
# compiles (~1 s) are cached too.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU mesh"
assert len(jax.devices()) >= 8, "xla_force_host_platform_device_count failed"


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="also run tests marked slow (long learnability/training runs); "
             "default tier excludes them")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running learnability/training tests")


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: `pytest tests/ -q` runs the quick tier;
    `pytest tests/ -q --slow` (or RUN_SLOW=1) runs everything."""
    if config.getoption("--slow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow tier: run with --slow or RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
