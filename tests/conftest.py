"""Test configuration: run JAX on CPU with 8 virtual devices so sharding tests
need no TPU (the reference's CUDA-only kernel made CPU CI impossible for them,
/root/reference/src/adacof/cupy_module/adacof.py:356-357 — ours is portable).

Note: this image force-registers an `axon` TPU platform ahead of whatever
JAX_PLATFORMS says, so we must override via jax.config, not just the env."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's wall time is dominated by XLA:CPU
# compiles of the same pipeline graphs run-over-run; cache them on disk so
# repeat runs (the common case for a driver/CI loop) skip compilation.
jax.config.update("jax_compilation_cache_dir", "/tmp/fmvfi_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# ---- slow-test gating ------------------------------------------------------
# The default fast run skips @pytest.mark.slow tests, BUT a test named
# explicitly on the command line always runs (the old `addopts = -m 'not
# slow'` silently deselected even explicit node ids — a developer re-running
# a golden pin got a green no-op).  `pytest -m slow`, `pytest -m ''`, or
# `pytest --runslow` run everything the marker expression allows.
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (default fast run skips them)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or config.getoption("-m"):
        return  # an explicit marker expression takes over entirely
    explicit = {
        a.split("::", 1)[1].split("[", 1)[0]
        for a in config.invocation_params.args
        if isinstance(a, str) and "::" in a
    }
    skip = pytest.mark.skip(reason="slow: use --runslow / -m slow")
    for item in items:
        if "slow" in item.keywords and item.originalname not in explicit:
            item.add_marker(skip)
