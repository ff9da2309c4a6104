"""Test configuration: force an 8-device CPU mesh before JAX initializes.

This is the JAX-native way to exercise DP/psum sharding without hardware
(SURVEY.md §4): every test sees 8 virtual CPU devices.

NOTE: some environments install a sitecustomize that overrides
JAX_PLATFORMS (e.g. a remote-TPU plugin); `jax.config.update` after import
wins over that, so we do both.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402
import subprocess  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Build the native RLE codec if it is missing so the byte-compat test in
# tests/test_eval_stack.py always runs instead of silently skipping
# (VERDICT r2 weak #7). Failure here is loud: a broken toolchain should
# fail the suite, not hide a skipped test.
_NATIVE = pathlib.Path(__file__).resolve().parent.parent / "native"
if not (_NATIVE / "librle.so").exists():
    subprocess.run(["make", "-C", str(_NATIVE)], check=True)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-compile end-to-end tests")
