"""Test configuration: CPU backend with a virtual 8-device mesh and x64.

Numerical parity tests (golden oxDNA energies) need float64; multi-chip
sharding tests need several devices. Both are provided by the CPU backend --
the TPU path itself is exercised by bench.py and __graft_entry__.py.
"""

import os

# force CPU: the session environment may preset JAX_PLATFORMS to a TPU
# plugin, and numerical tests need true float64 (and local execution)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["MYTHOS_TPU_PALLAS_INTERPRET"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

TEST_DATA = os.environ.get("MYTHOS_TPU_TESTDATA", "/root/reference/data/test-data")


@pytest.fixture(scope="session")
def test_data_dir() -> str:
    if not os.path.isdir(TEST_DATA):
        pytest.skip("golden test data not available")
    return TEST_DATA
