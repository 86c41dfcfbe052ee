"""Test configuration: CPU backend with a virtual 8-device mesh and x64.

Numerical parity tests (golden oxDNA energies) need float64; multi-chip
sharding tests need several devices. Both are provided by the CPU backend --
the TPU path itself is exercised by bench.py and __graft_entry__.py.
"""

import os
import sys

# The session environment may register a TPU PJRT plugin in EVERY python
# process via sitecustomize (PYTHONPATH site). The plugin's device tunnel is
# single-client, so a CPU-only test run holding (or waiting on) it blocks —
# and blocks concurrent TPU benchmarks. Registration happens at interpreter
# startup (sitecustomize imports jax, freezing JAX_PLATFORMS before this
# file runs), so the only reliable fix is to re-exec the interpreter with
# the plugin's trigger env removed. The re-exec lives in pytest_configure
# (not module level) so pytest's fd-level output capture can be unwound
# first — exec'ing while fd 1 points at the capture tmpfile silently eats
# the whole session's output.
_NEEDS_REEXEC = bool(os.environ.get("PALLAS_AXON_POOL_IPS")) and not os.environ.get(
    "MYTHOS_TPU_REEXEC"
)


def pytest_configure(config):
    if not _NEEDS_REEXEC:
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        MYTHOS_TPU_REEXEC="1",
    )
    argv = list(getattr(sys, "orig_argv", [sys.executable, "-m", "pytest", *sys.argv[1:]]))
    os.execve(sys.executable, argv, env)

# force CPU: the session environment may preset JAX_PLATFORMS to a TPU
# plugin, and numerical tests need true float64 (and local execution)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["MYTHOS_TPU_PALLAS_INTERPRET"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "backend_optimization_level" not in flags:
    # the suite is XLA-CPU-compile-bound (big energy graphs, tiny systems);
    # O0 + cheap LLVM passes compile ~3x faster with identical semantics
    # (f64 rounding differences are far below the golden tolerances)
    flags += " --xla_backend_optimization_level=0 --xla_llvm_disable_expensive_passes=true"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

TEST_DATA = os.environ.get("MYTHOS_TPU_TESTDATA", "/root/reference/data/test-data")


@pytest.fixture(scope="session")
def test_data_dir() -> str:
    if not os.path.isdir(TEST_DATA):
        pytest.skip("golden test data not available")
    return TEST_DATA
