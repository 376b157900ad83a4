"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding logic is
exercised without TPU hardware. Two environment quirks are handled here:

* the container's ``sitecustomize`` (PYTHONPATH=/root/.axon_site) registers
  the tunneled-TPU PJRT plugin in *every* interpreter, which breaks both
  CPU selection and the forced host device count — so the conftest re-execs
  pytest once with a sanitized environment;
* XLA kernel compiles are slow on this single-core host, so the persistent
  compilation cache is enabled (reruns hit the cache).
"""

import os
import sys

if not os.environ.get("STNERF_TESTS_REEXEC"):
    env = dict(os.environ)
    env["PYTHONPATH"] = ":".join(p for p in env.get("PYTHONPATH", "").split(":")
                                 if p and ".axon_site" not in p)
    env["STNERF_TESTS_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=8")
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    from stnerf_tpu.utils import enable_compilation_cache

    enable_compilation_cache(os.path.expanduser("~/.cache/stnerf_tests_xla"))


@pytest.fixture
def rng():
    return np.random.default_rng(0)
