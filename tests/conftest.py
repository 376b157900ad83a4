"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding logic is
exercised without TPU hardware. Two environment quirks are handled here:

* the container's ``sitecustomize`` (PYTHONPATH=/root/.axon_site) imports
  jax and registers the tunneled-TPU PJRT plugin in *every* interpreter —
  but jax initializes its backends lazily, so forcing
  ``jax_platforms=cpu`` + the virtual host device count here (before any
  computation touches a device) is enough; no re-exec. (An earlier re-exec
  approach broke pytest's fd capture — the child inherits the outer
  pytest's capture fds and all output vanishes.)
* XLA kernel compiles are slow on this single-core host, so the persistent
  compilation cache is enabled (reruns hit the cache).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    from stnerf_tpu.utils import enable_compilation_cache

    enable_compilation_cache(os.path.expanduser("~/.cache/stnerf_tests_xla"))


@pytest.fixture
def rng():
    return np.random.default_rng(0)
