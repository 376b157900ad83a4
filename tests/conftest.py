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
* tests marked ``isolate`` (the big sharded-program compiles) run in a fresh
  python subprocess each: one process accumulating torch + ~150 compiled XLA
  programs reproducibly SIGSEGVs inside ``backend_compile_and_load`` when it
  then compiles the large shard_map executables (verified 3/3 full-suite
  runs, round 3 — the same tests pass in per-file subsets). A clean child
  has neither torch nor the accumulated programs, so the compile is safe AND
  its persistent-cache writes go through, keeping reruns warm.
* persistent-cache WRITES are disabled in the long-lived pytest process
  itself (reads stay on): ``put_executable_and_time`` also SIGSEGVs with
  torch resident — observed on a *small* chunked-render compile at the
  ~170th test of a warm-cache run (round 4), so it is not only the big
  sharded programs. The isolated children and the standalone entry points
  (``__graft_entry__.py``, tools) do the writing.
* torch NEVER loads in the long-lived pytest process. With torch resident,
  *any* XLA compile after ~150 accumulated programs can SIGSEGV in
  ``backend_compile_and_load`` (round-4 run 3 crashed on a small
  chunked-render compile even with cache writes off — both bundle their
  own LLVM). The torch cross-check files (``test_models.py``,
  ``test_ref_parity.py``) are excluded from main-process collection and
  each runs, complete, in one fresh subprocess driven by
  ``test_torch_isolated.py``; the lazy-torch checkpoint round-trip test is
  marked ``isolate``. ``pytest_sessionfinish`` asserts torch stayed out.
* the program-count ceiling exists WITHOUT torch too: round 5's ~12 new
  compiled programs (layer_outputs renders, fidelity-gate probes, block-
  draw epoch) tipped the main process into the same
  ``backend_compile_and_load`` SIGSEGV at ~76% of the suite, torch-free
  (the faulthandler extension-module list had no torch). Torch lowers the
  threshold; it is not the root cause. Keep the main process's program
  count roughly flat: any test class that compiles several new full-render
  or scanned-epoch programs gets ``@pytest.mark.isolate``.
"""

import os
import subprocess
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

_ISOLATED_ENV = "STNERF_TEST_ISOLATED"

# test files whose collection imports torch; never imported by the
# long-lived process — test_torch_isolated.py runs each in a subprocess
TORCH_TEST_FILES = ("test_models.py", "test_ref_parity.py")


def pytest_ignore_collect(collection_path, config):
    if os.environ.get(_ISOLATED_ENV):
        return None  # the fresh child collects (and runs) them normally
    if collection_path.name in TORCH_TEST_FILES:
        return True
    return None


def pytest_sessionfinish(session, exitstatus):
    if not os.environ.get(_ISOLATED_ENV) and "torch" in sys.modules:
        print("\nWARNING: torch leaked into the main pytest process — "
              "XLA compiles can segfault past ~150 programs "
              "(tests/conftest.py docstring); find and isolate the "
              "importer.", file=sys.stderr)


def pytest_configure(config):
    from stnerf_tpu.utils import enable_compilation_cache

    config.addinivalue_line(
        "markers",
        "isolate: run this test alone in a fresh python subprocess "
        "(heavyweight XLA program compiles crash a long-lived pytest "
        "process that has torch loaded)")
    enable_compilation_cache(os.path.expanduser("~/.cache/stnerf_tests_xla"))
    if not os.environ.get(_ISOLATED_ENV):
        # The long-lived pytest process only READS the cache. Writes come
        # from the isolated children / standalone tools (module docstring).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)


@pytest.hookimpl(tryfirst=True)
def pytest_pyfunc_call(pyfuncitem):
    if (pyfuncitem.get_closest_marker("isolate") is None
            or os.environ.get(_ISOLATED_ENV)):
        return None  # normal in-process execution
    env = os.environ.copy()
    env[_ISOLATED_ENV] = "1"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [sys.executable, "-m", "pytest", "-q", "--no-header",
           "-p", "no:cacheprovider", pyfuncitem.nodeid]
    r = subprocess.run(cmd, cwd=root, env=env, stdout=subprocess.PIPE,
                       stderr=subprocess.STDOUT, text=True, timeout=3600)
    if r.returncode != 0:
        raise AssertionError(
            f"isolated subprocess for {pyfuncitem.nodeid} exited "
            f"rc={r.returncode}:\n{r.stdout[-8000:]}")
    return True  # handled; skip the in-process call


@pytest.fixture
def rng():
    return np.random.default_rng(0)
