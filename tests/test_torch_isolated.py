"""Run the torch cross-check test files in fresh subprocesses.

``test_models.py`` and ``test_ref_parity.py`` import torch at module scope
(torch ``nn.Module`` mirrors of the reference architecture). torch must not
load into the long-lived pytest process: with torch resident, XLA compiles
past ~150 accumulated programs reproducibly SIGSEGV in
``backend_compile_and_load`` (see tests/conftest.py docstring — both
libraries bundle their own LLVM). conftest excludes those files from
main-process collection; this proxy runs each one, complete, in a single
fresh subprocess (which also safely WRITES the persistent compile cache,
keeping reruns warm). A child failure surfaces here with its full output.
"""

import os
import subprocess
import sys

import pytest

from conftest import _ISOLATED_ENV, TORCH_TEST_FILES

_HERE = os.path.dirname(os.path.abspath(__file__))


@pytest.mark.parametrize("fname", TORCH_TEST_FILES)
def test_torch_file_in_subprocess(fname):
    env = os.environ.copy()
    env[_ISOLATED_ENV] = "1"
    cmd = [sys.executable, "-m", "pytest", "-q", "--no-header",
           "-p", "no:cacheprovider", os.path.join("tests", fname)]
    r = subprocess.run(cmd, cwd=os.path.dirname(_HERE), env=env,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       text=True, timeout=3600)
    assert r.returncode == 0, (
        f"torch test file {fname} failed in its subprocess "
        f"(rc={r.returncode}):\n{r.stdout[-8000:]}")
    tail = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
    print(f"{fname}: {tail}")
