"""Entry-point runtime helpers (stnerf_tpu/utils/jax_setup.py)."""

import subprocess

from stnerf_tpu.utils import tpu_reachable


def test_tpu_reachable_noop_on_pinned_cpu(monkeypatch):
    # conftest pins JAX_PLATFORMS=cpu for the suite; nothing to probe.
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert tpu_reachable(timeout_s=0.001) is True


def test_tpu_reachable_escalates_probe_timeout(monkeypatch):
    """Retry timeouts must GROW: a healthy-but-cold pool has been measured
    granting its first device op only after 333 s — a row of fixed-length
    probes misreads that as a dead tunnel (round-4 outage diagnosis)."""
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setattr("time.sleep", lambda s: None)
    seen = []

    def fake_run(cmd, timeout, capture_output):
        seen.append(timeout)
        if len(seen) < 3:
            raise subprocess.TimeoutExpired(cmd, timeout)

        class Ok:
            returncode = 0

        return Ok()

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert tpu_reachable(timeout_s=100.0, attempts=4, retry_sleep_s=0) is True
    assert seen == [100.0, 175.0, 100.0 * 1.75 ** 2]
    assert all(t <= 600.0 for t in seen)


def test_tpu_reachable_timeout_cap(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setattr("time.sleep", lambda s: None)
    seen = []

    def fake_run(cmd, timeout, capture_output):
        seen.append(timeout)
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert tpu_reachable(timeout_s=500.0, attempts=3, retry_sleep_s=0) is False
    assert seen == [500.0, 600.0, 600.0]
