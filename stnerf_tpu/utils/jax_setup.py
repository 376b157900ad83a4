"""JAX runtime setup helpers for entry points."""

from __future__ import annotations

import logging
import os


def _cache_key() -> str:
    """Backend+machine fingerprint for the persistent-cache directory.

    XLA:CPU caches AOT machine code keyed to the *compiling* host's CPU
    features; loading an entry compiled on a different microarch emits
    "Compile machine features ... doesn't match" warnings and can SIGILL.
    Keying the cache path by (pinned platform, arch, cpu-flags hash) keeps
    TPU entries, this host's CPU entries, and any other host's CPU entries
    in disjoint directories.
    """
    import hashlib
    import platform as _platform

    plat = (os.environ.get("JAX_PLATFORMS", "") or "auto").replace(",", "-")
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.lower().startswith(("flags", "features")):
                    flags = line
                    break
    except OSError:
        pass
    h = hashlib.sha1(f"{_platform.machine()}|{flags}".encode()).hexdigest()[:8]
    return f"{plat}-{_platform.machine()}-{h}"


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist compiled XLA programs across processes.

    The full layered render program takes minutes to compile on a tunneled
    TPU; caching makes every subsequent process start in seconds. Safe to
    call multiple times. The directory is keyed by backend+machine
    fingerprint (see ``_cache_key``) so cross-machine AOT entries never mix.
    """
    import jax

    base = path or os.environ.get("STNERF_COMPILE_CACHE",
                                  os.path.expanduser("~/.cache/stnerf_tpu_xla"))
    path = os.path.join(base, _cache_key())
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - config name drift
        logging.getLogger(__name__).warning("compilation cache unavailable: %s", e)


def tpu_reachable(timeout_s: float = 180.0, attempts: int = 1,
                  retry_sleep_s: float = 90.0) -> bool:
    """Probe the device backend in a SUBPROCESS bounded by ``timeout_s``.

    With the tunneled-TPU ("axon") plugin registered, backend init BLOCKS
    indefinitely inside native code when the tunnel is down — an in-process
    check cannot time out. Entry points that a supervisor runs unattended
    (bench, compile checks) call this first so a dead tunnel yields a fast,
    clear failure instead of a hang. ``attempts > 1`` retries with a sleep,
    which also rides out a *busy* device (this runtime admits ONE TPU
    process at a time — a second exits fast with FAILED_PRECONDITION).
    Returns True immediately when JAX_PLATFORMS pins a non-TPU backend
    (nothing to probe).

    The per-attempt timeout ESCALATES (x1.75 per retry, capped at 600 s):
    a healthy-but-cold pool has been measured granting its first device op
    only after 333 s of backend init — every fixed-180 s probe in a row
    misreads that as "tunnel dead" (and killing a probe mid-grant can wedge
    the claim cycle, prolonging the outage it is diagnosing).
    """
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and "tpu" not in plats and "axon" not in plats:
        return True
    import subprocess
    import sys
    import time as _time

    code = ("import jax, jax.numpy as jnp; "
            "print(float(jax.device_get(jnp.sum(jnp.ones((4, 4))))))")
    for attempt in range(max(1, attempts)):
        if attempt:
            _time.sleep(retry_sleep_s)
        try:
            proc = subprocess.run([sys.executable, "-c", code],
                                  timeout=min(600.0,
                                              timeout_s * 1.75 ** attempt),
                                  capture_output=True)
            if proc.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
    return False


def setup_logger(name: str = "stnerf_tpu", save_dir: str | None = None,
                 distributed_rank: int = 0) -> logging.Logger:
    """Stream+file logger (ref: utils/logger.py:12-30). ``distributed_rank``
    silences non-primary hosts in multi-process runs."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    if distributed_rank > 0:
        return logger
    if not logger.handlers:
        import sys
        fmt = logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")
        ch = logging.StreamHandler(sys.stdout)
        ch.setFormatter(fmt)
        logger.addHandler(ch)
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(save_dir, "log.txt"), mode="w")
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger
